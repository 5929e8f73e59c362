"""Model-level tests: forward shapes, gradient flow, train/eval paths, knob
schedules, pretrain chaining (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rec_attend_tpu import config
from rec_attend_tpu.models import box_model, fg_model, full_model

KEY = jax.random.PRNGKey(0)


def _synth_batch(rng, B, T, H, W, n_obj=2):
  x = rng.rand(B, H, W, 3).astype(np.float32)
  y_gt = np.zeros((B, T, H, W), np.float32)
  s_gt = np.zeros((B, T), np.float32)
  for b in range(B):
    for t in range(n_obj):
      cy, cx = rng.randint(8, H - 8), rng.randint(8, W - 8)
      y_gt[b, t, cy - 4:cy + 4, cx - 4:cx + 4] = 1.0
      s_gt[b, t] = 1.0
      x[b, cy - 4:cy + 4, cx - 4:cx + 4, :] += 0.5
  return {'x': jnp.array(x), 'y_gt': jnp.array(y_gt), 's_gt': jnp.array(s_gt)}


@pytest.fixture(scope='module')
def tiny_cfg():
  return config.tiny_full_config(use_knob=True, knob_use_timescale=True)


@pytest.fixture(scope='module')
def tiny_batch():
  return _synth_batch(np.random.RandomState(0), 2, 4, 64, 64)


class TestFullModel:

  def test_forward_shapes(self, tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    params = full_model.init_full_model(KEY, cfg)
    out, new_params = full_model.full_model_forward(
        params, tiny_batch, cfg, train=True, key=KEY, step=0)
    B, T, H, W = 2, cfg.timespan, cfg.inp_height, cfg.inp_width
    assert out['y_out'].shape == (B, T, H, W)
    assert out['s_out'].shape == (B, T)
    assert out['attn_box'].shape == (B, T, H, W)
    assert out['x_patch'].shape == (B, T, cfg.filter_height,
                                    cfg.filter_width, cfg.acnn_inp_depth)
    assert out['attn_ctr'].shape == (B, T, 2)
    assert out['glimpse_map'].shape == (B, T, cfg.num_ctrl_rnn_iter,
                                        cfg.crnn_h, cfg.crnn_w)
    # outputs in range
    y = np.asarray(out['y_out'])
    assert np.all(y >= 0) and np.all(y <= 1)
    s = np.asarray(out['s_out'])
    assert np.all(s >= 0) and np.all(s <= 1)
    # BN EMA was updated in train mode
    old = np.asarray(params['ctrl_cnn'][0]['bn']['ema_mean'])
    new = np.asarray(new_params['ctrl_cnn'][0]['bn']['ema_mean'])
    assert not np.allclose(old, new)

  def test_eval_mode_deterministic(self, tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    params = full_model.init_full_model(KEY, cfg)
    out1, np1 = full_model.full_model_forward(
        params, tiny_batch, cfg, train=False, key=jax.random.PRNGKey(1),
        step=0)
    out2, np2 = full_model.full_model_forward(
        params, tiny_batch, cfg, train=False, key=jax.random.PRNGKey(2),
        step=0)
    # Eval path ignores randomness entirely.
    np.testing.assert_allclose(np.asarray(out1['y_out']),
                               np.asarray(out2['y_out']), atol=1e-6)
    # BN EMA untouched in eval.
    np.testing.assert_allclose(
        np.asarray(params['ctrl_cnn'][0]['bn']['ema_mean']),
        np.asarray(np1['ctrl_cnn'][0]['bn']['ema_mean']))

  def test_loss_and_grad(self, tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    params = full_model.init_full_model(KEY, cfg)

    def loss_fn(p):
      loss, aux = full_model.full_model_loss(p, tiny_batch, cfg, True, KEY, 0)
      return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # Gradient flows to every net.
    for net in ('ctrl_cnn', 'ctrl_lstm', 'glimpse_mlp', 'ctrl_mlp',
                'attn_cnn', 'attn_dcnn', 'score_mlp'):
      gnorm = sum(float(jnp.sum(jnp.abs(g)))
                  for g in jax.tree_util.tree_leaves(grads[net]))
      assert gnorm > 0, f'no gradient reached {net}'

  def test_segm_weight_alpha(self, tiny_cfg):
    """Small-instance segm upweighting (counting lever): alpha=0 is the
    reference loss bit-for-bit; alpha>0 shifts the loss toward the small
    instance's (worse) IoU, so with one well-covered big instance and one
    missed small one the weighted loss must be strictly larger."""
    cfg0 = tiny_cfg.replace(use_knob=False, segm_weight_alpha=0.0)
    rng = np.random.RandomState(3)
    B, T, H, W = 2, cfg0.timespan, 64, 64
    batch = _synth_batch(rng, B, T, H, W, n_obj=1)
    y = np.asarray(batch['y_gt']).copy()
    s = np.asarray(batch['s_gt']).copy()
    y[:, 1, 2:5, 2:5] = 1.0        # tiny 3x3 second instance in the corner
    s[:, 1] = 1.0
    batch = dict(batch, y_gt=jnp.array(y), s_gt=jnp.array(s))
    params = full_model.init_full_model(KEY, cfg0)

    def loss_at(alpha):
      cfg = cfg0.replace(segm_weight_alpha=alpha)
      loss, aux = full_model.full_model_loss(params, batch, cfg, True,
                                             KEY, 0)
      return float(loss), aux

    base, aux0 = loss_at(0.0)
    # Construction matches the default code path exactly.
    again, _ = loss_at(0.0)
    assert base == again
    up, aux1 = loss_at(1.0)
    assert np.isfinite(up)
    # Metrics (reported iou_soft etc.) stay the unweighted definitions.
    for k in ('iou_soft',):
      if k in aux0:
        np.testing.assert_allclose(float(aux0[k]), float(aux1[k]),
                                   rtol=1e-6)
    # A random-init model covers neither instance well, but the tiny one
    # essentially not at all -> upweighting it must increase the loss.
    assert up > base

  def test_knob_schedule(self, tiny_cfg):
    cfg = tiny_cfg.replace(knob_base=1.0, knob_decay=0.5,
                           steps_per_knob_decay=100, knob_box_offset=0,
                           knob_segm_offset=200, knob_use_timescale=False)
    p_box0, p_segm0 = full_model.knob_probs(cfg, 0)
    p_box1, p_segm1 = full_model.knob_probs(cfg, 100)
    np.testing.assert_allclose(float(p_box0[0, 0, 0]), 1.0)
    np.testing.assert_allclose(float(p_box1[0, 0, 0]), 0.5)
    # segm offset delays the decay
    np.testing.assert_allclose(float(p_segm1[0, 0, 0]), 1.0)

  def test_learn_rate_staircase(self, tiny_cfg):
    cfg = tiny_cfg.replace(base_learn_rate=0.1, learn_rate_decay=0.5,
                           steps_per_learn_rate_decay=10)
    np.testing.assert_allclose(float(full_model.learn_rate(cfg, 9)), 0.1)
    np.testing.assert_allclose(float(full_model.learn_rate(cfg, 10)), 0.05)

  def test_canvas_disable_overwrite(self, tiny_batch):
    """With disable_overwrite, later masks cannot claim canvas pixels."""
    cfg = config.tiny_full_config(disable_overwrite=True, use_knob=False)
    params = full_model.init_full_model(KEY, cfg)
    out, _ = full_model.full_model_forward(
        params, tiny_batch, cfg, train=False, key=KEY, step=0)
    y = np.asarray(out['y_out'])
    # Sum over timesteps of any pixel stays <= ~1 + small slack.
    assert y.sum(axis=1).max() <= 1.0 + 0.5


class TestBoxModel:

  def test_forward_and_loss(self, tiny_batch):
    cfg = config.tiny_box_config()
    params = box_model.init_box_model(KEY, cfg)
    loss, aux = box_model.box_model_loss(params, tiny_batch, cfg, True, KEY, 0)
    assert np.isfinite(float(loss))
    out = aux['outputs']
    assert out['attn_box'].shape == (2, cfg.timespan, 64, 64)
    assert out['s_out'].shape == (2, cfg.timespan)

    def loss_fn(p):
      l, _ = box_model.box_model_loss(p, tiny_batch, cfg, True, KEY, 0)
      return l

    grads = jax.grad(loss_fn)(params)
    for net in ('ctrl_cnn', 'ctrl_lstm', 'ctrl_mlp', 'score_mlp'):
      gnorm = sum(float(jnp.sum(jnp.abs(g)))
                  for g in jax.tree_util.tree_leaves(grads[net]))
      assert gnorm > 0, f'no gradient reached {net}'


class TestFGModel:

  def test_forward_and_loss(self):
    cfg = config.tiny_fg_config()
    rng = np.random.RandomState(1)
    batch = {
        'x': jnp.array(rng.rand(2, 64, 64, 3).astype(np.float32)),
        'y_gt': jnp.array((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32)),
    }
    params = fg_model.init_fg_model(KEY, cfg)
    loss, aux = fg_model.fg_model_loss(params, batch, cfg, True, KEY)
    assert np.isfinite(float(loss))
    assert aux['outputs']['y_out'].shape == (2, 64, 64, 1)
    assert 0 <= float(aux['iou_soft']) <= 1

  def test_orientation_head(self):
    cfg = config.tiny_fg_config(
        add_orientation=True, num_orientation_classes=8,
        dcnn_depth=(8, 4, 9))
    rng = np.random.RandomState(1)
    d = np.zeros((2, 64, 64, 8), np.float32)
    d[..., 0] = 1.0
    batch = {
        'x': jnp.array(rng.rand(2, 64, 64, 3).astype(np.float32)),
        'y_gt': jnp.array((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32)),
        'd_gt': jnp.array(d),
    }
    params = fg_model.init_fg_model(KEY, cfg)
    loss, aux = fg_model.fg_model_loss(params, batch, cfg, True, KEY)
    assert np.isfinite(float(loss))
    assert 'orientation_acc' in aux
    assert aux['outputs']['d_out'].shape == (2, 64, 64, 8)


class TestPretrainChaining:

  def test_box_to_full_weight_transfer(self, tmp_path):
    """The run_cvppp.sh chain: box model weights.h5 -> full model ctrl net."""
    from rec_attend_tpu.nn import params as P
    box_cfg = config.tiny_box_config()
    bparams = box_model.init_box_model(KEY, box_cfg)
    path = str(tmp_path / 'weights.h5')
    P.export_weights_h5(
        {k: bparams[k] for k in
         ('ctrl_cnn', 'ctrl_lstm', 'glimpse_mlp', 'ctrl_mlp')}, path)

    full_cfg = config.tiny_full_config(pretrain_ctrl_net=path)
    fparams = full_model.init_full_model(jax.random.PRNGKey(9), full_cfg)
    fparams = full_model.load_pretrained(fparams, full_cfg)
    np.testing.assert_allclose(
        np.asarray(fparams['ctrl_cnn'][0]['w']),
        np.asarray(bparams['ctrl_cnn'][0]['w']))
    np.testing.assert_allclose(
        np.asarray(fparams['ctrl_lstm']['w_xi']),
        np.asarray(bparams['ctrl_lstm']['w_xi']))
    # attn nets stay freshly initialised
    assert fparams['attn_cnn'][0]['w'].shape[2] == full_cfg.acnn_inp_depth
