"""Coverage for model config variants: fixed_order, use_iou_box,
dynamic_var, packed d_in/y_in inputs, mse box loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rec_attend_tpu import config
from rec_attend_tpu.models import box_model, full_model

KEY = jax.random.PRNGKey(0)


def _batch(rng, T=4, H=64, W=64, with_packed=False, nsc=1):
  b = {
      'x': jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
      'y_gt': jnp.array((rng.rand(2, T, H, W) > 0.85).astype(np.float32)),
      's_gt': jnp.ones((2, T), jnp.float32),
  }
  if with_packed:
    b['d_in'] = jnp.array(rng.rand(2, H, W, 8).astype(np.float32))
    b['y_in'] = jnp.array(rng.rand(2, H, W, nsc).astype(np.float32))
  return b


def _check_loss_and_grads(loss_fn, params):
  (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
  assert np.isfinite(float(loss))
  gnorm = sum(float(jnp.sum(jnp.abs(g)))
              for g in jax.tree_util.tree_leaves(grads))
  assert np.isfinite(gnorm) and gnorm > 0
  return float(loss)


@pytest.mark.parametrize('over', [
    dict(fixed_order=True, use_knob=False),
    dict(fixed_order=True, use_knob=True),
    dict(use_iou_box=True, use_knob=True),
    dict(dynamic_var=True, use_knob=False),
    dict(box_loss_fn='mse', use_knob=False),
    dict(stop_canvas_grad=False, use_knob=False),
    dict(fixed_gamma=False, use_knob=False, squash_ctrl_params=True),
])
def test_full_model_variant(over):
  rng = np.random.RandomState(0)
  cfg = config.tiny_full_config(**over)
  params = full_model.init_full_model(KEY, cfg)
  batch = _batch(rng)

  def lf(p):
    return full_model.full_model_loss(p, batch, cfg, True, KEY, 100)

  _check_loss_and_grads(lf, params)


def test_full_model_with_packed_inputs():
  """The KITTI/Cityscapes shape: fg+orientation channels feed both nets."""
  rng = np.random.RandomState(1)
  cfg = config.tiny_full_config(
      add_d_out=True, add_y_out=True, num_semantic_classes=1,
      ctrl_add_inp=True, ctrl_add_canvas=True,
      ctrl_add_d_out=True, ctrl_add_y_out=True,
      attn_add_inp=True, attn_add_canvas=True,
      attn_add_d_out=True, attn_add_y_out=True, use_knob=True)
  assert cfg.ccnn_inp_depth == 3 + 1 + 8 + 1
  params = full_model.init_full_model(KEY, cfg)
  batch = _batch(rng, with_packed=True)

  def lf(p):
    return full_model.full_model_loss(p, batch, cfg, True, KEY, 0)

  _check_loss_and_grads(lf, params)


def test_box_model_with_packed_inputs_and_dynamic_var():
  """kitti_box_config shape (box_model.py:106-114 packed channels)."""
  rng = np.random.RandomState(2)
  cfg = config.tiny_box_config(add_d_out=True, add_y_out=True,
                               dynamic_var=True)
  params = box_model.init_box_model(KEY, cfg)
  batch = _batch(rng, with_packed=True)

  def lf(p):
    return box_model.box_model_loss(p, batch, cfg, True, KEY, 0)

  _check_loss_and_grads(lf, params)


def test_box_model_fixed_order_and_iou_box():
  rng = np.random.RandomState(3)
  for over in (dict(fixed_order=True), dict(use_iou_box=True),
               dict(box_loss_fn='mse')):
    cfg = config.tiny_box_config(**over)
    params = box_model.init_box_model(KEY, cfg)
    batch = _batch(rng)

    def lf(p):
      return box_model.box_model_loss(p, batch, cfg, True, KEY, 0)

    _check_loss_and_grads(lf, params)


def test_box_model_multiclass_scores():
  """num_semantic_classes > 1: softmax scores + 1-s0 conf loss
  (box_model.py:507-513, 616-621)."""
  rng = np.random.RandomState(4)
  cfg = config.tiny_box_config(num_semantic_classes=3)
  params = box_model.init_box_model(KEY, cfg)
  batch = _batch(rng)
  loss, aux = box_model.box_model_loss(params, batch, cfg, True, KEY, 0)
  assert np.isfinite(float(loss))
  s_out = aux['outputs']['s_out']
  assert s_out.shape == (2, cfg.timespan, 3)
  np.testing.assert_allclose(np.asarray(s_out).sum(-1), 1.0, rtol=1e-5)
