"""Tests for the nn layer library (ref nnlib.py semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from rec_attend_tpu.nn import layers as nn
from rec_attend_tpu.nn import params as P

KEY = jax.random.PRNGKey(0)


def test_conv2d_same_shape():
  x = jnp.ones((2, 16, 16, 3))
  w = jnp.ones((3, 3, 3, 8)) * 0.01
  y = nn.conv2d(x, w)
  assert y.shape == (2, 16, 16, 8)


def test_conv2d_transpose_matches_conv_gradient():
  """TF conv2d_transpose(value, filter[F,F,out,in], stride) is the VJP of
  SAME conv2d with that filter (what nnlib.py:372-376 relies on)."""
  rng = np.random.RandomState(0)
  stride = 2
  x_small = jnp.array(rng.randn(2, 8, 8, 6).astype(np.float32))   # deconv inp
  w = jnp.array(rng.randn(3, 3, 4, 6).astype(np.float32))         # [F,F,out,in]
  got = nn.conv2d_transpose(x_small, w, stride)
  assert got.shape == (2, 16, 16, 4)

  # Oracle: VJP of forward conv2d (input [2,16,16,4] -> output [2,8,8,6]).
  # The TF deconv filter [F, F, out=4, in=6] is exactly the forward conv's
  # HWIO kernel [F, F, in_fwd=4, out_fwd=6].
  def fwd(inp):
    return jax.lax.conv_general_dilated(
        inp, w, window_strides=(stride, stride), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  primal = jnp.zeros((2, 16, 16, 4))
  _, vjp_fn = jax.vjp(fwd, primal)
  want = vjp_fn(x_small)[0]
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                             atol=1e-4)


def test_max_pool():
  x = jnp.arange(16.0).reshape(1, 4, 4, 1)
  y = nn.max_pool(x, 2)
  np.testing.assert_allclose(np.asarray(y)[0, :, :, 0],
                             [[5, 7], [13, 15]])


def test_batch_norm_train_vs_eval():
  bn = nn.init_batch_norm(4)
  x = jnp.array(np.random.RandomState(0).randn(8, 6, 6, 4).astype(np.float32))
  y, new_bn = nn.apply_batch_norm(x, bn, train=True)
  # Train: output is standardised per channel.
  np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0.0,
                             atol=1e-5)
  # EMA moved toward batch stats with decay 0.9.
  np.testing.assert_allclose(
      np.asarray(new_bn['ema_mean']),
      0.1 * np.asarray(x).mean(axis=(0, 1, 2)), rtol=1e-4, atol=1e-5)
  # Eval: uses EMA, params untouched.
  y_eval, same_bn = nn.apply_batch_norm(x, new_bn, train=False)
  assert same_bn is new_bn


def test_lstm_gate_semantics():
  params = nn.init_lstm(KEY, 3, 5)
  # forget bias init 1.0, others 0
  np.testing.assert_allclose(np.asarray(params['b_f']), 1.0)
  np.testing.assert_allclose(np.asarray(params['b_i']), 0.0)
  inp = jnp.ones((2, 3))
  state = jnp.zeros((2, 10))
  new_state, g_i, g_f, g_o = nn.apply_lstm(params, inp, state)
  assert new_state.shape == (2, 10)
  assert g_i.shape == (2, 5)
  # Oracle: manual 12-matmul computation.
  c = state[:, :5]
  h = state[:, 5:]
  gi = jax.nn.sigmoid(inp @ params['w_xi'] + h @ params['w_hi'] + params['b_i'])
  gf = jax.nn.sigmoid(inp @ params['w_xf'] + h @ params['w_hf'] + params['b_f'])
  go = jax.nn.sigmoid(inp @ params['w_xo'] + h @ params['w_ho'] + params['b_o'])
  u = jnp.tanh(inp @ params['w_xu'] + h @ params['w_hu'] + params['b_u'])
  c2 = gf * c + gi * u
  h2 = go * jnp.tanh(c2)
  np.testing.assert_allclose(np.asarray(new_state),
                             np.asarray(jnp.concatenate([c2, h2], axis=1)),
                             rtol=1e-5, atol=1e-6)


def test_cnn_apply_shapes_and_bn_copies():
  params = nn.init_cnn(KEY, [3, 3], [3, 8, 16], [True, True], num_bn_copies=4)
  assert params[0]['bn']['beta'].shape == (4, 8)
  # Slice copy 0 and run.
  sliced = [dict(l, bn={k: v[0] for k, v in l['bn'].items()}) for l in params]
  x = jnp.ones((2, 16, 16, 3))
  h, new_bns = nn.apply_cnn(sliced, x, [2, 2], [jax.nn.relu] * 2, True)
  assert h[0].shape == (2, 8, 8, 8)
  assert h[1].shape == (2, 4, 4, 16)
  assert new_bns[0]['ema_mean'].shape == (8,)


def test_weight_decay_only_on_weights():
  params = {
      'mlp': [{'w': jnp.ones((3, 3)), 'b': jnp.ones((3,))}],
      'lstm': {'w_xi': jnp.ones((2, 2)), 'b_i': jnp.ones((2,))},
      'cnn': [{'w': jnp.ones((1, 1, 1, 1)),
               'bn': {'beta': jnp.ones((4,)), 'gamma': jnp.ones((4,))}}],
  }
  wd = float(nn.weight_decay_loss(params, 2.0))
  # 0.5*(9 + 4 + 1) * 2.0 = 14 ; biases/bn excluded
  np.testing.assert_allclose(wd, 14.0)


def test_weights_h5_roundtrip(tmp_path):
  """Export/import in the reference weights.h5 schema (box_model_read.py)."""
  key = jax.random.PRNGKey(1)
  params = {
      'ctrl_cnn': nn.init_cnn(key, [3, 3], [4, 8, 8], [True, True],
                              num_bn_copies=3),
      'ctrl_lstm': nn.init_lstm(key, 8, 16),
      'ctrl_mlp': nn.init_mlp(key, [16, 9]),
  }
  path = str(tmp_path / 'weights.h5')
  P.export_weights_h5(params, path)

  import h5py
  with h5py.File(path, 'r') as f:
    assert 'ctrl_cnn_w_0' in f
    assert 'ctrl_cnn_0_2_beta' in f            # per-timestep BN keys
    assert 'ctrl_lstm_w_xi' in f
    assert 'ctrl_mlp_w_0' in f

  loaded = P.load_net_h5(path, 'ctrl_cnn')
  np.testing.assert_allclose(np.asarray(loaded[0]['w']),
                             np.asarray(params['ctrl_cnn'][0]['w']))
  np.testing.assert_allclose(np.asarray(loaded[1]['bn']['beta']),
                             np.asarray(params['ctrl_cnn'][1]['bn']['beta']))
  lstm = P.load_net_h5(path, 'ctrl_lstm')
  np.testing.assert_allclose(np.asarray(lstm['w_hf']),
                             np.asarray(params['ctrl_lstm']['w_hf']))
  assert P.load_net_h5(path, 'attn_cnn') is None
