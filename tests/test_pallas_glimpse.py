"""Pallas fused glimpse kernels: parity with the einsum reference path
(forward + gradients), exercised in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rec_attend_tpu.ops import attention
from rec_attend_tpu.ops.pallas import glimpse as gk

RNG = np.random.RandomState(0)


@pytest.fixture(scope='module')
def data():
  B, H, W, D, FH, FW = 2, 32, 40, 3, 8, 8
  x = jnp.array(RNG.rand(B, H, W, D).astype(np.float32))
  ctr_y = jnp.array(RNG.rand(B).astype(np.float32) * H)
  ctr_x = jnp.array(RNG.rand(B).astype(np.float32) * W)
  size = jnp.array((RNG.rand(B) * 10 + 4).astype(np.float32))
  lg_var = jnp.zeros(B)
  f_y = attention.get_gaussian_filter(ctr_y, size, lg_var, H, FH)
  f_x = attention.get_gaussian_filter(ctr_x, size, lg_var, W, FW)
  p = jnp.array(RNG.rand(B, FH, FW, D).astype(np.float32))
  return x, f_y, f_x, p


def test_extract_matches_einsum(data):
  x, f_y, f_x, _ = data
  got = np.asarray(gk.extract_patch(x, f_y, f_x))
  want = np.asarray(attention.extract_patch(x, f_y, f_x))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_paste_matches_einsum(data):
  x, f_y, f_x, p = data
  got = np.asarray(gk.paste_patch(p, f_y, f_x))
  want = np.asarray(attention.paste_patch(p, f_y, f_x))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_extract_grads_match(data):
  x, f_y, f_x, _ = data

  def loss_pallas(x, f_y, f_x):
    return jnp.sum(gk.extract_patch(x, f_y, f_x) ** 2)

  def loss_einsum(x, f_y, f_x):
    return jnp.sum(attention.extract_patch(x, f_y, f_x) ** 2)

  g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, f_y, f_x)
  g2 = jax.grad(loss_einsum, argnums=(0, 1, 2))(x, f_y, f_x)
  for a, b in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-4)


def test_paste_grads_match(data):
  x, f_y, f_x, p = data

  def loss_pallas(p, f_y, f_x):
    return jnp.sum(gk.paste_patch(p, f_y, f_x) ** 2)

  def loss_einsum(p, f_y, f_x):
    return jnp.sum(attention.paste_patch(p, f_y, f_x) ** 2)

  g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(p, f_y, f_x)
  g2 = jax.grad(loss_einsum, argnums=(0, 1, 2))(p, f_y, f_x)
  for a, b in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-4)


def test_full_model_with_pallas_path():
  """The use_pallas flag produces the same eval outputs as the einsum path."""
  from rec_attend_tpu import config
  from rec_attend_tpu.models import full_model

  rng = np.random.RandomState(1)
  batch = {
      'x': jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32)),
      'y_gt': jnp.array((rng.rand(1, 4, 64, 64) > 0.8).astype(np.float32)),
      's_gt': jnp.ones((1, 4), jnp.float32),
  }
  key = jax.random.PRNGKey(0)
  cfg0 = config.tiny_full_config(use_pallas=False)
  cfg1 = config.tiny_full_config(use_pallas=True)
  params = full_model.init_full_model(key, cfg0)
  out0, _ = full_model.full_model_forward(params, batch, cfg0, False, key)
  out1, _ = full_model.full_model_forward(params, batch, cfg1, False, key)
  np.testing.assert_allclose(np.asarray(out1['y_out']),
                             np.asarray(out0['y_out']), rtol=1e-3,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(out1['s_out']),
                             np.asarray(out0['s_out']), rtol=1e-3,
                             atol=1e-4)


def test_channel_blocked_grid(data, monkeypatch):
  """Force a tiny VMEM budget so the channel grid dimension engages (>1
  block); results must still match the einsum path exactly."""
  x, f_y, f_x, p = data
  h, w = x.shape[1], x.shape[2]
  monkeypatch.setattr(gk, '_VMEM_BLOCK_BUDGET', h * w * 4)  # 1 ch/block
  assert gk._channel_block(x.shape[3], h, w) == 1
  got = np.asarray(gk.extract_patch(x, f_y, f_x))
  want = np.asarray(attention.extract_patch(x, f_y, f_x))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
  got_p = np.asarray(gk.paste_patch(p, f_y, f_x))
  want_p = np.asarray(attention.paste_patch(p, f_y, f_x))
  np.testing.assert_allclose(got_p, want_p, rtol=1e-4, atol=1e-5)


def test_channel_blocked_grid_nondivisor(data, monkeypatch):
  """Non-divisor channel block (db=2 over d=3): the pl.cdiv remainder path
  pads the last block; results must still match the einsum path (the real
  Cityscapes case is d=21, db=8 -> a 5-channel partial last block)."""
  x, f_y, f_x, p = data
  h, w = x.shape[1], x.shape[2]
  monkeypatch.setattr(gk, '_VMEM_BLOCK_BUDGET', 2 * h * w * 4)
  assert gk._channel_block(x.shape[3], h, w) == 2
  assert x.shape[3] % 2 == 1  # exercises the padded remainder block
  got = np.asarray(gk.extract_patch(x, f_y, f_x))
  want = np.asarray(attention.extract_patch(x, f_y, f_x))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
  got_p = np.asarray(gk.paste_patch(p, f_y, f_x))
  want_p = np.asarray(attention.paste_patch(p, f_y, f_x))
  np.testing.assert_allclose(got_p, want_p, rtol=1e-4, atol=1e-5)


def test_channel_block_sizing():
  """Cityscapes-sized inputs must stay under the VMEM block budget."""
  db = gk._channel_block(21, 256, 512)
  assert 1 <= db <= 21
  assert db * 256 * 512 * 4 <= gk._VMEM_BLOCK_BUDGET
