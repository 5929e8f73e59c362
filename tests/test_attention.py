"""Golden tests for Gaussian attention filters and extract/paste against
numpy oracles transcribing modellib.py:581-641."""

import numpy as np
import jax.numpy as jnp

from rec_attend_tpu.ops import attention

RNG = np.random.RandomState(7)


def np_gaussian_filter(center, size, lg_var, image_size, filter_size):
  B = center.shape[0]
  span_filter = np.arange(filter_size, dtype=np.float32).reshape(1, 1, -1)
  c = center.reshape(-1, 1, 1)
  s = size.reshape(-1, 1, 1)
  mu = c + (s + 1) / filter_size * (span_filter - (filter_size - 1) / 2.0)
  lv = lg_var.reshape(-1, 1, 1)
  span = np.arange(image_size, dtype=np.float32).reshape(1, -1, 1)
  return (1 / np.sqrt(np.exp(lv)) / np.sqrt(2 * np.pi) *
          np.exp(-0.5 * (span - mu) ** 2 / np.exp(lv)))


def np_extract_patch(x, f_y, f_x):
  B, H, W, D = x.shape
  FH, FW = f_y.shape[2], f_x.shape[2]
  out = np.zeros((B, FH, FW, D), np.float32)
  for d in range(D):  # per-channel matmul loop, as the reference
    xc = x[..., d]
    out[..., d] = np.einsum('bhf,bhw,bwg->bfg', f_y, xc, f_x)
  return out


def test_gaussian_filter_matches_oracle():
  B, L, F = 3, 32, 8
  center = RNG.rand(B).astype(np.float32) * L
  size = (RNG.rand(B).astype(np.float32) * 20 + 2)
  lg_var = RNG.randn(B).astype(np.float32)
  got = np.asarray(attention.get_gaussian_filter(
      jnp.array(center), jnp.array(size), jnp.array(lg_var), L, F))
  want = np_gaussian_filter(center, size, lg_var, L, F)
  assert got.shape == (B, L, F)
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_extract_patch_matches_oracle():
  B, H, W, D, FH, FW = 2, 16, 20, 3, 6, 7
  x = RNG.rand(B, H, W, D).astype(np.float32)
  f_y = RNG.rand(B, H, FH).astype(np.float32)
  f_x = RNG.rand(B, W, FW).astype(np.float32)
  got = np.asarray(attention.extract_patch(
      jnp.array(x), jnp.array(f_y), jnp.array(f_x)))
  want = np_extract_patch(x, f_y, f_x)
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_paste_is_transpose_of_extract():
  B, H, W, D, FH, FW = 2, 12, 12, 2, 5, 5
  patch = RNG.rand(B, FH, FW, D).astype(np.float32)
  f_y = RNG.rand(B, H, FH).astype(np.float32)
  f_x = RNG.rand(B, W, FW).astype(np.float32)
  got = np.asarray(attention.paste_patch(
      jnp.array(patch), jnp.array(f_y), jnp.array(f_x)))
  # Reference pastes via extract_patch with transposed filters
  # (full_model.py:810-811): extract(patch, f_y^T, f_x^T).
  want = np.asarray(attention.extract_patch(
      jnp.array(patch), jnp.array(f_y.transpose(0, 2, 1)),
      jnp.array(f_x.transpose(0, 2, 1))))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_filter_roundtrip_recovers_region():
  """A centered glimpse with var ~ (size/F)^2 should pick up mass from the
  attended region."""
  B, L, F = 1, 64, 16
  center = jnp.array([32.0])
  size = jnp.array([16.0])
  lg_var = jnp.array([0.0])
  f = attention.get_gaussian_filter(center, size, lg_var, L, F)
  # Peak of each tap's response is at its mu, within the window.
  mus = 32.0 + (16.0 + 1) / F * (np.arange(F) - (F - 1) / 2.0)
  peaks = np.argmax(np.asarray(f)[0], axis=0)
  np.testing.assert_allclose(peaks, np.round(mus), atol=1.0)


def test_normalization_roundtrips():
  H, W = 128, 448
  ctr = jnp.array([[30.0, 200.0], [64.0, 224.0]])
  size = jnp.array([[20.0, 50.0], [128.0, 448.0]])
  ctr_n = attention.get_normalized_center(ctr, H, W)
  lg_size = attention.get_normalized_size(size, H, W)
  ctr2 = attention.get_unnormalized_center(ctr_n, H, W)
  size2 = attention.get_unnormalized_size(lg_size, H, W)
  np.testing.assert_allclose(np.asarray(ctr2), np.asarray(ctr), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(size2), np.asarray(size), rtol=1e-5)
  assert np.all(np.abs(np.asarray(ctr_n)) <= 1.0)
  # full-image box maps to lg_size 0
  np.testing.assert_allclose(np.asarray(lg_size)[1], [0.0, 0.0], atol=1e-6)


def test_normalized_var_and_gamma():
  size = jnp.array([[48.0, 96.0]])
  lg_var = attention.get_normalized_var(size, 48, 48)
  np.testing.assert_allclose(np.asarray(lg_var), [[0.0, np.log(2.0)]],
                             atol=1e-6)
  lg_gamma = attention.get_normalized_gamma(size, 48, 48)
  np.testing.assert_allclose(
      np.asarray(lg_gamma), [np.log(48 * 48) - np.log(48 * 96)], atol=1e-6)


def test_box_coord_roundtrip():
  ctr = jnp.array([[10.0, 20.0]])
  size = jnp.array([[4.0, 8.0]])
  tl, br = attention.get_box_coord(ctr, size)
  ctr2, size2 = attention.get_box_ctr_size(tl, br)
  np.testing.assert_allclose(np.asarray(ctr2), np.asarray(ctr))
  np.testing.assert_allclose(np.asarray(size2), np.asarray(size))
