"""Direct tests for ops.image_ops.random_transformation (previously only
covered indirectly through the model-level augmentation paths).

Reference semantics: /root/reference/image_ops.py (pad -> random crop ->
flips/transpose blended by phase) and cmd_args_parser.py:65-88 (transpose
only enabled for the square CVPPP preset).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_attend_tpu.ops import image_ops


def _batch(h=16, w=16, t=3, seed=0):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
  y = jnp.asarray((rng.rand(2, t, h, w) > 0.7).astype(np.float32))
  return x, y


def test_eval_path_is_identity_centre_crop():
  x, y = _batch()
  out = image_ops.random_transformation(
      jax.random.PRNGKey(0), x, 4, False, y=y)
  np.testing.assert_allclose(np.asarray(out['x']), np.asarray(x), atol=0)
  np.testing.assert_allclose(np.asarray(out['y']), np.asarray(y), atol=0)


def test_train_path_transforms_x_and_y_consistently():
  x, _ = _batch()
  # Use the image itself as a single-instance mask so any geometric
  # transform applied to x must be applied identically to y.
  y = jnp.transpose(x[..., :1], (0, 3, 1, 2))
  for seed in range(4):
    out = image_ops.random_transformation(
        jax.random.PRNGKey(seed), x, 4, True, y=y)
    np.testing.assert_allclose(
        np.asarray(out['y'])[:, 0], np.asarray(out['x'])[..., 0],
        atol=1e-6)


def test_train_path_same_key_is_deterministic():
  x, y = _batch()
  a = image_ops.random_transformation(jax.random.PRNGKey(7), x, 4, True, y=y)
  b = image_ops.random_transformation(jax.random.PRNGKey(7), x, 4, True, y=y)
  np.testing.assert_array_equal(np.asarray(a['x']), np.asarray(b['x']))


def test_transpose_requires_square_images():
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
  with pytest.raises(AssertionError):
    image_ops.random_transformation(jax.random.PRNGKey(0), x, 4, True)
  # Non-square is fine with transpose off (the KITTI/Cityscapes presets).
  out = image_ops.random_transformation(
      jax.random.PRNGKey(0), x, 4, True, rnd_transpose=False)
  assert out['x'].shape == x.shape


def test_orientation_mode_forbids_flips():
  x, _ = _batch()
  d = jnp.zeros((2, 16, 16, 8))
  with pytest.raises(AssertionError):
    image_ops.random_transformation(
        jax.random.PRNGKey(0), x, 4, True, d=d)
  out = image_ops.random_transformation(
      jax.random.PRNGKey(0), x, 4, True, d=d,
      rnd_hflip=False, rnd_vflip=False, rnd_transpose=False)
  assert out['d'].shape == d.shape
