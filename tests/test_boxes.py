"""Tests for groundtruth box derivation (ref modellib.py:644-749)."""

import numpy as np
import jax.numpy as jnp

from rec_attend_tpu.ops import boxes


def _mask_with_box(h, w, y0, x0, y1, x1):
  m = np.zeros((h, w), np.float32)
  m[y0:y1 + 1, x0:x1 + 1] = 1.0
  return m


def test_idx_map():
  idx = np.asarray(boxes.get_idx_map(4, 6))
  assert idx.shape == (4, 6, 2)
  assert idx[2, 3, 0] == 2 and idx[2, 3, 1] == 3


def test_gt_box_tight_coords():
  h, w = 32, 32
  m = _mask_with_box(h, w, 5, 8, 15, 20)
  y_gt = jnp.array(m[None, None])
  tl, br, box = boxes.get_gt_box(y_gt, padding_ratio=0.0,
                                 center_shift_ratio=0.0, min_padding=0.0)
  np.testing.assert_allclose(np.asarray(tl)[0, 0], [5, 8])
  np.testing.assert_allclose(np.asarray(br)[0, 0], [15, 20])


def test_gt_box_padding():
  h, w = 64, 64
  m = _mask_with_box(h, w, 20, 20, 40, 40)
  y_gt = jnp.array(m[None, None])
  tl, br, box = boxes.get_gt_box(y_gt, padding_ratio=0.1,
                                 center_shift_ratio=0.0, min_padding=2.0)
  # size = 20, pad = max(0.1*20, 2) = 2
  np.testing.assert_allclose(np.asarray(tl)[0, 0], [18, 18])
  np.testing.assert_allclose(np.asarray(br)[0, 0], [42, 42])


def test_gt_box_empty_mask_fixup():
  """Empty instances collapse to the reference's corner convention
  (modellib.py:696-699)."""
  y_gt = jnp.zeros((1, 2, 16, 16))
  tl, br, _ = boxes.get_gt_box(y_gt, min_padding=10.0)
  np.testing.assert_allclose(np.asarray(tl)[0], [[0, 0], [0, 0]])
  np.testing.assert_allclose(np.asarray(br)[0], [[20, 20], [20, 20]])


def test_filled_box():
  idx = boxes.get_idx_map(8, 8)
  tl = jnp.array([[2.0, 3.0]])
  br = jnp.array([[4.0, 5.0]])
  box = np.asarray(boxes.get_filled_box_idx(idx, tl, br))[0]
  assert box[2, 3] == 1 and box[4, 5] == 1
  assert box[1, 3] == 0 and box[2, 6] == 0
  assert box.sum() == 3 * 3


def test_gt_attn_params():
  h = w = 48
  m = _mask_with_box(h, w, 10, 10, 30, 30)
  y_gt = jnp.array(m[None, None])
  ctr, size, lg_var, lg_gamma, box, tl, br = boxes.get_gt_attn(
      y_gt, 24, 24, padding_ratio=0.0, center_shift_ratio=0.0,
      min_padding=0.0)
  np.testing.assert_allclose(np.asarray(ctr)[0, 0], [20, 20])
  np.testing.assert_allclose(np.asarray(size)[0, 0], [20, 20])
  np.testing.assert_allclose(np.asarray(lg_var)[0, 0],
                             np.log(20) - np.log(24), rtol=1e-5)


def test_gt_box_noise_shapes_broadcast():
  """Noised path uses per-example/timestep ratios (full_model.py:568-580)."""
  rng = np.random.RandomState(0)
  y_gt = jnp.array((rng.rand(2, 3, 16, 16) > 0.7).astype(np.float32))
  pad = jnp.array(rng.uniform(0.1, 0.3, (2, 3, 1)).astype(np.float32))
  shift = jnp.array(rng.uniform(-0.05, 0.05, (2, 3, 2)).astype(np.float32))
  tl, br, box = boxes.get_gt_box(y_gt, padding_ratio=pad,
                                 center_shift_ratio=shift, min_padding=4.0)
  assert tl.shape == (2, 3, 2)
  assert box.shape == (2, 3, 16, 16)
