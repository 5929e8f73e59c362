"""Groundtruth box derivation from masks.

Capability twin of the reference's ``modellib.py:644-749``: bounding boxes
from instance masks via index-map min/max reductions, padded/noised boxes,
and filled box rasterisation.  Static shapes throughout (XLA requirement);
the reference built these with dynamic shape ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from rec_attend_tpu.ops import attention


def get_idx_map(height, width, dtype=jnp.float32):
  """Pixel coordinate map [H, W, 2] with (y, x) in the last dim
  (ref modellib.py:704-729, minus the dynamic-shape gymnastics)."""
  idx_y = jnp.broadcast_to(
      jnp.arange(height, dtype=dtype)[:, None], (height, width))
  idx_x = jnp.broadcast_to(
      jnp.arange(width, dtype=dtype)[None, :], (height, width))
  return jnp.stack([idx_y, idx_x], axis=-1)


def get_filled_box_idx(idx, top_left, bot_right):
  """Rasterise [top_left, bot_right] boxes over an index map.

  Args:
    idx: [H, W, 2] from get_idx_map.
    top_left, bot_right: [..., 2].
  Returns:
    box: [..., H, W] with 1 inside the (inclusive) box.
  """
  tl = top_left[..., None, None, :]
  br = bot_right[..., None, None, :]
  lower = jnp.prod((idx >= tl).astype(jnp.float32), axis=-1)
  upper = jnp.prod((idx <= br).astype(jnp.float32), axis=-1)
  return lower * upper


def get_gt_box(y_gt, padding_ratio=0.0, center_shift_ratio=0.0,
               min_padding=10.0):
  """Groundtruth bounding boxes from instance masks.

  Args:
    y_gt: [B, T, H, W] soft/binary masks.
    padding_ratio: scalar or [B, T, 1]/[B, T, 2] box-size padding fraction.
    center_shift_ratio: scalar or [B, T, 2] centre jitter fraction.
    min_padding: minimum padding in pixels.
  Returns:
    (top_left [B, T, 2], bot_right [B, T, 2], box [B, T, H, W])

  Semantics mirror ``modellib.py:663-701`` including the empty-mask fixup:
  empty instances collapse to top_left=0, bot_right=2*min_padding.
  """
  b, t, h, w = y_gt.shape
  idx = get_idx_map(h, w)                                    # [H, W, 2]
  y_gt_not_zero = (jnp.sum(y_gt, axis=(2, 3)) > 0).astype(jnp.float32)
  y_gt_not_zero = y_gt_not_zero[:, :, None]                  # [B, T, 1]
  # Push background pixels to +inf-ish for the min, 0 for the max.
  big = float(h * w)
  idx_min = idx[None, None] + ((1.0 - y_gt) * big)[..., None]
  idx_max = idx[None, None] * y_gt[..., None]
  top_left = jnp.min(idx_min, axis=(2, 3))                   # [B, T, 2]
  bot_right = jnp.max(idx_max, axis=(2, 3))

  size = bot_right - top_left
  pad = jnp.maximum(padding_ratio * size, min_padding)
  top_left = top_left + center_shift_ratio * size - pad
  bot_right = bot_right + center_shift_ratio * size + pad
  box = get_filled_box_idx(idx, top_left, bot_right)

  top_left = top_left * y_gt_not_zero
  bot_right = (y_gt_not_zero * bot_right +
               (1 - y_gt_not_zero) * (2 * min_padding))
  return top_left, bot_right, box


def get_gt_attn(y_gt, filter_height, filter_width, padding_ratio=0.0,
                center_shift_ratio=0.0, min_padding=10.0):
  """Groundtruth attention parameters from masks (ref modellib.py:644-660).

  Returns (ctr, size, lg_var, lg_gamma, box, top_left, bot_right)."""
  top_left, bot_right, box = get_gt_box(
      y_gt, padding_ratio=padding_ratio,
      center_shift_ratio=center_shift_ratio, min_padding=min_padding)
  ctr, size = attention.get_box_ctr_size(top_left, bot_right)
  lg_var = attention.get_normalized_var(size, filter_height, filter_width)
  lg_gamma = attention.get_normalized_gamma(size, filter_height, filter_width)
  return ctr, size, lg_var, lg_gamma, box, top_left, bot_right
