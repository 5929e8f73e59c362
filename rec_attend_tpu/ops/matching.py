"""Segmentation-to-groundtruth matching.

Capability twin of the reference's ``f_segm_match`` (``modellib.py:382-415``)
and ``get_identity_match`` (``modellib.py:28-36``), driving the matched
soft-IoU losses.  The numerical contract is preserved exactly:

  1. mask the pairwise IoU on both sides with the GT score sequence;
  2. round to 1e-6 precision (keeps the solver well-conditioned on the
     degenerate near-uniform matrices in the reference regression tests);
  3. add eps=1e-5 so every edge has positive weight;
  4. solve max-weight matching; and
  5. re-mask the matching with the GT scores.
"""

from __future__ import annotations

import jax.numpy as jnp

from rec_attend_tpu.ops import hungarian as hungarian_lib

MATCH_EPS = 1e-5
MATCH_PRECISION = 1e6


def f_segm_match(iou, s_gt, matcher='jax'):
  """Match predictions to groundtruth by pairwise IoU.

  Args:
    iou: [B, N, M] pairwise scores (predictions x groundtruth).
    s_gt: [B, M] groundtruth presence indicators.
    matcher: 'jax' (on-device while_loop solver) or 'native'
      (host callback to the C++ reference-parity solver).
  Returns:
    match: [B, N, M] 0/1 matching, zero outside present GT rows/cols.
  """
  mask_x = s_gt[:, None, :]
  mask_y = s_gt[:, :, None]
  iou_mask = iou * mask_x * mask_y
  iou_mask = jnp.round(iou_mask * MATCH_PRECISION) / MATCH_PRECISION
  weights = iou_mask + MATCH_EPS
  if matcher == 'native':
    from rec_attend_tpu.ops import native
    match_eps = native.hungarian_callback(weights)
  else:
    match_eps, _, _ = hungarian_lib.hungarian(weights)
  return match_eps * mask_x * mask_y


def get_identity_match(timespan, s_gt):
  """Fixed-order identity matching masked by the GT scores
  (ref modellib.py:28-36)."""
  eye = jnp.eye(timespan, dtype=jnp.float32)[None]
  mask_x = s_gt[:, None, :]
  mask_y = s_gt[:, :, None]
  return eye * mask_x * mask_y
