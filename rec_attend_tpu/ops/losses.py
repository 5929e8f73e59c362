"""Loss and metric primitives.

Capability twin of the reference's ``modellib.py:39-530`` loss/metric block,
rebuilt for XLA: the reference computes pairwise IoU/Dice with an O(T) Python
split loop (``modellib.py:138-153``); here every pairwise score is a single
batched contraction that XLA maps onto the MXU.

Numerical contracts preserved exactly (eps placement matters for parity):
  - ``f_union`` adds eps *per pixel* (``modellib.py:110-114``), so the pairwise
    union carries an ``eps * H * W`` term.
  - ``f_dice`` cards add 1e-5 per pixel (``modellib.py:90-100``).
  - BCE/CE use eps=1e-5 inside the log (``modellib.py:418-437``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5


# ---------------------------------------------------------------------------
# Cumulative min / max  (ref modellib.py:39-68)
# ---------------------------------------------------------------------------

def f_cum_min(s):
  """Prefix cumulative minimum along axis 1.  s: [B, D] -> [B, D]."""
  return jax.lax.cummin(s, axis=1)


def f_cum_max(s):
  """Suffix cumulative maximum along axis 1 (reference computes max of s[i:])."""
  return jnp.flip(jax.lax.cummax(jnp.flip(s, axis=1), axis=1), axis=1)


# ---------------------------------------------------------------------------
# Intersections / unions / IoU / Dice  (ref modellib.py:71-181)
# ---------------------------------------------------------------------------

def _flatten_hw(a):
  """[..., H, W] -> [..., H*W]."""
  return a.reshape(a.shape[:-2] + (-1,))


def f_inter(a, b):
  """Sum of a*b over the last two dims."""
  return jnp.sum(a * b, axis=(-2, -1))


def f_union(a, b, eps=EPS):
  """Sum of a+b-ab+eps over the last two dims (eps per-pixel, as reference)."""
  return jnp.sum(a + b - a * b + eps, axis=(-2, -1))


def f_iou(a, b, pairwise=False):
  """Soft IoU.

  Args:
    a: [B, N, H, W] (or fewer leading dims).
    b: [B, M, H, W].
    pairwise: if True returns [B, N, M]; else aligned IoU over last two dims.
  """
  if not pairwise:
    return f_inter(a, b) / f_union(a, b)
  af = _flatten_hw(a).astype(jnp.float32)
  bf = _flatten_hw(b).astype(jnp.float32)
  npix = af.shape[-1]
  inter = jnp.einsum('bnp,bmp->bnm', af, bf)
  sum_a = jnp.sum(af, axis=-1)
  sum_b = jnp.sum(bf, axis=-1)
  union = sum_a[:, :, None] + sum_b[:, None, :] - inter + EPS * npix
  return inter / union


def f_dice(a, b, pairwise=False):
  """Soft Dice; pairwise mode returns [B, N, M] (ref modellib.py:71-101)."""
  if not pairwise:
    card_a = jnp.sum(a + EPS, axis=(-2, -1))
    card_b = jnp.sum(b + EPS, axis=(-2, -1))
    return 2 * f_inter(a, b) / (card_a + card_b)
  af = _flatten_hw(a).astype(jnp.float32)
  bf = _flatten_hw(b).astype(jnp.float32)
  npix = af.shape[-1]
  inter = jnp.einsum('bnp,bmp->bnm', af, bf)
  card_a = jnp.sum(af, axis=-1) + EPS * npix
  card_b = jnp.sum(bf, axis=-1) + EPS * npix
  return 2 * inter / (card_a[:, :, None] + card_b[:, None, :])


def f_iou_all(a, b):
  """Dataset-level IoU over everything (ref modellib.py:171-181)."""
  inter = jnp.sum(a * b)
  union = jnp.sum(a) + jnp.sum(b) - inter + EPS
  return inter / union


# ---------------------------------------------------------------------------
# Box IoU  (ref modellib.py:184-265)
# ---------------------------------------------------------------------------

def f_inter_box(top_left_a, bot_right_a, top_left_b, bot_right_b):
  """Intersection area of boxes; shapes [..., 2] -> [...]."""
  tl = jnp.maximum(top_left_a, top_left_b)
  br = jnp.minimum(bot_right_a, bot_right_b)
  overlap = jnp.prod((tl < br).astype(jnp.float32), axis=-1)
  area = jnp.prod(br - tl, axis=-1)
  return overlap * jnp.abs(area)


def f_iou_box(top_left_a, bot_right_a, top_left_b, bot_right_b):
  """Box IoU, broadcasting; coordinates are (y, x) pairs in the last dim
  (ref modellib.py:206-238)."""
  y1a, x1a = top_left_a[..., 0], top_left_a[..., 1]
  y2a, x2a = bot_right_a[..., 0], bot_right_a[..., 1]
  y1b, x1b = top_left_b[..., 0], top_left_b[..., 1]
  y2b, x2b = bot_right_b[..., 0], bot_right_b[..., 1]
  x1m = jnp.maximum(x1a, x1b)
  y1m = jnp.maximum(y1a, y1b)
  x2m = jnp.minimum(x2a, x2b)
  y2m = jnp.minimum(y2a, y2b)
  overlap = ((x1m < x2m).astype(jnp.float32) *
             (y1m < y2m).astype(jnp.float32))
  overlap_area = overlap * (x2m - x1m) * (y2m - y1m)
  area_a = (x2a - x1a) * (y2a - y1a)
  area_b = (x2b - x1b) * (y2b - y1b)
  union = area_a + area_b - overlap_area
  return overlap_area / union


# ---------------------------------------------------------------------------
# Coverage  (ref modellib.py:268-313)
# ---------------------------------------------------------------------------

def f_coverage(iou):
  """Max IoU over predictions per GT instance; iou [B, N, M] -> [B, M]."""
  return jnp.max(iou, axis=1)


def f_coverage_weight(y_gt):
  """Per-instance area weight, zero for empty instances
  (ref modellib.py:278-289)."""
  y_gt_sum = jnp.sum(y_gt, axis=(2, 3))
  denom = (jnp.sum(y_gt_sum, axis=1, keepdims=True) +
           (y_gt_sum == 0).astype(jnp.float32))
  return y_gt_sum / denom


def f_weighted_coverage(iou, y_gt):
  cov = f_coverage(iou)
  wt = f_coverage_weight(y_gt)
  num_ex = y_gt.shape[0]
  return jnp.sum(cov * wt) / num_ex


def f_unweighted_coverage(iou, count):
  cov = f_coverage(iou)
  num_ex = iou.shape[0]
  return jnp.sum(jnp.sum(cov, axis=1) / count) / num_ex


# ---------------------------------------------------------------------------
# Cross-entropies  (ref modellib.py:418-437)
# ---------------------------------------------------------------------------

def f_ce(y_out, y_gt):
  return -y_gt * jnp.log(y_out + EPS)


def f_bce(y_out, y_gt):
  return (-y_gt * jnp.log(y_out + EPS)
          - (1 - y_gt) * jnp.log(1 - y_out + EPS))


def f_bce_minmax(y_out_min, y_out_max, y_gt):
  """Monotonic-decreasing BCE: prefix-min against 1, suffix-max against 0."""
  return (-y_gt * jnp.log(y_out_min + EPS)
          - (1 - y_gt) * jnp.log(1 - y_out_max + EPS))


# ---------------------------------------------------------------------------
# Confidence / semantic losses  (ref modellib.py:316-363)
# ---------------------------------------------------------------------------

def f_conf_loss(s_out, match, use_cum_min=True):
  """Confidence sequence loss; s_out [B, T], match [B, T, T]."""
  num_ex, timespan = s_out.shape
  match_sum = jnp.sum(match, axis=2)
  if use_cum_min:
    s_bce = f_bce_minmax(f_cum_min(s_out), f_cum_max(s_out), match_sum)
  else:
    s_bce = f_bce(s_out, match_sum)
  return jnp.sum(s_bce) / num_ex / timespan


def f_sem_loss(s_out, match, c_gt, num_semantic_classes, use_cum_min=True):
  """Semantic score loss (ref modellib.py:342-363).

  s_out: [B, T, C] class scores; match: [B, T, T]; c_gt: [B, T, C].
  """
  c_loss = f_conf_loss(1 - s_out[:, :, 0], match, use_cum_min=use_cum_min)
  # Permute GT classes through the matching.
  c_gt2 = jnp.einsum('btu,buc->btc', match, c_gt)
  num_ex, max_num_obj = s_out.shape[0], s_out.shape[1]
  s_loss = jnp.sum(f_ce(s_out, c_gt2)) / num_ex / max_num_obj
  return c_loss + s_loss


# ---------------------------------------------------------------------------
# Greedy matching  (ref modellib.py:366-379)
# ---------------------------------------------------------------------------

def f_greedy_match(score, matched):
  """One greedy step: pick argmax of score among unmatched GT slots.

  Args:
    score: [B, N] non-negative relatedness.
    matched: [B, N] binary mask of already-used slots.
  Returns:
    match: [B, N] (one-hot; uniform split on exact ties, as reference).
  """
  score = score * (1.0 - matched)
  max_score = jnp.max(score, axis=1, keepdims=True)
  match = (score == max_score).astype(jnp.float32)
  return match / jnp.sum(match, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Matched elementwise loss  (ref modellib.py:440-479)
# ---------------------------------------------------------------------------

def f_match_loss(y_out, y_gt, match, loss_fn):
  """Elementwise loss under a matching.

  Args:
    y_out: [B, N, ...]; y_gt: [B, M, ...]; match: [B, N, M].
    loss_fn: elementwise fn of (pred, target).
  Returns scalar: sum over matched pairs of per-pair summed loss, divided by
  match_count, batch size, and the per-item feature count.
  """
  num_ex = y_out.shape[0]
  feat_dims = y_out.shape[2:]
  num_dim = 1
  for d in feat_dims:
    num_dim *= d
  match_count = jnp.maximum(jnp.sum(match, axis=(1, 2)), 1.0)
  # Pairwise per-pair loss: [B, N, M]
  red_axes = tuple(range(3, 3 + len(feat_dims)))
  pair = jnp.sum(loss_fn(jnp.expand_dims(y_out, 2), jnp.expand_dims(y_gt, 1)),
                 axis=red_axes)
  err_total = jnp.sum(pair * match, axis=(1, 2))
  return jnp.sum(err_total / match_count) / num_ex / num_dim


# ---------------------------------------------------------------------------
# Counting metrics  (ref modellib.py:482-511)
# ---------------------------------------------------------------------------

def f_count_acc(s_out, s_gt):
  num_ex = s_out.shape[0]
  count_out = jnp.sum((s_out > 0.5).astype(jnp.float32), axis=1)
  count_gt = jnp.sum(s_gt, axis=1)
  return jnp.sum((count_out == count_gt).astype(jnp.float32)) / num_ex


def f_dic(s_out, s_gt, abs=False):
  num_ex = s_out.shape[0]
  count_out = jnp.sum((s_out > 0.5).astype(jnp.float32), axis=1)
  count_gt = jnp.sum(s_gt, axis=1)
  diff = count_out - count_gt
  if abs:
    diff = jnp.abs(diff)
  return jnp.sum(diff) / num_ex


# ---------------------------------------------------------------------------
# Pointwise regression losses  (ref modellib.py:514-530)
# ---------------------------------------------------------------------------

def f_huber(y_out, y_gt, threshold=1.0):
  """Huber loss.

  Note: the reference gates on ``err <= threshold`` rather than
  ``|err| <= threshold`` (``modellib.py:518``), a latent bug in an unused
  branch (canonical configs use iou box loss).  We implement the standard
  symmetric form.
  """
  err = y_out - y_gt
  ind = (jnp.abs(err) <= threshold).astype(jnp.float32)
  squared = 0.5 * err * err
  l1 = jnp.abs(err) - (threshold - 0.5 * threshold ** 2)
  return squared * ind + l1 * (1 - ind)


def f_squared_err(y_out, y_gt):
  err = y_out - y_gt
  return 0.5 * err * err
