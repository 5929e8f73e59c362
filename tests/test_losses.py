"""Golden tests for the loss/metric primitives against numpy oracles that
transcribe the reference formulas (modellib.py:39-530)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rec_attend_tpu.ops import losses

RNG = np.random.RandomState(2)


def _rand_masks(b, n, h, w):
  return (RNG.rand(b, n, h, w) > 0.6).astype(np.float32)


# ---- numpy oracles (direct transcriptions of the reference math) ----------

def np_pairwise_iou(a, b, eps=1e-5):
  B, N, H, W = a.shape
  M = b.shape[1]
  out = np.zeros((B, N, M), np.float32)
  for i in range(N):
    ai = a[:, i:i + 1]
    inter = np.sum(ai * b, axis=(2, 3))
    union = np.sum(ai + b - ai * b + eps, axis=(2, 3))
    out[:, i, :] = inter / union
  return out


def np_pairwise_dice(a, b, eps=1e-5):
  B, N, H, W = a.shape
  M = b.shape[1]
  card_b = np.sum(b + eps, axis=(2, 3))
  out = np.zeros((B, N, M), np.float32)
  for i in range(N):
    ai = a[:, i:i + 1]
    inter = np.sum(ai * b, axis=(2, 3))
    card_a = np.sum(ai + eps, axis=(2, 3))
    out[:, i, :] = 2 * inter / (card_a + card_b)
  return out


def test_pairwise_iou_matches_oracle():
  a = _rand_masks(2, 4, 16, 16)
  b = _rand_masks(2, 4, 16, 16)
  got = np.asarray(losses.f_iou(jnp.array(a), jnp.array(b), pairwise=True))
  want = np_pairwise_iou(a, b)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pairwise_dice_matches_oracle():
  a = _rand_masks(2, 3, 12, 12)
  b = _rand_masks(2, 3, 12, 12)
  got = np.asarray(losses.f_dice(jnp.array(a), jnp.array(b), pairwise=True))
  want = np_pairwise_dice(a, b)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_aligned_iou():
  a = _rand_masks(2, 4, 8, 8)
  b = _rand_masks(2, 4, 8, 8)
  got = np.asarray(losses.f_iou(jnp.array(a), jnp.array(b)))
  inter = np.sum(a * b, axis=(2, 3))
  union = np.sum(a + b - a * b + 1e-5, axis=(2, 3))
  np.testing.assert_allclose(got, inter / union, rtol=1e-5)


def test_cum_min_max():
  s = np.array([[0.9, 0.5, 0.7, 0.2], [0.1, 0.9, 0.3, 0.4]], np.float32)
  got_min = np.asarray(losses.f_cum_min(jnp.array(s)))
  got_max = np.asarray(losses.f_cum_max(jnp.array(s)))
  want_min = np.minimum.accumulate(s, axis=1)
  want_max = np.maximum.accumulate(s[:, ::-1], axis=1)[:, ::-1]
  np.testing.assert_allclose(got_min, want_min)
  np.testing.assert_allclose(got_max, want_max)


def test_conf_loss_perfect_prediction_is_small():
  # 3 objects then stop: s = [1,1,1,0,0], match diag on first 3.
  s_out = jnp.array([[0.999, 0.999, 0.999, 0.001, 0.001]])
  match = jnp.zeros((1, 5, 5)).at[0, [0, 1, 2], [0, 1, 2]].set(1.0)
  loss = float(losses.f_conf_loss(s_out, match))
  assert loss < 0.01
  # Non-monotonic confidence is punished via cum-min/max.
  s_bad = jnp.array([[0.999, 0.001, 0.999, 0.001, 0.001]])
  assert float(losses.f_conf_loss(s_bad, match)) > loss + 1.0


def test_greedy_match_picks_best_unmatched():
  score = jnp.array([[0.1, 0.9, 0.5]])
  matched = jnp.array([[0.0, 1.0, 0.0]])
  m = np.asarray(losses.f_greedy_match(score, matched))
  np.testing.assert_allclose(m, [[0.0, 0.0, 1.0]])


def test_greedy_match_tie_split():
  score = jnp.array([[0.5, 0.5, 0.1]])
  matched = jnp.zeros((1, 3))
  m = np.asarray(losses.f_greedy_match(score, matched))
  np.testing.assert_allclose(m, [[0.5, 0.5, 0.0]])


def test_match_loss_matches_loop_oracle():
  B, N, D = 2, 4, 5
  y_out = RNG.rand(B, N, D).astype(np.float32)
  y_gt = RNG.rand(B, N, D).astype(np.float32)
  # random permutation matching on first 3 slots
  match = np.zeros((B, N, N), np.float32)
  for b in range(B):
    perm = RNG.permutation(3)
    for i, j in enumerate(perm):
      match[b, i, j] = 1.0
  got = float(losses.f_match_loss(
      jnp.array(y_out), jnp.array(y_gt), jnp.array(match),
      losses.f_squared_err))
  # loop oracle (ref modellib.py:440-479)
  match_count = np.maximum(match.sum(axis=(1, 2)), 1.0)
  err_total = np.zeros(B)
  for i in range(N):
    l = 0.5 * (y_out[:, i:i + 1] - y_gt) ** 2  # [B, N, D]
    err_total += np.sum(np.sum(l, axis=2) * match[:, i, :], axis=1)
  want = np.sum(err_total / match_count) / B / D
  np.testing.assert_allclose(got, want, rtol=1e-5)


def test_coverage_scores():
  iou = jnp.array(RNG.rand(2, 4, 4).astype(np.float32))
  y_gt = jnp.array(_rand_masks(2, 4, 8, 8))
  cov = np.asarray(losses.f_coverage(iou))
  np.testing.assert_allclose(cov, np.max(np.asarray(iou), axis=1))
  wt = np.asarray(losses.f_coverage_weight(y_gt))
  sums = np.asarray(y_gt).sum(axis=(2, 3))
  np.testing.assert_allclose(
      wt, sums / (sums.sum(axis=1, keepdims=True) + (sums == 0)), rtol=1e-6)
  # weighted coverage scalar
  wc = float(losses.f_weighted_coverage(iou, y_gt))
  assert 0.0 <= wc <= 1.0


def test_count_metrics():
  s_out = jnp.array([[0.9, 0.8, 0.2], [0.9, 0.6, 0.7]])
  s_gt = jnp.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
  assert float(losses.f_count_acc(s_out, s_gt)) == 0.5
  assert float(losses.f_dic(s_out, s_gt)) == 1.0
  assert float(losses.f_dic(s_out, s_gt, abs=True)) == 1.0


def test_box_iou():
  tl_a = jnp.array([[[0.0, 0.0]]])
  br_a = jnp.array([[[10.0, 10.0]]])
  tl_b = jnp.array([[[5.0, 5.0]]])
  br_b = jnp.array([[[15.0, 15.0]]])
  iou = float(losses.f_iou_box(tl_a, br_a, tl_b, br_b)[0, 0])
  np.testing.assert_allclose(iou, 25.0 / 175.0, rtol=1e-5)
  # disjoint
  tl_c = jnp.array([[[20.0, 20.0]]])
  br_c = jnp.array([[[30.0, 30.0]]])
  assert float(losses.f_iou_box(tl_a, br_a, tl_c, br_c)[0, 0]) == 0.0


def test_sem_loss_matches_numpy_oracle():
  """f_sem_loss (ref modellib.py:342-363 — defined there but never wired
  into a model, same as here): monotonic presence loss on 1-s0 plus a
  matched-class cross-entropy, checked against a from-scratch numpy
  oracle."""
  rng = np.random.RandomState(0)
  B, T, C = 3, 5, 4
  raw = rng.rand(B, T, C).astype('float32')
  s_out = raw / raw.sum(-1, keepdims=True)          # softmax-like scores
  c_gt = np.eye(C, dtype='float32')[rng.randint(0, C, (B, T))]
  # A permutation matching per example, masked to the first few slots.
  match = np.zeros((B, T, T), np.float32)
  for b in range(B):
    perm = rng.permutation(T)
    for t in range(rng.randint(2, T + 1)):
      match[b, t, perm[t]] = 1.0

  got = float(losses.f_sem_loss(jnp.asarray(s_out), jnp.asarray(match),
                                jnp.asarray(c_gt), C))

  # Oracle: conf part on 1 - s_out[:, :, 0] with prefix-min/suffix-max BCE.
  eps = 1e-5
  pres = 1 - s_out[:, :, 0]
  pres_min = np.minimum.accumulate(pres, axis=1)
  pres_max = np.maximum.accumulate(pres[:, ::-1], axis=1)[:, ::-1]
  m_sum = match.sum(axis=2)
  bce = (-m_sum * np.log(pres_min + eps)
         - (1 - m_sum) * np.log(1 - pres_max + eps))
  conf = bce.sum() / B / T
  # Class part: GT classes permuted through the matching, then CE.
  c_gt2 = np.einsum('btu,buc->btc', match, c_gt)
  ce = -(c_gt2 * np.log(s_out + eps)).sum() / B / T
  np.testing.assert_allclose(got, conf + ce, rtol=1e-5)


def test_bce_minmax():
  y_min = jnp.array([[0.9, 0.8]])
  y_max = jnp.array([[0.95, 0.85]])
  y_gt = jnp.array([[1.0, 0.0]])
  got = np.asarray(losses.f_bce_minmax(y_min, y_max, y_gt))
  want = np.array([[-np.log(0.9 + 1e-5), -np.log(1 - 0.85 + 1e-5)]])
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
