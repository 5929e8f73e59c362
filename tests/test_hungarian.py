"""Hungarian matcher tests.

Ports the reference's ``hungarian_tf_tests.py`` suite: four integer
cover/matching cases with exact expected duals+matching (asserted bit-exact
on the native C++ twin), and six degenerate real-valued regression cases
that historically hung the solver (asserted to terminate, with the
production 1e-6 rounding applied).  The JAX in-graph matcher is checked for
exact optimality (same total weight as the native solver) and feasible
optimal dual covers on every case plus random batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rec_attend_tpu.ops import hungarian as hj
from rec_attend_tpu.ops import matching as matching_lib
from rec_attend_tpu.ops import native

# ---- reference test matrices (hungarian_tf_tests.py:9-276) -----------------

W1 = np.array([[3, 2, 2], [1, 2, 0], [2, 2, 1]], np.float32)
C0_1 = np.array([2, 1, 1], np.float32)
C1_1 = np.array([1, 1, 0], np.float32)
M1 = np.eye(3, dtype=np.float32)

W2 = np.array([[5, 0, 4, 0], [0, 4, 6, 8], [4, 0, 5, 7]], np.float32)
C0_2 = np.array([5, 6, 5], np.float32)
C1_2 = np.array([0, 0, 0, 2], np.float32)
M2 = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)

W3 = np.array([[5, 0, 2], [3, 1, 0], [0, 5, 0]], np.float32)
C0_3 = np.array([2, 0, 4], np.float32)
C1_3 = np.array([3, 1, 0], np.float32)
M3 = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)

WR1 = np.array(
    [[0.90, 0.70, 0.30, 0.20, 0.40, 0.001, 0.001, 0.001, 0.001, 0.001],
     [0.80, 0.75, 0.92, 0.10, 0.15, 0.001, 0.001, 0.001, 0.001, 0.001],
     [0.78, 0.85, 0.66, 0.29, 0.21, 0.001, 0.001, 0.001, 0.001, 0.001],
     [0.42, 0.55, 0.23, 0.43, 0.33, 0.002, 0.001, 0.001, 0.001, 0.001],
     [0.64, 0.44, 0.33, 0.33, 0.34, 0.001, 0.002, 0.001, 0.001, 0.001],
     [0.22, 0.55, 0.43, 0.43, 0.14, 0.001, 0.001, 0.002, 0.001, 0.001],
     [0.43, 0.33, 0.34, 0.22, 0.14, 0.001, 0.001, 0.001, 0.002, 0.001],
     [0.33, 0.42, 0.23, 0.13, 0.43, 0.001, 0.001, 0.001, 0.001, 0.002],
     [0.39, 0.24, 0.53, 0.56, 0.89, 0.001, 0.001, 0.001, 0.001, 0.001],
     [0.12, 0.34, 0.82, 0.82, 0.77, 0.001, 0.001, 0.001, 0.001, 0.001]],
    np.float32)
MR1 = np.zeros((10, 10), np.float32)
for r, c in enumerate([0, 2, 1, 5, 6, 7, 8, 9, 4, 3]):
  MR1[r, c] = 1.0

WR2 = np.array([
    [0.00604139, 0.0126045, 0.0117373, 0.01245, 0.00808836, 0.0162662,
     0.0137996, 0.00403898, 0.0123786, 1e-05],
    [0.00604229, 0.0126071, 0.0117400, 0.0124528, 0.00808971, 0.0162703,
     0.0138028, 0.00403935, 0.0123812, 1e-05],
    [0.00604234, 0.0126073, 0.0117402, 0.012453, 0.00808980, 0.0162706,
     0.0138030, 0.00403937, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05],
    [0.00604235, 0.0126073, 0.0117402, 0.012453, 0.00808981, 0.0162706,
     0.0138030, 0.00403938, 0.0123814, 1e-05]], np.float32)

WR3 = np.array([
    [0.00302646, 0.00321431, 0.0217552, 0.00836773, 0.0256353, 0.0177026,
     0.0289461, 0.0214768, 0.0101898, 1e-05],
    [0.00302875, 0.003217, 0.0217628, 0.00836405, 0.0256229, 0.0177137,
     0.0289468, 0.0214719, 0.0101904, 1e-05],
    [0.00302897, 0.00321726, 0.0217636, 0.00836369, 0.0256217, 0.0177148,
     0.0289468, 0.0214714, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.0177149,
     0.0289468, 0.0214713, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.0177149,
     0.0289468, 0.0214713, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.017715,
     0.0289468, 0.0214713, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.017715,
     0.0289468, 0.0214713, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.017715,
     0.0289468, 0.0214713, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.017715,
     0.0289468, 0.0214713, 0.0101905, 1e-05],
    [0.003029, 0.0032173, 0.0217637, 0.00836364, 0.0256216, 0.017715,
     0.0289468, 0.0214713, 0.0101905, 1e-05]], np.float32)

WR4 = np.array([
    [1e-05, 0.0634311, 1e-05, 4.76687e-05, 1.00079e-05, 1.00378e-05, 1e-05,
     1e-05, 1e-05, 3.9034e-05],
    [1e-05, 3.42696e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1.0122e-05,
     3.43236e-05, 1e-05],
    [1e-05, 0.0426792, 0.031155, 1.0008e-05, 0.00483961, 0.0228187, 1e-05,
     1e-05, 1e-05, 0.102463],
    [1e-05, 1e-05, 1e-05, 1.07065e-05, 1e-05, 1.00185e-05, 1e-05, 1e-05,
     1e-05, 1.00007e-05],
    [1e-05, 4.22947e-05, 0.00062168, 0.623917, 1.03468e-05, 0.00588984,
     1.00004e-05, 1.44433e-05, 1.00014e-05, 0.000213425],
    [1e-05, 1.01764e-05, 1e-05, 0.000667249, 1e-05, 0.000485082, 1e-05,
     1e-05, 1.00002e-05, 1e-05],
    [1e-05, 1e-05, 1.50331e-05, 1e-05, 0.11269, 1e-05, 1e-05, 1e-05, 1e-05,
     1.13251e-05],
    [1.0001e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 0.0246974, 1e-05, 1e-05,
     1e-05],
    [1e-05, 2.89144e-05, 1e-05, 1.05147e-05, 1e-05, 0.000894762, 1.03587e-05,
     0.150301, 1e-05, 1.00045e-05],
    [1e-05, 3.97901e-05, 1e-05, 1.11641e-05, 1e-05, 2.34249e-05, 1.0007e-05,
     2.42828e-05, 1e-05, 1.10529e-05]], np.float32)

WR5 = np.array([
    [1.4e-05, 1e-05, 1e-05, 0.053306, 0.044139, 1e-05, 1.2e-05, 1e-05, 1e-05,
     1e-05],
    [0.001234, 1e-05, 1e-05, 2.1e-05, 1e-05, 0.001535, 0.019553, 1e-05,
     1e-05, 1e-05],
    [0.002148, 1e-05, 1e-05, 1.6e-05, 0.651536, 2e-05, 7.4e-05, 0.002359,
     1e-05, 1e-05],
    [3.8e-05, 1e-05, 0.000592, 4.7e-05, 0.09173, 1e-05, 1e-05, 1e-05, 1e-05,
     1e-05],
    [1e-05, 1e-05, 1e-05, 0.213736, 1e-05, 4.5e-05, 0.000768, 1e-05, 1e-05,
     1e-05],
    [1e-05, 1e-05, 1e-05, 0.317609, 1e-05, 1e-05, 0.002151, 1e-05, 1e-05,
     1e-05],
    [0.002802, 1e-05, 1.2e-05, 1e-05, 1e-05, 0.002999, 4.8e-05, 1.1e-05,
     0.000919, 1e-05],
    [1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 0.028816,
     1e-05],
    [1e-05, 1e-05, 0.047335, 1e-05, 1.2e-05, 1e-05, 1e-05, 1e-05, 1e-05,
     1e-05],
    [1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05, 1e-05]],
    np.float32)

_row6 = [0.003408, 0.010531, 0.002795, 1e-05, 0.019786, 0.010435, 0.002743,
         0.023617, 0.010436, 0.003116]
WR6 = np.array([_row6] * 10, np.float32)


def _round6(w):
  p = 1e6
  return np.round(w * p) / p


def _check_valid_matching(m, n_small):
  """0/1, at most one per row/col, saturating the smaller side."""
  assert set(np.unique(m)).issubset({0.0, 1.0})
  assert np.all(m.sum(axis=0) <= 1.0 + 1e-6)
  assert np.all(m.sum(axis=1) <= 1.0 + 1e-6)
  assert m.sum() >= n_small - 1e-6


def _check_optimal_duals(w, m, cx, cy):
  """Feasibility + strong duality: cover >= w everywhere, total cover on the
  smaller side equals the matching weight."""
  cov = cx[:, None] + cy[None, :]
  assert np.all(cov >= w - 1e-4)
  weight = float((w * m).sum())
  total_cover = float(cx.sum() + cy.sum())
  np.testing.assert_allclose(total_cover, weight, atol=1e-3)


# ---------------------------------------------------------------------------
# Native (C++) twin: bit-exact reference parity.
# ---------------------------------------------------------------------------

class TestNative:

  @pytest.mark.parametrize('w,m_t,c0_t,c1_t', [
      (W1, M1, C0_1, C1_1),
      (W2, M2, C0_2, C1_2),
      (W3, M3, C0_3, C1_3),
  ])
  def test_integer_cases(self, w, m_t, c0_t, c1_t):
    m, cx, cy = native.hungarian_native(w)
    np.testing.assert_array_equal(m, m_t)
    np.testing.assert_array_equal(cx.flatten(), c0_t)
    np.testing.assert_array_equal(cy.flatten(), c1_t)

  def test_batch_case(self):
    """Ref test_min_weighted_bp_cover_4: batch of two 3x3 problems."""
    w = np.stack([W3, W1])
    m, cx, cy = native.hungarian_native(w)
    np.testing.assert_array_equal(m[0], M3)
    np.testing.assert_array_equal(m[1], M1)
    np.testing.assert_array_equal(cx[0].flatten(), C0_3)
    np.testing.assert_array_equal(cx[1].flatten(), C0_1)
    np.testing.assert_array_equal(cy[0].flatten(), C1_3)
    np.testing.assert_array_equal(cy[1].flatten(), C1_1)

  def test_real_values_1(self):
    m, _, _ = native.hungarian_native(WR1)
    np.testing.assert_array_equal(m, MR1)

  @pytest.mark.parametrize('w', [WR2, WR3])
  def test_real_values_terminate(self, w):
    m, _, _ = native.hungarian_native(w)
    _check_valid_matching(m, 10)

  @pytest.mark.parametrize('w', [WR4, WR5, WR6])
  def test_real_values_rounded_terminate(self, w):
    m, _, _ = native.hungarian_native(_round6(w))
    _check_valid_matching(m, 10)


# ---------------------------------------------------------------------------
# JAX in-graph matcher: exact optimality + feasible duals.
# ---------------------------------------------------------------------------

class TestJax:

  @pytest.mark.parametrize('w,m_t', [(W1, M1), (WR1, MR1)])
  def test_unique_optimum_cases(self, w, m_t):
    m, cx, cy = hj.hungarian(jnp.array(w))
    m = np.asarray(m)
    np.testing.assert_array_equal(m, m_t)
    _check_optimal_duals(w, m, np.asarray(cx).ravel(), np.asarray(cy).ravel())

  def test_tied_optimum_case(self):
    # W3 has two weight-10 matchings; assert optimality, not identity.
    m, cx, cy = hj.hungarian(jnp.array(W3))
    m = np.asarray(m)
    _check_valid_matching(m, 3)
    np.testing.assert_allclose(float((W3 * m).sum()), 10.0)
    _check_optimal_duals(W3, m, np.asarray(cx).ravel(), np.asarray(cy).ravel())

  def test_rectangular_case_weight(self):
    # W2 has two optimal matchings (ties); assert optimal weight.
    m, cx, cy = hj.hungarian(jnp.array(W2))
    m = np.asarray(m)
    _check_valid_matching(m, 3)
    np.testing.assert_allclose(float((W2 * m).sum()), 18.0)

  @pytest.mark.parametrize('w', [WR2, WR3, WR4, WR5, WR6])
  def test_degenerate_cases_optimal(self, w):
    w = _round6(w) + 1e-5  # production rounding + eps contract
    m, cx, cy = hj.hungarian(jnp.array(w))
    m = np.asarray(m)
    _check_valid_matching(m, 10)
    m_ref, _, _ = native.hungarian_native(w)
    np.testing.assert_allclose(
        float((w * m).sum()), float((w * m_ref).sum()), rtol=1e-5)

  def test_random_batch_matches_native_weight(self):
    rng = np.random.RandomState(2)
    w = rng.rand(8, 21, 21).astype(np.float32)
    w = np.round(w * 1e6) / 1e6 + 1e-5
    m, cx, cy = jax.jit(hj.hungarian)(jnp.array(w))
    m = np.asarray(m)
    m_ref, _, _ = native.hungarian_native(w)
    for b in range(8):
      _check_valid_matching(m[b], 21)
      np.testing.assert_allclose(float((w[b] * m[b]).sum()),
                                 float((w[b] * m_ref[b]).sum()), rtol=1e-4)
      _check_optimal_duals(w[b], m[b], np.asarray(cx)[b].ravel(),
                           np.asarray(cy)[b].ravel())


# ---------------------------------------------------------------------------
# f_segm_match contract
# ---------------------------------------------------------------------------

class TestSegmMatch:

  def test_masking_and_assignment(self):
    rng = np.random.RandomState(3)
    iou = rng.rand(2, 5, 5).astype(np.float32)
    s_gt = np.array([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]], np.float32)
    match = np.asarray(matching_lib.f_segm_match(
        jnp.array(iou), jnp.array(s_gt)))
    # Matching is zero outside the GT-present block.
    assert match[0, :, 3:].sum() == 0
    assert match[0, 3:, :].sum() == 0
    assert match[1, :, 2:].sum() == 0
    # Present GT instances each get exactly one prediction.
    np.testing.assert_allclose(match[0].sum(), 3.0)
    np.testing.assert_allclose(match[1].sum(), 2.0)

  def test_identity_match(self):
    s_gt = jnp.array([[1.0, 1.0, 0.0]])
    m = np.asarray(matching_lib.get_identity_match(3, s_gt))
    np.testing.assert_array_equal(m[0], np.diag([1.0, 1.0, 0.0]))

  def test_native_callback_matches_jax_weight(self):
    rng = np.random.RandomState(4)
    iou = rng.rand(2, 6, 6).astype(np.float32)
    s_gt = np.ones((2, 6), np.float32)
    m_jax = np.asarray(matching_lib.f_segm_match(
        jnp.array(iou), jnp.array(s_gt), matcher='jax'))
    m_nat = np.asarray(matching_lib.f_segm_match(
        jnp.array(iou), jnp.array(s_gt), matcher='native'))
    w = np.round(iou * 1e6) / 1e6 + 1e-5
    np.testing.assert_allclose((w * m_jax).sum(axis=(1, 2)),
                               (w * m_nat).sum(axis=(1, 2)), rtol=1e-5)


def test_native_matcher_inside_jitted_train_step():
  """matcher='native' routes through jax.pure_callback (ops/native.py);
  it must survive jit + grad inside a real train step and produce the same
  loss as the on-device matcher (both matchings are optimal; the weights
  here are random so the optimum is unique)."""
  from rec_attend_tpu import config
  from rec_attend_tpu.models import box_model
  from rec_attend_tpu.parallel import train_step as ts_lib

  cfg = config.tiny_box_config(timespan=4, inp_height=32, inp_width=32,
                               filter_height=12, filter_width=12, padding=2)
  key = jax.random.PRNGKey(0)
  params = box_model.init_box_model(key, cfg)
  rng = np.random.RandomState(0)
  batch = {
      'x': jnp.array(rng.rand(2, 32, 32, 3).astype(np.float32)),
      'y_gt': jnp.array((rng.rand(2, 4, 32, 32) > 0.9).astype(np.float32)),
      's_gt': jnp.ones((2, 4), np.float32),
  }

  losses = {}
  for matcher in ('jax', 'native'):
    def loss_fn(p, b, c, train, k, step, _m=matcher):
      return box_model.box_model_loss(p, b, c, train, k, step, matcher=_m)

    step_fn, tx = ts_lib.make_train_step(loss_fn, cfg, donate=False)
    opt_state = tx.init(params)
    new_params, _, metrics = step_fn(params, opt_state, batch, key,
                                     jnp.asarray(0.0))
    losses[matcher] = float(metrics['loss'])
    assert np.isfinite(losses[matcher])
  np.testing.assert_allclose(losses['native'], losses['jax'], rtol=1e-5)
