"""Batched in-graph Hungarian (max-weight bipartite matching).

TPU-native replacement for the reference's CPU custom op (``hungarian.cc``,
loaded at ``modellib.py:389-393`` and pinned to host at ``modellib.py:14-25``).
Running the matcher *inside* the jitted step removes the per-step
device->host->device round trip the reference paid on every training step.

Algorithm: Jonker-Volgenant style shortest-augmenting-path assignment
(O(N^3)) expressed with ``lax.while_loop`` / ``lax.fori_loop`` and fully
vectorised inner scans, batched with ``vmap``.  N here is the timespan
(<= 21), so one matching is a few thousand scalar ops — negligible next to
the conv stack.

Contract (shared with the C++ twin in ``native/hungarian.cc``):
  - input weights are non-negative; callers pre-round to 1e-6 precision and
    add 1e-5 (``modellib.py:403-406`` contract, see ``ops/matching.py``);
  - output is a 0/1 matching matrix saturating the smaller side with maximum
    total weight;
  - also returns feasible optimal dual covers (c_x, c_y) with
    c_x[i] + c_y[j] >= w[i, j] and equality on matched edges.

The matching is exact-optimal; on *ties* the selected matching may differ
from the reference C++ op (both are optimal, losses are identical).  Exact
trajectory parity, including dual values, is provided by the native twin and
checked in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e30


def _hungarian_square(w):
  """Max-weight perfect matching on a square [n, n] weight matrix.

  Returns (matching [n, n] float 0/1, c_x [n], c_y [n]) where (c_x, c_y) is
  an optimal dual cover.
  """
  n = w.shape[0]
  # Minimise cost = -w with the classic sentinel-column formulation:
  # arrays are padded to n+1 with index 0 as the sentinel.
  cost = jnp.zeros((n + 1, n + 1), dtype=jnp.float32)
  cost = cost.at[1:, 1:].set(-w.astype(jnp.float32))

  u0 = jnp.zeros(n + 1, dtype=jnp.float32)
  v0 = jnp.zeros(n + 1, dtype=jnp.float32)
  p0 = jnp.zeros(n + 1, dtype=jnp.int32)  # p[j]: row matched to column j

  # Iteration caps guard degenerate/NaN inputs, mirroring the reference
  # op's MAX_NUM_ITERATION bail-outs (hungarian.cc:20, 362-377): the
  # Dijkstra phase visits at most n+1 columns and augmentation walks at
  # most n+1 predecessors; the caps make that a hard guarantee.
  max_iter = n + 2

  def assign_row(i, carry):
    u, v, p = carry
    i = i + 1  # rows are 1-based
    p = p.at[0].set(i)
    minv = jnp.full(n + 1, _INF, dtype=jnp.float32)
    used = jnp.zeros(n + 1, dtype=bool)
    way = jnp.zeros(n + 1, dtype=jnp.int32)
    j0 = jnp.int32(0)
    it = jnp.int32(0)

    def dij_cond(state):
      u, v, p, minv, used, way, j0, it = state
      return (p[j0] != 0) & (it < max_iter)

    def dij_body(state):
      u, v, p, minv, used, way, j0, it = state
      used = used.at[j0].set(True)
      i0 = p[j0]
      cur = cost[i0] - u[i0] - v
      upd = (cur < minv) & (~used)
      minv = jnp.where(upd, cur, minv)
      way = jnp.where(upd, j0, way)
      mm = jnp.where(used, _INF, minv).at[0].set(_INF)
      j1 = jnp.argmin(mm).astype(jnp.int32)
      delta = mm[j1]
      u = u.at[p].add(jnp.where(used, delta, 0.0))
      v = v - jnp.where(used, delta, 0.0)
      minv = jnp.where(used, minv, minv - delta)
      return (u, v, p, minv, used, way, j1, it + 1)

    u, v, p, minv, used, way, j0, _ = jax.lax.while_loop(
        dij_cond, dij_body, (u, v, p, minv, used, way, j0, it))

    # Augment along the recorded predecessor chain.
    def aug_cond(state):
      j0, p, it = state
      return (j0 != 0) & (it < max_iter)

    def aug_body(state):
      j0, p, it = state
      j1 = way[j0]
      p = p.at[j0].set(p[j1])
      return (j1, p, it + 1)

    j0, p, _ = jax.lax.while_loop(aug_cond, aug_body, (j0, p, jnp.int32(0)))
    return (u, v, p)

  u, v, p = jax.lax.fori_loop(0, n, assign_row, (u0, v0, p0))

  col_to_row = p[1:] - 1                                 # [n], 0-based rows
  matching = (col_to_row[None, :] ==
              jnp.arange(n)[:, None]).astype(jnp.float32)
  # Min-cost potentials satisfy u[i] + v[j] <= -w  =>  (-u, -v) covers w.
  c_x = -u[1:]
  c_y = -v[1:]
  return matching, c_x, c_y


def hungarian(w):
  """Max-weight bipartite matching, single or batched.

  Args:
    w: [n_x, n_y] or [B, n_x, n_y] non-negative weights.
  Returns:
    (matching, c_x, c_y) matching the reference op's shapes:
    matching like ``w``; c_x [..., n_x, 1]; c_y [..., 1, n_y].
  """
  if w.ndim == 2:
    m, cx, cy = _hungarian_rect(w)
    return m, cx[:, None], cy[None, :]
  m, cx, cy = jax.vmap(_hungarian_rect)(w)
  return m, cx[..., None], cy[:, None, :]


def _hungarian_rect(w):
  """Rectangular wrapper: zero-pad to square, solve, crop."""
  n_x, n_y = w.shape
  n = max(n_x, n_y)
  wp = jnp.zeros((n, n), dtype=jnp.float32)
  wp = wp.at[:n_x, :n_y].set(w)
  m, cx, cy = _hungarian_square(wp)
  return m[:n_x, :n_y], cx[:n_x], cy[:n_y]


@functools.partial(jax.jit, static_argnames=())
def hungarian_jit(w):
  return hungarian(w)


def matching_weight(w, matching):
  """Total weight of a matching (for optimality checks)."""
  return jnp.sum(w * matching, axis=(-2, -1))
