"""Fused Pallas TPU kernels for the glimpse crop / mask paste path.

The per-timestep hot ops of the model are the separable-filter
contractions (ops/attention.py):

  extract: patch[b,f,g,d] = sum_hw f_y[b,h,f] x[b,h,w,d] f_x[b,w,g]
  paste:   out[b,h,w,d]   = sum_fg f_y[b,h,f] p[b,f,g,d] f_x[b,w,g]

XLA lowers the einsum forms to two batched matmuls with an intermediate
[B, FH, W, D] buffer bounced through HBM.  These kernels fuse both matmuls
per batch element so the intermediate lives in VMEM only.

Layout design (round 3 — the round-2 kernels lost 1.7x to the einsum path
because they bracketed every call with full-tensor [B,H,W,D] <-> [B,D,H,W]
HBM transposes and unrolled a python loop of 1-channel matmuls):

  - operate on the model's native channels-last layout, viewing [B, H, W, D]
    as [B, H, W*D] — a free row-major regroup, no data movement;
  - contract H / FH on the MXU with (W*D) as the lane dimension;
  - every mid-kernel rearrangement is either a free row-major regroup
    ([(a b), c] <-> [a, (b c)]) or a small VMEM transpose — never an HBM
    round trip;
  - wide shapes are blocked over W chunks: paste writes disjoint output
    chunks, extract accumulates partial (W-chunk) contractions in a VMEM
    scratch accumulator and writes once on the last chunk.

Gradients: a custom VJP keeps training supported — d/dx of extract is a
paste with the same filters (and vice versa), and filter gradients are thin
einsum contractions.  The kernels run in interpreter mode automatically on
non-TPU backends so the CPU test suite exercises the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
  return jax.default_backend() != 'tpu'


# ---------------------------------------------------------------------------
# W-chunk sizing
# ---------------------------------------------------------------------------

# Per-block VMEM budget for the dominant [H, wb*D] buffer (v5e has ~16 MiB
# of VMEM/core; leave room for the filter blocks, the intermediate, and
# double buffering).
_VMEM_BLOCK_BUDGET = 2 * 1024 * 1024


def _w_chunk(h, w, d):
  """Largest divisor of ``w`` whose [h, wb*d] f32 block fits the budget."""
  for nj in range(1, w + 1):
    if w % nj:
      continue
    wb = w // nj
    if h * wb * d * 4 <= _VMEM_BLOCK_BUDGET:
      return wb
  return 1


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _extract_kernel(x_ref, fy_ref, fx_ref, out_ref, acc_ref):
  """One (batch, w-chunk) tile.

  x_ref [1, H, wb*D] (channels-last view), fy_ref [1, H, FH],
  fx_ref [1, wb, FW]; acc_ref scratch [FW, D*FH]; out_ref [1, FH, FW*D].
  """
  j = pl.program_id(1)
  fh = fy_ref.shape[2]
  fw = fx_ref.shape[2]
  wb = fx_ref.shape[1]
  d = x_ref.shape[2] // wb

  # tmp[(w d), f] = sum_h x[h, (w d)] f_y[h, f]   (MXU, lanes = FH)
  tmp = jax.lax.dot_general(x_ref[0], fy_ref[0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
  # [(wb d), FH] -> [wb, (d FH)]: free row-major regroup.
  tmp2 = tmp.reshape(wb, d * fh)
  # part[g, (d f)] = sum_w f_x[w, g] tmp2[w, (d f)]
  part = jax.lax.dot_general(fx_ref[0], tmp2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

  @pl.when(j == 0)
  def _init():
    acc_ref[...] = part

  @pl.when(j > 0)
  def _accum():
    acc_ref[...] += part

  @pl.when(j == pl.num_programs(1) - 1)
  def _write():
    # [FW, (d f)] -> [FH, FW, D] -> [FH, (g d)]: one small VMEM transpose.
    out_ref[0] = acc_ref[...].reshape(fw, d, fh).transpose(2, 0, 1).reshape(
        fh, fw * d)


def _paste_kernel(p_ref, fy_ref, fx_ref, out_ref):
  """One (batch, w-chunk) tile; chunks write disjoint output columns.

  p_ref [1, FH, FW*D], fy_ref [1, H, FH], fx_ref [1, wb, FW];
  out_ref [1, H, wb*D].
  """
  h = fy_ref.shape[1]
  fh = fy_ref.shape[2]
  wb = fx_ref.shape[1]
  fw = fx_ref.shape[2]
  d = p_ref.shape[2] // fw

  # s[(g d), h] = sum_f p[f, (g d)] f_y[h, f]   (produced pre-transposed)
  s = jax.lax.dot_general(p_ref[0], fy_ref[0], (((0,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
  # [(fw d), H] -> [FW, (d H)]: free row-major regroup.
  s2 = s.reshape(fw, d * h)
  # o[w, (d h)] = sum_g f_x[w, g] s2[g, (d h)]
  o = jax.lax.dot_general(fx_ref[0], s2, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
  # [wb, (d h)] -> [H, wb, D] -> [H, (w d)]: one VMEM transpose.
  out_ref[0] = o.reshape(wb, d, h).transpose(2, 0, 1).reshape(h, wb * d)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _extract_call(x, f_y, f_x):
  b, h, w, d = x.shape
  fh = f_y.shape[2]
  fw = f_x.shape[2]
  wb = _w_chunk(h, w, d)
  out = pl.pallas_call(
      _extract_kernel,
      grid=(b, w // wb),
      in_specs=[
          pl.BlockSpec((1, h, wb * d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, h, fh), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, wb, fw), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, fh, fw * d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, fh, fw * d), jnp.float32),
      scratch_shapes=[pltpu.VMEM((fw, d * fh), jnp.float32)],
      interpret=_interpret(),
  )(x.reshape(b, h, w * d), f_y, f_x)
  return out.reshape(b, fh, fw, d)


def _paste_call(p, f_y, f_x):
  b, fh, fw, d = p.shape
  h = f_y.shape[1]
  w = f_x.shape[1]
  wb = _w_chunk(h, w, d)
  out = pl.pallas_call(
      _paste_kernel,
      grid=(b, w // wb),
      in_specs=[
          pl.BlockSpec((1, fh, fw * d), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, h, fh), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, wb, fw), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, h, wb * d), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, h, w * d), jnp.float32),
      interpret=_interpret(),
  )(p.reshape(b, fh, fw * d), f_y, f_x)
  return out.reshape(b, h, w, d)


# ---------------------------------------------------------------------------
# Custom-VJP public ops
# ---------------------------------------------------------------------------

@jax.custom_vjp
def extract_patch(x, f_y, f_x):
  """Fused glimpse crop.  Same contract as ops.attention.extract_patch."""
  return _extract_call(x, f_y, f_x)


def _extract_fwd(x, f_y, f_x):
  return _extract_call(x, f_y, f_x), (x, f_y, f_x)


def _extract_bwd(res, g):
  x, f_y, f_x = res
  d_x = _paste_call(g, f_y, f_x)
  # d_f_y[b,h,f] = sum_{g,d} g[b,f,g,d] * (x f_x)[b,h,g,d]
  xg = jnp.einsum('bhwd,bwg->bhgd', x, f_x,
                  preferred_element_type=jnp.float32)
  d_f_y = jnp.einsum('bfgd,bhgd->bhf', g, xg,
                     preferred_element_type=jnp.float32)
  # d_f_x[b,w,g] = sum_{f,d} g[b,f,g,d] * (f_y x)[b,f,w,d]
  fyx = jnp.einsum('bhf,bhwd->bfwd', f_y, x,
                   preferred_element_type=jnp.float32)
  d_f_x = jnp.einsum('bfgd,bfwd->bwg', g, fyx,
                     preferred_element_type=jnp.float32)
  return d_x, d_f_y, d_f_x


extract_patch.defvjp(_extract_fwd, _extract_bwd)


@jax.custom_vjp
def paste_patch(p, f_y, f_x):
  """Fused mask paste.  Same contract as ops.attention.paste_patch."""
  return _paste_call(p, f_y, f_x)


def _paste_fwd(p, f_y, f_x):
  return _paste_call(p, f_y, f_x), (p, f_y, f_x)


def _paste_bwd(res, g):
  p, f_y, f_x = res
  d_p = _extract_call(g, f_y, f_x)
  # d_f_y[b,h,f] = sum_{w,d} g[b,h,w,d] * (p f_x^T)[b,f,w,d]
  pfx = jnp.einsum('bfgd,bwg->bfwd', p, f_x,
                   preferred_element_type=jnp.float32)
  d_f_y = jnp.einsum('bhwd,bfwd->bhf', g, pfx,
                     preferred_element_type=jnp.float32)
  # d_f_x[b,w,g] = sum_{h,d} g[b,h,w,d] * (f_y p)[b,h,g,d]
  fyp = jnp.einsum('bhf,bfgd->bhgd', f_y, p,
                   preferred_element_type=jnp.float32)
  d_f_x = jnp.einsum('bhwd,bhgd->bwg', g, fyp,
                     preferred_element_type=jnp.float32)
  return d_p, d_f_y, d_f_x


paste_patch.defvjp(_paste_fwd, _paste_bwd)
