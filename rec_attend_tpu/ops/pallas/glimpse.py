"""Fused Pallas TPU kernels for the glimpse crop / mask paste path.

The per-timestep hot ops of the model are the separable-filter
contractions (ops/attention.py):

  extract: patch[b,f,g,d] = sum_hw f_y[b,h,f] x[b,h,w,d] f_x[b,w,g]
  paste:   out[b,h,w,d]   = sum_fg f_y[b,h,f] p[b,f,g,d] f_x[b,w,g]

XLA lowers the einsum forms to two batched matmuls with an intermediate
[B, FH, W, D] (or [B, H, FW, D]) buffer bounced through HBM.  These kernels
fuse both matmuls per batch element so the intermediate lives in VMEM only.

STATUS — capability/testing path, default-off (``cfg.use_pallas``).
Measured on a v5e chip (docs/BENCH_PALLAS.json, docs/BENCH_NOTES.md): the
XLA einsum path wins at every model shape, and the round-3 attempt at a
channels-last ("lane-major") fused kernel is not expressible in Mosaic —
the W-contraction of a [H, W*D] channels-last tile needs a mid-kernel
(w d)-lane regroup whose relayout Mosaic either rejects (block-shape
divisibility at 256x512) or crashes on (tpu_compile_helper exit 1 at
224x224).  This channel-major formulation below is the Mosaic-friendly
one, but it must bracket every call with full-tensor [B,H,W,D]<->[B,D,H,W]
HBM transposes (~4x the einsum's intermediate traffic at CVPPP shapes),
which is exactly where the 1.7x loss comes from.  Conclusion: for these
filter sizes (48, unaligned to the 128-lane MXU) and a channels-last model
layout, XLA's two-matmul lowering is the right program; the kernels stay
as a differential-testing twin of ops/attention.py.

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
# Kernels
# ---------------------------------------------------------------------------

# VMEM budget per input block (bytes).  v5e has ~16 MiB VMEM/core; the
# x block is the dominant buffer, so cap it at ~1/4 and let the channel
# grid dimension cover the rest (VERDICT r1 #10: the unblocked kernel
# stopped fitting at Cityscapes 256x512 with wide glimpse inputs).
_VMEM_BLOCK_BUDGET = 4 * 1024 * 1024


def _channel_block(d, h, w):
  per_channel = h * w * 4
  return max(1, min(d, _VMEM_BLOCK_BUDGET // per_channel))


def _extract_kernel(x_ref, fy_ref, fx_ref, out_ref):
  """One (batch, channel-block) tile, channels-major (Mosaic-friendly:
  every op is a 2-D matmul on the (sublane, lane) dims; the channel loop
  is a static unroll of the block size):
  x [1, DB, H, W], f_y [1, H, FH], f_x [1, W, FW] -> out [1, DB, FH, FW]."""
  _, d, h, w = x_ref.shape
  fy_t = fy_ref[0].T                                    # [FH, H]
  fx = fx_ref[0]                                        # [W, FW]
  for dd in range(d):
    tmp = jnp.dot(fy_t, x_ref[0, dd], preferred_element_type=jnp.float32)
    out_ref[0, dd] = jnp.dot(tmp, fx, preferred_element_type=jnp.float32)


def _paste_kernel(p_ref, fy_ref, fx_ref, out_ref):
  """One (batch, channel-block) tile: p [1, DB, FH, FW], f_y [1, H, FH],
  f_x [1, W, FW] -> out [1, DB, H, W]."""
  _, d, fh, fw = p_ref.shape
  fy = fy_ref[0]                                        # [H, FH]
  fx_t = fx_ref[0].T                                    # [FW, W]
  for dd in range(d):
    tmp = jnp.dot(fy, p_ref[0, dd], preferred_element_type=jnp.float32)
    out_ref[0, dd] = jnp.dot(tmp, fx_t, preferred_element_type=jnp.float32)


def _extract_call(x, f_y, f_x):
  b, h, w, d = x.shape
  fh = f_y.shape[2]
  fw = f_x.shape[2]
  db = _channel_block(d, h, w)
  x_cm = jnp.transpose(x, (0, 3, 1, 2))                 # [B, D, H, W]
  out = pl.pallas_call(
      _extract_kernel,
      grid=(b, pl.cdiv(d, db)),
      in_specs=[
          pl.BlockSpec((1, db, h, w), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, h, fh), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, w, fw), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, db, fh, fw), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, d, fh, fw), jnp.float32),
      interpret=_interpret(),
  )(x_cm, f_y, f_x)
  return jnp.transpose(out, (0, 2, 3, 1))               # [B, FH, FW, D]


def _paste_call(p, f_y, f_x):
  b, fh, fw, d = p.shape
  h = f_y.shape[1]
  w = f_x.shape[1]
  db = _channel_block(d, h, w)
  p_cm = jnp.transpose(p, (0, 3, 1, 2))                 # [B, D, FH, FW]
  out = pl.pallas_call(
      _paste_kernel,
      grid=(b, pl.cdiv(d, db)),
      in_specs=[
          pl.BlockSpec((1, db, fh, fw), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, h, fh), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, w, fw), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, db, h, w), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, d, h, w), jnp.float32),
      interpret=_interpret(),
  )(p_cm, f_y, f_x)
  return jnp.transpose(out, (0, 2, 3, 1))               # [B, H, W, D]


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
