"""Gaussian attention geometry: separable filter banks, glimpse extract and
mask paste, and attention-parameter (un)normalisation.

Capability twin of the reference's ``modellib.py:581-641`` and ``:752-856``.
The reference extracts patches with a per-channel Python loop of two
``batch_matmul`` calls (``modellib.py:631-641``); here extract and paste are
each one einsum contraction over all channels, which XLA lowers to two
MXU-friendly batched matmuls.  ``ops/pallas/glimpse.py`` provides a fused
kernel for the same contraction on the TPU hot path.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def get_gaussian_filter(center, size, lg_var, image_size, filter_size):
  """Build a 1-D Gaussian attention filter bank.

  Args:
    center: [B] filter-centre coordinate in image pixels.
    size: [B] attention-window extent in image pixels.
    lg_var: [B] log variance of each Gaussian tap.
    image_size: int, static image extent L.
    filter_size: int, static number of taps F.
  Returns:
    filt: [B, L, F].

  Mirrors ``modellib.py:581-612``: tap means are
  ``mu = center + (size+1)/F * (i - (F-1)/2)`` and taps are *unnormalised*
  Gaussian densities (no sum-to-one normalisation).
  """
  span_filter = jnp.arange(filter_size, dtype=jnp.float32).reshape(1, 1, -1)
  center = center.reshape(-1, 1, 1)
  size = size.reshape(-1, 1, 1)
  mu = center + (size + 1) / filter_size * (
      span_filter - (filter_size - 1) / 2.0)
  lg_var = lg_var.reshape(-1, 1, 1)
  span = jnp.arange(image_size, dtype=jnp.float32).reshape(1, -1, 1)
  var = jnp.exp(lg_var)
  filt = (1.0 / jnp.sqrt(var) / math.sqrt(2 * math.pi) *
          jnp.exp(-0.5 * (span - mu) ** 2 / var))
  return filt


def extract_patch(x, f_y, f_x):
  """Apply separable filters: patch[b,f,g,d] = sum_hw f_y[b,h,f] x[b,h,w,d] f_x[b,w,g].

  Args:
    x: [B, H, W, D].
    f_y: [B, H, FH].
    f_x: [B, W, FW].
  Returns:
    patch: [B, FH, FW, D].

  With transposed filters this same contraction performs the inverse paste
  (ref ``modellib.py:615-641`` used a per-channel matmul loop).
  """
  # Two chained batched matmuls keeps peak memory at B*FH*W*D.
  # [B, FH, W, D]
  tmp = jnp.einsum('bhf,bhwd->bfwd', f_y, x, preferred_element_type=jnp.float32)
  return jnp.einsum('bfwd,bwg->bfgd', tmp, f_x,
                    preferred_element_type=jnp.float32)


def paste_patch(patch, f_y, f_x):
  """Inverse of extract: out[b,h,w,d] = sum_fg f_y[b,h,f] patch[b,f,g,d] f_x[b,w,g].

  Equivalent to the reference's ``extract_patch(patch, f_y^T, f_x^T)`` with
  inverse (transposed) filters (``full_model.py:810``)."""
  tmp = jnp.einsum('bhf,bfgd->bhgd', f_y, patch,
                   preferred_element_type=jnp.float32)
  return jnp.einsum('bhgd,bwg->bhwd', tmp, f_x,
                    preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Attention parameter (un)normalisation  (ref modellib.py:752-856)
# ---------------------------------------------------------------------------

def _img_size(inp_height, inp_width):
  return jnp.array([inp_height, inp_width], dtype=jnp.float32)


def get_unnormalized_center(ctr_norm, inp_height, inp_width):
  """[-1, 1] -> pixels."""
  half = _img_size(inp_height, inp_width) / 2.0
  return (ctr_norm + 1.0) * half


def get_normalized_center(ctr, inp_height, inp_width):
  half = _img_size(inp_height, inp_width) / 2.0
  return ctr / half - 1.0


def get_unnormalized_size(lg_size, inp_height, inp_width):
  """log-fraction -> pixels."""
  return jnp.exp(lg_size) * _img_size(inp_height, inp_width)


def get_normalized_size(size, inp_height, inp_width):
  return jnp.log(size / _img_size(inp_height, inp_width))


def get_unnormalized_attn(ctr_norm, lg_size, inp_height, inp_width):
  return (get_unnormalized_center(ctr_norm, inp_height, inp_width),
          get_unnormalized_size(lg_size, inp_height, inp_width))


def get_normalized_var(size, filter_height, filter_width):
  """lg_var = log(size) - log(filter_size), per (y, x) dim."""
  fsize = jnp.array([filter_height, filter_width], dtype=jnp.float32)
  return jnp.log(size) - jnp.log(fsize)


def get_normalized_gamma(size, filter_height, filter_width):
  """lg_gamma = log(F_area) - log(box area)."""
  filter_area = float(filter_height * filter_width)
  area = jnp.prod(size, axis=-1)
  return jnp.log(filter_area) - jnp.log(area)


def get_box_coord(ctr, size):
  return ctr - size / 2.0, ctr + size / 2.0


def get_box_ctr_size(top_left, bot_right):
  return (top_left + bot_right) / 2.0, bot_right - top_left
