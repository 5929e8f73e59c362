"""Eval-time postprocess chain (host-side numpy/cv2).

Same pipeline contract as the reference's ``utils/postprocess.py`` —
confidence weighting -> full-resolution upsample (bilinear + 5x10x10
bilateral filter) -> optional 5x5 dilation -> per-pixel single-label argmax
-> threshold -> tiny-region removal (<200 px zeroes mask AND confidence) ->
foreground masking — re-expressed vectorised (no per-channel python inner
loops where numpy can broadcast).  Stays on the host deliberately: the
full-size label shapes vary per image, which is the wrong fit for XLA
(SURVEY.md §7.3).

All list-valued arguments are per-image lists of [T, H_i, W_i] arrays
(full-size shapes differ per image); batch-shaped arguments are [B, T, ...].
"""

from __future__ import annotations

import cv2
import numpy as np

# Contract constants shared with the reference pipeline.
DILATE_KERNEL = np.ones((5, 5), np.uint8)
TINY_REGION_PIXELS = 200
BILATERAL_ARGS = (5, 10, 10)


def apply_confidence(y_out, s_out, threshold=0.5):
  """Scale each instance map by its confidence; harden scores at
  ``threshold`` (the reference fixes 0.5, postprocess.py:15-28; a
  calibrated stop threshold is the counting knob).

  y_out [B, T, H, W], s_out [B, T] -> (weighted maps, 0/1 scores)."""
  return (y_out * s_out[:, :, None, None],
          (s_out > threshold).astype('float32'))


def apply_threshold(y_list, thresh):
  """Binarise soft maps at ``thresh``."""
  return [(y > thresh).astype('float32') for y in y_list]


def apply_one_label(y_list):
  """Resolve overlaps: each pixel keeps only its argmax instance."""
  out = []
  for y in y_list:
    winner = np.argmax(y, axis=0)[None, :, :]
    channel = np.arange(y.shape[0])[:, None, None]
    out.append(y * (winner == channel))
  return out


def morph(y_list):
  """5x5 dilation of every instance channel."""
  return [np.stack([cv2.dilate(ch, DILATE_KERNEL) for ch in y])
          for y in y_list]


def upsample(y_list, y_ref):
  """Resize each [T, h, w] stack to its reference [T, H_i, W_i] shape.

  Bilinear resize then bilateral smoothing, per the reference chain."""
  out = []
  for y, ref in zip(y_list, y_ref):
    size = (ref.shape[-1], ref.shape[-2])            # cv2 wants (W, H)
    out.append(np.stack([
        _resize_smooth(y[t].astype('float32'), size)
        for t in range(ref.shape[0])]))
  return out


def _resize_smooth(img, size):
  resized = cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)
  return cv2.bilateralFilter(resized, *BILATERAL_ARGS)


def remove_tiny(y_list, conf, threshold=TINY_REGION_PIXELS):
  """Zero instances smaller than ``threshold`` pixels, and their scores.

  conf is [B, T] and is updated in place (matching the pipeline's reuse of
  the hardened score array)."""
  if threshold == 0:
    return y_list, conf
  out = []
  for i, y in enumerate(y_list):
    area = y.reshape(y.shape[0], -1).sum(axis=1)
    keep = (area > threshold).astype('float32')
    out.append(y * keep[:, None, None])
    conf[i] = conf[i] * keep
  return out, conf


def mask_foreground(y_list, fg_list):
  """Intersect instance maps with a per-image foreground map [H, W]."""
  return [y * fg for y, fg in zip(y_list, fg_list)]
