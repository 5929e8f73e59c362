"""Eval-time postprocessing pipeline (host-side numpy/cv2).

Capability twin of the reference's ``utils/postprocess.py``: confidence
weighting, bilinear upsample + bilateral filter to full resolution,
single-label argmax, thresholding, 5x5 dilation, tiny-region removal with
confidence zeroing, and foreground masking.  Kept on the host exactly as the
reference does — the shapes are dynamic per image (full-size labels vary),
which is the wrong fit for XLA (SURVEY.md §7.3).
"""

from __future__ import annotations

import cv2
import numpy as np


def apply_threshold(y_out, thresh):
  """list of [T, H, W] soft -> binary maps."""
  return [(_y > thresh).astype('float32') for _y in y_out]


def apply_confidence(y_out, s_out):
  """Weight masks by confidence; harden scores at 0.5.

  y_out [B, T, H, W], s_out [B, T] -> (weighted y_out, hard s_out)."""
  s_mask = np.reshape(s_out, [-1, s_out.shape[1], 1, 1])
  y_out = y_out * s_mask
  s_out_hard = (s_out > 0.5).astype('float32')
  return y_out, s_out_hard


def apply_one_label(y_out):
  """Each pixel belongs to at most the argmax instance; list of [T, H, W]."""
  out = []
  for _y in y_out:
    y_max = np.argmax(_y, axis=0)
    _y2 = np.zeros(_y.shape, dtype=_y.dtype)
    for jj in range(_y.shape[0]):
      _y2[jj] = (y_max == jj).astype('float32') * _y[jj]
    out.append(_y2)
  return out


def morph(y_out):
  """5x5 dilation per instance channel; list of [T, H, W]."""
  return [morph_single(_y) for _y in y_out]


def morph_single(y_out):
  kernel = np.ones([5, 5], np.uint8)
  out = np.zeros(y_out.shape, dtype=y_out.dtype)
  for ch in range(y_out.shape[0]):
    out[ch] = cv2.dilate(y_out[ch], kernel)
  return out


def upsample(y_out, y_gt):
  """Resize each [T, H', W'] in y_out to its matching y_gt size with
  bilinear + bilateral filtering."""
  out = []
  for ii in range(len(y_gt)):
    size = (y_gt[ii].shape[-1], y_gt[ii].shape[-2])
    _y = np.zeros(y_gt[ii].shape, dtype='float32')
    for jj in range(y_gt[ii].shape[0]):
      _y[jj] = upsample_single(y_out[ii][jj].astype('float32'), size)
    out.append(_y)
  return out


def upsample_single(a, size):
  b = cv2.resize(a, size, interpolation=cv2.INTER_LINEAR)
  return cv2.bilateralFilter(b, 5, 10, 10)


def remove_tiny(y_out, conf, threshold=200):
  """Zero instances smaller than ``threshold`` pixels (and their
  confidence); list of [T, H, W], conf [B, T]."""
  if threshold == 0:
    return y_out, conf
  out = []
  for ii, _y in enumerate(y_out):
    _y_removed, _conf = remove_tiny_single(_y, conf[ii], threshold=threshold)
    out.append(_y_removed)
    conf[ii] = _conf
  return out, conf


def remove_tiny_single(y_out, conf, threshold=200):
  y_size = y_out.sum(axis=1, keepdims=True).sum(axis=2, keepdims=True)
  is_not_tiny = (y_size > threshold).astype('float32')
  conf = conf * np.reshape(is_not_tiny, [-1])
  return y_out * is_not_tiny, conf


def mask_foreground(y_out, fg):
  """Mask instances by a foreground map; lists of [T, H, W] and [H, W]."""
  return [_y * _fg for _y, _fg in zip(y_out, fg)]
