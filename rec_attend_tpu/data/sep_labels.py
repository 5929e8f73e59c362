"""Colour/id label image -> list of binary instance masks.

Capability twin of the reference's ``sep_labels.py:3-26``: pack the channels
of a label image into one 64-bit id per pixel, then split on unique ids
(0 = background).
"""

from __future__ import annotations

import numpy as np


def get_separate_labels(label_img):
  """Returns (list of [H, W] uint8 masks, list of packed colour ids)."""
  dtype = label_img.dtype
  if dtype == np.uint8:
    w = 8
  elif dtype == np.uint16:
    w = 16
  elif dtype in (np.int32, np.uint32):
    w = 32
  else:
    raise ValueError(f'Unknown dtype: {dtype}')
  l64 = label_img.astype('uint64')
  if l64.ndim == 3:
    l64i = (l64[:, :, 0] << np.uint64(2 * w)) + \
           (l64[:, :, 1] << np.uint64(w)) + l64[:, :, 2]
  else:
    l64i = l64
  colors = np.unique(l64i)
  segmentations = []
  colors_all = []
  for c in colors:
    if c != 0:
      segmentations.append((l64i == c).astype('uint8'))
      colors_all.append(int(c))
  return segmentations, colors_all
