"""Instance masks -> 8-bin angle-to-centroid orientation maps.

Same data contract as the reference's assembly-time ``orientation.py``
(8 angular bins of the pixel->instance-centroid direction, bin edges offset
by pi/8, masked to the instance union), computed fully vectorised: one
coordinate grid, per-instance centroids by masked mean, and ``arctan2`` for
the angle instead of the reference's four-quadrant arcsin blend (identical
binning for every non-degenerate direction vector; the single
centre-of-mass pixel of a mask, whose direction is undefined, may land in a
neighbouring bin).
"""

from __future__ import annotations

import numpy as np

color_wheel = np.array(
    [[255, 17, 0], [255, 137, 0], [230, 255, 0], [34, 255, 0],
     [0, 255, 213], [0, 154, 255], [9, 0, 255], [255, 0, 255]], dtype='uint8')


def build_orientation_img(d, mask):
  """Render an orientation one-hot map with the colour wheel.

  d: [..., H, W, 8]; mask: [..., H, W] -> uint8 RGB image."""
  y = np.expand_dims(mask, -1)
  did = np.argmax(d, -1)
  new_shape = list(y.shape[:-1]) + [3]
  c2 = color_wheel[did.reshape([-1])].reshape(new_shape)
  return (c2 * y).astype('uint8')


def get_orientation(y, num_classes=8, encoding='one_hot'):
  """Per-pixel angle-to-instance-centroid classes.

  Args:
    y: [B, T, H, W] binary instance masks.
    num_classes: number of angular bins.
    encoding: 'one_hot' -> [B, H, W, num_classes] uint8 (union over T);
      'class' -> [B, H, W] uint8 bin indices.
  """
  b, t, h, w = y.shape
  yf = y.astype('float32')

  # Masked centroid of each instance: [B, T] each.
  row = np.arange(h, dtype='float32')[:, None]
  col = np.arange(w, dtype='float32')[None, :]
  area = yf.sum(axis=(2, 3)) + 1e-7
  ctr_row = (yf * row).sum(axis=(2, 3)) / area
  ctr_col = (yf * col).sum(axis=(2, 3)) / area

  # Pixel -> centroid offsets, zero off-mask, unit-normalised with the
  # shared epsilon scheme (offsets + 1e-8 over joint norm + 1e-7).
  d_row = (row - ctr_row[:, :, None, None]) * yf
  d_col = (col - ctr_col[:, :, None, None]) * yf
  norm = np.sqrt(d_row * d_row + d_col * d_col) + 1e-7
  u_row = (d_row + 1e-8) / norm
  u_col = (d_col + 1e-8) / norm

  # Angle -> bin, with bin edges rotated by half a bin width.
  angle = np.arctan2(u_row, u_col) + np.pi / num_classes
  bins = np.mod(np.floor((angle + np.pi) * num_classes / (2 * np.pi)),
                num_classes)

  if encoding == 'class':
    return (bins * yf).max(axis=1).astype('uint8')
  if encoding == 'one_hot':
    clazz = np.arange(num_classes, dtype='float32').reshape(1, 1, 1, 1, -1)
    one_hot = (bins[..., None] == clazz) * yf[..., None]
    return one_hot.max(axis=1).astype('uint8')
  raise ValueError(f'Unknown encoding type: {encoding}')
