"""ctypes bindings for the native host kernels in ``native/``.

Builds on demand with make/g++ (no TF headers needed, unlike the reference's
``hungarian_build.sh``).  The native Hungarian is the bit-parity twin of the
in-graph JAX matcher; it can also be used inside jit via
``jax.pure_callback`` (``hungarian_callback``) for trajectory-exact matching.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_lock = threading.Lock()
_libs = {}


def _load(name: str):
  with _lock:
    if name in _libs:
      return _libs[name]
    path = os.path.join(_NATIVE_DIR, name)
    if not os.path.exists(path):
      subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                     capture_output=True)
    lib = ctypes.CDLL(path)
    _libs[name] = lib
    return lib


def hungarian_native(w: np.ndarray):
  """Solve max-weight matching with the native reference-parity solver.

  Args:
    w: [n_x, n_y] or [B, n_x, n_y] float array.
  Returns:
    (matching, cover_x, cover_y) with the reference op's shapes
    (cover_x [..., n_x, 1], cover_y [..., 1, n_y]).
  """
  lib = _load('libhungarian.so')
  lib.hungarian_solve.restype = ctypes.c_int
  squeeze = w.ndim == 2
  wb = np.ascontiguousarray(
      w[None] if squeeze else w, dtype=np.float32)
  b, n_x, n_y = wb.shape
  m = np.zeros((b, n_x, n_y), dtype=np.float32)
  cx = np.zeros((b, n_x), dtype=np.float32)
  cy = np.zeros((b, n_y), dtype=np.float32)
  lib.hungarian_solve(
      wb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      ctypes.c_int(b), ctypes.c_int(n_x), ctypes.c_int(n_y),
      m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      cx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      cy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
  cx = cx[..., None]
  cy = cy[:, None, :]
  if squeeze:
    return m[0], cx[0], cy[0]
  return m, cx, cy


def hungarian_callback(w):
  """In-graph host callback to the native matcher (jit-compatible).

  Matches the reference's placement of Hungarian on the host CPU
  (``modellib.py:14-25``) when trajectory-exact matching is required;
  the default production path is the pure-JAX on-device matcher.
  """
  import jax

  def _host(w_np):
    m, _, _ = hungarian_native(np.asarray(w_np))
    return m.astype(np.float32)

  return jax.pure_callback(
      _host, jax.ShapeDtypeStruct(w.shape, np.float32), w, vmap_method='broadcast_all')


def add_to_confusion_matrix(prediction: np.ndarray, groundtruth: np.ndarray,
                            num_classes: int,
                            conf_matrix: np.ndarray | None = None):
  """Accumulate a [num_classes, num_classes] uint64 confusion matrix.

  Twin of the reference Cython kernel (addToConfusionMatrix.pyx:10-43);
  rows are groundtruth labels, columns predictions."""
  lib = _load('libconfmat.so')
  pred = np.ascontiguousarray(prediction, dtype=np.uint8).ravel()
  gt = np.ascontiguousarray(groundtruth, dtype=np.uint8).ravel()
  if pred.size != gt.size:
    raise ValueError('prediction/groundtruth size mismatch')
  if conf_matrix is None:
    conf_matrix = np.zeros((num_classes, num_classes), dtype=np.uint64)
  assert conf_matrix.shape == (num_classes, num_classes)
  assert conf_matrix.dtype == np.uint64
  lib.add_to_confusion_matrix(
      pred.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(pred.size), ctypes.c_uint64(num_classes),
      conf_matrix.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
  return conf_matrix
