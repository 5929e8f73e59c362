"""Device mesh construction and sharding helpers.

This layer has NO reference equivalent: the reference runs one tf.Session on
one GPU (experiment.py:54).  Here data parallelism (and optional model-axis
sharding) ride ``jax.sharding.Mesh`` + NamedSharding; XLA inserts the
gradient ``psum`` over ICI when the batch axis is sharded.

Axes:
  data   - batch sharding (gradient all-reduce); the main scaling axis.
  model  - optional tensor-parallel axis for wide layers (the models are
           small, so this is a capability axis, off by default).
"""

from __future__ import annotations

import contextlib
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Ambient tensor-parallel mesh: set by ``tensor_parallel`` around a traced
# step so layer code (nn/layers.py) can pin activation shardings without
# threading the mesh through every call signature.
_TP_STATE = threading.local()


@contextlib.contextmanager
def tensor_parallel(mesh: Mesh):
  """Activate in-model TP activation constraints while tracing under it."""
  prev = getattr(_TP_STATE, 'mesh', None)
  _TP_STATE.mesh = mesh
  try:
    yield
  finally:
    _TP_STATE.mesh = prev


def constrain(x, *spec):
  """``with_sharding_constraint`` against the ambient TP mesh.

  No-op unless a mesh with a >1 'model' axis is active and every sharded
  dim divides by its axis size; layer code can therefore call this
  unconditionally.
  """
  mesh = getattr(_TP_STATE, 'mesh', None)
  if mesh is None:
    return x
  sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
  if sizes.get('model', 1) <= 1:
    return x
  for dim, name in enumerate(spec):
    if name is not None and x.shape[dim] % sizes[name] != 0:
      return x
  return jax.lax.with_sharding_constraint(
      x, NamedSharding(mesh, P(*spec)))


def make_mesh(num_data=None, num_model=1, devices=None) -> Mesh:
  """Build a (data, model) mesh over the available devices."""
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if num_data is None:
    num_data = n // num_model
  assert num_data * num_model <= n, (
      f'mesh {num_data}x{num_model} needs more than {n} devices')
  dev = np.array(devices[:num_data * num_model]).reshape(
      num_data, num_model)
  return Mesh(dev, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (batch) axis over 'data'."""
  return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
  """Place a host batch dict with the leading axis sharded over 'data'."""
  sh = batch_sharding(mesh)
  return {k: jax.device_put(v, sh) if hasattr(v, 'shape') else v
          for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
  return jax.device_put(tree, replicated(mesh))


def param_sharding_rules(params, mesh: Mesh, shard_model_axis=False):
  """Per-leaf shardings for the parameter pytree.

  Default: fully replicated (DP).  With ``shard_model_axis`` matmul
  weights split on their output dim and conv kernels on their output
  channel over 'model' — tensor parallelism for the LSTM/MLP/CNN blocks,
  paired with the activation constraints in nn/layers.py (``constrain``).
  XLA inserts the required collectives.
  """
  model_n = mesh.shape['model']

  def rule(leaf):
    if shard_model_axis and model_n > 1 and hasattr(leaf, 'ndim'):
      if (leaf.ndim == 2 and leaf.shape[1] % model_n == 0
          and leaf.shape[1] >= 2 * model_n):
        return NamedSharding(mesh, P(None, 'model'))
      if (leaf.ndim == 4 and leaf.shape[3] % model_n == 0
          and leaf.shape[3] >= 2 * model_n):
        # [kh, kw, in_c, out_c] conv kernel: split output channels.
        return NamedSharding(mesh, P(None, None, None, 'model'))
    return NamedSharding(mesh, P())

  return jax.tree_util.tree_map(rule, params)
