"""Multi-host (multi-slice) execution helpers.

No reference equivalent (single tf.Session); this is the DCN half of the
TPU-native communication story (SURVEY §5.8): ``jax.distributed.initialize``
for process groups, per-host batch slicing, and assembly of globally-sharded
arrays from process-local data so the jitted train step sees one logical
batch sharded over every chip in the job.

Single-process usage degrades gracefully (process_count == 1), which is how
the test suite exercises the code path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None):
  """Bring up the jax distributed runtime (no-op if single process)."""
  if num_processes is None or num_processes <= 1:
    return
  jax.distributed.initialize(coordinator_address=coordinator_address,
                             num_processes=num_processes,
                             process_id=process_id)


def global_mesh(num_model=1):
  """Mesh over ALL devices in the job (local + remote)."""
  devices = np.array(jax.devices())
  num_data = len(devices) // num_model
  return Mesh(devices[:num_data * num_model].reshape(num_data, num_model),
              ('data', 'model'))


def process_batch_slice(global_batch_size):
  """This host's slice of the global batch (contiguous block per process)."""
  per = global_batch_size // jax.process_count()
  start = jax.process_index() * per
  return start, start + per


def make_global_batch(mesh, host_batch):
  """Assemble a globally-sharded batch from per-host arrays.

  host_batch holds this process's rows; the result is a dict of global
  arrays sharded on 'data' whose global leading dim is
  process_count * local_rows."""
  sharding = NamedSharding(mesh, P('data'))

  def to_global(x):
    x = np.asarray(x)
    global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, x, global_shape=global_shape)

  return {k: to_global(v) for k, v in host_batch.items()}
