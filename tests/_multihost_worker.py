"""Worker for the 2-process multi-host test (launched by
test_multihost.py).  Each process owns 4 virtual CPU devices; together they
form one 8-device global mesh.  Exercises the cross-process branch of
parallel/multihost.py: distributed init, global mesh, per-process batch
slicing, make_global_batch assembly, and one jitted computation whose
result requires data from BOTH processes.

Usage: python tests/_multihost_worker.py <coordinator> <num_procs> <pid>
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
os.environ.pop('PALLAS_AXON_POOL_IPS', None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
  coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))
  import jax
  from rec_attend_tpu.parallel import multihost

  multihost.initialize(coordinator_address=coordinator,
                       num_processes=num_procs, process_id=pid)
  assert jax.process_count() == num_procs, jax.process_count()
  assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

  mesh = multihost.global_mesh()
  assert mesh.shape['data'] == 4 * num_procs

  global_batch = 8
  lo, hi = multihost.process_batch_slice(global_batch)
  assert hi - lo == global_batch // num_procs

  # Each process contributes rows whose value encodes their global row id;
  # the global mean then proves both processes' data entered the result.
  import numpy as np
  rows = np.arange(lo, hi, dtype=np.float32)[:, None] * np.ones(
      (1, 16), np.float32)
  gbatch = multihost.make_global_batch(mesh, {'x': rows})
  assert gbatch['x'].shape == (global_batch, 16)

  @jax.jit
  def global_mean(b):
    return jax.numpy.mean(b['x'])

  got = float(global_mean(gbatch))
  want = float(np.arange(global_batch).mean())
  assert abs(got - want) < 1e-6, (got, want)
  print(f'OK pid={pid} mean={got}', flush=True)


if __name__ == '__main__':
  main()
