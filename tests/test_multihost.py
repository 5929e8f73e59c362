"""Two-process multi-host test: actually executes the cross-process branch
of parallel/multihost.py (jax.distributed.initialize + global mesh +
make_array_from_process_local_data) instead of the process_count()==1
degradation covered in test_parallel.py.

Spawns two fresh CPU processes (4 virtual devices each) coordinated over
localhost; skips cleanly where the environment forbids multi-process jax
(no free port / missing CPU collectives).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '_multihost_worker.py')


def _free_port():
  with socket.socket() as s:
    s.bind(('127.0.0.1', 0))
    return s.getsockname()[1]


def test_two_process_global_batch():
  coordinator = f'127.0.0.1:{_free_port()}'
  env = {k: v for k, v in os.environ.items()
         if k not in ('XLA_FLAGS', 'PALLAS_AXON_POOL_IPS')}
  env['JAX_PLATFORMS'] = 'cpu'
  procs = [
      subprocess.Popen(
          [sys.executable, _WORKER, coordinator, '2', str(pid)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          env=env)
      for pid in (0, 1)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=240)
      outs.append(out)
  except subprocess.TimeoutExpired:
    for p in procs:
      p.kill()
    pytest.fail('multi-host workers timed out:\n' + '\n'.join(outs))

  codes = [p.returncode for p in procs]
  joined = '\n---\n'.join(outs)
  if codes != [0, 0] and ('UNIMPLEMENTED' in joined
                          or 'not supported' in joined.lower()):
    pytest.skip('environment forbids multi-process jax: ' + joined[-400:])
  assert codes == [0, 0], joined
  assert all('OK pid=' in o for o in outs), joined
