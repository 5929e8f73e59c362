"""Tunnel-stall watchdog (`pipelines/watchdog.sh`) behavior.

The axon tunnel can freeze a training process silently (no exception, no
output — CLAUDE.md env gotchas), so long TPU runs are wrapped in a
watchdog that kills the run BY PID after a silence threshold and
relaunches it (commands are resume-safe).  These tests drive the real
script with short timeouts on fake commands (WATCHDOG_POLL shrinks the
60 s poll interval).
"""

import os
import subprocess
import sys
import time

import pytest

WATCHDOG = os.path.join(os.path.dirname(__file__), '..', 'pipelines',
                        'watchdog.sh')


def _attempts(wd_text):
  """Number of launch attempts recorded in the .wd sidecar (the command
  line is echoed there too, so substring-counting 'attempt' overcounts
  whenever a path contains the word)."""
  return sum(1 for line in wd_text.splitlines()
             if line.startswith('[watchdog] attempt'))


def _run(log, silent_sec, cmd, timeout=120, poll=1):
  env = dict(os.environ, WATCHDOG_POLL=str(poll))
  return subprocess.run(
      ['bash', WATCHDOG, str(log), str(silent_sec), '--'] + cmd,
      timeout=timeout, capture_output=True, text=True, env=env)


@pytest.mark.skipif(sys.platform != 'linux', reason='bash + procfs')
def test_watchdog_passthrough_clean_exit(tmp_path):
  """A command that finishes on its own runs exactly once and the
  watchdog exits 0 promptly (an exited child is a zombie until wait();
  the watchdog must not mistake it for a silent-but-alive run)."""
  log = tmp_path / 'run.log'
  t0 = time.time()
  r = _run(log, 300, ['bash', '-c', 'echo hello'])
  assert r.returncode == 0
  assert time.time() - t0 < 30
  assert log.read_text().count('hello') == 1
  wd = (tmp_path / 'run.log.wd').read_text()
  assert _attempts(wd) == 1 and 'success' in wd


@pytest.mark.skipif(sys.platform != 'linux', reason='bash + procfs')
def test_watchdog_retries_failing_command(tmp_path):
  """A nonzero exit is retried; a later attempt that succeeds ends the
  loop with rc=0."""
  log = tmp_path / 'run.log'
  marker = tmp_path / 'tried'
  script = (f'if [ -e {marker} ]; then echo ok; '
            f'else touch {marker}; echo fail; exit 3; fi')
  r = _run(log, 300, ['bash', '-c', script])
  assert r.returncode == 0
  wd = (tmp_path / 'run.log.wd').read_text()
  assert 'rc=3' in wd and _attempts(wd) == 2


@pytest.mark.skipif(sys.platform != 'linux', reason='bash + procfs')
def test_watchdog_spares_busy_but_silent_run(tmp_path):
  """Log silence alone is not a stall: device-split decode/upload and
  big-shape compiles run for many minutes without log lines while
  burning CPU.  A child that is CPU-busy past the silence threshold
  must be left alone (the stall signature is no-log AND no-CPU)."""
  log = tmp_path / 'run.log'
  # Busy-loop ~8x the silence threshold without writing to the log.
  script = ('echo started; end=$((SECONDS + 8)); '
            'while [ $SECONDS -lt $end ]; do :; done; echo finished')
  t0 = time.time()
  r = _run(log, 1, ['bash', '-c', script], timeout=120)
  assert r.returncode == 0
  body = log.read_text()
  wd = (tmp_path / 'run.log.wd').read_text()
  assert 'started' in body and 'finished' in body
  assert 'stall' not in wd and _attempts(wd) == 1
  assert time.time() - t0 < 60


@pytest.mark.skipif(sys.platform != 'linux', reason='bash + procfs')
def test_watchdog_kills_stalled_run_and_relaunches(tmp_path):
  """A run that goes silent past the threshold is killed by pid and
  relaunched; the relaunch (resume-style) completes the job."""
  log = tmp_path / 'run.log'
  marker = tmp_path / 'second_attempt'
  # First attempt: write one line then stall forever.  Second attempt
  # (marker file exists) finishes immediately — models a --resume rerun.
  script = (f'if [ -e {marker} ]; then echo resumed; '
            f'else touch {marker}; echo started; sleep 600; fi')
  t0 = time.time()
  r = _run(log, 3, ['bash', '-c', script], timeout=120)
  assert r.returncode == 0
  body = log.read_text()
  wd = (tmp_path / 'run.log.wd').read_text()
  assert 'started' in body and 'resumed' in body
  assert 'stall' in wd and _attempts(wd) == 2
  assert time.time() - t0 < 100
