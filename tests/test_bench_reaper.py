"""bench.py leftover-run reaper.

The driver runs bench.py on the real TPU at round end; a watchdog-wrapped
training pipeline that outlived its session (they survive session death)
would contend with the single-tenant TPU claim mid-benchmark.  bench.py
therefore kills recorded run/watchdog/queue pids first (strictly by pid,
from logs/runs/ pid files).
"""

import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import bench  # noqa: E402


def _spawn_sleeper():
  return subprocess.Popen(['sleep', '600'])


def _alive(pid):
  try:
    os.kill(pid, 0)
    return True
  except ProcessLookupError:
    return False


@pytest.mark.skipif(sys.platform != 'linux', reason='posix signals')
def test_reaper_kills_recorded_pids(tmp_path):
  runs = tmp_path / 'logs' / 'runs'
  runs.mkdir(parents=True)
  run_p, wd_p, q_p = _spawn_sleeper(), _spawn_sleeper(), _spawn_sleeper()
  (runs / 'a.log.pid').write_text(f'{run_p.pid}\n')
  (runs / 'a.log.wdpid').write_text(f'{wd_p.pid}\n')
  (runs / 'queue.pid').write_text(f'queue pid {q_p.pid}\n')  # prose format
  (runs / 'stale.log.pid').write_text('99999999\n')          # dead pid: skipped
  (runs / 'empty.log.pid').write_text('\n')                  # no digits: skipped
  try:
    bench._reap_inflight_runs(base_dir=str(tmp_path), grace_sec=2)
    for p in (run_p, wd_p, q_p):
      p.wait(timeout=10)
    assert not any(_alive(p.pid) for p in (run_p, wd_p, q_p))
  finally:
    for p in (run_p, wd_p, q_p):
      if p.poll() is None:
        p.kill()
      p.wait()


@pytest.mark.skipif(sys.platform != 'linux', reason='posix signals')
def test_reaper_kills_pids_directly_under_logs(tmp_path):
  """Live chains park pid files at logs/wd_*.log.{pid,wdpid} (not under
  logs/runs/) — the reaper must cover that layout too."""
  logs = tmp_path / 'logs'
  logs.mkdir(parents=True)
  run_p, wd_p = _spawn_sleeper(), _spawn_sleeper()
  (logs / 'wd_synth3_1024.log.pid').write_text(f'{run_p.pid}\n')
  (logs / 'wd_synth3_1024.log.wdpid').write_text(f'{wd_p.pid}\n')
  try:
    bench._reap_inflight_runs(base_dir=str(tmp_path), grace_sec=2)
    for p in (run_p, wd_p):
      p.wait(timeout=10)
    assert not any(_alive(p.pid) for p in (run_p, wd_p))
  finally:
    for p in (run_p, wd_p):
      if p.poll() is None:
        p.kill()
      p.wait()


@pytest.mark.skipif(sys.platform != 'linux', reason='posix signals')
def test_reaper_kills_chain_subdir_and_queue_pids(tmp_path):
  """The pipeline chains park pid files one level down
  (logs/<chain-id>/chain.log.{pid,wdpid}) and the job-queue scripts
  record theirs at logs/queue_*.pid — the reaper must cover both, or a
  queue outliving its session relaunches TPU work mid-benchmark."""
  chain = tmp_path / 'logs' / 'synthcs-test'
  chain.mkdir(parents=True)
  run_p, wd_p, q_p = _spawn_sleeper(), _spawn_sleeper(), _spawn_sleeper()
  (chain / 'chain.log.pid').write_text(f'{run_p.pid}\n')
  (chain / 'chain.log.wdpid').write_text(f'{wd_p.pid}\n')
  (tmp_path / 'logs' / 'queue_ablate.pid').write_text(f'{q_p.pid}\n')
  try:
    bench._reap_inflight_runs(base_dir=str(tmp_path), grace_sec=2)
    for p in (run_p, wd_p, q_p):
      p.wait(timeout=10)
    assert not any(_alive(p.pid) for p in (run_p, wd_p, q_p))
  finally:
    for p in (run_p, wd_p, q_p):
      if p.poll() is None:
        p.kill()
      p.wait()


@pytest.mark.skipif(sys.platform != 'linux', reason='posix signals')
def test_reaper_respects_keep_env(tmp_path, monkeypatch):
  runs = tmp_path / 'logs' / 'runs'
  runs.mkdir(parents=True)
  p = _spawn_sleeper()
  (runs / 'a.log.pid').write_text(f'{p.pid}\n')
  monkeypatch.setenv('BENCH_KEEP_RUNS', '1')
  try:
    bench._reap_inflight_runs(base_dir=str(tmp_path), grace_sec=1)
    time.sleep(0.2)
    assert _alive(p.pid)
  finally:
    p.kill()
    p.wait()
