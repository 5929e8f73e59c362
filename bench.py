#!/usr/bin/env python
"""Benchmark: batched recurrent eval throughput of the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: decoded instance slots per second (batch x timespan / wall step) on
the CVPPP-shaped full model (224x224, T=21) in eval mode on one chip.

Measurement notes (docs/BENCH_NOTES.md has the full calibration):
- Timing DRAINS the dispatch queue with a host read-back after the timed
  window.  ``block_until_ready`` alone under-reports through the tunnelled
  TPU backend (it measures dispatch rate, not execution; round-1's 253k
  slots/s was that artifact).
- Batch 128 amortises the tunnel's ~30 ms fixed per-dispatch latency; the
  measured number is compute-bound (asymptote ~57-64k slots/s; batch-8
  device compute is ~2.4 ms but a batch-8 *call* pays the full latency).
- Keys are precomputed: an in-loop ``fold_in`` is its own dispatch.

Baseline: the reference publishes no numbers (BASELINE.md); the comparison
constant is an estimate of its TF-0.12 single-GPU eval throughput
(~2 images/s at 224x224 T=21 => ~42 instance slots/s), derived from the
step_time channel it logs (runner.py:54-57).  The driver-stated target is
>=50x this on one v5e chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_INSTANCES_PER_SEC = 42.0   # estimated reference throughput (see above)


def _reap_inflight_runs(base_dir=None, grace_sec=20):
  """Kill any long TPU training runs left behind by a dead session.

  The TPU claim is single-tenant (CLAUDE.md): a watchdog-wrapped pipeline
  that outlived its session would contend with this benchmark and corrupt
  the round's recorded number.  Runs record their pids in
  logs/runs/*.log.pid (the run), *.log.wdpid (its watchdog) and
  logs/runs/queue.pid (the run queue) — kill queue first so nothing
  relaunches, then watchdogs, then runs, strictly BY PID (never by
  pattern).  Set BENCH_KEEP_RUNS=1 to skip (manual mid-round benching).
  """
  import glob
  import os
  import re
  import signal
  import sys
  if os.environ.get('BENCH_KEEP_RUNS'):
    return
  here = base_dir or os.path.dirname(os.path.abspath(__file__))
  # Watchdogs before runs, so nothing relaunches what we just killed.
  # Long runs park their pid files either directly under logs/
  # (watchdog.sh LOG=logs/wd_*.log) or under logs/runs/.
  pid_files = (glob.glob(os.path.join(here, 'logs/runs/queue.pid'))
               + glob.glob(os.path.join(here, 'logs/queue_*.pid'))
               + glob.glob(os.path.join(here, 'logs/runs/*.wdpid'))
               + glob.glob(os.path.join(here, 'logs/*.wdpid'))
               + glob.glob(os.path.join(here, 'logs/*/*.wdpid'))
               + glob.glob(os.path.join(here, 'logs/runs/*.pid'))
               + glob.glob(os.path.join(here, 'logs/*.pid'))
               + glob.glob(os.path.join(here, 'logs/*/*.pid')))
  victims = []
  for pf in pid_files:
    try:
      m = re.search(r'\d+', open(pf).read())
    except OSError:
      continue
    if not m:
      continue
    pid = int(m.group())
    try:
      os.kill(pid, 0)
    except (ProcessLookupError, PermissionError):
      continue
    if pid == os.getpid():
      continue
    print(f'[bench] reaping leftover run pid {pid} ({pf})', file=sys.stderr)
    try:
      os.kill(pid, signal.SIGTERM)
    except ProcessLookupError:
      continue
    victims.append(pid)
    # Round-handoff contract: killing a live chain must leave an executable
    # resume recipe.  watchdog.sh records its exact relaunch line in
    # <LOG>.cmd next to the .wdpid / .pid we just matched.
    cmd_file = re.sub(r'\.(wd)?pid$', '.cmd', pf)
    if cmd_file != pf and os.path.exists(cmd_file):
      try:
        recipe = open(cmd_file).read().strip()
        with open(os.path.join(here, 'RESUME.md'), 'a') as rf:
          rf.write(f'\n## bench reaper kill ({time.strftime("%Y-%m-%dT%H:%M:%S")})\n'
                   f'Killed pid {pid} ({os.path.relpath(pf, here)}) to free the '
                   f'TPU for the round benchmark.  Resume:\n'
                   f'```\n{recipe}\n```\n')
      except OSError:
        pass
  if victims:
    time.sleep(grace_sec)   # graceful exit + TPU claim release
    for pid in victims:
      try:
        os.kill(pid, signal.SIGKILL)
      except (ProcessLookupError, PermissionError):
        pass
    time.sleep(max(1, grace_sec // 2))


def _retry_backend_init(attempts=4, delay=20):
  """The tunnelled TPU backend registration is occasionally transient
  (claim contention); re-exec until a device is visible."""
  import os
  import sys
  try:
    import jax
    jax.devices()
    return
  except Exception:
    tries = int(os.environ.get('BENCH_BACKEND_RETRY', '0'))
    if tries >= attempts:
      raise
    time.sleep(delay)
    os.environ['BENCH_BACKEND_RETRY'] = str(tries + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
  _reap_inflight_runs()
  _retry_backend_init()
  import jax
  import jax.numpy as jnp
  from rec_attend_tpu import config
  from rec_attend_tpu.models import full_model

  # bf16 inference: 1.1x faster than f32 at this batch (BENCH_FULL.json);
  # f32 remains the training/parity default, bf16 is the serving dtype.
  cfg = config.cvppp_full_config().replace(use_knob=False, use_pallas=False,
                                           dtype='bfloat16')
  batch = 128
  params = jax.device_put(
      full_model.init_full_model(jax.random.PRNGKey(0), cfg))

  rng = np.random.RandomState(0)
  h, w, t = cfg.inp_height, cfg.inp_width, cfg.timespan
  x = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
  y = jnp.zeros((batch, t, h, w), jnp.float32)
  s = jnp.zeros((batch, t), jnp.float32)
  keys = [jax.device_put(k)
          for k in jax.random.split(jax.random.PRNGKey(0), 16)]
  jax.block_until_ready(keys)

  @jax.jit
  def fwd(x, key):
    outputs, _ = full_model.full_model_forward(
        params, {'x': x, 'y_gt': y, 's_gt': s}, cfg, train=False, key=key)
    return outputs['y_out'], outputs['s_out']

  # Warmup/compile + queue drain.
  out = fwd(x, keys[0])
  _ = np.asarray(out[1][0])

  iters = 8
  t0 = time.perf_counter()
  for i in range(iters):
    out = fwd(x, keys[i % len(keys)])
  _ = np.asarray(out[1][0])   # drain: forces all queued executions
  dt = time.perf_counter() - t0

  instances_per_sec = batch * t * iters / dt

  # Absolute, falsifiable companions (VERDICT r2 weak #3): the headline
  # ratio rests on an estimated denominator, so also report measured
  # device ms/image and effective TFLOP/s against the ~197 bf16 TFLOP/s
  # v5e peak.  FLOPs come from XLA's own cost analysis of the compiled
  # executable (fallback: the ~7.5 GFLOP/image hand count in
  # docs/BENCH_NOTES.md).
  flops_per_call = None
  try:
    ca = fwd.lower(x, keys[0]).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
      ca = ca[0]
    flops_per_call = float(ca['flops'])
  except Exception:
    flops_per_call = 7.5e9 * batch
  ms_per_image = dt / iters / batch * 1000
  eff_tflops = flops_per_call * iters / dt / 1e12

  # Train-direction companion (VERDICT r3 weak #6/#8): regression-track the
  # training step too.  f32 (the parity/training default), batch 32 —
  # large enough to amortise dispatch latency without a long compile.
  train_ips, train_err = None, None
  try:
    from rec_attend_tpu.parallel import train_step as ts_lib
    tcfg = config.cvppp_full_config().replace(use_knob=True)
    tb = 32
    tparams = jax.device_put(
        full_model.init_full_model(jax.random.PRNGKey(1), tcfg))
    step_fn, tx = ts_lib.make_train_step(full_model.full_model_loss, tcfg,
                                         donate=False)
    opt_state = tx.init(tparams)
    ty = jnp.asarray((rng.rand(tb, t, h, w) > 0.9).astype(np.float32))
    tbatch = {'x': jnp.asarray(rng.rand(tb, h, w, 3).astype(np.float32)),
              'y_gt': ty, 's_gt': jnp.ones((tb, t), jnp.float32)}
    st = jnp.asarray(0.0)
    out_t = step_fn(tparams, opt_state, tbatch, keys[0], st)
    _ = np.asarray(out_t[2]['loss'])
    t1 = time.perf_counter()
    for i in range(4):
      out_t = step_fn(tparams, opt_state, tbatch, keys[i % len(keys)], st)
    _ = np.asarray(out_t[2]['loss'])
    train_ips = tb * 4 / (time.perf_counter() - t1)
  except Exception as e:   # record the cause — a silent null defeats the
    train_err = repr(e)    # regression-tracking purpose of this metric

  print(json.dumps({
      'metric': 'full_model_eval_instances_per_sec',
      'value': round(instances_per_sec, 2),
      'unit': 'instances/s',
      'vs_baseline': round(instances_per_sec / REF_INSTANCES_PER_SEC, 2),
      'context': {
          'device_ms_per_image': round(ms_per_image, 4),
          'effective_tflops': round(eff_tflops, 2),
          'v5e_bf16_peak_tflops': 197.0,
          'mfu_pct': round(100 * eff_tflops / 197.0, 1),
          'batch': batch,
          'dtype': cfg.dtype,
          'train_images_per_sec_b32_f32': (round(train_ips, 2)
                                           if train_ips else None),
          'train_error': train_err,
      },
  }))


if __name__ == '__main__':
  main()
