#!/usr/bin/env python
"""Train-step decomposition on the real chip (VERDICT r2 weak #2).

Ablation-based profile: times the CVPPP-shape (224x224, T=21) full-model
train step and a ladder of reduced variants so each subsystem's cost is the
difference between adjacent rungs.  All timings are honest queue-drain
measurements (see docs/BENCH_NOTES.md): inputs pre-placed on device,
keys precomputed, the timed window ends with a host read-back.

Writes docs/PROFILE_TRAIN.json and prints the breakdown.

Usage (real chip):  python pipelines/profile_train.py [--batch 8 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _measure(fn, args_list, drain, iters=8):
  out = fn(*args_list[0])
  _ = np.asarray(drain(out))
  t0 = time.perf_counter()
  for i in range(iters):
    out = fn(*args_list[i % len(args_list)])
  _ = np.asarray(drain(out))
  return (time.perf_counter() - t0) / iters


def _batch(rng, cfg, batch):
  import jax.numpy as jnp
  h, w, t = cfg.inp_height, cfg.inp_width, cfg.timespan
  x = rng.rand(batch, h, w, 3).astype(np.float32)
  y = np.zeros((batch, t, h, w), np.float32)
  s = np.zeros((batch, t), np.float32)
  for b in range(batch):
    for k in range(5):
      cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4,
                                                            3 * w // 4)
      r = max(4, h // 12)
      y[b, k, cy - r:cy + r, cx - r:cx + r] = 1.0
      s[b, k] = 1.0
  return {'x': jnp.asarray(x), 'y_gt': jnp.asarray(y), 's_gt': jnp.asarray(s)}


def time_variant(name, cfg, b, keys, results, mode='step', iters=6):
  """mode: 'step' (grads+adam), 'loss' (value only), 'fwd' (train fwd),
  'eval' (eval fwd)."""
  import jax
  import jax.numpy as jnp
  from rec_attend_tpu.models import full_model
  from rec_attend_tpu.parallel import train_step as ts_lib

  params = jax.device_put(full_model.init_full_model(jax.random.PRNGKey(0),
                                                     cfg))
  st = jnp.asarray(100.0)

  if mode == 'step':
    step_fn, tx = ts_lib.make_train_step(full_model.full_model_loss, cfg,
                                         donate=False)
    opt_state = tx.init(params)
    fn = lambda k: step_fn(params, opt_state, b, k, st)
    drain = lambda o: o[2]['loss']
  elif mode == 'loss':
    @jax.jit
    def fn(k):
      loss, _ = full_model.full_model_loss(params, b, cfg, True, k, st)
      return loss
    drain = lambda o: o
  elif mode in ('fwd', 'eval'):
    train = mode == 'fwd'
    @jax.jit
    def fn(k):
      outputs, _ = full_model.full_model_forward(params, b, cfg, train, k,
                                                 st)
      return outputs['s_out']
    drain = lambda o: o[0, 0]
  else:
    raise ValueError(mode)

  try:
    dt = _measure(fn, [(k,) for k in keys], drain, iters=iters)
  except Exception as e:  # noqa: BLE001 — record (e.g. OOM without remat)
    results[name] = {'error': repr(e)[:300]}
    print(f'{name}: ERROR {repr(e)[:120]}')
    return None
  results[name] = round(dt * 1000, 2)
  print(f'{name}: {dt * 1000:.1f} ms')
  return dt


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--batch', nargs='+', type=int, default=[8, 32])
  parser.add_argument('--trace', action='store_true',
                      help='also capture a jax.profiler trace of the base '
                           'step into logs/profile_trace')
  args = parser.parse_args()

  import jax
  from rec_attend_tpu import config
  from rec_attend_tpu.ops import matching

  results = {'backend': jax.devices()[0].platform,
             'device': str(jax.devices()[0])}
  base = config.cvppp_full_config()          # use_knob=True, remat=True, f32

  identity_match = lambda iou, s_gt, matcher='jax': (
      matching.get_identity_match(iou.shape[-1], s_gt))
  real_match = matching.f_segm_match

  for bs in args.batch:
    rng = np.random.RandomState(0)
    b = _batch(rng, base, bs)
    keys = [jax.device_put(k) for k in
            jax.random.split(jax.random.PRNGKey(1), 8)]
    jax.block_until_ready(keys)
    p = f'b{bs}'

    time_variant(f'{p}/eval_fwd', base, b, keys, results, mode='eval')
    time_variant(f'{p}/train_fwd', base, b, keys, results, mode='fwd')
    time_variant(f'{p}/train_loss', base, b, keys, results, mode='loss')
    # Matching ablation: identity instead of the in-graph Hungarian.
    matching.f_segm_match = identity_match
    try:
      time_variant(f'{p}/train_loss_nomatch', base, b, keys, results,
                   mode='loss')
      time_variant(f'{p}/train_step_nomatch', base, b, keys, results)
    finally:
      matching.f_segm_match = real_match
    time_variant(f'{p}/train_step', base, b, keys, results)
    time_variant(f'{p}/train_step_noknob', base.replace(use_knob=False), b,
                 keys, results)
    time_variant(f'{p}/train_step_noremat', base.replace(remat=False), b,
                 keys, results)
    time_variant(f'{p}/train_step_nobn', base.replace(use_bn=False), b,
                 keys, results)
    time_variant(f'{p}/train_step_bf16', base.replace(dtype='bfloat16'), b,
                 keys, results)

  if args.trace:
    from rec_attend_tpu.utils import profiling
    from rec_attend_tpu.models import full_model
    from rec_attend_tpu.parallel import train_step as ts_lib
    import jax.numpy as jnp
    b = _batch(np.random.RandomState(0), base, args.batch[0])
    params = jax.device_put(full_model.init_full_model(
        jax.random.PRNGKey(0), base))
    step_fn, tx = ts_lib.make_train_step(full_model.full_model_loss, base,
                                         donate=False)
    opt_state = tx.init(params)
    k = jax.random.PRNGKey(2)
    out = step_fn(params, opt_state, b, k, jnp.asarray(100.0))
    _ = np.asarray(out[2]['loss'])
    with profiling.trace('logs/profile_trace'):
      out = step_fn(params, opt_state, b, k, jnp.asarray(100.0))
      _ = np.asarray(out[2]['loss'])
    results['trace'] = 'logs/profile_trace'

  out_path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'docs', 'PROFILE_TRAIN.json')
  with open(out_path, 'w') as f:
    json.dump(results, f, indent=2)
  print(json.dumps(results, indent=2))


if __name__ == '__main__':
  main()
