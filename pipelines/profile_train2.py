#!/usr/bin/env python
"""Round 2 of the train-step optimization experiments (after the merged
Hungarian solve): scan unroll, remat policy, donation, batch scaling.
Appends results into docs/PROFILE_TRAIN.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from pipelines.profile_train import _batch, _measure  # noqa: E402


def time_step(name, cfg, b, keys, results, donate=False, iters=6):
  import jax
  import jax.numpy as jnp
  from rec_attend_tpu.models import full_model
  from rec_attend_tpu.parallel import train_step as ts_lib

  params = jax.device_put(full_model.init_full_model(jax.random.PRNGKey(0),
                                                     cfg))
  st = jnp.asarray(100.0)
  step_fn, tx = ts_lib.make_train_step(full_model.full_model_loss, cfg,
                                       donate=donate)
  opt_state = tx.init(params)

  try:
    if donate:
      # donation consumes params/opt_state; thread them through the loop.
      p, o = params, opt_state
      out = step_fn(p, o, b, keys[0], st)
      p, o = out[0], out[1]
      _ = np.asarray(out[2]['loss'])
      t0 = time.perf_counter()
      for i in range(iters):
        p, o, m = step_fn(p, o, b, keys[i % len(keys)], st)
      _ = np.asarray(m['loss'])
      dt = (time.perf_counter() - t0) / iters
    else:
      fn = lambda k: step_fn(params, opt_state, b, k, st)
      dt = _measure(fn, [(k,) for k in keys], lambda o: o[2]['loss'],
                    iters=iters)
  except Exception as e:  # noqa: BLE001
    results[name] = {'error': repr(e)[:300]}
    print(f'{name}: ERROR {repr(e)[:160]}')
    return
  results[name] = round(dt * 1000, 2)
  print(f'{name}: {dt * 1000:.1f} ms')


def main():
  import jax
  from rec_attend_tpu import config

  out_path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'docs', 'PROFILE_TRAIN.json')
  results = {}
  if os.path.exists(out_path):
    with open(out_path) as f:
      results = json.load(f)

  base = config.cvppp_full_config()
  keys = [jax.device_put(k) for k in
          jax.random.split(jax.random.PRNGKey(1), 8)]
  jax.block_until_ready(keys)

  for bs in (8, 32):
    b = _batch(np.random.RandomState(0), base, bs)
    p = f'b{bs}'
    time_step(f'{p}/step_merged_match', base, b, keys, results)
    time_step(f'{p}/step_merged_donate', base, b, keys, results,
              donate=True)
    time_step(f'{p}/step_unroll3', base.replace(scan_unroll=3), b, keys,
              results)
    time_step(f'{p}/step_remat_dots', base.replace(remat_policy='dots'), b,
              keys, results)
    time_step(f'{p}/step_bf16_merged', base.replace(dtype='bfloat16'), b,
              keys, results)
    time_step(f'{p}/step_bf16_unroll3',
              base.replace(dtype='bfloat16', scan_unroll=3), b, keys,
              results)

  for bs in (64, 128):
    b = _batch(np.random.RandomState(0), base, bs)
    time_step(f'b{bs}/step_merged_match', base, b, keys, results, iters=4)
    time_step(f'b{bs}/step_bf16_merged', base.replace(dtype='bfloat16'), b,
              keys, results, iters=4)

  with open(out_path, 'w') as f:
    json.dump(results, f, indent=2)
  print(json.dumps({k: v for k, v in results.items()
                    if 'step_' in k or 'merged' in k}, indent=2))


if __name__ == '__main__':
  main()
