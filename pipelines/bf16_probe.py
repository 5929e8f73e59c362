#!/usr/bin/env python
"""Localize the bf16-vs-f32 speed anomaly on the real TPU (VERDICT r1 #4).

Times the full-model ctrl-CNN stack and each individual conv+BN block in
both dtypes at the CVPPP shape, prints a table, and appends the findings to
docs/BENCH_FULL.json under 'bf16_probe/*'. Designed to be cheap (a handful
of small jits) so it fits a short TPU window after training/bench runs.

Run on the real chip (default env):  python pipelines/bf16_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _measure(fn, *args, iters=20):
  import jax
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
  import argparse
  import jax
  import jax.numpy as jnp
  from rec_attend_tpu import config as C
  from rec_attend_tpu.nn import layers

  ap = argparse.ArgumentParser()
  # Each (layer, dtype) pair is one XLA compile (~30-60 s via the tunnel);
  # default probes alternating layers to keep the sweep ~5 min.
  ap.add_argument('--layers', default='0,2,4,6')
  probe_layers = {int(v) for v in ap.parse_args().layers.split(',') if v}

  cfg = C.cvppp_full_config()
  b, h, w = 8, cfg.inp_height, cfg.inp_width
  depths = cfg.ctrl_cnn_depth
  pools = cfg.ctrl_cnn_pool
  fsizes = cfg.ctrl_cnn_filter_size
  # ctrl CNN input channels: image(3) + canvas(1) per resolved flags.
  cin = 4

  key = jax.random.PRNGKey(0)
  params = layers.init_cnn(key, fsizes, (cin,) + tuple(depths),
                           use_bn=(True,) * len(depths))
  rng = np.random.RandomState(0)
  x32 = jnp.asarray(rng.rand(b, h, w, cin).astype(np.float32))

  results = {}

  def stack_fn(dtype):
    @jax.jit
    def f(p, x):
      hs, _ = layers.apply_cnn(p, x.astype(dtype), pools,
                               (jax.nn.relu,) * len(depths), train=False)
      return hs[-1].astype(jnp.float32).sum()
    return f

  for name, dt in (('f32', jnp.float32), ('bf16', jnp.bfloat16)):
    ms = _measure(stack_fn(dt), params, x32)
    results[f'bf16_probe/ctrl_cnn_stack_{name}_ms'] = round(ms, 3)
    print(f'ctrl CNN stack {name}: {ms:.3f} ms')

  # Per-layer conv+BN blocks at their in-model resolutions.
  res = h
  chan = cin
  for i, (d, p, fs) in enumerate(zip(depths, pools, fsizes)):
    if i not in probe_layers:
      chan = d
      if p > 1:
        res //= p
      continue
    xl = jnp.asarray(rng.rand(b, res, res if w == h else res * w // h,
                              chan).astype(np.float32))
    wkey = jax.random.PRNGKey(i)
    wconv = 0.01 * jax.random.normal(wkey, (fs, fs, chan, d))

    def layer_fn(dtype, wconv=wconv):
      @jax.jit
      def f(x, wv):
        y = layers.conv2d(x.astype(dtype), wv.astype(dtype))
        return y.astype(jnp.float32).sum()
      return f

    for name, dt in (('f32', jnp.float32), ('bf16', jnp.bfloat16)):
      ms = _measure(layer_fn(dt), xl, wconv)
      results[f'bf16_probe/conv{i}_{chan}to{d}_r{res}_{name}_ms'] = round(
          ms, 3)
      print(f'conv{i} {chan}->{d} @{res}: {name} {ms:.3f} ms')
    chan = d
    if p > 1:
      res //= p

  out_path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'docs', 'BENCH_FULL.json')
  merged = {}
  if os.path.exists(out_path):
    with open(out_path) as f:
      merged = json.load(f)
  merged.update(results)
  with open(out_path, 'w') as f:
    json.dump(merged, f, indent=2)
  print(f'appended {len(results)} rows to {out_path}')


if __name__ == '__main__':
  main()
