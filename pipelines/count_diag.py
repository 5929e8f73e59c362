#!/usr/bin/env python
"""Per-timestep stop-score diagnostics for the counting gap.

Round-3 counting stalled at count_acc ~0.72 (target >=0.85); RESULTS.md
attributes it to trailing-instance misses.  This script pins *where* the
score path fails: it iterates a split, collects s_out [B, T] against
s_gt, and reports

  - score margin at the count boundary: s at slot K-1 (last real object)
    vs slot K (first empty) per example, and the distribution of both;
  - the count error as a pure function of a score threshold (no masks
    involved) swept over a grid — the mask-free counting ceiling;
  - per-timestep miss rates: P(s_t <= thr | t < K) and
    P(s_t > thr | t >= K).

Writes a JSON summary + per-example CSV next to the checkpoint and prints
the JSON line.  CPU-light: only s_out crosses the device boundary.

Usage: python pipelines/count_diag.py --model_id full_model_... \
    [--split valid] [--results results] [--batch_size 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('--model_id', required=True)
  p.add_argument('--results', default='results')
  p.add_argument('--split', default='valid')
  p.add_argument('--batch_size', default=8, type=int)
  p.add_argument('--dataset', default='synth')
  p.add_argument('--dataset_folder', default=None)
  args = p.parse_args(argv)

  import yaml
  from rec_attend_tpu import config as C
  from rec_attend_tpu.cli import args as A
  from rec_attend_tpu.engine.experiment import EvalExperiment

  restore = os.path.join(args.results, args.model_id)
  with open(os.path.join(restore, 'model_opt.yaml')) as f:
    model_cfg = C.FullModelConfig.from_dict(yaml.safe_load(f))
  model_cfg = model_cfg.replace(use_knob=False)
  train_cfg = C.TrainConfig(restore=restore, batch_size=args.batch_size,
                            results=args.results)
  data_cfg = A.make_data_config(args, restore=restore)

  exp = EvalExperiment('full', model_cfg, train_cfg, data_cfg,
                       splits=[args.split])
  s_all, k_all = [], []
  for ds, raw, outputs in exp.iterate_split(args.split,
                                            output_keys=('s_out',)):
    s = np.asarray(outputs['s_out'])
    if s.ndim == 3:
      s = s[:, :, 0]
    s_all.append(s)
    k_all.append(raw['s_gt'].sum(axis=1).astype(int))
  s = np.concatenate(s_all)                      # [N, T]
  k = np.concatenate(k_all)                      # [N] true counts
  n, t = s.shape

  # Boundary margins.
  last_real = s[np.arange(n), np.clip(k - 1, 0, t - 1)]
  first_empty = np.where(k < t, s[np.arange(n), np.clip(k, 0, t - 1)],
                         np.nan)
  margin = last_real - np.where(np.isnan(first_empty), 0.0, first_empty)

  # Mask-free count accuracy over a score-threshold grid.
  grid = np.round(np.arange(0.05, 0.96, 0.05), 2)
  rows = []
  for thr in grid:
    count = (s > thr).sum(axis=1)
    rows.append({'thr': float(thr),
                 'count_acc': float((count == k).mean()),
                 'dic_abs': float(np.abs(count - k).mean()),
                 'dic': float((count - k).mean())})
  best = max(rows, key=lambda r: r['count_acc'])

  # Per-timestep miss profile at the best threshold.
  thr = best['thr']
  t_idx = np.arange(t)[None, :]
  real = t_idx < k[:, None]
  miss_real = ((s <= thr) & real).sum(axis=0) / np.maximum(
      real.sum(axis=0), 1)
  fire_empty = ((s > thr) & ~real).sum(axis=0) / np.maximum(
      (~real).sum(axis=0), 1)

  summary = {
      'model_id': args.model_id, 'split': args.split, 'n': int(n),
      'mean_margin': round(float(np.nanmean(margin)), 4),
      'p10_margin': round(float(np.nanpercentile(margin, 10)), 4),
      'frac_margin_neg': round(float((margin <= 0).mean()), 4),
      'mean_last_real_score': round(float(last_real.mean()), 4),
      'mean_first_empty_score': round(float(np.nanmean(first_empty)), 4),
      'score_only_best': best,
      'score_only_at_0.5': next(r for r in rows if r['thr'] == 0.5),
      'miss_rate_by_t_at_best': [round(float(v), 3) for v in miss_real],
      'false_fire_by_t_at_best': [round(float(v), 3) for v in fire_empty],
      'sweep': rows,
  }
  out = os.path.join(restore, f'count_diag_{args.split}.json')
  with open(out, 'w') as f:
    json.dump(summary, f, indent=2)
  with open(os.path.join(restore, f'count_diag_{args.split}.csv'),
            'w') as f:
    f.write('idx,count_gt,' + ','.join(f's{j}' for j in range(t)) + '\n')
    for i in range(n):
      f.write(f'{i},{k[i]},' + ','.join(f'{v:.4f}' for v in s[i]) + '\n')
  print(json.dumps({kk: vv for kk, vv in summary.items()
                    if kk not in ('sweep', 'miss_rate_by_t_at_best',
                                  'false_fire_by_t_at_best')}))
  return summary


if __name__ == '__main__':
  main()
