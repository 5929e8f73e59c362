#!/usr/bin/env python
"""Side-by-side comparison table for eval'd runs (bf16 validation +
counting-lever experiments, VERDICT r4 #2/#4).

Reads, for each model id: the train-calibrated headline
(count_calibration.json, pipelines/calibrate_count.py), the best-of-sweep
diagnostics row (output_valid analyzer CSVs), and the loss-curve tail.
Writes a markdown table to stdout and optionally into a notes.md (the
per-run commentary file write_results.py renders into RESULTS.md).

Usage:
  python pipelines/compare_runs.py \
      --ids full_model_synth1024-20260816,full_model_synth1024bf16-r5 \
      --labels f32,bf16 [--notes results/<id>/notes.md --title "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from pipelines.write_results import (read_analyzer_csvs, split_sweep,
                                     best_threshold, read_loss_curve)

METRICS = ('sbd', 'count_acc', 'dic_abs', 'count_mse', 'wt_cov',
           'unwt_cov')


def collect(results, logs, model_id):
  folder = os.path.join(results, model_id)
  row = {'id': model_id}
  metrics, sweep = split_sweep(read_analyzer_csvs(
      os.path.join(folder, 'output_valid')))
  if sweep:
    bt = best_threshold(sweep)
    row['sweep_best_thr'] = bt
    row['sweep'] = {k: sweep[bt][k][0] for k in METRICS if k in sweep[bt]}
  elif metrics:
    row['sweep'] = {k: metrics[k][0] for k in METRICS if k in metrics}
  cal = os.path.join(folder, 'count_calibration.json')
  if os.path.exists(cal):
    with open(cal) as f:
      c = json.load(f)
    head = c.get('headline')
    if head:
      row['headline_thr'] = (head['mask_threshold'],
                             head['score_threshold'])
      row['headline'] = {k: head['metrics'][k][0]
                         for k in METRICS if k in head['metrics']}
  loss = read_loss_curve(os.path.join(logs, model_id, 'loss.csv'))
  if loss:
    row['final_loss'] = loss[-1][1]
    row['final_step'] = loss[-1][0]
  return row


def render(rows, labels, title):
  lines = [f'### {title}', '']
  hdr = ['metric'] + list(labels)
  lines.append('| ' + ' | '.join(hdr) + ' |')
  lines.append('|' + '---|' * len(hdr))

  def fmt(row, key, metric):
    d = row.get(key)
    if not d or metric not in d:
      return '—'
    return f'{d[metric]:.4f}'

  # Headline (train-calibrated) rows only exist for runs that went through
  # calibrate_count.py; lever finetunes skip it, so drop rows that would
  # render as all-dashes.
  for metric in METRICS:
    if any(r.get('headline') and metric in r['headline'] for r in rows):
      lines.append(f'| {metric} (headline) | '
                   + ' | '.join(fmt(r, 'headline', metric) for r in rows)
                   + ' |')
  for metric in ('sbd', 'count_acc', 'dic_abs'):
    lines.append(f'| {metric} (best-of-sweep) | '
                 + ' | '.join(fmt(r, 'sweep', metric) for r in rows)
                 + ' |')
  tail = []
  for r in rows:
    t = []
    if 'final_loss' in r:
      t.append(f'loss {r["final_loss"]:.3f}@{r["final_step"]}')
    if 'headline_thr' in r:
      t.append(f'thr {r["headline_thr"][0]:.2f}/{r["headline_thr"][1]:.2f}')
    tail.append('; '.join(t) or '—')
  lines.append('| provenance | ' + ' | '.join(tail) + ' |')
  lines.append('')
  return '\n'.join(lines)


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('--ids', required=True)
  p.add_argument('--labels', default=None)
  p.add_argument('--results', default='results')
  p.add_argument('--logs', default='logs')
  p.add_argument('--title', default='Run comparison')
  p.add_argument('--notes', default=None,
                 help='append the table to this notes.md')
  args = p.parse_args(argv)
  ids = args.ids.split(',')
  labels = args.labels.split(',') if args.labels else ids
  rows = [collect(args.results, args.logs, i) for i in ids]
  text = render(rows, labels, args.title)
  print(text)
  if args.notes:
    os.makedirs(os.path.dirname(args.notes), exist_ok=True)
    with open(args.notes, 'a') as f:
      f.write('\n' + text)
  return rows


if __name__ == '__main__':
  main()
