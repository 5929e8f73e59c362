#!/usr/bin/env python
"""Post-hoc fg-model metrics over a split: foreground IoU (soft/hard) and
masked orientation accuracy, averaged batch-size-weighted.  Prints one JSON
line and appends a CSV row next to the checkpoint.

Usage: python pipelines/eval_fg_metrics.py --model_id fg_model_... \
         [--results results] [--split valid] [--batch_size 8]
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
  p.add_argument('--data_examples', default=None, type=int)
  args = p.parse_args(argv)

  import yaml
  from rec_attend_tpu import config as C
  from rec_attend_tpu.cli import args as A
  from rec_attend_tpu.engine.experiment import EvalExperiment

  restore = os.path.join(args.results, args.model_id)
  with open(os.path.join(restore, 'model_opt.yaml')) as f:
    model_cfg = C.FGModelConfig.from_dict(yaml.safe_load(f))
  train_cfg = C.TrainConfig(restore=restore, batch_size=args.batch_size,
                            results=args.results)
  data_cfg = A.make_data_config(args, restore=restore)

  exp = EvalExperiment('fg', model_cfg, train_cfg, data_cfg,
                       splits=[args.split])
  sums, count = {}, 0
  for ds, raw, outputs in exp.iterate_split(args.split):
    y_out = np.asarray(outputs['y_out'])              # [B, H, W, C]
    y_gt = raw['c_gt']                                # [B, H, W, C]
    n = y_out.shape[0]
    # Multiclass c_gt carries a background channel 0 (1 wherever no
    # foreground class is present) — exclude it from IoU and from the
    # orientation mask, matching the model's own metrics
    # (fg_model_loss: y_gt[..., 1:]).  Including it made the orientation
    # accuracy an all-pixel average (round-3 synthcs "0.236" artefact; the
    # true masked valid accuracy logged in training was 0.81).
    if y_gt.shape[-1] > 1:
      y_out_fg, y_gt_fg = y_out[..., 1:], y_gt[..., 1:]
    else:
      y_out_fg, y_gt_fg = y_out, y_gt
    inter = np.minimum(y_out_fg, y_gt_fg).sum()
    union = np.maximum(y_out_fg, y_gt_fg).sum() + 1e-5
    hard = (y_out_fg > 0.5).astype('float32')
    inter_h = np.minimum(hard, y_gt_fg).sum()
    union_h = np.maximum(hard, y_gt_fg).sum() + 1e-5
    row = {'iou_soft': inter / union, 'iou_hard': inter_h / union_h}
    if 'd_out' in outputs:
      d_out = np.asarray(outputs['d_out'])
      d_gt = raw['d_gt']
      mask = y_gt_fg.max(axis=-1)
      correct = (d_out.argmax(-1) == d_gt.argmax(-1)).astype('float32')
      row['orientation_acc'] = ((correct * mask).sum() /
                                max(mask.sum(), 1.0))
    for k, v in row.items():
      sums[k] = sums.get(k, 0.0) + float(v) * n
    count += n
  avg = {k: round(v / count, 4) for k, v in sums.items()}
  avg.update(model_id=args.model_id, split=args.split, n=count,
             step=exp.step)
  print(json.dumps(avg))
  with open(os.path.join(restore, f'fg_metrics_{args.split}.json'),
            'w') as f:
    json.dump(avg, f, indent=2)


if __name__ == '__main__':
  main()
