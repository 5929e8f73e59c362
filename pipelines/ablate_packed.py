#!/usr/bin/env python
"""Packed-channel ablation (VERDICT r3 next-step #2): does feeding the fg
model's packed ``d_in``/``y_in`` channels into the box stage actually help
at the Cityscapes-preset shape?

Trains a no-packed-channels twin of an existing synthcs box run (same
data, steps, batch size; only ``add_d_out``/``add_y_out`` off) and prints
a with/without comparison of the box loss and valid-channel curve tails.

Usage: python pipelines/ablate_packed.py \
    --baseline_id box_model_synthcs-XXXX [--steps 6000] [--batch_size 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rec_attend_tpu import config as C
from rec_attend_tpu.engine.experiment import TrainingExperiment
from pipelines.write_results import read_loss_curve


def tail_mean(rows, n=5):
  vals = [v for _, v in rows[-n:]]
  return round(sum(vals) / len(vals), 4) if vals else None


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('--baseline_id', required=True)
  p.add_argument('--results', default='results')
  p.add_argument('--logs', default='logs')
  p.add_argument('--steps', default=6000, type=int)
  p.add_argument('--batch_size', default=4, type=int)
  p.add_argument('--dataset_folder', default=None)
  p.add_argument('--resume', action='store_true',
                 help='continue the twin from its latest checkpoint '
                      '(a watchdog relaunch or a killed queue must not '
                      'restart the 12k-step run from scratch)')
  args = p.parse_args(argv)

  import yaml
  base_folder = os.path.join(args.results, args.baseline_id)
  with open(os.path.join(base_folder, 'data_opt.yaml')) as f:
    data_cfg = C.DataConfig.from_dict(yaml.safe_load(f))
  if args.dataset_folder:
    data_cfg = data_cfg.replace(folder=args.dataset_folder)
  with open(os.path.join(base_folder, 'model_opt.yaml')) as f:
    box_cfg = C.BoxModelConfig.from_dict(yaml.safe_load(f))
  assert box_cfg.add_d_out and box_cfg.add_y_out, \
      'baseline must be a packed-channel run'
  ablate_cfg = box_cfg.replace(add_d_out=False, add_y_out=False)

  ablate_id = args.baseline_id.replace('box_model_', 'box_model_nofg_')
  assert ablate_id != args.baseline_id, (
      f'--baseline_id {args.baseline_id!r} must start with "box_model_" — '
      'otherwise the ablation twin would train INTO the baseline folder, '
      'clobbering the checkpoint being compared against')
  import glob
  twin_folder = os.path.join(args.results, ablate_id)
  restore = (twin_folder if args.resume
             and glob.glob(os.path.join(twin_folder, 'ckpt-*.npz'))
             else None)
  train_cfg = C.TrainConfig(model_id=ablate_id, num_steps=args.steps,
                            batch_size=args.batch_size, save_ckpt=True,
                            results=args.results, logs=args.logs,
                            restore=restore,
                            steps_per_valid=250, steps_per_trainval=250,
                            steps_per_plot=0, num_batch_valid=4,
                            prefetch=True, num_worker=2, device_data=True)
  TrainingExperiment('box', ablate_cfg, train_cfg, data_cfg).run()

  table = {}
  for label, mid in (('with_packed', args.baseline_id),
                     ('no_packed', ablate_id)):
    loss = read_loss_curve(os.path.join(args.logs, mid, 'loss.csv'))
    iou = read_loss_curve(os.path.join(args.logs, mid, 'iou_soft_box.csv'),
                          field=2)
    iou_v = read_loss_curve(
        os.path.join(args.logs, mid, 'iou_soft_box.csv'), field=3)
    table[label] = {
        'final_loss_tail5': tail_mean(loss),
        'train_iou_soft_box_tail5': tail_mean(iou),
        'valid_iou_soft_box_tail5': tail_mean(iou_v),
        'steps': loss[-1][0] if loss else None,
    }
  os.makedirs(os.path.join(args.results, ablate_id), exist_ok=True)
  out = os.path.join(args.results, ablate_id, 'ablation.json')
  with open(out, 'w') as f:
    json.dump(table, f, indent=2)
  print(json.dumps(table, indent=2))
  return table


if __name__ == '__main__':
  main()
