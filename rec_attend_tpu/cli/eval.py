"""Eval CLIs: instance eval with the postprocess+analyzer pipeline and FG
eval at original sizes.

Capability twins of ``full_model_eval.py`` and ``fg_model_eval.py``: the
postprocess chain confidence -> upsample -> [morph] -> one-label ->
threshold sweep -> [fg-mask, remove-tiny] -> analyzers
(full_model_eval.py:97-145), with knob forced off for eval
(full_model_eval.py:172-174 — our eval forward pass never mixes GT).
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from rec_attend_tpu import analysis
from rec_attend_tpu.cli import args as A
from rec_attend_tpu.engine.experiment import EvalExperiment
from rec_attend_tpu.utils import logger
from rec_attend_tpu.utils import postprocess as pp

DEFAULT_ANALYZERS = ['sbd', 'wt_cov', 'unwt_cov', 'avg_fp', 'avg_fn',
                     'avg_pr', 'avg_re', 'obj_pr', 'obj_re', 'count_acc',
                     'count_mse', 'dic', 'dic_abs']


def eval_split(exp, split, output_folder, threshold_list, analyzer_names,
               foreground_folder=None, no_morph=False, remove_tiny=0,
               render_output=True, render_gt=False, batch_size=None,
               score_threshold=None, max_batches=None):
  """Run the instance eval pipeline over one split; returns
  {threshold: {analyzer: (mean, std)}}."""
  log = logger.get()
  os.makedirs(output_folder, exist_ok=True)

  # Clear stale per-threshold CSVs from previous sweeps: write_results
  # consumes every {name}_NN.csv present, so a re-run with a different
  # threshold list must not leave older thresholds' files behind.
  import glob as _glob
  for name in analyzer_names:
    for stale in ([os.path.join(output_folder, f'{name}.csv')]
                  + _glob.glob(os.path.join(output_folder, f'{name}_*.csv'))):
      if os.path.exists(stale):
        os.remove(stale)

  analyzer_sets = []
  for tt in threshold_list:
    _analyzers = []
    suffix = f' {tt:.2f}'
    thresh_folder = f'{int(tt * 100):02d}'
    # Single threshold keeps the plain {name}.csv contract; a sweep writes
    # per-threshold files so the analyzers don't truncate each other.
    csv_stem = (f'{{}}.csv' if len(threshold_list) == 1 else
                f'{{}}_{thresh_folder}.csv')
    for name in analyzer_names:
      fname = os.path.join(output_folder, csv_stem.format(name))
      _analyzers.append(analysis.create_analyzer(
          name, display_name=name + suffix, fname=fname))
    if render_output:
      _analyzers.append(analysis.RenderInstanceAnalyzer(
          os.path.join(output_folder, thresh_folder), None))
    analyzer_sets.append(_analyzers)
  gt_render = (analysis.RenderGroundtruthInstanceAnalyzer(
      os.path.join(output_folder, 'gt'), None) if render_gt else None)

  for n_batch, (ds, raw, outputs) in enumerate(
      exp.iterate_split(split, batch_size=batch_size)):
    if max_batches is not None and n_batch >= max_batches:
      # Calibration passes (pipelines/calibrate_count.py) sweep the TRAIN
      # split only to pick thresholds — a capped prefix is plenty and the
      # full-split pass through postprocess is minutes of host work.
      break
    for aset in analyzer_sets:
      for a in aset:
        if hasattr(a, 'dataset'):
          a.dataset = ds
    if gt_render is not None:
      gt_render.dataset = ds
    y_out = outputs['y_out']
    s_out = outputs['s_out']
    if s_out.ndim == 3:
      s_out = s_out[:, :, 0]
    idx_map = raw['idx_map']
    y_gt_h = ds.get_full_size_labels(idx_map, timespan=y_out.shape[1])

    if score_threshold is not None:
      # Explicit stop gate: zero slots below the calibrated score threshold
      # so the count no longer depends on the mask threshold killing dim
      # (score-weighted) masks.  Default path keeps the reference contract.
      y_out, s_out = pp.apply_confidence(y_out, s_out,
                                         threshold=score_threshold)
      y_out = y_out * s_out[:, :, None, None]
    else:
      y_out, s_out = pp.apply_confidence(y_out, s_out)
    fg = _read_foreground(foreground_folder, ds, idx_map)
    y_out = pp.upsample(y_out, y_gt_h)
    if fg is not None and not no_morph:
      y_out = pp.morph(y_out)
    y_out = pp.apply_one_label(y_out)
    for tt, thresh in enumerate(threshold_list):
      y_out_thresh = pp.apply_threshold(y_out, thresh)
      s_out_t = s_out.copy()
      if fg is not None:
        y_out_thresh = pp.mask_foreground(y_out_thresh, fg)
        y_out_thresh, s_out_t = pp.remove_tiny(y_out_thresh, s_out_t,
                                               threshold=remove_tiny)
      iou_pairwise = [analysis.f_iou_pairwise(a, b)
                      for a, b in zip(y_out_thresh, y_gt_h)]
      results_thresh = {
          'y_out': y_out_thresh, 'y_gt': y_gt_h, 's_out': s_out_t,
          's_gt': raw['s_gt'], 'iou_pairwise': iou_pairwise,
          'indices': list(idx_map),
      }
      for a in analyzer_sets[tt]:
        a.stage(results_thresh)
      if gt_render is not None and tt == len(threshold_list) - 1:
        gt_render.stage(results_thresh)

  summary = {}
  for tt, thresh in enumerate(threshold_list):
    summary[thresh] = {}
    for a in analyzer_sets[tt]:
      r = a.finalize()
      if r is not None:
        summary[thresh][a.name] = r
  return summary


def _read_foreground(folder, dataset, idx_map):
  if folder is None:
    return None
  fg = []
  for ii in idx_map:
    fname = os.path.join(folder, dataset.get_fname(ii))
    img = cv2.imread(fname)
    if img is None:
      raise FileNotFoundError(fname)
    fg.append(img.astype('float32').max(axis=2) / 255.0)
  return fg


def full_main(argv=None):
  parser = argparse.ArgumentParser(description='Evaluate full model')
  A.add_eval_args(parser)
  A.add_data_args(parser)
  parser.add_argument('--foreground_folder', default=None)
  parser.add_argument('--threshold_list', default=None)
  parser.add_argument('--analyzers', default=None)
  parser.add_argument('--test', action='store_true')
  parser.add_argument('--no_morph', action='store_true')
  parser.add_argument('--remove_tiny', default=0, type=int)
  parser.add_argument('--score_threshold', default=None, type=float,
                      help='explicit stop-score gate (default: reference '
                           'behaviour — score-weighted masks cut by the '
                           'mask threshold)')
  parser.add_argument('--max_batches', default=None, type=int,
                      help='cap the number of eval batches (threshold '
                           'calibration on the train split)')
  parser.add_argument('--no_render', action='store_true',
                      help='skip instance PNG rendering (calibration '
                           'passes)')
  args = parser.parse_args(argv)
  log = logger.get()
  log.log_args()

  if args.threshold_list is None:
    threshold_list = [0.3]
  else:
    threshold_list = [float(t) for t in args.threshold_list.split(',')]
  if args.analyzers is None:
    analyzer_names = [] if args.test else DEFAULT_ANALYZERS
  else:
    analyzer_names = args.analyzers.split(',') if args.analyzers else []

  from rec_attend_tpu import config as C
  restore = os.path.join(args.results, args.model_id)
  model_cfg = C.FullModelConfig.from_dict(
      __import__('yaml').safe_load(
          open(os.path.join(restore, 'model_opt.yaml'))))
  model_cfg = model_cfg.replace(use_knob=False)
  train_cfg = C.TrainConfig(restore=restore, batch_size=args.batch_size,
                            results=args.results)
  data_cfg = A.make_data_config(args, restore=restore)

  exp = EvalExperiment('full', model_cfg, train_cfg, data_cfg,
                       splits=args.split.split(','))
  for split in args.split.split(','):
    out_folder = (args.output or
                  os.path.join(restore, f'output_{split}'))
    eval_split(exp, split, out_folder, threshold_list, analyzer_names,
               foreground_folder=args.foreground_folder,
               no_morph=args.no_morph, remove_tiny=args.remove_tiny,
               score_threshold=args.score_threshold,
               render_output=not args.no_render,
               max_batches=args.max_batches)
  return exp


def fg_main(argv=None):
  """FG eval: render thresholded foreground/orientation at original sizes
  (ref fg_model_eval.py:134-178)."""
  parser = argparse.ArgumentParser(description='Evaluate fg model')
  A.add_eval_args(parser)
  A.add_data_args(parser)
  parser.add_argument('--threshold_list', default='0.5')
  args = parser.parse_args(argv)

  from rec_attend_tpu import config as C
  restore = os.path.join(args.results, args.model_id)
  model_cfg = C.FGModelConfig.from_dict(
      __import__('yaml').safe_load(
          open(os.path.join(restore, 'model_opt.yaml'))))
  train_cfg = C.TrainConfig(restore=restore, batch_size=args.batch_size,
                            results=args.results)
  data_cfg = A.make_data_config(args, restore=restore)
  thresholds = [float(t) for t in args.threshold_list.split(',')]

  exp = EvalExperiment('fg', model_cfg, train_cfg, data_cfg,
                       splits=args.split.split(','))
  from rec_attend_tpu.data import orientation as orient_lib
  for split in args.split.split(','):
    out_base = args.output or os.path.join(restore, 'output')
    for ds, raw, outputs in exp.iterate_split(split):
      y_out = outputs['y_out'][..., 0] if outputs['y_out'].shape[-1] == 1 \
          else outputs['y_out'].max(axis=-1)
      d_out = outputs.get('d_out')
      idx_map = raw['idx_map']
      orig = raw.get('orig_size')
      for thresh in thresholds:
        folder = os.path.join(out_base, f'{int(thresh * 100):02d}')
        os.makedirs(folder, exist_ok=True)
        ori_folder = os.path.join(out_base, 'orientation')
        gt_folder = os.path.join(out_base, 'gt')
        os.makedirs(ori_folder, exist_ok=True)
        os.makedirs(gt_folder, exist_ok=True)
        for ii, idx in enumerate(idx_map):
          y = y_out[ii]
          if orig is not None:
            y = cv2.resize(y, (int(orig[ii][1]), int(orig[ii][0])),
                           interpolation=cv2.INTER_LINEAR)
          y_bin = ((y > thresh) * 255).astype('uint8')
          cv2.imwrite(os.path.join(folder, ds.get_fname(idx)), y_bin)
          # Orientation colour-wheel render masked by the FG prediction
          # (ref fg_model_eval.py:134-178 renders fg/ori/gt).
          if d_out is not None and thresh == thresholds[0]:
            mask = (y_out[ii] > thresh).astype('float32')
            img = orient_lib.build_orientation_img(d_out[ii], mask)
            cv2.imwrite(os.path.join(ori_folder, ds.get_fname(idx)), img)
          if thresh == thresholds[0] and 'c_gt' in raw:
            gt = (raw['c_gt'][ii].max(axis=-1) * 255).astype('uint8')
            cv2.imwrite(os.path.join(gt_folder, ds.get_fname(idx)), gt)
  return exp
