"""Model-free Cityscapes full-resolution evaluation.

Capability twin of the reference's ``cityscapes_eval.py``: reads packed
instance predictions + foreground (packed semantic model output, or an
external LRR .mat semantic segmentation) from the dataset H5 at
batch_size=1, upsamples to full resolution, applies confidence / one-label
/ threshold / fg-mask / remove-tiny(1200), runs the metric analyzers and
the Cityscapes submission renderer.  No model is built at all
(ref cityscapes_eval.py:119-120, 252-256).  Sharding over workers via
--split_id/--num_split as the reference.
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from rec_attend_tpu import analysis
from rec_attend_tpu.cli import args as A
from rec_attend_tpu.data import provider
from rec_attend_tpu.utils import logger
from rec_attend_tpu.utils import postprocess as pp

FG_THRESHOLD = 0.3
LRR_SEM_IDS = [12, 13, 14, 15, 16, 17, 18, 19]


def read_foreground_lrr(lrr_folder, split, idx):
  """External LRR semantic segmentation .mat -> [H, W, 9] one-hot
  (ref cityscapes_eval.py:212-232)."""
  import scipy.io
  folder = ('train' if split.startswith('train') else
            'val' if split.startswith('val') or split.startswith('valid')
            else 'test')
  runname = idx.split('_')[0]
  matfn = os.path.join(lrr_folder, folder, runname, f'{idx}_ss.mat')
  fgraw = scipy.io.loadmat(matfn)['semanticPrediction']
  fg = np.zeros(list(fgraw.shape) + [9], dtype='float32')
  for ii in range(8):
    fg[:, :, ii + 1] = (fgraw == LRR_SEM_IDS[ii]).astype('float32')
  fg[:, :, 0] = 1 - fg.max(axis=-1)
  return fg


def eval_one(ds, pos, threshold_list, analyzer_sets, opt, gt_render=None,
             timespan=None):
  """Process one image (batch_size=1 semantics).  timespan must cover the
  packed instance_pred slot count (the model's T, not the dataset default —
  e.g. synth defaults to 6 but cityscapes-preset models pack T=20)."""
  batch = ds.get_batch([pos], timespan=timespan, variables={
      'x_full', 'y_gt_full', 'y_out', 'd_out', 'y_out_ins', 's_out',
      's_gt', 'idx_map'})
  idx = batch['idx_map'][0]
  y_gt_h = [batch['y_gt_full']]                       # [T, H, W]
  full_size = (y_gt_h[0].shape[1], y_gt_h[0].shape[2])
  s_out = batch['s_out']                              # [1, T]
  conf = s_out.copy()
  s_gt = batch['s_gt']

  if opt.get('lrr_seg'):
    fg_h = [read_foreground_lrr(opt['lrr_folder'], opt['split'], idx)]
    fg_mask = [1 - fg_h[0][:, :, 0]]
  else:
    fg = batch['y_out'][0]                            # [H, W, C]
    fg_h = np.zeros([full_size[0], full_size[1], fg.shape[2]],
                    dtype='float32')
    for cc in range(fg.shape[2]):
      fg_h[:, :, cc] = cv2.resize(fg[:, :, cc],
                                  (full_size[1], full_size[0]))
    if fg.shape[2] == 1:
      fg_mask = [(fg_h[:, :, 0] > FG_THRESHOLD).astype('float32')]
    else:
      fg_mask = [(fg_h[:, :, 0] <= (1 - FG_THRESHOLD)).astype('float32')]
    fg_h = [fg_h]

  y_out = pp.upsample(batch['y_out_ins'], y_gt_h)
  y_out, conf_hard = pp.apply_confidence(np.stack(y_out), conf)
  y_out = pp.apply_one_label([y_out[0]])

  for tt, thresh in enumerate(threshold_list):
    y_out_thresh = pp.apply_threshold(y_out, thresh)
    y_out_thresh = pp.mask_foreground(y_out_thresh, fg_mask)
    # remove_tiny zeroes removed slots' conf in place — each threshold
    # must start from the raw scores, not the previous threshold's
    # removals (cli/eval.py does the same per-threshold copy).
    y_out_thresh, conf_t = pp.remove_tiny(y_out_thresh, conf=conf.copy(),
                                          threshold=opt['remove_tiny'])
    results_thresh = {
        'y_out': y_out_thresh, 'y_gt': y_gt_h, 's_out': conf_hard,
        'conf': conf_t, 'y_in': fg_h, 's_gt': s_gt,
        'indices': [idx],
    }
    if not opt.get('no_iou'):
      results_thresh['iou_pairwise'] = [
          analysis.f_iou_pairwise(a, b)
          for a, b in zip(y_out_thresh, y_gt_h)]
    for a in analyzer_sets[tt]:
      a.stage(results_thresh)
    if gt_render is not None and tt == len(threshold_list) - 1:
      gt_render.stage(results_thresh)


def main(argv=None):
  parser = argparse.ArgumentParser(
      description='Cityscapes full-resolution eval (model-free)')
  A.add_eval_args(parser)
  A.add_data_args(parser)
  parser.add_argument('--threshold_list', default='0.6')
  parser.add_argument('--analyzers', default='sbd,wt_cov,unwt_cov')
  parser.add_argument('--remove_tiny', default=1200, type=int)
  parser.add_argument('--lrr_seg', action='store_true')
  parser.add_argument('--lrr_folder', default=None)
  parser.add_argument('--no_iou', action='store_true')
  parser.add_argument('--render_gt', action='store_true')
  parser.add_argument('--render_cityscapes', action='store_true',
                      default=True)
  parser.add_argument('--split_id', default=0, type=int)
  parser.add_argument('--num_split', default=1, type=int)
  args = parser.parse_args(argv)
  log = logger.get()
  log.log_args()

  # The packed predictions live in the H5 the model was trained against, so
  # reuse its data_opt.yaml snapshot when a model folder is given (same
  # restore rule as eval/pack CLIs).
  restore = (os.path.join(args.results, args.model_id)
             if args.model_id else None)
  if restore is not None and not os.path.isdir(restore):
    restore = None
  data_cfg = A.make_data_config(args, restore=restore)
  threshold_list = [float(t) for t in args.threshold_list.split(',')]
  analyzer_names = args.analyzers.split(',') if args.analyzers else []

  for split in args.split.split(','):
    ds = provider.get(data_cfg.dataset, data_cfg, split=split)
    output_folder = (args.output or os.path.join(
        args.results, args.model_id or 'cityscapes_eval',
        f'output_{split}'))
    os.makedirs(output_folder, exist_ok=True)

    analyzer_sets = []
    sweep = len(threshold_list) > 1
    for thresh in threshold_list:
      _a = []
      thresh_folder = f'{int(thresh * 100):02d}'
      for name in analyzer_names:
        # Single threshold keeps the reference's plain {name}.csv; a sweep
        # needs per-threshold files ({name}_NN.csv, cli/eval.py
        # convention) — analyzers truncate their CSV at construction, so
        # sharing one file across thresholds interleaves rows and stacks
        # multiple Mean/Std trailers.
        stem = f'{name}_{thresh_folder}' if sweep else name
        fname = os.path.join(output_folder, f'{stem}.csv')
        _a.append(analysis.create_analyzer(
            name, display_name=f'{name} {thresh:.2f}', fname=fname))
      if args.render_cityscapes:
        sub_folder = (os.path.join(output_folder, 'cityscapes',
                                   thresh_folder) if sweep
                      else os.path.join(output_folder, 'cityscapes'))
        _a.append(analysis.RenderCityScapesOutputAnalyzer(sub_folder, ds))
      _a.append(analysis.RenderInstanceAnalyzer(
          os.path.join(output_folder, thresh_folder), ds))
      _a.append(analysis.CountAnalyzer(
          os.path.join(output_folder, thresh_folder, 'count.csv')))
      analyzer_sets.append(_a)
    gt_render = (analysis.RenderGroundtruthInstanceAnalyzer(
        os.path.join(output_folder, 'gt'), ds) if args.render_gt else None)

    n = ds.get_dataset_size()
    opt = {'remove_tiny': args.remove_tiny, 'lrr_seg': args.lrr_seg,
           'lrr_folder': args.lrr_folder, 'split': split,
           'no_iou': args.no_iou}
    # Worker sharding (ref cityscapes_eval.py:39-44, 265-266).
    per = int(np.ceil(n / args.num_split))
    start = args.split_id * per
    end = min(start + per, n)
    for pos in range(start, end):
      eval_one(ds, pos, threshold_list, analyzer_sets, opt,
               gt_render=gt_render, timespan=data_cfg.timespan)
    for aset in analyzer_sets:
      for a in aset:
        a.finalize()


if __name__ == '__main__':
  main()
