#!/usr/bin/env python
"""Three-stage training pipelines.

Capability twin of the reference's ``run_cvppp.sh`` / ``run_kitti.sh`` /
``run_cityscapes.sh``: chains fg -> pack -> box -> read-weights -> full ->
eval as one driver, with the canonical hyperparameters from the shell
scripts baked into config presets (rec_attend_tpu/config.py).

Usage:
  python pipelines/run_pipeline.py --dataset cvppp [--scale tiny]
  python pipelines/run_pipeline.py --dataset kitti
  python pipelines/run_pipeline.py --dataset synth --scale tiny
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rec_attend_tpu import config as C
from rec_attend_tpu.cli import eval as eval_cli
from rec_attend_tpu.cli import pack as pack_cli
from rec_attend_tpu.cli import read_weights
from rec_attend_tpu.engine.experiment import (TrainingExperiment,
                                              EvalExperiment,
                                              assign_model_id)
from rec_attend_tpu.utils import logger


def _data_flags(args):
  """Optional dataset-override argv forwarded to the sub-CLIs (they fall
  back to the model's data_opt.yaml snapshot otherwise)."""
  return ((['--dataset_folder', args.dataset_folder]
           if args.dataset_folder else [])
          + (['--data_examples', str(args.data_examples)]
             if getattr(args, 'data_examples', None) else []))


def _reuse_stages(args, stages, log):
  """--fg_from/--box_from mean "reuse this trained stage": drop the
  corresponding train stages so a default --stages list cannot train a
  fresh model INTO the reused folder (clobbering the checkpoint the flag
  points at)."""
  for flag, stage in (('fg_from', 'fg'), ('box_from', 'box')):
    if getattr(args, flag, None) and stage in stages:
      log.warning(f'--{flag} given: skipping the {stage!r} train stage '
                  f'(reusing {getattr(args, flag)})')
      stages.discard(stage)
  return stages


def _restore_folder(args, model_id, data_cfg=None):
  """results/<id> when --resume was passed and a run exists there, else
  None (fresh training).

  When resuming, the current CLI-derived DataConfig must match the run's
  data_opt.yaml snapshot — otherwise the resumed checkpoint would sit on a
  silently regenerated train/valid split (e.g. a different
  --data_examples), shifting the eval split under it.  Fail loudly.
  """
  folder = os.path.join(args.results, model_id)
  if not (getattr(args, 'resume', False) and os.path.isdir(folder)):
    return None
  snap_path = os.path.join(folder, 'data_opt.yaml')
  if data_cfg is not None and os.path.exists(snap_path):
    import yaml
    with open(snap_path) as f:
      snap = yaml.safe_load(f)
    for key in ('num_examples', 'height', 'width', 'timespan',
                'max_objects', 'num_semantic_classes'):
      cur = getattr(data_cfg, key, None)
      if key in snap and snap[key] != cur:
        raise ValueError(
            f'--resume {model_id}: DataConfig.{key}={cur} does not match '
            f'the run snapshot {snap_path} ({key}={snap[key]}); pass '
            f'matching data flags to extend this run')
  return folder


def run_cvppp(args):
  """ref run_cvppp.sh: box pretrain (60k) -> full (30k) -> eval."""
  log = logger.get()
  model_id = assign_model_id()
  box_id = f'box_model_cvppp-{model_id}'
  full_id = f'full_model_cvppp-{model_id}'
  data_cfg = C.data_config_for('cvppp', args.dataset_folder)

  box_cfg = C.cvppp_box_config()
  box_steps = 60000 if args.scale == 'paper' else (args.num_steps or 100)
  full_steps = 30000 if args.scale == 'paper' else (args.num_steps or 100)
  bs = 5

  train_cfg = C.TrainConfig(model_id=box_id, num_steps=box_steps,
                            batch_size=bs, save_ckpt=True,
                            results=args.results, logs=args.logs)
  TrainingExperiment('box', box_cfg, train_cfg, data_cfg).run()
  weights = read_weights.box_main(
      ['--model_id', box_id, '--results', args.results])

  full_cfg = C.cvppp_full_config().replace(pretrain_ctrl_net=weights)
  train_cfg = train_cfg.replace(model_id=full_id, num_steps=full_steps)
  TrainingExperiment('full', full_cfg, train_cfg, data_cfg).run()

  eval_cli.full_main(['--model_id', full_id, '--results', args.results,
                      '--dataset', 'cvppp', '--split', 'valid',
                      '--batch_size', str(bs)]
                     + (['--dataset_folder', args.dataset_folder]
                        if args.dataset_folder else []))
  log.info(f'Pipeline done: {full_id}')


def run_kitti(args):
  """ref run_kitti.sh: fg (40k) -> pack -> box (60k) -> full (100k)."""
  log = logger.get()
  model_id = assign_model_id()
  fg_id = f'fg_model_kitti-{model_id}'
  box_id = f'box_model_kitti-{model_id}'
  full_id = f'full_model_kitti-{model_id}'
  data_cfg = C.data_config_for('kitti', args.dataset_folder)
  paper = args.scale == 'paper'

  fg_cfg = C.kitti_fg_config()
  train_cfg = C.TrainConfig(model_id=fg_id,
                            num_steps=40000 if paper else (args.num_steps or 100),
                            batch_size=8, save_ckpt=True,
                            results=args.results, logs=args.logs)
  TrainingExperiment('fg', fg_cfg, train_cfg, data_cfg).run()
  pack_cli.fg_main(['--model_id', fg_id, '--results', args.results,
                    '--dataset', 'kitti', '--split', 'train,valid'])

  box_cfg = C.kitti_box_config()
  train_cfg = train_cfg.replace(model_id=box_id, batch_size=5,
                                num_steps=60000 if paper else (args.num_steps or 100))
  TrainingExperiment('box', box_cfg, train_cfg, data_cfg).run()
  weights = read_weights.box_main(
      ['--model_id', box_id, '--results', args.results])

  full_cfg = C.kitti_full_config().replace(pretrain_ctrl_net=weights)
  train_cfg = train_cfg.replace(
      model_id=full_id, batch_size=2,
      num_steps=100000 if paper else (args.num_steps or 100))
  TrainingExperiment('full', full_cfg, train_cfg, data_cfg).run()
  eval_cli.full_main(['--model_id', full_id, '--results', args.results,
                      '--dataset', 'kitti', '--split', 'valid'])
  log.info(f'Pipeline done: {full_id}')


def run_cityscapes(args):
  """ref run_cityscapes.sh: fg (40k) -> pack(train,valid,test) -> box (60k)
  -> read -> full (70k) -> pack -> cityscapes_eval per split."""
  from rec_attend_tpu.cli import cityscapes_eval as cs_eval_cli
  log = logger.get()
  model_id = assign_model_id()
  fg_id = f'fg_model_cityscapes-{model_id}'
  box_id = f'box_model_cityscapes-{model_id}'
  full_id = f'full_model_cityscapes-{model_id}'
  data_cfg = C.data_config_for('cityscapes', args.dataset_folder)
  paper = args.scale == 'paper'

  fg_cfg = C.cityscapes_fg_config()
  train_cfg = C.TrainConfig(model_id=fg_id,
                            num_steps=40000 if paper else (args.num_steps
                                                           or 100),
                            batch_size=8, save_ckpt=True, prefetch=True,
                            results=args.results, logs=args.logs)
  TrainingExperiment('fg', fg_cfg, train_cfg, data_cfg).run()
  pack_cli.fg_main(['--model_id', fg_id, '--results', args.results,
                    '--dataset', 'cityscapes',
                    '--split', 'train,valid,test'])

  box_cfg = C.cityscapes_box_config()
  train_cfg = train_cfg.replace(model_id=box_id, batch_size=4,
                                num_steps=60000 if paper else
                                (args.num_steps or 100))
  TrainingExperiment('box', box_cfg, train_cfg, data_cfg).run()
  weights = read_weights.box_main(
      ['--model_id', box_id, '--results', args.results])

  full_cfg = C.cityscapes_full_config().replace(pretrain_ctrl_net=weights)
  train_cfg = train_cfg.replace(model_id=full_id, batch_size=2,
                                num_steps=70000 if paper else
                                (args.num_steps or 100))
  TrainingExperiment('full', full_cfg, train_cfg, data_cfg).run()
  pack_cli.full_main(['--model_id', full_id, '--results', args.results,
                      '--dataset', 'cityscapes', '--split', 'valid,test'])
  for split in ('valid', 'test'):
    cs_eval_cli.main(['--model_id', full_id, '--results', args.results,
                      '--dataset', 'cityscapes', '--split', split]
                     + (['--dataset_folder', args.dataset_folder]
                        if args.dataset_folder else []))
  log.info(f'Pipeline done: {full_id}')


def run_synth(args):
  """End-to-end pipeline on the synthetic dataset.

  ``--scale tiny``: 64x64 smoke run (CI-sized).
  ``--scale paper``: CVPPP-shaped accuracy run — 224x224, T=21, up to 9
  instances, CVPPP model presets (run_cvppp.sh hyperparameters) on
  generated data; produces the SBD/count metric table for RESULTS.md.
  """
  log = logger.get()
  model_id = assign_model_id()
  box_id = f'box_model_synth-{model_id}'
  full_id = f'full_model_synth-{model_id}'
  paper = args.scale == 'paper'

  if paper:
    data_cfg = C.DataConfig(dataset='synth', folder=args.dataset_folder,
                            height=224, width=224, timespan=21,
                            num_examples=256, max_objects=9)
    box_cfg = C.cvppp_box_config()
    full_base = C.cvppp_full_config()
    bs = 8
    box_steps = args.num_steps or 12000
    full_steps = args.num_steps or 20000
    cadence = dict(steps_per_valid=250, steps_per_trainval=250,
                   steps_per_plot=0, num_batch_valid=4, prefetch=True,
                   num_worker=2, device_data=True)
  else:
    data_cfg = C.data_config_for('synth', args.dataset_folder)
    box_cfg = C.tiny_box_config(timespan=6)
    full_base = C.tiny_full_config(timespan=6, use_knob=True)
    bs = 4
    box_steps = full_steps = args.num_steps or 100
    cadence = dict(steps_per_valid=max(box_steps // 2, 1),
                   steps_per_trainval=max(box_steps // 2, 1),
                   steps_per_plot=0)

  train_cfg = C.TrainConfig(model_id=box_id, num_steps=box_steps,
                            batch_size=bs, save_ckpt=True,
                            results=args.results, logs=args.logs, **cadence)
  TrainingExperiment('box', box_cfg, train_cfg, data_cfg).run()
  weights = read_weights.box_main(
      ['--model_id', box_id, '--results', args.results])

  full_cfg = full_base.replace(pretrain_ctrl_net=weights)
  train_cfg = train_cfg.replace(model_id=full_id, num_steps=full_steps)
  TrainingExperiment('full', full_cfg, train_cfg, data_cfg).run()
  eval_cli.full_main(['--model_id', full_id, '--results', args.results,
                      '--dataset', 'synth', '--split', 'valid',
                      '--batch_size', str(bs)]
                     + (['--dataset_folder', args.dataset_folder]
                        if args.dataset_folder else []))
  log.info(f'Pipeline done: {full_id}')


def _skip_completed_prefix(args, stages, full_id, data_cfg, log):
  """On --resume relaunches mid-full-stage (watchdog kill + restart after
  a tunnel stall), skip the fg/pack/box prefix: a full-stage checkpoint
  can only exist if they completed, and re-running the pack stage costs
  ~20 min of big-shape compile per relaunch.  Only applies when the
  packed channels are actually present in BOTH splits (an environment
  restore can wipe the gitignored H5 while a committed checkpoint
  survives — then the prefix must really re-run)."""
  import glob as _glob
  import h5py
  if not getattr(args, 'resume', False):
    return stages
  if not _glob.glob(os.path.join(args.results, full_id, 'ckpt-*.npz')):
    return stages
  from rec_attend_tpu.data import provider
  try:
    packed = True
    for split in ('train', 'valid'):
      ds = provider.get('synth', data_cfg, split=split)
      with h5py.File(ds.h5_fname, 'r') as f:
        packed &= 'foreground_pred' in f[ds.get_str_id(ds.img_ids[0])]
  except Exception:
    packed = False
  if packed:
    for s in ('fg', 'pack', 'box'):
      stages.discard(s)
    log.info('--resume: full-stage ckpt + packed H5 present; '
             'skipping fg/pack/box')
  return stages


def run_synth3(args):
  """THREE-stage pipeline on synthetic data at KITTI shape: fg (orientation
  on) -> pack foreground_pred/orientation_pred into the H5 -> box with
  --add_d_out/--add_y_out -> full (packed channels into both nets) -> eval.

  This is the reference's run_kitti.sh:13-118 workflow executed end-to-end
  on generated data (real KITTI archives are unobtainable here), i.e. the
  packed d_in/y_in channels are *trained through*, not just shape-tested.

  ``--scale tiny``: 64x64 smoke run (CI-sized, CPU-able).
  ``--scale paper``: 128x448, T=20, kitti model presets.
  ``--stages`` + ``--model_id`` resume the chain mid-way.
  """
  log = logger.get()
  model_id = args.model_id or assign_model_id()
  fg_id = args.fg_from or f'fg_model_synth3-{model_id}'
  box_id = args.box_from or f'box_model_synth3-{model_id}'
  full_id = f'full_model_synth3-{model_id}'
  paper = args.scale == 'paper'
  stages = set(args.stages.split(','))

  if paper:
    data_cfg = C.DataConfig(dataset='synth', folder=args.dataset_folder,
                            height=128, width=448, timespan=20,
                            num_examples=args.data_examples or 256,
                            max_objects=12)
    fg_cfg = C.kitti_fg_config()
    box_cfg = C.kitti_box_config()
    full_base = C.kitti_full_config()
    bs = 8
    fg_steps = args.fg_steps or 3000
    box_steps = args.box_steps or 12000
    full_steps = args.full_steps or 16000
    cadence = dict(steps_per_valid=250, steps_per_trainval=250,
                   steps_per_plot=0, num_batch_valid=4, prefetch=True,
                   num_worker=2, device_data=True)
  else:
    data_cfg = C.DataConfig(dataset='synth', folder=args.dataset_folder,
                            height=64, width=64, timespan=6,
                            num_examples=32, max_objects=4)
    fg_cfg = C.tiny_fg_config(add_orientation=True, dcnn_depth=(8, 4, 9))
    box_cfg = C.tiny_box_config(timespan=6, add_d_out=True, add_y_out=True)
    full_base = C.tiny_full_config(
        timespan=6, use_knob=True, add_d_out=True, add_y_out=True,
        ctrl_add_inp=True, ctrl_add_canvas=True,
        attn_add_inp=True, attn_add_canvas=True)
    bs = 4
    fg_steps = box_steps = full_steps = args.num_steps or 20
    cadence = dict(steps_per_valid=max(fg_steps // 2, 1),
                   steps_per_trainval=max(fg_steps // 2, 1),
                   steps_per_plot=0)

  stages = _reuse_stages(args, stages, log)
  stages = _skip_completed_prefix(args, stages, full_id, data_cfg, log)
  train_cfg = C.TrainConfig(model_id=fg_id, num_steps=fg_steps,
                            batch_size=bs, save_ckpt=True,
                            results=args.results, logs=args.logs,
                            **cadence)
  if 'fg' in stages:
    # _restore_folder (and its data-snapshot guard) only for stages that
    # actually train — a reused fg/box stage must not be validated
    # against the current CLI data flags.
    train_cfg = train_cfg.replace(
        restore=_restore_folder(args, fg_id, data_cfg))
    TrainingExperiment('fg', fg_cfg, train_cfg, data_cfg).run()
  if 'pack' in stages:
    pack_cli.fg_main(['--model_id', fg_id, '--results', args.results,
                      '--dataset', 'synth', '--split', 'train,valid',
                      '--batch_size', str(bs)] + _data_flags(args))
  if 'box' in stages:
    train_cfg = train_cfg.replace(model_id=box_id, num_steps=box_steps,
                                  restore=_restore_folder(args, box_id, data_cfg))
    TrainingExperiment('box', box_cfg, train_cfg, data_cfg).run()
  if 'full' in stages:
    weights = read_weights.box_main(
        ['--model_id', box_id, '--results', args.results])
    full_cfg = full_base.replace(pretrain_ctrl_net=weights)
    train_cfg = train_cfg.replace(model_id=full_id, num_steps=full_steps,
                                  restore=_restore_folder(args, full_id, data_cfg))
    TrainingExperiment('full', full_cfg, train_cfg, data_cfg).run()
  if 'eval' in stages:
    from pipelines import eval_fg_metrics
    eval_fg_metrics.main(['--model_id', fg_id, '--results', args.results,
                          '--batch_size', str(bs)] + _data_flags(args))
    eval_cli.full_main(['--model_id', full_id, '--results', args.results,
                        '--dataset', 'synth', '--split', 'valid',
                        '--batch_size', str(bs),
                        '--threshold_list', '0.2,0.3,0.4,0.5,0.6,0.7']
                       + _data_flags(args))
  log.info(f'Pipeline done: {fg_id} -> {box_id} -> {full_id}')


def run_synth_cs(args):
  """Three-stage pipeline with the CITYSCAPES presets on multiclass synth
  data (256x512, T=20, 2 instance classes by shape family -> 3 config
  classes incl. background): exercises the multiclass fg softmax head,
  the multiclass box score head (softmax + 1-s0 conf loss) and the
  9ch-analogue packed y_in through real training, matching the
  reference's run_cityscapes.sh stage wiring."""
  log = logger.get()
  model_id = args.model_id or assign_model_id()
  fg_id = args.fg_from or f'fg_model_synthcs-{model_id}'
  box_id = args.box_from or f'box_model_synthcs-{model_id}'
  full_id = f'full_model_synthcs-{model_id}'
  paper = args.scale == 'paper'
  stages = set(args.stages.split(','))
  nsc_data = 2                  # instance classes (ellipse / rectangle)
  nsc_cfg = nsc_data + 1        # + background channel

  if paper:
    data_cfg = C.DataConfig(dataset='synth', folder=args.dataset_folder,
                            height=256, width=512, timespan=20,
                            num_examples=args.data_examples or 256,
                            max_objects=10,
                            num_semantic_classes=nsc_data)
    fg_cfg = C.cityscapes_fg_config()
    fg_cfg = fg_cfg.replace(
        num_semantic_classes=nsc_cfg,
        dcnn_depth=fg_cfg.dcnn_depth[:-1] + (nsc_cfg + 8,))
    box_cfg = C.cityscapes_box_config().replace(num_semantic_classes=nsc_cfg)
    full_base = C.cityscapes_full_config().replace(
        num_semantic_classes=nsc_cfg)
    bs_fg, bs = 8, 4
    fg_steps = args.fg_steps or 1500
    box_steps = args.box_steps or 4000
    full_steps = args.full_steps or 6000
    cadence = dict(steps_per_valid=250, steps_per_trainval=250,
                   steps_per_plot=0, num_batch_valid=4, prefetch=True,
                   num_worker=2, device_data=True)
  else:
    data_cfg = C.DataConfig(dataset='synth', folder=args.dataset_folder,
                            height=64, width=64, timespan=6,
                            num_examples=32, max_objects=4,
                            num_semantic_classes=nsc_data)
    fg_cfg = C.tiny_fg_config(add_orientation=True,
                              num_semantic_classes=nsc_cfg,
                              dcnn_depth=(8, 4, nsc_cfg + 8))
    box_cfg = C.tiny_box_config(timespan=6, add_d_out=True, add_y_out=True,
                                num_semantic_classes=nsc_cfg)
    full_base = C.tiny_full_config(
        timespan=6, use_knob=True, add_d_out=True, add_y_out=True,
        num_semantic_classes=nsc_cfg,
        ctrl_add_inp=True, ctrl_add_canvas=True,
        attn_add_inp=True, attn_add_canvas=True)
    bs_fg = bs = 4
    fg_steps = box_steps = full_steps = args.num_steps or 20
    cadence = dict(steps_per_valid=max(fg_steps // 2, 1),
                   steps_per_trainval=max(fg_steps // 2, 1),
                   steps_per_plot=0)

  train_cfg = C.TrainConfig(model_id=fg_id, num_steps=fg_steps,
                            batch_size=bs_fg, save_ckpt=True,
                            results=args.results, logs=args.logs,
                            **cadence)
  stages = _reuse_stages(args, stages, log)
  stages = _skip_completed_prefix(args, stages, full_id, data_cfg, log)
  if 'fg' in stages:
    train_cfg = train_cfg.replace(
        restore=_restore_folder(args, fg_id, data_cfg))
    TrainingExperiment('fg', fg_cfg, train_cfg, data_cfg).run()
  if 'pack' in stages:
    pack_cli.fg_main(['--model_id', fg_id, '--results', args.results,
                      '--dataset', 'synth', '--split', 'train,valid',
                      '--batch_size', str(bs_fg)] + _data_flags(args))
  if 'box' in stages:
    train_cfg = train_cfg.replace(model_id=box_id, num_steps=box_steps,
                                  batch_size=bs,
                                  restore=_restore_folder(args, box_id, data_cfg))
    TrainingExperiment('box', box_cfg, train_cfg, data_cfg).run()
  if 'full' in stages:
    weights = read_weights.box_main(
        ['--model_id', box_id, '--results', args.results])
    full_cfg = full_base.replace(pretrain_ctrl_net=weights)
    train_cfg = train_cfg.replace(model_id=full_id, num_steps=full_steps,
                                  batch_size=bs,
                                  restore=_restore_folder(args, full_id, data_cfg))
    TrainingExperiment('full', full_cfg, train_cfg, data_cfg).run()
  if 'eval' in stages:
    from pipelines import eval_fg_metrics
    eval_fg_metrics.main(['--model_id', fg_id, '--results', args.results,
                          '--batch_size', str(bs_fg)] + _data_flags(args))
    eval_cli.full_main(['--model_id', full_id, '--results', args.results,
                        '--dataset', 'synth', '--split', 'valid',
                        '--batch_size', str(bs),
                        '--threshold_list', '0.2,0.3,0.4,0.5,0.6,0.7']
                       + _data_flags(args))
  if 'ap' in stages:
    run_ap_stage(args, full_id, data_cfg, bs)
  if 'pixel' in stages:
    run_pixel_stage(args, full_id, data_cfg)
  log.info(f'Pipeline done: {fg_id} -> {box_id} -> {full_id}')


def run_pixel_stage(args, full_id, data_cfg, split='valid'):
  """Official Cityscapes PIXEL-level semantic eval, end-to-end on the
  packed fg semantic output (the one evaluator family whose numbers had
  never flowed from a trained chain; differential test:
  tests/test_pixel_differential.py).

  Pred labelIds: argmax over the packed multiclass ``foreground_pred``
  channels (softmax channel 0 = background -> CS_BACKGROUND_LABEL_ID,
  instance class c -> CS_INSTANCE_LABEL_IDS[c-1]); single-channel fg
  (nsc=1) thresholds at 0.5.  GT labelIds/instanceIds: rendered from the
  H5 full-size masks + per-instance classes with the same encoding as
  ``write_instance_id_gt``.  Pairing/metrics per the official
  ``evalPixelLevelSemanticLabeling.py:638-658``."""
  import json
  import cv2
  import h5py
  import numpy as np
  import yaml
  from rec_attend_tpu.data import provider
  from rec_attend_tpu.data.assembler import png_decode
  from rec_attend_tpu.data.synthetic import (CS_BACKGROUND_LABEL_ID,
                                             CS_INSTANCE_LABEL_IDS)
  from rec_attend_tpu.eval_cityscapes.pixel_eval import PixelEvaluator
  log = logger.get()

  # Same snapshot guard as run_ap_stage: GT must come from the dataset
  # the predictions were packed into.
  snap_path = os.path.join(args.results, full_id, 'data_opt.yaml')
  if os.path.exists(snap_path):
    with open(snap_path) as f:
      data_cfg = C.DataConfig.from_dict(yaml.safe_load(f))
    if args.dataset_folder:
      data_cfg = data_cfg.replace(folder=args.dataset_folder)
    if getattr(args, 'data_examples', None):
      data_cfg = data_cfg.replace(num_examples=args.data_examples)
  ds = provider.get('synth', data_cfg, split=split)
  ids_tbl = CS_INSTANCE_LABEL_IDS
  ev = PixelEvaluator()
  n = 0
  with h5py.File(ds.h5_fname, 'r') as h5f:
    for idx in ds.img_ids:
      group = h5f[ds.get_str_id(idx)]
      if 'foreground_pred' not in group:
        raise FileNotFoundError(
            f'{ds.h5_fname}:{ds.get_str_id(idx)} has no foreground_pred '
            '— run the pack stage first')
      chans = sorted(group['foreground_pred'].keys())
      fg = np.stack([png_decode(group[f'foreground_pred/{c}'][:],
                                cv2.IMREAD_GRAYSCALE)
                     for c in chans], axis=-1)
      if fg.shape[2] == 1:
        pred = np.where(fg[:, :, 0] > 127, ids_tbl[0],
                        CS_BACKGROUND_LABEL_ID)
      else:
        am = fg.argmax(axis=2)
        inst_ids = np.asarray(ids_tbl)[(am - 1) % len(ids_tbl)]
        pred = np.where(am == 0, CS_BACKGROUND_LABEL_ID, inst_ids)
      pred = pred.astype(np.uint8)

      classes = (group['instance_semantic_classes'][:]
                 if 'instance_semantic_classes' in group else None)
      seg = group['label_segmentation_full_size']
      gt_label = np.full(pred.shape, CS_BACKGROUND_LABEL_ID, np.uint8)
      gt_inst = np.full(pred.shape, CS_BACKGROUND_LABEL_ID, np.int64)
      for jj in range(len(seg.keys())):
        mask = png_decode(seg[f'{jj:02d}'][:], cv2.IMREAD_GRAYSCALE) > 0
        cls = int(classes[jj]) if classes is not None else 0
        lid = ids_tbl[cls % len(ids_tbl)]
        gt_label[mask] = lid
        gt_inst[mask] = lid * 1000 + jj
      ev.add_pair(pred, gt_label, instance_img=gt_inst)
      n += 1
  result = ev.finalize()
  export = os.path.join(args.results, full_id, f'output_{split}',
                        'pixel_eval.json')
  os.makedirs(os.path.dirname(export), exist_ok=True)
  with open(export, 'w') as f:
    json.dump(result, f, indent=2)
  log.info(f'Pixel-level eval over {n} images: meanIoU '
           f'{result["meanIoU"]:.4f} iIoU {result["meanInstIoU"]:.4f} '
           f'-> {export}')
  return result


def run_ap_stage(args, full_id, data_cfg, batch_size, split='valid'):
  """Official Cityscapes instance-level AP, end-to-end on a trained full
  model: pack instance/score predictions into the H5 -> model-free
  full-resolution eval (postprocess + submission writer, the reference's
  cityscapes_eval.py path) -> synthetic gtFine instanceIds -> AP
  (ref run_cityscapes_eval.sh:27-55).  Writes
  results/<full_id>/output_<split>/ap.json and returns the averages."""
  import json
  from rec_attend_tpu.cli import cityscapes_eval as cs_eval_cli
  from rec_attend_tpu.data import provider
  from rec_attend_tpu.data import synthetic
  from rec_attend_tpu.eval_cityscapes import instance_eval
  log = logger.get()

  pack_cli.full_main(['--model_id', full_id, '--results', args.results,
                      '--dataset', 'synth', '--split', split,
                      '--batch_size', str(batch_size)] + _data_flags(args))
  out_folder = os.path.join(args.results, full_id, f'cs_output_{split}')
  cs_eval_cli.main(['--model_id', full_id, '--results', args.results,
                    '--dataset', 'synth', '--split', split,
                    '--output', out_folder,
                    '--remove_tiny', str(args.ap_remove_tiny),
                    '--analyzers', 'sbd'] + _data_flags(args))

  # GT must come from the SAME dataset the predictions were packed into:
  # pack/cs_eval restore the model's data_opt.yaml snapshot, so a
  # standalone `--stages ap` with non-matching CLI data flags would
  # otherwise regenerate a different split here (provider deletes the H5
  # on a meta mismatch — including the just-packed predictions) and
  # evaluate against unrelated scenes.
  import yaml
  snap_path = os.path.join(args.results, full_id, 'data_opt.yaml')
  if os.path.exists(snap_path):
    with open(snap_path) as f:
      data_cfg = C.DataConfig.from_dict(yaml.safe_load(f))
    if args.dataset_folder:
      data_cfg = data_cfg.replace(folder=args.dataset_folder)
    if getattr(args, 'data_examples', None):
      data_cfg = data_cfg.replace(num_examples=args.data_examples)
  ds = provider.get('synth', data_cfg, split=split)
  gt_folder = os.path.join(args.results, full_id, f'ap_gt_{split}')
  gt_files = synthetic.write_instance_id_gt(ds, gt_folder)
  sub_folder = os.path.join(out_folder, 'cityscapes')
  pred_txts = [instance_eval.find_prediction_file(g, sub_folder)
               for g in gt_files]
  export = os.path.join(args.results, full_id, f'output_{split}', 'ap.json')
  avg = instance_eval.evaluate_instance_predictions(
      pred_txts, gt_files, export_file=export)
  log.info(f'AP results exported to {export}')
  return avg


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--dataset', default='cvppp',
                      choices=['cvppp', 'kitti', 'cityscapes', 'synth',
                               'synth3', 'synthcs'])
  parser.add_argument('--dataset_folder', default=None)
  parser.add_argument('--results', default='results')
  parser.add_argument('--logs', default='logs')
  parser.add_argument('--scale', default='paper', choices=['paper', 'tiny'])
  parser.add_argument('--num_steps', default=None, type=int,
                      help='steps per stage when --scale tiny')
  parser.add_argument('--model_id', default=None,
                      help='reuse an id (resume a synth3 chain mid-way)')
  parser.add_argument('--stages', default='fg,pack,box,full,eval,ap,pixel',
                      help='synth3/synthcs stages to run (ap = official '
                           'Cityscapes instance-level AP; pixel = official '
                           'pixel-level semantic IoU/iIoU on the packed '
                           'fg output; both synthcs only)')
  parser.add_argument('--fg_steps', default=None, type=int)
  parser.add_argument('--box_steps', default=None, type=int)
  parser.add_argument('--full_steps', default=None, type=int)
  parser.add_argument('--data_examples', default=None, type=int,
                      help='override the train-split size (synth3/synthcs '
                           'paper)')
  parser.add_argument('--fg_from', default=None,
                      help='reuse this trained fg model id instead of '
                           'training a new one (data-scaling runs)')
  parser.add_argument('--box_from', default=None,
                      help='reuse this trained box model id (its weights.h5 '
                           'initialises the full model)')
  parser.add_argument('--ap_remove_tiny', default=100, type=int,
                      help='remove-tiny area for the ap stage (the official '
                           'min region size; the reference uses 1200 at '
                           'full 2048x1024 resolution)')
  parser.add_argument('--resume', action='store_true',
                      help='restore each trained stage from its existing '
                           'results/<id> checkpoint (extend a run to a '
                           'higher step count)')
  args = parser.parse_args()
  if args.dataset == 'cvppp':
    run_cvppp(args)
  elif args.dataset == 'kitti':
    run_kitti(args)
  elif args.dataset == 'synth':
    run_synth(args)
  elif args.dataset == 'synth3':
    run_synth3(args)
  elif args.dataset == 'synthcs':
    run_synth_cs(args)
  elif args.dataset == 'cityscapes':
    run_cityscapes(args)
  else:
    raise ValueError(f'Unknown dataset {args.dataset}')


if __name__ == '__main__':
  main()
