"""Pack CLIs: run inference and write predictions back into the dataset H5.

Capability twins of ``fg_model_pack.py`` (foreground_pred/orientation_pred,
:25-50) and ``full_model_pack.py`` (instance_pred PNGs + score_pred,
:35-57) — the H5-as-message-bus pattern chaining the three stages.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from rec_attend_tpu.cli import args as A
from rec_attend_tpu.data.dataset import pack_predictions
from rec_attend_tpu.engine.experiment import EvalExperiment
from rec_attend_tpu.utils import logger


def _load_cfg(cls, restore):
  import yaml
  with open(os.path.join(restore, 'model_opt.yaml')) as f:
    return cls.from_dict(yaml.safe_load(f))


def fg_main(argv=None):
  parser = argparse.ArgumentParser(description='Pack fg model output')
  A.add_eval_args(parser)
  A.add_data_args(parser)
  args = parser.parse_args(argv)
  log = logger.get()

  from rec_attend_tpu import config as C
  restore = os.path.join(args.results, args.model_id)
  model_cfg = _load_cfg(C.FGModelConfig, restore)
  train_cfg = C.TrainConfig(restore=restore, batch_size=args.batch_size,
                            results=args.results)
  data_cfg = A.make_data_config(args, restore=restore)

  for split in args.split.split(','):
    exp = EvalExperiment('fg', model_cfg, train_cfg, data_cfg,
                         splits=[split])
    for ds, raw, outputs in exp.iterate_split(split):
      y_out = outputs['y_out']                       # [B, H, W, C]
      d_out = outputs.get('d_out')                   # [B, H, W, 8]
      for ii, idx in enumerate(raw['idx_map']):
        sid = ds.get_str_id(idx)
        pack_predictions(
            ds.h5_fname, sid, foreground=np.asarray(y_out[ii]),
            orientation=(np.asarray(d_out[ii]) if d_out is not None
                         else None))
    ds.clear_cache()   # re-reads must see the packed predictions
    log.info(f'Packed fg predictions into {ds.h5_fname} ({split})')


def full_main(argv=None):
  parser = argparse.ArgumentParser(description='Pack full model output')
  A.add_eval_args(parser)
  A.add_data_args(parser)
  args = parser.parse_args(argv)
  log = logger.get()

  from rec_attend_tpu import config as C
  restore = os.path.join(args.results, args.model_id)
  model_cfg = _load_cfg(C.FullModelConfig, restore).replace(use_knob=False)
  train_cfg = C.TrainConfig(restore=restore, batch_size=args.batch_size,
                            results=args.results)
  data_cfg = A.make_data_config(args, restore=restore)

  for split in args.split.split(','):
    exp = EvalExperiment('full', model_cfg, train_cfg, data_cfg,
                         splits=[split])
    for ds, raw, outputs in exp.iterate_split(split):
      y_out = outputs['y_out']                       # [B, T, H, W]
      s_out = outputs['s_out']                       # [B, T]
      for ii, idx in enumerate(raw['idx_map']):
        sid = ds.get_str_id(idx)
        pack_predictions(ds.h5_fname, sid,
                         instance=np.asarray(y_out[ii]),
                         score=np.asarray(s_out[ii]))
    ds.clear_cache()   # re-reads must see the packed predictions
    log.info(f'Packed instance predictions into {ds.h5_fname} ({split})')
