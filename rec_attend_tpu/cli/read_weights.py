"""Weight-export CLIs: checkpoint -> weights.h5.

Capability twins of ``box_model_read.py`` / ``full_model_read.py``: restore
the latest checkpoint and dump named weights (incl. per-timestep BN
beta/gamma) to an h5 in the reference schema, consumed downstream by
``pretrain_*`` loading.
"""

from __future__ import annotations

import argparse
import os

import jax
import yaml

from rec_attend_tpu.engine.saver import Saver
from rec_attend_tpu.nn import params as P
from rec_attend_tpu.parallel.train_step import make_optimizer
from rec_attend_tpu.utils import logger

BOX_NETS = ('ctrl_cnn', 'ctrl_mlp', 'glimpse_mlp', 'score_mlp', 'ctrl_lstm')
FULL_NETS = BOX_NETS + ('attn_cnn', 'attn_dcnn')


def _restore_params(spec, restore):
  from rec_attend_tpu import config as C
  from rec_attend_tpu.engine.experiment import get_model_spec
  cls = {'box': C.BoxModelConfig, 'full': C.FullModelConfig}[spec]
  with open(os.path.join(restore, 'model_opt.yaml')) as f:
    cfg = cls.from_dict(yaml.safe_load(f))
  model_spec = get_model_spec(spec)
  params = model_spec.init_fn(jax.random.PRNGKey(0), cfg)
  saver = Saver(restore)
  tx = make_optimizer(cfg)
  tree = {'params': params, 'opt_state': tx.init(params)}
  loaded, step = saver.restore(tree)
  return loaded['params'], cfg, step


def _main(spec, nets, argv=None):
  parser = argparse.ArgumentParser(
      description=f'Read pretrained {spec} weights')
  parser.add_argument('--model_id', default=None, required=True)
  parser.add_argument('--results', default='results')
  parser.add_argument('--output', default=None)
  args = parser.parse_args(argv)
  log = logger.get()
  restore = os.path.join(args.results, args.model_id)
  output = args.output or os.path.join(restore, 'weights.h5')
  params, cfg, step = _restore_params(spec, restore)
  P.export_weights_h5({n: params[n] for n in nets if n in params}, output)
  log.info(f'Saved weights (step {step}) to {output}')
  return output


def box_main(argv=None):
  return _main('box', BOX_NETS, argv)


def full_main(argv=None):
  return _main('full', FULL_NETS, argv)
