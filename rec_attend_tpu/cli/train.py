"""Train CLIs for the three model families.

Capability twins of ``full_model_train.py`` / ``box_model_train.py`` /
``fg_model_train.py``: compose the default/data/model argparse namespaces,
build the experiment and run the cadenced loop.
"""

from __future__ import annotations

import argparse

from rec_attend_tpu.cli import args as A
from rec_attend_tpu.engine.experiment import TrainingExperiment
from rec_attend_tpu.utils import logger


def _run(spec, make_model_cfg, add_model_args, argv=None, plot_fn=None):
  parser = argparse.ArgumentParser(description=f'Train {spec} model')
  A.add_train_args(parser)
  A.add_data_args(parser)
  add_model_args(parser)
  args = parser.parse_args(argv)
  log = logger.get()
  log.log_args()
  model_cfg = make_model_cfg(args)
  train_cfg = A.make_train_config(args)
  data_cfg = A.make_data_config(args)
  if plot_fn is None:
    plot_fn = _default_plot_fn(spec)
  exp = TrainingExperiment(spec, model_cfg, train_cfg, data_cfg,
                           plot_fn=plot_fn)
  exp.run()
  return exp


def _default_plot_fn(spec):
  def plot(exp):
    try:
      from rec_attend_tpu.utils import plot_utils
      plot_utils.plot_experiment_samples(exp, spec)
    except Exception as e:   # plotting must never kill training
      exp.log.warning(f'plotting failed: {e}')
  return plot


def full_main(argv=None):
  return _run('full', A.make_full_model_config, A.add_full_model_args, argv)


def box_main(argv=None):
  return _run('box', A.make_box_model_config, A.add_box_model_args, argv)


def fg_main(argv=None):
  return _run('fg', A.make_fg_model_config, A.add_fg_model_args, argv)
