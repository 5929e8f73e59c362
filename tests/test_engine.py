"""Engine tests: training loop end-to-end on synthetic data, checkpointing,
resume, eval iteration."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rec_attend_tpu import config
from rec_attend_tpu.engine import experiment as exp_lib
from rec_attend_tpu.engine.saver import Saver, save_pytree, load_pytree


def _tiny_setup(tmp_path, spec='full', num_steps=8, **model_over):
  data_folder = str(tmp_path / 'data')
  results = str(tmp_path / 'results')
  logs = str(tmp_path / 'logs')
  if spec == 'fg':
    model_cfg = config.tiny_fg_config(inp_height=32, inp_width=32,
                                      **model_over)
  else:
    model_cfg = (config.tiny_full_config(timespan=6, inp_height=32,
                                         inp_width=32, filter_height=8,
                                         filter_width=8, **model_over)
                 if spec == 'full' else
                 config.tiny_box_config(timespan=6, inp_height=32,
                                        inp_width=32, filter_height=8,
                                        filter_width=8, **model_over))
  train_cfg = config.TrainConfig(
      num_steps=num_steps, batch_size=2, results=results, logs=logs,
      steps_per_valid=4, steps_per_trainval=4, steps_per_log=2,
      steps_per_ckpt=4, steps_per_plot=0, num_batch_valid=1,
      save_ckpt=True, model_id=f'{spec}_test')
  data_cfg = config.DataConfig(dataset='synth', folder=data_folder,
                               height=32, width=32, timespan=6)
  return model_cfg, train_cfg, data_cfg


def test_training_experiment_full(tmp_path):
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'full')
  exp = exp_lib.TrainingExperiment('full', model_cfg, train_cfg, data_cfg)
  exp.run()
  assert exp.step == train_cfg.num_steps
  # Checkpoints + YAML snapshots exist.
  folder = os.path.join(train_cfg.results, 'full_test')
  assert os.path.exists(os.path.join(folder, 'model_opt.yaml'))
  assert os.path.exists(os.path.join(folder, 'data_opt.yaml'))
  ckpts = [f for f in os.listdir(folder) if f.startswith('ckpt-')]
  assert len(ckpts) >= 1
  # max_to_keep pruning
  assert len(ckpts) <= 2
  # Time-series CSVs written.
  logs = os.path.join(train_cfg.logs, 'full_test')
  assert os.path.exists(os.path.join(logs, 'loss.csv'))
  assert os.path.exists(os.path.join(logs, 'step_time.csv'))
  assert os.path.exists(os.path.join(logs, 'catalog'))


def test_training_resume(tmp_path):
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'box', num_steps=4)
  exp = exp_lib.TrainingExperiment('box', model_cfg, train_cfg, data_cfg)
  exp.run()
  p0 = np.asarray(exp.params['ctrl_mlp'][0]['w'])

  # Resume from the checkpoint folder and train 4 more steps.
  train_cfg2 = train_cfg.replace(
      restore=os.path.join(train_cfg.results, 'box_test'), num_steps=6)
  exp2 = exp_lib.TrainingExperiment('box', model_cfg, train_cfg2, data_cfg)
  exp2.restore_ckpt()
  assert exp2.step == 4
  np.testing.assert_allclose(np.asarray(exp2.params['ctrl_mlp'][0]['w']), p0)
  exp2.run()
  assert exp2.step == 6


def _adam_count(opt_state):
  """The optimizer is chain(clip, adam); adam's count drives the LR."""
  import jax
  counts = [int(x) for x in jax.tree_util.tree_leaves(opt_state)
            if hasattr(x, 'dtype') and x.dtype == np.int32 and x.ndim == 0]
  assert counts, 'no count leaf found in opt_state'
  return counts[0]


def test_finetune_restarts_lr_schedule(tmp_path):
  """finetune=True must reset the optimizer count, not just self.step —
  otherwise the staircase LR resumes fully decayed
  (ref experiment.py:28-37 resets global_step which drives both)."""
  model_cfg, train_cfg, data_cfg = _tiny_setup(
      tmp_path, 'box', num_steps=4, steps_per_learn_rate_decay=2,
      learn_rate_decay=0.5)
  train_cfg = train_cfg.replace(model_id='box_ft', steps_per_valid=0,
                                steps_per_trainval=0)
  exp = exp_lib.TrainingExperiment('box', model_cfg, train_cfg, data_cfg)
  exp.run()
  assert _adam_count(exp.opt_state) == 4

  restore = train_cfg.replace(
      restore=os.path.join(train_cfg.results, 'box_ft'), num_steps=6)
  # Plain resume keeps the schedule position.
  exp2 = exp_lib.TrainingExperiment('box', model_cfg, restore, data_cfg)
  assert exp2.step == 4 and _adam_count(exp2.opt_state) == 4
  # Finetune restarts it: step 0, optimizer count 0 -> base_learn_rate.
  exp3 = exp_lib.TrainingExperiment(
      'box', model_cfg.replace(finetune=True), restore, data_cfg)
  assert exp3.step == 0 and _adam_count(exp3.opt_state) == 0
  from rec_attend_tpu.models.full_model import learn_rate
  np.testing.assert_allclose(float(learn_rate(model_cfg, 0)),
                             model_cfg.base_learn_rate, rtol=1e-6)


def test_eval_restore_tolerates_optimizer_mismatch(tmp_path):
  """A checkpoint saved under momentum must restore into an eval
  experiment whose current config says adam (the YAML snapshot beside the
  checkpoint supplies the real optimizer template)."""
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'fg', num_steps=2)
  model_cfg = model_cfg.replace(optimizer='momentum')
  exp = exp_lib.TrainingExperiment('fg', model_cfg, train_cfg, data_cfg)
  exp.run()

  eval_model_cfg = model_cfg.replace(optimizer='adam')
  train_cfg2 = train_cfg.replace(
      restore=os.path.join(train_cfg.results, 'fg_test'))
  ev = exp_lib.EvalExperiment('fg', eval_model_cfg, train_cfg2, data_cfg,
                              splits=('valid',))
  assert ev.step == 2
  np.testing.assert_allclose(
      np.asarray(ev.params['cnn'][0]['w']),
      np.asarray(exp.params['cnn'][0]['w']))


def test_eval_refuses_missing_checkpoint(tmp_path):
  """Eval/pack on a restore folder with NO ckpt must fail loudly instead
  of silently running the random init (a VM restore that wipes gitignored
  ckpt-*.npz would otherwise let a pack stage write random-model
  predictions into the dataset H5)."""
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'fg', num_steps=2)
  exp = exp_lib.TrainingExperiment('fg', model_cfg, train_cfg, data_cfg)
  exp.run()
  folder = os.path.join(train_cfg.results, 'fg_test')
  for f in os.listdir(folder):
    if f.startswith('ckpt-'):
      os.remove(os.path.join(folder, f))   # yaml snapshots survive

  train_cfg2 = train_cfg.replace(restore=folder)
  with pytest.raises(FileNotFoundError, match='refusing to eval'):
    exp_lib.EvalExperiment('fg', model_cfg, train_cfg2, data_cfg,
                           splits=('valid',))


def test_eval_restore_params_only_checkpoint(tmp_path):
  """A params-only npz (no opt_state) must still restore for eval."""
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'fg', num_steps=2)
  exp = exp_lib.TrainingExperiment('fg', model_cfg, train_cfg, data_cfg)
  exp.run()
  folder = os.path.join(train_cfg.results, 'fg_test')
  for f in os.listdir(folder):
    if f.startswith('ckpt-'):
      os.remove(os.path.join(folder, f))
  save_pytree(os.path.join(folder, 'ckpt-7.npz'), {'params': exp.params})

  train_cfg2 = train_cfg.replace(restore=folder)
  ev = exp_lib.EvalExperiment('fg', model_cfg, train_cfg2, data_cfg,
                              splits=('valid',))
  assert ev.step == 7
  np.testing.assert_allclose(
      np.asarray(ev.params['cnn'][0]['w']),
      np.asarray(exp.params['cnn'][0]['w']))


def test_training_device_resident_data(tmp_path):
  """device_data=True pins the split to device memory and gathers batches
  in-jit; the loop must train to completion and checkpoint normally."""
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'box', num_steps=4)
  train_cfg = train_cfg.replace(device_data=True, model_id='box_dev')
  exp = exp_lib.TrainingExperiment('box', model_cfg, train_cfg, data_cfg)
  assert exp.device_train_data is not None
  assert exp.device_train_data['x'].dtype == jnp.uint8
  n = exp.train_ds.get_dataset_size()
  assert exp.device_train_data['x'].shape[0] == n
  # Epoch sampler: two epochs' worth of indices cover every example twice.
  seen = np.concatenate([exp._next_train_idx(2) for _ in range(n)])
  assert np.bincount(seen, minlength=n).min() >= 1
  exp.run()
  assert exp.step == 4
  folder = os.path.join(train_cfg.results, 'box_dev')
  assert any(f.startswith('ckpt-') for f in os.listdir(folder))


def test_training_experiment_fg(tmp_path):
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'fg')
  exp = exp_lib.TrainingExperiment('fg', model_cfg, train_cfg, data_cfg)
  exp.run()
  assert exp.step == train_cfg.num_steps


def test_eval_experiment_iterates(tmp_path):
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'full', num_steps=2)
  exp = exp_lib.TrainingExperiment('full', model_cfg, train_cfg, data_cfg)
  exp.run()

  eval_train_cfg = train_cfg.replace(
      restore=os.path.join(train_cfg.results, 'full_test'))
  ev = exp_lib.EvalExperiment('full', model_cfg, eval_train_cfg, data_cfg,
                              splits=['valid'])
  total = 0
  for ds, raw, outputs in ev.iterate_split('valid', batch_size=2):
    assert outputs['y_out'].shape[1:] == (6, 32, 32)
    assert 'idx_map' in raw
    total += outputs['y_out'].shape[0]
  assert total == ds.get_dataset_size()


def test_saver_pytree_roundtrip(tmp_path):
  tree = {'a': np.arange(5.0), 'b': [np.ones((2, 2)), np.zeros(3)]}
  path = str(tmp_path / 'x.npz')
  save_pytree(path, tree)
  like = {'a': np.zeros(5), 'b': [np.zeros((2, 2)), np.ones(3)]}
  out = load_pytree(path, like)
  np.testing.assert_allclose(out['a'], tree['a'])
  np.testing.assert_allclose(out['b'][0], tree['b'][0])


def test_saver_max_to_keep(tmp_path):
  saver = Saver(str(tmp_path / 'run'), max_to_keep=2)
  for s in (1, 2, 3, 4):
    saver.save({'x': np.array([s])}, s)
  steps = [s for s, _ in saver.list_ckpts()]
  assert steps == [3, 4]
  tree, step = saver.restore({'x': np.zeros(1)})
  assert step == 4 and tree['x'][0] == 4


def test_training_cadences_disabled(tmp_path):
  """steps_per_valid/steps_per_trainval of 0 disable the cadence (they
  used to raise ZeroDivisionError in the train loop)."""
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'fg', num_steps=2)
  train_cfg = train_cfg.replace(steps_per_valid=0, steps_per_trainval=0,
                                steps_per_plot=0, save_ckpt=False)
  exp = exp_lib.TrainingExperiment('fg', model_cfg, train_cfg, data_cfg)
  exp.run()
  assert exp.step == 2


def test_make_data_config_restores_snapshot(tmp_path):
  """Eval/pack CLIs must see the dims the model was trained with: the
  data_opt.yaml beside the checkpoint wins over the dataset-name preset
  (a 224x224-trained synth model used to be evaluated at the 64x64
  preset and crash in the forward concat)."""
  import argparse
  import yaml
  from rec_attend_tpu.cli import args as A

  snap = {'dataset': 'synth', 'folder': 'data/big', 'height': 224,
          'width': 224, 'timespan': 21, 'num_examples': 256,
          'max_objects': 9}
  with open(tmp_path / 'data_opt.yaml', 'w') as f:
    yaml.safe_dump(snap, f)
  ns = argparse.Namespace(dataset='synth', dataset_folder=None)
  cfg = A.make_data_config(ns, restore=str(tmp_path))
  assert (cfg.height, cfg.width, cfg.timespan) == (224, 224, 21)
  assert cfg.folder == 'data/big'
  # explicit --dataset_folder still relocates
  ns = argparse.Namespace(dataset='synth', dataset_folder='/elsewhere')
  assert A.make_data_config(ns, restore=str(tmp_path)).folder == '/elsewhere'
  # no snapshot -> preset
  ns = argparse.Namespace(dataset='synth', dataset_folder=None)
  assert A.make_data_config(ns).height == 64
