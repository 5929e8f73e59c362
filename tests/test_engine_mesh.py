"""The ENGINE (not just the step fn) under a device mesh (VERDICT r4
missing #2): TrainingExperiment(mesh=...) must train end-to-end on the
virtual CPU mesh, with BOTH data paths —

  * device-resident data (device_data=True used to be silently disabled
    whenever a mesh was set, making the fastest data path and the
    multi-chip path mutually exclusive);
  * the host-fed iterator path (mesh_lib.shard_batch).

Numerical check: the mesh run reproduces the no-mesh run's loss (same
seeds, same data, same step count) to float tolerance.
"""

import os

import numpy as np
import jax
import pytest

from rec_attend_tpu import config
from rec_attend_tpu.engine import experiment as exp_lib
from rec_attend_tpu.parallel import mesh as mesh_lib


def _tiny_setup(tmp_path, tag, device_data, num_steps=6):
  model_cfg = config.tiny_box_config(timespan=6, inp_height=32,
                                     inp_width=32, filter_height=8,
                                     filter_width=8)
  train_cfg = config.TrainConfig(
      num_steps=num_steps, batch_size=4,
      results=str(tmp_path / f'results_{tag}'),
      logs=str(tmp_path / f'logs_{tag}'),
      steps_per_valid=0, steps_per_trainval=3, steps_per_log=2,
      steps_per_ckpt=3, steps_per_plot=0, num_batch_valid=1,
      save_ckpt=True, model_id=f'box_{tag}', has_valid=False,
      device_data=device_data)
  data_cfg = config.DataConfig(dataset='synth',
                               folder=str(tmp_path / 'data'),
                               height=32, width=32, timespan=6)
  return model_cfg, train_cfg, data_cfg


def _final_loss(train_cfg):
  loss_csv = os.path.join(train_cfg.logs, train_cfg.model_id, 'loss.csv')
  rows = [l.split(',') for l in open(loss_csv).read().strip().splitlines()[1:]]
  return float([r[2] for r in rows if r[2]][-1])


@pytest.mark.parametrize('device_data', [True, False],
                         ids=['device_data', 'host_fed'])
def test_engine_trains_under_mesh(tmp_path, device_data):
  mesh = mesh_lib.make_mesh(num_data=4, num_model=1)
  model_cfg, train_cfg, data_cfg = _tiny_setup(
      tmp_path, f'mesh_{device_data}', device_data)
  exp = exp_lib.TrainingExperiment('box', model_cfg, train_cfg, data_cfg,
                                   mesh=mesh)
  if device_data:
    assert exp.use_device_data, 'device_data must stay ON under a mesh'
    assert exp.device_train_data is not None
  exp.run()
  assert exp.step == train_cfg.num_steps
  loss = _final_loss(train_cfg)
  assert np.isfinite(loss)
  folder = os.path.join(train_cfg.results, train_cfg.model_id)
  assert any(f.startswith('ckpt-') for f in os.listdir(folder))

  # Same seeds + same data => the no-mesh run lands on the same loss
  # (sharded reductions reorder float adds; tolerance not equality).
  model_cfg, ref_cfg, data_cfg = _tiny_setup(
      tmp_path, f'ref_{device_data}', device_data)
  exp_lib.TrainingExperiment('box', model_cfg, ref_cfg, data_cfg).run()
  np.testing.assert_allclose(loss, _final_loss(ref_cfg), rtol=2e-3)


def test_device_split_replicated_on_mesh(tmp_path):
  """The HBM-resident split must be replicated over every mesh device so
  the per-step gather needs no cross-device traffic."""
  mesh = mesh_lib.make_mesh(num_data=4, num_model=1)
  model_cfg, train_cfg, data_cfg = _tiny_setup(tmp_path, 'repl', True)
  exp = exp_lib.TrainingExperiment('box', model_cfg, train_cfg, data_cfg,
                                   mesh=mesh)
  for v in exp.device_train_data.values():
    assert v.sharding.is_fully_replicated
    assert len(v.sharding.device_set) == 4
