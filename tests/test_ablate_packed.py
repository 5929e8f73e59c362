"""ablate_packed.py — packed-channel ablation twin runner.

Plumbing-level tests (the training itself is engine-tested elsewhere):
the twin config flips add_d_out/add_y_out off, the twin id is derived by
prefix substitution, and --resume restores from the twin's own latest
checkpoint so a watchdog relaunch or killed queue never restarts a long
run from scratch.
"""

import json
import os

import numpy as np
import yaml

from rec_attend_tpu import config as C
from pipelines import ablate_packed


def _make_baseline(results, logs, mid):
  folder = os.path.join(results, mid)
  os.makedirs(folder, exist_ok=True)
  data_cfg = C.DataConfig(dataset='synth', height=64, width=64,
                          timespan=6, num_examples=8, max_objects=4)
  box_cfg = C.tiny_box_config(timespan=6, add_d_out=True, add_y_out=True)
  with open(os.path.join(folder, 'data_opt.yaml'), 'w') as f:
    yaml.safe_dump(data_cfg.to_dict(), f)
  with open(os.path.join(folder, 'model_opt.yaml'), 'w') as f:
    yaml.safe_dump(box_cfg.to_dict(), f)
  for m in (mid, mid.replace('box_model_', 'box_model_nofg_')):
    os.makedirs(os.path.join(logs, m), exist_ok=True)
    with open(os.path.join(logs, m, 'loss.csv'), 'w') as f:
      f.write('step,time,train loss,valid loss\n2,t,-0.5,\n')
    with open(os.path.join(logs, m, 'iou_soft_box.csv'), 'w') as f:
      f.write('step,time,train,valid\n2,t,0.5,0.4\n')


def test_ablate_twin_config_and_resume_plumbing(tmp_path, monkeypatch):
  results, logs = str(tmp_path / 'res'), str(tmp_path / 'logs')
  _make_baseline(results, logs, 'box_model_synthx')
  captured = {}

  class FakeExperiment:
    def __init__(self, kind, model_cfg, train_cfg, data_cfg):
      captured['kind'] = kind
      captured['model_cfg'] = model_cfg
      captured['train_cfg'] = train_cfg

    def run(self):
      pass

  monkeypatch.setattr(ablate_packed, 'TrainingExperiment', FakeExperiment)
  argv = ['--baseline_id', 'box_model_synthx', '--results', results,
          '--logs', logs, '--steps', '4', '--batch_size', '2']

  table = ablate_packed.main(argv)
  assert captured['kind'] == 'box'
  assert not captured['model_cfg'].add_d_out
  assert not captured['model_cfg'].add_y_out
  assert captured['train_cfg'].model_id == 'box_model_nofg_synthx'
  # no --resume: train from scratch even if a ckpt exists
  assert captured['train_cfg'].restore is None
  assert table['with_packed']['final_loss_tail5'] == -0.5
  assert os.path.exists(os.path.join(
      results, 'box_model_nofg_synthx', 'ablation.json'))

  # --resume without a checkpoint: still from scratch (restore folder
  # without ckpts would be refused by the engine)
  ablate_packed.main(argv + ['--resume'])
  assert captured['train_cfg'].restore is None

  # --resume with a twin checkpoint present: restore from the twin folder
  twin = os.path.join(results, 'box_model_nofg_synthx')
  np.savez(os.path.join(twin, 'ckpt-2.npz'), step=2)
  ablate_packed.main(argv + ['--resume'])
  assert captured['train_cfg'].restore == twin
