"""End-to-end tests of the model-free full-resolution Cityscapes eval CLI
(``cli/cityscapes_eval.py``) on packed synthetic data.

Covers the seams the reference's ``cityscapes_eval.py:101-266`` exercises:
batch-size-1 full-size reads, the packed-foreground branch, the external
LRR ``.mat`` semantic-segmentation branch, remove-tiny conf zeroing, the
submission renderer, and --split_id/--num_split worker sharding.  No model
is built — predictions are packed into the H5 directly."""

import glob
import os
import sys

import h5py
import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rec_attend_tpu import config as C
from rec_attend_tpu.cli import cityscapes_eval as cs_cli
from rec_attend_tpu.data import provider
from rec_attend_tpu.data.dataset import pack_predictions

NSC = 2          # instance classes; +1 background channel in predictions
T = 6


@pytest.fixture(scope='module')
def packed(tmp_path_factory):
  """Synthetic multiclass valid split with GT-perfect packed predictions."""
  tmp = tmp_path_factory.mktemp('cseval')
  folder = str(tmp / 'data')
  data_cfg = C.DataConfig(dataset='synth', folder=folder, height=64,
                          width=64, timespan=T, num_examples=32,
                          max_objects=4, num_semantic_classes=NSC)
  ds = provider.get('synth', data_cfg, split='valid')
  n = ds.get_dataset_size()
  # pack GT as predictions (per image): instance masks, semantic fg, score
  for pos in range(n):
    batch = ds.get_batch([pos], timespan=T,
                         variables={'y_gt', 'c_gt', 's_gt', 'idx_map'})
    sid = ds.get_str_id(batch['idx_map'][0])
    inst = batch['y_gt'][0]                        # [T, H, W]
    fg = batch['c_gt'][0]                          # [H, W, NSC+1]
    score = batch['s_gt'][0] * 0.9                 # confident where real
    ori = np.zeros(fg.shape[:2] + (8,), 'float32')
    ori[..., 0] = 1.0
    pack_predictions(ds.h5_fname, sid, foreground=fg, orientation=ori,
                     instance=inst, score=score)
  ds.clear_cache()

  # fake results/<id>/data_opt.yaml so the CLI's restore path finds the
  # multiclass DataConfig (there are no CLI flags for the synth gen knobs)
  results = str(tmp / 'results')
  model_dir = os.path.join(results, 'packed_model')
  os.makedirs(model_dir)
  with open(os.path.join(model_dir, 'data_opt.yaml'), 'w') as f:
    yaml.safe_dump(data_cfg.to_dict(), f)
  return tmp, folder, results, data_cfg, n


def _txts(folder):
  return sorted(glob.glob(os.path.join(folder, 'cityscapes', '**',
                                       '*.txt'), recursive=True))


def test_packed_fg_branch_with_sharding(packed):
  tmp, folder, results, data_cfg, n = packed
  outs = []
  for split_id in (0, 1):
    out = os.path.join(str(tmp), f'out_shard{split_id}')
    cs_cli.main(['--model_id', 'packed_model', '--results', results,
                 '--dataset', 'synth', '--dataset_folder', folder,
                 '--split', 'valid', '--output', out,
                 '--remove_tiny', '20', '--analyzers', 'sbd',
                 '--split_id', str(split_id), '--num_split', '2'])
    outs.append(_txts(out))
  # the two workers cover disjoint halves summing to the whole split
  assert len(outs[0]) + len(outs[1]) == n
  assert not set(map(os.path.basename, outs[0])) & \
      set(map(os.path.basename, outs[1]))
  # GT-perfect packed predictions with GT fg masking -> near-perfect SBD
  sbd_csv = os.path.join(str(tmp), 'out_shard0', 'sbd.csv')
  trailer = [l for l in open(sbd_csv) if l.startswith('Mean,')]
  assert trailer and float(trailer[0].split(',')[1]) > 0.9
  # submission lines carry labelID from the packed semantic channels
  lines = [l.split() for txt in outs[0] for l in open(txt)]
  assert lines
  assert {int(l[1]) for l in lines} <= {24, 25}   # person/rider table rows


def test_lrr_mat_branch(packed):
  tmp, folder, results, data_cfg, n = packed
  import scipy.io
  ds = provider.get('synth', data_cfg, split='valid')
  lrr = str(tmp / 'lrr')
  # synthesize {lrr}/val/{run}/{idx}_ss.mat semantic predictions from GT
  for pos in range(n):
    batch = ds.get_batch([pos], timespan=T,
                         variables={'c_gt', 'idx_map'})
    idx = batch['idx_map'][0]
    run = idx.split('_')[0]
    os.makedirs(os.path.join(lrr, 'val', run), exist_ok=True)
    c = batch['c_gt'][0]                           # [H, W, NSC+1]
    sem = np.zeros(c.shape[:2], np.uint8)
    for cc in range(NSC):
      sem[c[:, :, cc + 1] > 0.5] = cs_cli.LRR_SEM_IDS[cc]
    scipy.io.savemat(os.path.join(lrr, 'val', run, f'{idx}_ss.mat'),
                     {'semanticPrediction': sem})
  out = os.path.join(str(tmp), 'out_lrr')
  cs_cli.main(['--model_id', 'packed_model', '--results', results,
               '--dataset', 'synth', '--dataset_folder', folder,
               '--split', 'valid', '--output', out,
               '--remove_tiny', '20', '--analyzers', 'sbd',
               '--lrr_seg', '--lrr_folder', lrr])
  txts = _txts(out)
  assert len(txts) == n
  lines = [l.split() for txt in txts for l in open(txt)]
  assert lines
  # LRR one-hot channels drive the class decision through the same table
  assert {int(l[1]) for l in lines} <= {24, 25}
  sbd_csv = os.path.join(out, 'sbd.csv')
  trailer = [l for l in open(sbd_csv) if l.startswith('Mean,')]
  assert trailer and float(trailer[0].split(',')[1]) > 0.9


def test_remove_tiny_zeroes_conf(packed):
  """remove_tiny must drop sub-threshold regions AND zero their conf so
  they vanish from the submission txt (ref postprocess.py:109-134)."""
  tmp, folder, results, data_cfg, n = packed
  out = os.path.join(str(tmp), 'out_tiny')
  cs_cli.main(['--model_id', 'packed_model', '--results', results,
               '--dataset', 'synth', '--dataset_folder', folder,
               '--split', 'valid', '--output', out,
               '--remove_tiny', '100000',    # larger than any instance
               '--analyzers', '', '--no_iou'])
  lines = [l for txt in _txts(out) for l in open(txt)]
  assert lines == []                         # everything removed
