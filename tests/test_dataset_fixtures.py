"""Real-archive layout fixtures for the three external datasets.

The actual CVPPP/KITTI/Cityscapes archives are unobtainable in this
environment, so these tests build tiny in-repo directory trees mimicking
the REAL layouts (ref data_api/cvppp.py:65-102 plant regex + split txts,
kitti.py:13-78 images/gt/gt_man folders, cityscapes.py:88-119
leftImg8bit/gtFine city walks with instanceIds PNGs) and drive the real
user entry points over them: ``setup_dataset.py`` -> assembler -> H5 ->
dataset ``get_batch`` -> one training step.  A first run on real data
exercises exactly this code.
"""

import os
import sys

import cv2
import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import setup_dataset  # noqa: E402
from rec_attend_tpu import config as C  # noqa: E402
from rec_attend_tpu.data import provider  # noqa: E402
from rec_attend_tpu.engine.experiment import TrainingExperiment  # noqa: E402

H = W = 48   # raw fixture image size (assembler resizes to --height/width)


def _run_setup(argv):
  old = sys.argv
  sys.argv = ['setup_dataset'] + argv
  try:
    setup_dataset.main()
  finally:
    sys.argv = old


def _ellipse(h, w, cy, cx, ry, rx, value=1, img=None, dtype=np.uint8):
  m = np.zeros((h, w), dtype) if img is None else img
  cv2.ellipse(m, (cx, cy), (rx, ry), 0, 0, 360, int(value), -1)
  return m


def _train_one_step(data_cfg, tmp_path, num_classes=1):
  """Two fg-model steps through the standard engine on the assembled H5."""
  fg_cfg = C.tiny_fg_config(num_semantic_classes=num_classes,
                            dcnn_depth=(8, 4, num_classes)
                            if num_classes > 1 else (8, 4, 1))
  train_cfg = C.TrainConfig(model_id=f'fixture_{data_cfg.dataset}',
                            num_steps=2, batch_size=2, save_ckpt=False,
                            steps_per_valid=0, steps_per_trainval=0,
                            steps_per_plot=0,
                            results=str(tmp_path / 'res'),
                            logs=str(tmp_path / 'logs'))
  TrainingExperiment('fg', fg_cfg, train_cfg, data_cfg).run()


# ---------------------------------------------------------------------------
# CVPPP: flat folder of plantNNN_{rgb,label,fg}.png
# ---------------------------------------------------------------------------


def test_cvppp_fixture_layout(tmp_path):
  folder = str(tmp_path / 'A1')
  os.makedirs(folder)
  rng = np.random.RandomState(0)
  for pid in range(1, 6):
    rgb = (rng.rand(H, W, 3) * 80 + 40).astype(np.uint8)
    label = np.zeros((H, W, 3), np.uint8)
    # leaves as distinct colours (colour-label separation, sep_labels)
    for k in range(3):
      colour = [(200, 40, 40), (40, 200, 40), (40, 40, 200)][k]
      m = _ellipse(H, W, 12 + 10 * k, 12 + 10 * k, 6, 9)
      label[m > 0] = colour
      rgb[m > 0] = colour
    fg = ((label.max(axis=2) > 0) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(folder, f'plant{pid:03d}_rgb.png'), rgb)
    cv2.imwrite(os.path.join(folder, f'plant{pid:03d}_label.png'), label)
    cv2.imwrite(os.path.join(folder, f'plant{pid:03d}_fg.png'), fg)

  _run_setup(['--dataset', 'cvppp', '--folder', folder,
              '--splits', 'train,valid', '--height', '64', '--width', '64'])

  # deterministic 80/20 split txts written (seed 2)
  assert os.path.exists(os.path.join(folder, 'train.txt'))
  assert os.path.exists(os.path.join(folder, 'valid.txt'))
  with open(os.path.join(folder, 'train.txt')) as f:
    assert len(f.read().split()) == 4   # ceil(5 * 0.8)

  with h5py.File(os.path.join(folder, 'train_64x64.h5'), 'r') as f:
    ids = [k for k in f if k != 'index_map']
    assert len(ids) == 4
    grp = f[ids[0]]
    assert 'label_segmentation' in grp and 'input_full_size' in grp
    assert len(grp['label_segmentation']) == 3   # 3 leaves

  data_cfg = C.DataConfig(dataset='cvppp', folder=folder, height=64,
                          width=64, timespan=6)
  ds = provider.get('cvppp', data_cfg, split='train')
  batch = ds.get_batch([0, 1], timespan=6,
                       variables={'x', 'y_gt', 's_gt', 'c_gt', 'idx_map'})
  assert batch['x'].shape == (2, 64, 64, 3)
  assert batch['y_gt'].shape == (2, 6, 64, 64)
  assert batch['s_gt'][0].sum() == 3
  _train_one_step(data_cfg, tmp_path)


# ---------------------------------------------------------------------------
# KITTI: images/ + gt/ + gt_man/ + {split}.txt id lists
# ---------------------------------------------------------------------------


def test_kitti_fixture_layout(tmp_path):
  folder = str(tmp_path / 'kitti')
  for sub in ('images', 'gt', 'gt_man'):
    os.makedirs(os.path.join(folder, sub))
  rng = np.random.RandomState(1)
  for iid in range(4):
    img = (rng.rand(H, W * 3, 3) * 80 + 40).astype(np.uint8)
    gt = np.zeros((H, W * 3, 3), np.uint8)
    for k in range(2):
      m = _ellipse(H, W * 3, 20, 30 + 50 * k, 8, 14)
      gt[m > 0] = [(120, 60, 30), (30, 120, 200)][k]
    cv2.imwrite(os.path.join(folder, 'images', f'{iid:06d}.png'), img)
    cv2.imwrite(os.path.join(folder, 'gt', f'{iid:06d}.png'), gt)
    cv2.imwrite(os.path.join(folder, 'gt_man', f'{iid:06d}.png'), gt)
  with open(os.path.join(folder, 'train.txt'), 'w') as f:
    f.write('0\n1\n2\n')
  with open(os.path.join(folder, 'valid.txt'), 'w') as f:
    f.write('3\n')
  with open(os.path.join(folder, 'valid_man.txt'), 'w') as f:
    f.write('3\n')

  _run_setup(['--dataset', 'kitti', '--folder', folder,
              '--splits', 'train,valid,valid_man',
              '--height', '32', '--width', '96'])

  with h5py.File(os.path.join(folder, 'train_32x96.h5'), 'r') as f:
    ids = [k for k in f if k != 'index_map']
    assert ids == ['000000', '000001', '000002']
    assert len(f[ids[0]]['label_segmentation']) == 2
  # gt_man split assembled from the manual-annotation folder
  assert os.path.exists(os.path.join(folder, 'valid_man_32x96.h5'))

  data_cfg = C.DataConfig(dataset='kitti', folder=folder, height=32,
                          width=96, timespan=5)
  ds = provider.get('kitti', data_cfg, split='train')
  batch = ds.get_batch([0, 1, 2], timespan=5,
                       variables={'x', 'y_gt', 's_gt', 'idx_map'})
  assert batch['x'].shape == (3, 32, 96, 3)
  assert batch['s_gt'].sum(axis=1).tolist() == [2, 2, 2]
  _train_one_step(data_cfg, tmp_path)


# ---------------------------------------------------------------------------
# Cityscapes: leftImg8bit/{split}/{city}/ + gtFine instanceIds PNGs
# ---------------------------------------------------------------------------


def test_cityscapes_fixture_layout(tmp_path):
  folder = str(tmp_path / 'cs')
  cities = {'train': ['aachen', 'bochum'], 'val': ['frankfurt']}
  rng = np.random.RandomState(2)
  for split, cc in cities.items():
    for city in cc:
      os.makedirs(os.path.join(folder, 'leftImg8bit', split, city))
      os.makedirs(os.path.join(folder, 'gtFine', split, city))
      for seq in range(2):
        stem = f'{city}_{seq:06d}_000019'
        img = (rng.rand(H, W * 2, 3) * 80 + 40).astype(np.uint8)
        gt = np.full((H, W * 2), 7, np.uint16)          # road background
        gt[:10, :10] = 0                                 # void region
        # two cars + one person (ids > 1000 => instances)
        gt = _ellipse(H, W * 2, 20, 20, 7, 10, 26000, gt, np.uint16)
        gt = _ellipse(H, W * 2, 20, 50, 7, 10, 26001, gt, np.uint16)
        gt = _ellipse(H, W * 2, 30, 75, 9, 5, 24000, gt, np.uint16)
        gt = _ellipse(H, W * 2, 5, 80, 3, 6, 23, gt, np.uint16)  # sky: stuff
        cv2.imwrite(os.path.join(folder, 'leftImg8bit', split, city,
                                 f'{stem}_leftImg8bit.png'), img)
        cv2.imwrite(os.path.join(folder, 'gtFine', split, city,
                                 f'{stem}_gtFine_instanceIds.png'), gt)

  _run_setup(['--dataset', 'cityscapes', '--folder', folder,
              '--splits', 'train,valid', '--height', '32', '--width', '64'])

  with h5py.File(os.path.join(folder, 'train_32x64.h5'), 'r') as f:
    ids = [k for k in f if k != 'index_map']
    assert len(ids) == 4    # 2 cities x 2 frames
    assert ids[0].startswith('aachen_')
    grp = f[ids[0]]
    # stuff classes (road/sky/void) are NOT instances
    assert len(grp['label_segmentation']) == 3
    classes = grp['instance_semantic_classes'][:]
    # trainId-1: car = 2, person = 0 (cityscapes_labels table)
    assert sorted(classes.tolist()) == [0, 2, 2]
  assert os.path.exists(os.path.join(folder, 'valid_32x64.h5'))

  data_cfg = C.DataConfig(dataset='cityscapes', folder=folder, height=32,
                          width=64, timespan=5, num_semantic_classes=8)
  ds = provider.get('cityscapes', data_cfg, split='train')
  assert ds.get_num_semantic_classes() == 8
  batch = ds.get_batch([0, 1], timespan=5,
                       variables={'x', 'y_gt', 's_gt', 'c_gt', 'd_gt',
                                  'idx_map'})
  assert batch['x'].shape == (2, 32, 64, 3)
  assert batch['c_gt'].shape == (2, 32, 64, 9)
  # semantic channels: 1+2=person channel, 1+... car channel populated
  assert batch['c_gt'][0, :, :, 3].max() == 1.0    # car (trainId 3)
  assert batch['c_gt'][0, :, :, 1].max() == 1.0    # person (trainId 1)
  assert batch['s_gt'][0].sum() == 3
  # per-example coarse-data weights default to fine
  assert batch['sem_weights'].tolist() == [1.0, 1.0]
  _train_one_step(data_cfg, tmp_path, num_classes=9)
