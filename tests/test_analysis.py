"""Analysis suite tests: metric oracles on constructed cases, analyzer
streaming, renderers, postprocess pipeline."""

import os

import numpy as np
import pytest

from rec_attend_tpu import analysis
from rec_attend_tpu.utils import postprocess as pp


def _results_perfect(B=2, T=4, H=16, W=16, n_obj=2):
  """Predictions exactly equal GT."""
  rng = np.random.RandomState(0)
  y_gt = []
  for b in range(B):
    y = np.zeros((T, H, W), np.float32)
    y[0, 2:8, 2:8] = 1
    y[1, 10:14, 10:14] = 1
    y_gt.append(y)
  y_out = [y.copy() for y in y_gt]
  s_gt = np.zeros((B, T), np.float32)
  s_gt[:, :n_obj] = 1
  s_out = s_gt.copy()
  iou_pw = [analysis.f_iou_pairwise(a, b) for a, b in zip(y_out, y_gt)]
  return {'y_out': y_out, 'y_gt': y_gt, 's_out': s_out, 's_gt': s_gt,
          'iou_pairwise': iou_pw, 'indices': list(range(B))}


def test_perfect_prediction_metrics():
  r = _results_perfect()
  np.testing.assert_allclose(analysis.f_symmetric_best_dice(r), 1.0)
  np.testing.assert_allclose(analysis.f_wt_coverage(r), 1.0)
  np.testing.assert_allclose(analysis.f_unwt_coverage(r), 1.0)
  np.testing.assert_allclose(analysis.f_fg_iou(r), 1.0)
  np.testing.assert_allclose(analysis.f_fg_dice(r), 1.0)
  np.testing.assert_allclose(analysis.f_fp(r), 0.0)
  np.testing.assert_allclose(analysis.f_fn(r), 0.0)
  np.testing.assert_allclose(analysis.f_pixel_pr(r), 1.0)
  np.testing.assert_allclose(analysis.f_obj_pr(r), 1.0)
  np.testing.assert_allclose(analysis.f_count_acc(r), 1.0)
  np.testing.assert_allclose(analysis.f_dic(r), 0.0)
  np.testing.assert_allclose(analysis.f_ins_iou(r), 1.0)


def test_missed_instance_metrics():
  r = _results_perfect()
  # Remove the second prediction everywhere.
  for y in r['y_out']:
    y[1] = 0
  r['iou_pairwise'] = [analysis.f_iou_pairwise(a, b)
                       for a, b in zip(r['y_out'], r['y_gt'])]
  np.testing.assert_allclose(analysis.f_fn(r), 1.0)   # one GT unmatched
  np.testing.assert_allclose(analysis.f_dic(r), -1.0)
  sbd = analysis.f_symmetric_best_dice(r)
  assert np.all(sbd < 1.0) and np.all(sbd > 0.0)
  # unweighted coverage = (1 + 0) / 2
  np.testing.assert_allclose(analysis.f_unwt_coverage(r), 0.5)


def test_false_positive_metrics():
  r = _results_perfect()
  # Add a spurious prediction in an empty slot, disjoint from GT.
  for y in r['y_out']:
    y[2, 0:2, 14:16] = 1
  r['iou_pairwise'] = [analysis.f_iou_pairwise(a, b)
                       for a, b in zip(r['y_out'], r['y_gt'])]
  np.testing.assert_allclose(analysis.f_fp(r), 1.0)
  np.testing.assert_allclose(analysis.f_dic(r), 1.0)


def test_stats_analyzer_stream(tmp_path):
  fname = str(tmp_path / 'sbd.csv')
  a = analysis.create_analyzer('sbd', fname=fname)
  r = _results_perfect()
  a.stage(r)
  a.stage(r)
  mean, std = a.finalize()
  np.testing.assert_allclose(mean, 1.0)
  np.testing.assert_allclose(std, 0.0, atol=1e-6)
  lines = open(fname).read().strip().splitlines()
  assert lines[0] == 'ID,Score'
  assert len(lines) == 1 + 4 + 2  # header + 4 examples + mean/std


def test_fg_iou_all_analyzer():
  a = analysis.create_analyzer('fg_iou_all')
  b = analysis.create_analyzer('bg_iou_all')
  r = _results_perfect()
  a.stage(r)
  b.stage(r)
  iou, _ = a.finalize()
  biou, _ = b.finalize()
  np.testing.assert_allclose(iou, 1.0)
  np.testing.assert_allclose(biou, 1.0)


def test_render_instance(tmp_path):
  class FakeDS:
    def get_fname(self, idx):
      return f'{idx}.png'

  folder = str(tmp_path / 'render')
  a = analysis.RenderInstanceAnalyzer(folder, FakeDS())
  r = _results_perfect()
  a.stage(r)
  assert os.path.exists(os.path.join(folder, '0.png'))
  assert os.path.exists(os.path.join(folder, '1.png'))


def test_cityscapes_submission_writer(tmp_path):
  class FakeDS:
    def get_fname(self, idx):
      return f'city_{idx:06d}_000019_gtFine_instanceIds.png'

  folder = str(tmp_path / 'cs')
  a = analysis.RenderCityScapesOutputAnalyzer(folder, FakeDS())
  H = W = 16
  seg = np.zeros((2, H, W), np.float32)
  seg[0, 2:8, 2:8] = 1
  # semantic map: channel 3 (car) hot under the mask, low background
  fg = np.zeros((H, W, 9), np.float32)
  fg[..., 3] = 1.0
  a.stage({'y_out': [seg], 'y_in': [fg], 'conf': np.array([[0.9, 0.1]]),
           'indices': [7]})
  runfolder = os.path.join(folder, 'city')
  files = os.listdir(runfolder)
  assert any(f.endswith('.txt') for f in files)
  assert any(f.endswith('_000.png') for f in files)
  txt = [f for f in files if f.endswith('.txt')][0]
  line = open(os.path.join(runfolder, txt)).read().strip()
  parts = line.split()
  assert parts[1] == '26'  # car labelID
  assert float(parts[2]) == pytest.approx(0.9)


def test_postprocess_chain():
  rng = np.random.RandomState(0)
  B, T, H, W = 2, 3, 8, 8
  y_out = rng.rand(B, T, H, W).astype('float32')
  s_out = np.array([[0.9, 0.6, 0.2], [0.8, 0.3, 0.1]], np.float32)
  y_conf, s_hard = pp.apply_confidence(y_out, s_out)
  np.testing.assert_array_equal(s_hard, [[1, 1, 0], [1, 0, 0]])
  # one-label: each pixel claimed once
  y_list = [y_conf[i] for i in range(B)]
  y_one = pp.apply_one_label(y_list)
  claimed = np.stack([(y > 0).sum(axis=0) for y in y_one])
  assert claimed.max() <= 1
  # threshold + remove_tiny
  y_thr = pp.apply_threshold(y_one, 0.5)
  y_rt, s2 = pp.remove_tiny(y_thr, s_hard.copy(), threshold=64)
  for y in y_rt:
    assert y.sum() == 0  # everything smaller than 64 pixels is removed
  # upsample to 2x size
  y_gt_big = [np.zeros((T, 16, 16), np.float32) for _ in range(B)]
  y_up = pp.upsample(y_list, y_gt_big)
  assert y_up[0].shape == (T, 16, 16)
  # foreground masking
  fg = [np.zeros((8, 8), np.float32) for _ in range(B)]
  y_masked = pp.mask_foreground(y_list, fg)
  assert sum(y.sum() for y in y_masked) == 0
