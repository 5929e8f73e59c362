"""Cityscapes official-eval tests: AP algorithm oracle cases, pixel IoU via
the native confusion kernel, end-to-end txt/PNG submission parsing."""

import os

import cv2
import numpy as np
import pytest

from rec_attend_tpu.eval_cityscapes import instance_eval as IE
from rec_attend_tpu.eval_cityscapes.pixel_eval import PixelEvaluator


def _write_case(tmp_path, preds):
  """Build one gt image (two cars id 26001/26002 + a void strip) and a
  prediction txt with the given (mask, conf) list."""
  h = w = 128
  gt = np.zeros((h, w), np.int32)
  gt[:, :8] = 4                  # 'static' -> void/ignore
  gt[20:60, 20:60] = 26001       # car instance, 1600 px
  gt[70:110, 70:110] = 26002     # car instance, 1600 px
  gt_file = str(tmp_path / 'frankfurt_000000_000001_gtFine_instanceIds.png')
  cv2.imwrite(gt_file, gt.astype(np.uint16))

  pred_dir = tmp_path / 'preds' / 'frankfurt'
  os.makedirs(pred_dir, exist_ok=True)
  txt = pred_dir / 'frankfurt_000000_000001_pred.txt'
  with open(txt, 'w') as f:
    for i, (mask, label_id, conf) in enumerate(preds):
      name = f'mask_{i:03d}.png'
      cv2.imwrite(str(pred_dir / name), (mask * 255).astype(np.uint8))
      f.write(f'{name} {label_id} {conf}\n')
  return str(txt), gt_file


def test_ap_perfect_predictions(tmp_path):
  h = w = 128
  m1 = np.zeros((h, w), np.uint8)
  m1[20:60, 20:60] = 1
  m2 = np.zeros((h, w), np.uint8)
  m2[70:110, 70:110] = 1
  txt, gt = _write_case(tmp_path, [(m1, 26, 0.9), (m2, 26, 0.8)])
  avg = IE.evaluate_instance_predictions([txt], [gt], quiet=True)
  np.testing.assert_allclose(avg['allAp'], 1.0)
  np.testing.assert_allclose(avg['allAp50%'], 1.0)
  np.testing.assert_allclose(avg['classes']['car']['ap'], 1.0)


def test_ap_half_matched_with_fp(tmp_path):
  """One perfect match (conf .9), one disjoint FP (conf .8), one missed gt:
  hand-computed AP = 0.5 at every overlap."""
  h = w = 128
  m1 = np.zeros((h, w), np.uint8)
  m1[20:60, 20:60] = 1
  fp = np.zeros((h, w), np.uint8)
  fp[10:40, 90:120] = 1          # overlaps neither gt nor void
  txt, gt = _write_case(tmp_path, [(m1, 26, 0.9), (fp, 26, 0.8)])
  avg = IE.evaluate_instance_predictions([txt], [gt], quiet=True)
  np.testing.assert_allclose(avg['allAp'], 0.5, atol=1e-6)
  np.testing.assert_allclose(avg['classes']['car']['ap50%'], 0.5, atol=1e-6)


def test_ap_void_overlapping_fp_is_ignored(tmp_path):
  """A false positive mostly inside the void strip must be ignored."""
  h = w = 128
  m1 = np.zeros((h, w), np.uint8)
  m1[20:60, 20:60] = 1
  m2 = np.zeros((h, w), np.uint8)
  m2[70:110, 70:110] = 1
  void_fp = np.zeros((h, w), np.uint8)
  void_fp[0:30, 0:8] = 1         # fully inside the void strip
  txt, gt = _write_case(tmp_path,
                        [(m1, 26, 0.9), (m2, 26, 0.85), (void_fp, 26, 0.8)])
  avg = IE.evaluate_instance_predictions([txt], [gt], quiet=True)
  np.testing.assert_allclose(avg['allAp'], 1.0)


def test_ap_low_overlap_drops_at_high_threshold(tmp_path):
  """A 60%-IoU match counts at overlap 0.5/0.55 but not at 0.9."""
  h = w = 128
  m1 = np.zeros((h, w), np.uint8)
  m1[20:60, 20:52] = 1           # 40x32 inside the 40x40 gt: IoU = 0.8
  m2 = np.zeros((h, w), np.uint8)
  m2[70:110, 70:110] = 1
  txt, gt = _write_case(tmp_path, [(m1, 26, 0.9), (m2, 26, 0.8)])
  avg = IE.evaluate_instance_predictions([txt], [gt], quiet=True)
  # IoU=0.8: matched for overlaps < 0.8 (7 of 10), unmatched above.
  assert avg['allAp50%'] == pytest.approx(1.0)
  assert 0.5 < avg['allAp'] < 1.0


def test_gt_instance_extraction():
  gt = np.zeros((32, 32), np.int64)
  gt[0:8, 0:8] = 26001
  gt[10:18, 10:18] = 24003
  gt[20:22, 20:22] = 26          # car group region
  inst = IE.get_gt_instances(gt)
  assert len(inst['car']) == 2   # instance + group
  assert len(inst['person']) == 1
  ids = sorted(i['instID'] for i in inst['car'])
  assert ids == [26, 26001]


def test_pixel_evaluator():
  ev = PixelEvaluator()
  gt = np.full((64, 64), 7, np.uint8)     # road
  gt[:32] = 26                            # car
  pred = gt.copy()
  pred[:8] = 7                            # misslabel some car as road
  ev.add_pair(pred, gt)
  result = ev.finalize()
  np.testing.assert_allclose(result['classes']['car'], 24 / 32)
  # road FP includes the 8 rows of mislabelled car
  np.testing.assert_allclose(result['classes']['road'],
                             32 / (32 + 8))


def _disp_value(distance_m):
  """Invert the official disparity encoding for a target distance."""
  d = IE.NOMINAL_BASELINE * IE.NOMINAL_FX / distance_m
  return int(round(d * 256.0 + 1.0))


def test_disparity_to_distance_roundtrip():
  disp = np.zeros((4, 4), np.uint16)
  disp[0, 0] = _disp_value(20.0)
  disp[0, 1] = _disp_value(150.0)
  dist = IE.disparity_to_distance(disp)
  np.testing.assert_allclose(dist[0, 0], 20.0, rtol=1e-2)
  np.testing.assert_allclose(dist[0, 1], 150.0, rtol=1e-2)
  assert np.isnan(dist[1, 1])   # p == 0 is invalid


def test_ap_distance_rows(tmp_path):
  """Near car (20m) + far car (150m), both predicted perfectly:
  AP=1 everywhere — the far gt is excluded from the 100m/50m rows and its
  unmatched prediction is ignored (overlaps the excluded gt)."""
  h = w = 128
  m1 = np.zeros((h, w), np.uint8)
  m1[20:60, 20:60] = 1           # near car, 1600 px (>= 1000 min size)
  m2 = np.zeros((h, w), np.uint8)
  m2[70:110, 70:110] = 1         # far car
  txt, gt = _write_case(tmp_path, [(m1, 26, 0.9), (m2, 26, 0.8)])

  disp = np.zeros((h, w), np.uint16)
  disp[20:60, 20:60] = _disp_value(20.0)
  disp[70:110, 70:110] = _disp_value(150.0)
  disp_file = str(tmp_path / 'disparity.png')
  cv2.imwrite(disp_file, disp)

  avg = IE.evaluate_instance_predictions([txt], [gt], quiet=True,
                                         distance_files=[disp_file])
  np.testing.assert_allclose(avg['allAp'], 1.0)
  np.testing.assert_allclose(avg['allAp100m'], 1.0)
  np.testing.assert_allclose(avg['allAp50m'], 1.0)


def test_ap_distance_low_conf_instance_excluded(tmp_path):
  """An instance whose disparity is <50% valid fails the distConf filter:
  with no valid gt left the 100m row has no positives, and the (ignored)
  predictions keep it NaN-free via the overlap rule."""
  h = w = 128
  m1 = np.zeros((h, w), np.uint8)
  m1[20:60, 20:60] = 1
  txt, gt_file = _write_case(tmp_path, [(m1, 26, 0.9)])
  # Rewrite gt to a single car; disparity valid on only 40% of its pixels.
  gt = np.zeros((h, w), np.int32)
  gt[20:60, 20:60] = 26001
  cv2.imwrite(gt_file, gt.astype(np.uint16))
  disp = np.zeros((h, w), np.uint16)
  disp[20:36, 20:60] = _disp_value(20.0)   # 16/40 rows valid = 40%
  disp_file = str(tmp_path / 'disparity.png')
  cv2.imwrite(disp_file, disp)

  avg = IE.evaluate_instance_predictions([txt], [gt_file], quiet=True,
                                         distance_files=[disp_file])
  np.testing.assert_allclose(avg['allAp'], 1.0)
  # 100m row: the only gt is excluded (distConf 0.4 < 0.5) and the
  # prediction ignored -> no gt, no counted pred -> NaN -> nanmean -> NaN
  assert np.isnan(avg['allAp100m'])


def test_pixel_evaluator_inst_iou_and_categories():
  """Hand-computed iIoU: a perfectly-predicted 400px car + a fully-missed
  100px car weight equally in iIoU (0.5) but not in IoU (0.8)."""
  from rec_attend_tpu.eval_cityscapes.pixel_eval import AVG_CLASS_SIZE
  ev = PixelEvaluator()
  h = w = 64
  gt = np.full((h, w), 7, np.uint8)        # road
  inst = np.zeros((h, w), np.int32)
  gt[0:10, 0:10] = 26                      # car A (100 px)
  inst[0:10, 0:10] = 26001
  gt[20:40, 20:40] = 26                    # car B (400 px)
  inst[20:40, 20:40] = 26002
  pred = np.full((h, w), 7, np.uint8)
  pred[20:40, 20:40] = 26                  # only B predicted
  ev.add_pair(pred, gt, instance_img=inst)
  result = ev.finalize()

  np.testing.assert_allclose(result['classes']['car'], 400 / 500)
  # iIoU: tpW = 400*avg/400 = avg, fnW = 100*avg/100 = avg, fp = 0 -> 0.5
  np.testing.assert_allclose(result['classesInst']['car'], 0.5)
  np.testing.assert_allclose(result['classes']['road'], 3596 / 3696)
  # road has no instances -> nan in the instance column
  assert np.isnan(result['classesInst']['road'])
  np.testing.assert_allclose(result['categories']['vehicle'], 400 / 500)
  np.testing.assert_allclose(result['categoriesInst']['vehicle'], 0.5)
  np.testing.assert_allclose(result['categories']['flat'], 3596 / 3696)
  assert np.isnan(result['categoriesInst'].get('flat', float('nan')))
  assert not np.isnan(result['meanInstIoU'])
  assert not np.isnan(result['meanCategoryInstIoU'])
  # sanity: the weighting constant actually cancelled
  assert AVG_CLASS_SIZE['car'] > 0


def test_pixel_evaluator_without_instances_matches_legacy():
  """No instance image -> instance scores are nan, IoU path unchanged."""
  ev = PixelEvaluator()
  gt = np.full((64, 64), 7, np.uint8)
  gt[:32] = 26
  pred = gt.copy()
  ev.add_pair(pred, gt)
  result = ev.finalize()
  np.testing.assert_allclose(result['classes']['car'], 1.0)
  assert np.isnan(result['classesInst']['car'])
  assert np.isnan(result['meanInstIoU'])


def test_pixel_eval_cli_end_to_end(tmp_path):
  """Full pixel-eval driver over files produced by the preparation twin."""
  import json as json_lib
  from rec_attend_tpu.data import cityscapes_prep as prep
  from rec_attend_tpu.eval_cityscapes import pixel_eval

  root = tmp_path / 'cs'
  gt_dir = root / 'gtFine' / 'val' / 'samplecity'
  os.makedirs(gt_dir)
  j = str(gt_dir / 'samplecity_000000_000019_gtFine_polygons.json')
  with open(j, 'w') as f:
    json_lib.dump({'imgHeight': 64, 'imgWidth': 96, 'objects': [
        {'label': 'road',
         'polygon': [[0, 32], [95, 32], [95, 63], [0, 63]]},
        {'label': 'car', 'polygon': [[5, 40], [25, 40], [25, 60], [5, 60]]},
    ]}, f)
  prep.json2label_img(j, j.replace('_polygons.json', '_labelIds.png'))
  prep.json2instance_img(j, j.replace('_polygons.json',
                                      '_instanceIds.png'))

  pred_dir = tmp_path / 'preds'
  os.makedirs(pred_dir)
  gt_png = j.replace('_polygons.json', '_labelIds.png')
  import shutil
  shutil.copy(gt_png, str(pred_dir / 'samplecity_000000_000019_pred.png'))

  result = pixel_eval.main(['--predictions', str(pred_dir),
                            '--dataset', str(root), '--split', 'val'])
  np.testing.assert_allclose(result['classes']['car'], 1.0)
  np.testing.assert_allclose(result['classesInst']['car'], 1.0)
  np.testing.assert_allclose(result['categories']['vehicle'], 1.0)


def test_submission_roundtrip_with_renderer(tmp_path):
  """The analysis writer's output parses through the official evaluator."""
  from rec_attend_tpu import analysis

  class FakeDS:
    def get_fname(self, idx):
      return f'{idx}_gtFine_instanceIds.png'

  h = w = 128
  gt = np.zeros((h, w), np.int32)
  gt[20:60, 20:60] = 26001
  gt_file = str(tmp_path / 'gt' / 'frankfurt_000000_000001_'
                'gtFine_instanceIds.png')
  os.makedirs(os.path.dirname(gt_file), exist_ok=True)
  cv2.imwrite(gt_file, gt.astype(np.uint16))

  seg = np.zeros((1, h, w), np.float32)
  seg[0, 20:60, 20:60] = 1
  fg = np.zeros((h, w, 9), np.float32)
  fg[..., 3] = 1.0               # car channel
  out_folder = str(tmp_path / 'out')
  writer = analysis.RenderCityScapesOutputAnalyzer(out_folder, FakeDS())
  writer.stage({'y_out': [seg], 'y_in': [fg],
                'conf': np.array([[0.95]]),
                'indices': ['frankfurt_000000_000001']})
  txt = IE.find_prediction_file(gt_file, out_folder)
  avg = IE.evaluate_instance_predictions([txt], [gt_file], quiet=True)
  np.testing.assert_allclose(avg['allAp'], 1.0)
