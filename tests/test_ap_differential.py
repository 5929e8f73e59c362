"""Differential test: our instance-level AP evaluator vs the official
Cityscapes script.

The reference vendors the official ``evalInstanceLevelSemanticLabeling.py``
(run via env vars by ``run_cityscapes_eval.sh:22-52``).  Its helper modules
are Python-2-only, so this test supplies tiny Python-3 shims for the two
imports (``csHelpers`` re-exporting our label table + IO helpers,
``instances2dict`` implementing the documented instance-statistics
contract) and then runs the official matching + AP code verbatim from
``/root/reference`` on crafted fixture scenes, asserting our
``eval_cityscapes.instance_eval`` produces identical AP numbers.

Skipped when the reference checkout is not present.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rec_attend_tpu.data import cityscapes_labels as cs_labels
from rec_attend_tpu.eval_cityscapes import instance_eval

OFFICIAL = ('/root/reference/data_api/cityscapes_scripts/evaluation/'
            'evalInstanceLevelSemanticLabeling.py')

pytestmark = pytest.mark.skipif(not os.path.exists(OFFICIAL),
                                reason='official script not available')

CAR, PERSON, ROAD, VOID = 26, 24, 7, 0


# ---------------------------------------------------------------------------
# Python-3 shims for the official script's two py2-only imports
# ---------------------------------------------------------------------------


def _make_cshelpers_shim():
  import PIL.Image as Image
  import glob as _glob
  import math as _math
  m = types.ModuleType('csHelpers')
  m.labels = cs_labels.labels
  m.id2label = cs_labels.id2label
  m.Image = Image
  m.np = np
  # the original is a star-import module, so stdlib names leak through it
  m.os, m.sys, m.json, m.glob, m.math = os, sys, json, _glob, _math
  m.printError = lambda msg: (_ for _ in ()).throw(RuntimeError(msg))

  class colors:
    RED = GREEN = YELLOW = BLUE = CYAN = BOLD = ENDC = ''

  m.colors = colors
  m.getColorEntry = lambda val, args: ''

  def ensurePath(path):
    if path:
      os.makedirs(path, exist_ok=True)

  def writeDict2JSON(d, fname):
    with open(fname, 'w') as f:
      json.dump(d, f)

  m.ensurePath = ensurePath
  m.writeDict2JSON = writeDict2JSON
  return m


def _make_instances2dict_shim():
  import PIL.Image as Image
  m = types.ModuleType('instances2dict')

  def instances2dict(image_file_list, verbose=False):
    out = {}
    if not isinstance(image_file_list, list):
      image_file_list = [image_file_list]
    for fn in image_file_list:
      img = np.array(Image.open(fn))
      instances = {l.name: [] for l in cs_labels.labels}
      for inst_id in np.unique(img):
        inst_id = int(inst_id)
        label_id = inst_id // 1000 if inst_id >= 1000 else inst_id
        if label_id not in cs_labels.id2label:
          continue
        instances[cs_labels.id2label[label_id].name].append({
            'instID': inst_id, 'labelID': label_id,
            'pixelCount': int((img == inst_id).sum()),
            'medDist': -1, 'distConf': 0.0,
        })
      out[os.path.abspath(fn)] = instances
    return out

  m.instances2dict = instances2dict
  return m


@pytest.fixture(scope='module')
def official():
  """Import the official script with shimmed dependencies and numpy-2
  compat aliases (the script predates np.float/np.bool removal)."""
  if not hasattr(np, 'float'):
    np.float = float
  if not hasattr(np, 'bool'):
    np.bool = bool
  saved = {k: sys.modules.get(k) for k in ('csHelpers', 'instances2dict')}
  sys.modules['csHelpers'] = _make_cshelpers_shim()
  sys.modules['instances2dict'] = _make_instances2dict_shim()
  try:
    spec = importlib.util.spec_from_file_location('official_inst_eval',
                                                  OFFICIAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
  finally:
    for k, v in saved.items():
      if v is None:
        sys.modules.pop(k, None)
      else:
        sys.modules[k] = v
  return mod


def _run_official(official, pred_txts, gt_files, tmp, distance_gt=None):
  """Drive the official evaluateImgLists on explicit file lists."""
  args = official.CArgs()
  for k, v in vars(official.args).items():
    setattr(args, k, v)
  args.quiet = True
  args.colorized = False
  args.csv = False
  args.JSONOutput = False
  args.exportFile = os.path.join(str(tmp), 'official_result.json')
  args.gtInstancesFile = os.path.join(str(tmp), 'gtInstances.json')
  args.predictionPath = os.path.abspath(str(tmp))
  args.distanceAvailable = distance_gt is not None
  args.instLabels = []
  if distance_gt is not None:
    # The official flow reads medDist/distConf from the gtInstances JSON
    # cache (an external depth pipeline fills it); feed it our
    # distance-annotated instances so both evaluators see identical stats.
    with open(args.gtInstancesFile, 'w') as f:
      json.dump(distance_gt, f)
  cwd = os.getcwd()
  os.chdir(str(tmp))   # the script writes matches.json into CWD
  try:
    res = official.evaluateImgLists(list(pred_txts), list(gt_files), args)
  finally:
    os.chdir(cwd)
  return res['averages']


# ---------------------------------------------------------------------------
# Fixture scenes
# ---------------------------------------------------------------------------

H, W = 100, 120


def _write_gt(tmp, name, arr):
  import PIL.Image as Image
  fn = os.path.join(str(tmp), f'{name}_gtFine_instanceIds.png')
  Image.fromarray(arr.astype(np.int32), mode='I').save(fn)
  return fn


def _write_pred(tmp, name, preds):
  """preds: list of (mask [H,W] bool, labelID, conf)."""
  import cv2
  folder = os.path.join(str(tmp), 'preds', name)
  os.makedirs(folder, exist_ok=True)
  txt = os.path.join(folder, f'{name}.txt')
  with open(txt, 'w') as f:
    for jj, (mask, label_id, conf) in enumerate(preds):
      img_file = f'{name}_{jj:03d}.png'
      cv2.imwrite(os.path.join(folder, img_file),
                  mask.astype(np.uint8) * 255)
      f.write(f'{img_file} {label_id:d} {conf:f}\n')
  return txt


def _box(y0, x0, h, w):
  m = np.zeros((H, W), bool)
  m[y0:y0 + h, x0:x0 + w] = True
  return m


def _scenes(tmp):
  """Crafted scenes covering double matches, void ignores, undersized and
  group ground truth, partial overlaps, and class confusion."""
  gt_files, pred_txts = [], []

  def add(name, gt, preds):
    gt_files.append(_write_gt(tmp, name, gt))
    pred_txts.append(_write_pred(tmp, name, preds))

  # 1. perfect: two cars, exact predictions
  gt = np.full((H, W), ROAD, np.int32)
  m1, m2 = _box(10, 10, 30, 40), _box(60, 60, 20, 20)
  gt[m1] = CAR * 1000
  gt[m2] = CAR * 1000 + 1
  add('perfect', gt, [(m1, CAR, 0.9), (m2, CAR, 0.8)])

  # 2. double match: two predictions on one gt; lower conf becomes FP
  gt = np.full((H, W), ROAD, np.int32)
  gt[m1] = CAR * 1000
  add('double', gt, [(m1, CAR, 0.9), (m1, CAR, 0.7)])

  # 3. void ignore: prediction over an ignoreInEval region is discarded
  gt = np.full((H, W), ROAD, np.int32)
  void = _box(0, 0, 40, 40)
  gt[void] = VOID
  gt[m2] = CAR * 1000
  add('void', gt, [(void, CAR, 0.6), (m2, CAR, 0.85)])

  # 4. undersized gt (< 100 px) is filtered; its prediction is ignored
  gt = np.full((H, W), ROAD, np.int32)
  tiny = _box(5, 5, 7, 7)   # 49 px
  gt[tiny] = CAR * 1000
  gt[m2] = CAR * 1000 + 1
  add('tinygt', gt, [(tiny, CAR, 0.95), (m2, CAR, 0.8)])

  # 5. group region (instID < 1000): overlapping prediction ignored
  gt = np.full((H, W), ROAD, np.int32)
  grp = _box(30, 30, 20, 30)
  gt[grp] = CAR          # car group, raw id
  gt[m2] = CAR * 1000
  add('group', gt, [(grp, CAR, 0.9), (m2, CAR, 0.75)])

  # 6. partial overlaps straddling overlap thresholds
  gt = np.full((H, W), ROAD, np.int32)
  g = _box(20, 20, 20, 40)
  gt[g] = CAR * 1000
  p_hi = _box(20, 24, 20, 40)   # IoU = 36/44 ~ 0.818
  p_lo = _box(20, 36, 20, 40)   # IoU = 24/56 ~ 0.429 -> never matches
  add('partial', gt, [(p_hi, CAR, 0.9), (p_lo, CAR, 0.6)])

  # 7. plain false positive on background + class confusion:
  #    a person labeled as car is an FP for car and an FN for person
  gt = np.full((H, W), ROAD, np.int32)
  per = _box(40, 10, 25, 12)
  gt[per] = PERSON * 1000
  gt[m2] = CAR * 1000
  fp = _box(5, 80, 15, 15)
  add('confusion', gt, [(per, CAR, 0.7), (m2, CAR, 0.9), (fp, CAR, 0.5)])

  return gt_files, pred_txts


def test_ap_matches_official(tmp_path, official):
  gt_files, pred_txts = _scenes(tmp_path)
  ours = instance_eval.evaluate_instance_predictions(pred_txts, gt_files,
                                                     quiet=True)
  theirs = _run_official(official, pred_txts, gt_files, tmp_path)
  assert ours['allAp'] == pytest.approx(theirs['allAp'], abs=1e-6)
  assert ours['allAp50%'] == pytest.approx(theirs['allAp50%'], abs=1e-6)
  for name, d in ours['classes'].items():
    assert d['ap'] == pytest.approx(theirs['classes'][name]['ap'],
                                    abs=1e-6, nan_ok=True), name
    assert d['ap50%'] == pytest.approx(theirs['classes'][name]['ap50%'],
                                       abs=1e-6, nan_ok=True), name
  # sanity: the scenes produce a non-trivial AP (not 0, not 1)
  assert 0.05 < ours['allAp'] < 0.95


def test_ap_distance_rows_match_official(tmp_path, official):
  """AP_100m / AP_50m: distances from synthetic disparity on our side; the
  official script consumes the identical per-instance stats via its
  gtInstances JSON cache (its designed external-depth interface)."""
  import cv2
  bfx = instance_eval.NOMINAL_BASELINE * instance_eval.NOMINAL_FX

  gt = np.full((H, W), ROAD, np.int32)
  near, far = _box(10, 10, 30, 40), _box(60, 60, 20, 20)
  gt[near] = CAR * 1000
  gt[far] = CAR * 1000 + 1
  gt_file = _write_gt(tmp_path, 'dist', gt)

  # near instance ~30 m (full stereo density), far ~120 m with 40% of its
  # disparity pixels invalid (distConf 0.6 still passes the 0.5 gate)
  disp = np.zeros((H, W), np.uint16)
  disp[near] = int(1 + 256 * bfx / 30.0)
  disp[far] = int(1 + 256 * bfx / 120.0)
  far_idx = np.argwhere(far)
  kill = far_idx[:int(0.4 * len(far_idx))]
  disp[kill[:, 0], kill[:, 1]] = 0
  disp_file = os.path.join(str(tmp_path), 'dist_disparity.png')
  cv2.imwrite(disp_file, disp)

  # predictions: both found, far one with lower confidence
  pred_txt = _write_pred(tmp_path, 'dist', [(near, CAR, 0.9),
                                            (far, CAR, 0.6)])

  ours = instance_eval.evaluate_instance_predictions(
      [pred_txt], [gt_file], quiet=True, distance_files=[disp_file])

  # identical stats for the official side, via our gt extractor
  dist_img = instance_eval.disparity_to_distance(
      cv2.imread(disp_file, -1))
  gt_inst = instance_eval.get_gt_instances(gt.astype(np.int64),
                                           distance_img=dist_img)
  all_names = {l.name: [] for l in cs_labels.labels}
  all_names.update(gt_inst)
  theirs = _run_official(official, [pred_txt], [gt_file], tmp_path,
                         distance_gt={os.path.abspath(gt_file): all_names})

  for key in ('allAp', 'allAp50%', 'allAp100m', 'allAp50m'):
    assert ours[key] == pytest.approx(theirs[key], abs=1e-6), key
  # the far instance (~120 m) must be excluded from the 100 m/50 m rows:
  # only the near one remains and it is matched, so those rows are perfect
  assert ours['allAp100m'] == pytest.approx(1.0)
  assert ours['allAp50m'] == pytest.approx(1.0)
  assert ours['allAp'] < 1.0 or ours['allAp'] == pytest.approx(1.0)
