"""Differential test: our pixel-level evaluator vs the official
Cityscapes script.

Counterpart of ``test_ap_differential.py`` for the one evaluator family
that never had the treatment: the reference vendors the official
``evalPixelLevelSemanticLabeling.py`` (ref
data_api/cityscapes_scripts/evaluation/evalPixelLevelSemanticLabeling.py),
which is Python-2-only (print statements, ``itertools.izip``).  This test
mechanically converts ONLY the print statements with lib2to3's print
fixer (no semantic edits), shims its two py2-only dependencies
(``csHelpers`` star-import re-exporting our label table; ``itertools``
providing ``izip``), leaves its optional Cython kernel absent so its own
pure-python confusion-matrix fallback runs verbatim, and asserts
``eval_cityscapes.pixel_eval`` produces identical class / instance /
category IoU numbers on crafted scenes.

Skipped when the reference checkout is not present.
"""

import json
import math
import os
import sys
import types
import warnings

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rec_attend_tpu.data import cityscapes_labels as cs_labels
from rec_attend_tpu.eval_cityscapes import pixel_eval

OFFICIAL = ('/root/reference/data_api/cityscapes_scripts/evaluation/'
            'evalPixelLevelSemanticLabeling.py')

pytestmark = pytest.mark.skipif(not os.path.exists(OFFICIAL),
                                reason='official script not available')

ROAD, SIDEWALK, BUILDING, SKY = 7, 8, 11, 23
PERSON, RIDER, CAR, TRUCK, CARAVAN = 24, 25, 26, 27, 29
VOID, DYNAMIC, EGO = 0, 5, 1


def _make_cshelpers_shim():
  import PIL.Image as Image
  import glob as _glob
  m = types.ModuleType('csHelpers')
  m.labels = cs_labels.labels
  m.id2label = cs_labels.id2label
  m.name2label = {l.name: l for l in cs_labels.labels}
  cats = {}
  for l in cs_labels.labels:
    cats.setdefault(l.category, []).append(l)
  m.category2labels = cats
  m.Image = Image
  m.np = np
  # star-import module: stdlib names leak through it in the original
  m.os, m.sys, m.json, m.glob, m.math = os, sys, json, _glob, math
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
      json.dump(d, f, default=float)

  m.ensurePath = ensurePath
  m.writeDict2JSON = writeDict2JSON
  return m


@pytest.fixture(scope='module')
def official():
  """Exec the official script with prints fixed and deps shimmed."""
  from lib2to3.refactor import RefactoringTool
  with warnings.catch_warnings():
    warnings.simplefilter('ignore')
    rt = RefactoringTool(['lib2to3.fixes.fix_print'])
    src = str(rt.refactor_string(open(OFFICIAL).read() + '\n',
                                 'official_pixel'))
  saved = sys.modules.get('csHelpers')
  sys.modules['csHelpers'] = _make_cshelpers_shim()
  mod = types.ModuleType('official_pixel_eval')
  mod.__file__ = OFFICIAL
  try:
    exec(compile(src, OFFICIAL, 'exec'), mod.__dict__)
  finally:
    if saved is None:
      sys.modules.pop('csHelpers', None)
    else:
      sys.modules['csHelpers'] = saved
  assert not mod.CSUPPORT, 'Cython kernel unexpectedly importable'
  # the pure-python confusion fallback uses itertools.izip (py2)
  mod.itertools = types.SimpleNamespace(izip=zip)
  return mod


def _run_official(official, pred_files, gt_files, tmp):
  args = official.CArgs()
  for k, v in vars(official.args).items():
    setattr(args, k, v)
  args.quiet = True
  args.colorized = False
  args.evalInstLevelScore = True
  args.evalPixelAccuracy = False
  args.exportFile = os.path.join(str(tmp), 'official_pixel_result.json')
  conf, inst_stats = official.evaluateImgLists(list(pred_files),
                                               list(gt_files), args)
  classes, classes_inst = {}, {}
  for label_id in args.evalLabels:
    name = cs_labels.id2label[label_id].name
    classes[name] = official.getIouScoreForLabel(label_id, conf, args)
    classes_inst[name] = official.getInstanceIouScoreForLabel(
        label_id, conf, inst_stats, args)
  categories, categories_inst = {}, {}
  for cat in {l.category for l in cs_labels.labels}:
    categories[cat] = official.getIouScoreForCategory(cat, conf, args)
    categories_inst[cat] = official.getInstanceIouScoreForCategory(
        cat, conf, inst_stats, args)
  return {
      'classes': classes, 'classesInst': classes_inst,
      'categories': categories, 'categoriesInst': categories_inst,
      'meanIoU': official.getScoreAverage(classes, args),
      'meanInstIoU': official.getScoreAverage(classes_inst, args),
      'meanCategoryIoU': official.getScoreAverage(categories, args),
      'meanCategoryInstIoU': official.getScoreAverage(categories_inst,
                                                      args),
  }


# ---------------------------------------------------------------------------
# Crafted scenes
# ---------------------------------------------------------------------------

H, W = 64, 80


def _boxmask(y0, x0, h, w):
  m = np.zeros((H, W), bool)
  m[y0:y0 + h, x0:x0 + w] = True
  return m


def _write_scene(tmp, name, gt_label, gt_inst, pred):
  import PIL.Image as Image
  gt_file = os.path.join(str(tmp), f'{name}_gtFine_labelIds.png')
  inst_file = os.path.join(str(tmp), f'{name}_gtFine_instanceIds.png')
  pred_file = os.path.join(str(tmp), f'{name}_pred.png')
  Image.fromarray(gt_label.astype(np.uint8), mode='L').save(gt_file)
  Image.fromarray(gt_inst.astype(np.int32), mode='I').save(inst_file)
  Image.fromarray(pred.astype(np.uint8), mode='L').save(pred_file)
  return gt_file, inst_file, pred_file


def _scenes(tmp):
  """Scenes covering within/across-category confusion, ignored gt labels,
  size-dependent instance weighting, predictions over ignored regions,
  ignored instance classes (caravan), and a perfect image."""
  gt_files, pred_files, triples = [], [], []

  def add(name, gt_label, gt_inst, pred):
    gt_f, inst_f, pred_f = _write_scene(tmp, name, gt_label, gt_inst, pred)
    gt_files.append(gt_f)
    pred_files.append(pred_f)
    triples.append((pred, gt_label, gt_inst))

  # 1. mixed: car 1/3 mislabeled truck (same category), person half
  #    mislabeled rider (same category), road strip mislabeled sidewalk
  gt = np.full((H, W), ROAD, np.uint8)
  inst = np.full((H, W), ROAD, np.int32)
  sky = _boxmask(0, 0, 10, W)
  gt[sky], inst[sky] = SKY, SKY
  bld = _boxmask(10, 0, 10, 30)
  gt[bld], inst[bld] = BUILDING, BUILDING
  car = _boxmask(30, 10, 24, 30)
  gt[car] = CAR
  inst[car] = CAR * 1000
  per = _boxmask(25, 60, 20, 10)
  gt[per] = PERSON
  inst[per] = PERSON * 1000
  pred = gt.copy()
  pred[_boxmask(30, 10, 24, 10)] = TRUCK      # 1/3 of the car
  pred[_boxmask(25, 60, 10, 10)] = RIDER      # half of the person
  pred[_boxmask(60, 0, 4, W)] = SIDEWALK      # road strip
  add('mixed', gt, inst, pred)

  # 2. ignored gt + weighting: void / dynamic regions (ignoreInEval),
  #    one big and one tiny car (weight = avgClassSize / instSize differs),
  #    a caravan instance (ignored instance class, skipped by both), and a
  #    prediction painting the void region as car (FP only vs non-ignored)
  gt = np.full((H, W), ROAD, np.uint8)
  inst = np.full((H, W), ROAD, np.int32)
  void = _boxmask(0, 0, 16, 20)
  gt[void], inst[void] = VOID, VOID
  dyn = _boxmask(0, 60, 10, 20)
  gt[dyn], inst[dyn] = DYNAMIC, DYNAMIC
  big = _boxmask(20, 5, 30, 40)
  gt[big] = CAR
  inst[big] = CAR * 1000
  tiny = _boxmask(55, 70, 6, 6)
  gt[tiny] = CAR
  inst[tiny] = CAR * 1000 + 1
  cara = _boxmask(20, 55, 12, 12)
  gt[cara] = CARAVAN
  inst[cara] = CARAVAN * 1000
  pred = gt.copy()
  pred[void] = CAR                            # over ignored gt
  pred[tiny] = ROAD                           # tiny car fully missed
  pred[_boxmask(20, 5, 30, 10)] = BUILDING    # part of big car wrong cat
  pred[cara] = CAR                            # caravan predicted as car
  add('ignored', gt, inst, pred)

  # 3. perfect image with an instance
  gt = np.full((H, W), SIDEWALK, np.uint8)
  inst = np.full((H, W), SIDEWALK, np.int32)
  p = _boxmask(10, 10, 20, 12)
  gt[p] = PERSON
  inst[p] = PERSON * 1000
  add('perfect', gt, inst, gt.copy())

  # 4. predictions using ignored label ids (ego vehicle) on valid gt
  gt = np.full((H, W), ROAD, np.uint8)
  inst = np.full((H, W), ROAD, np.int32)
  c = _boxmask(30, 30, 20, 20)
  gt[c] = CAR
  inst[c] = CAR * 1000
  pred = gt.copy()
  pred[_boxmask(0, 0, 20, 20)] = EGO          # ignored id as prediction
  pred[_boxmask(30, 30, 20, 8)] = EGO         # over part of the car too
  add('egopred', gt, inst, pred)

  return gt_files, pred_files, triples


def test_pixel_scores_match_official(tmp_path, official):
  gt_files, pred_files, triples = _scenes(tmp_path)

  ev = pixel_eval.PixelEvaluator()
  for pred, gt_label, gt_inst in triples:
    ev.add_pair(pred.astype(np.uint8), gt_label.astype(np.uint8),
                instance_img=gt_inst.astype(np.int64))
  ours = ev.finalize()

  theirs = _run_official(official, pred_files, gt_files, tmp_path)

  for name, v in ours['classes'].items():
    assert v == pytest.approx(theirs['classes'][name], abs=1e-6,
                              nan_ok=True), f'class {name}'
  for name, v in ours['classesInst'].items():
    assert v == pytest.approx(theirs['classesInst'][name], abs=1e-6,
                              nan_ok=True), f'classInst {name}'
  for cat, v in ours['categories'].items():
    assert v == pytest.approx(theirs['categories'][cat], abs=1e-6,
                              nan_ok=True), f'category {cat}'
  for cat, v in ours['categoriesInst'].items():
    assert v == pytest.approx(theirs['categoriesInst'][cat], abs=1e-6,
                              nan_ok=True), f'categoryInst {cat}'
  for key in ('meanIoU', 'meanInstIoU', 'meanCategoryIoU',
              'meanCategoryInstIoU'):
    assert ours[key] == pytest.approx(theirs[key], abs=1e-6), key
  # sanity: the scenes are non-trivial (not all perfect, not all zero)
  assert 0.05 < ours['meanIoU'] < 0.999
  assert 0.05 < ours['meanInstIoU'] < 0.999
