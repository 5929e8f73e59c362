"""Preparation-twin tests: polygon JSON -> label/instance images with the
official encoding (instances = id*1000+k, groups = bare id)."""

import json
import os

import cv2
import numpy as np

from rec_attend_tpu.data import cityscapes_prep as prep
from rec_attend_tpu.eval_cityscapes import instance_eval as IE


def _write_json(path, objects, h=64, w=96):
  with open(path, 'w') as f:
    json.dump({'imgHeight': h, 'imgWidth': w, 'objects': objects}, f)


def _rect(x0, y0, x1, y1):
  return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def test_instance_image_encoding(tmp_path):
  j = str(tmp_path / 'a_polygons.json')
  _write_json(j, [
      {'label': 'building', 'polygon': _rect(0, 0, 95, 63)},
      {'label': 'car', 'polygon': _rect(5, 5, 25, 25)},
      {'label': 'car', 'polygon': _rect(30, 5, 50, 25)},
      {'label': 'cargroup', 'polygon': _rect(55, 5, 75, 25)},
      {'label': 'person', 'polygon': _rect(5, 35, 15, 55)},
  ])
  ann = prep.Annotation.from_json_file(j)
  img = prep.create_instance_image(ann, 'ids')
  assert img[0, 90] == 11          # building: plain id
  assert img[10, 10] == 26000      # first car instance
  assert img[10, 40] == 26001      # second car instance
  assert img[10, 60] == 26         # car group: bare class id
  assert img[45, 10] == 24000      # first person instance


def test_label_image_encodings(tmp_path):
  j = str(tmp_path / 'b_polygons.json')
  _write_json(j, [
      {'label': 'road', 'polygon': _rect(0, 32, 95, 63)},
      {'label': 'car', 'polygon': _rect(5, 40, 25, 60)},
  ])
  ann = prep.Annotation.from_json_file(j)
  ids = prep.create_label_image(ann, 'ids')
  assert ids[1, 1] == 0            # unlabeled background
  assert ids[50, 50] == 7          # road
  assert ids[50, 10] == 26         # car on top of road
  train = prep.create_label_image(ann, 'trainIds')
  assert train[50, 10] == 3        # car trainId (reference convention)
  colour = prep.create_label_image(ann, 'color')
  assert tuple(colour[50, 10]) == (142, 0, 0)   # BGR of (0, 0, 142)


def test_deleted_objects_skipped(tmp_path):
  j = str(tmp_path / 'c_polygons.json')
  _write_json(j, [
      {'label': 'car', 'polygon': _rect(5, 5, 25, 25), 'deleted': 1},
      {'label': 'car', 'polygon': _rect(30, 5, 50, 25)},
  ])
  img = prep.create_instance_image(prep.Annotation.from_json_file(j))
  assert img[10, 10] == 0
  assert img[10, 40] == 26000      # numbering unaffected by deleted objs


def test_roundtrip_through_instance_eval(tmp_path):
  """Generated instanceIds images parse through the official-AP gt reader."""
  j = str(tmp_path / 'd_polygons.json')
  _write_json(j, [
      {'label': 'car', 'polygon': _rect(5, 5, 40, 40)},
      {'label': 'cargroup', 'polygon': _rect(60, 40, 90, 60)},
      {'label': 'person', 'polygon': _rect(50, 5, 58, 30)},
  ])
  out = str(tmp_path / 'd_instanceIds.png')
  prep.json2instance_img(j, out)
  gt = cv2.imread(out, -1).astype(np.int64)
  inst = IE.get_gt_instances(gt)
  assert len(inst['car']) == 2            # one instance + one group
  assert sorted(i['instID'] for i in inst['car']) == [26, 26000]
  assert len(inst['person']) == 1


def test_batch_driver(tmp_path):
  root = tmp_path / 'cs'
  d = root / 'gtFine' / 'train' / 'samplecity'
  os.makedirs(d)
  for i in range(3):
    _write_json(str(d / f'samplecity_{i:06d}_000019_gtFine_polygons.json'),
                [{'label': 'car', 'polygon': _rect(5, 5, 25, 25)}])
  n = prep.create_ground_truth_images(str(root))
  assert n == 3
  pngs = sorted(os.listdir(d))
  assert sum(p.endswith('_instanceIds.png') for p in pngs) == 3
  assert sum(p.endswith('_labelIds.png') for p in pngs) == 3
