"""Cityscapes annotation preparation: polygon JSON -> label/instance images.

Capability twin of the vendored toolkit's preparation scripts the reference
ships (``data_api/cityscapes_scripts/preparation/json2instanceImg.py``,
``json2labelImg.py``, ``createTrainIdInstanceImgs.py``,
``createTrainIdLabelImgs.py``): regenerates ``*_labelIds.png`` /
``*_instanceIds.png`` (or trainId variants) straight from the raw
``*_polygons.json`` annotations, so assembling the H5 datasets needs no
external toolkit.

Encoding contract (json2instanceImg.py:1-33): instance-capable classes get
``id * 1000 + running_instance_index``; a ``<class>group`` polygon (e.g.
``cargroup``) collapses to the bare class id; non-instance classes always
use their plain id; negative ids are skipped.

Polygons are rasterised with cv2.fillPoly (the toolkit used PIL ImageDraw;
boundary-pixel conventions may differ by <=1 px along polygon edges).
"""

from __future__ import annotations

import glob
import json
import os

import cv2
import numpy as np

from rec_attend_tpu.data.cityscapes_labels import labels, name2label
from rec_attend_tpu.utils import logger


class Annotation:
  """One image's polygon annotation (helpers/annotation.py)."""

  def __init__(self, img_height=0, img_width=0, objects=None):
    self.img_height = img_height
    self.img_width = img_width
    self.objects = objects or []   # list of (label, [(x, y), ...])

  @classmethod
  def from_json_file(cls, path):
    with open(path) as f:
      d = json.load(f)
    objects = [(str(o['label']), [(float(p[0]), float(p[1]))
                                  for p in o['polygon']])
               for o in d['objects']
               # newer annotations mark withdrawn objects
               if not o.get('deleted', 0)]
    return cls(int(d['imgHeight']), int(d['imgWidth']), objects)


def _resolve_label(label):
  """Handle the '<class>group' convention; returns (Label, is_group)."""
  is_group = False
  if label not in name2label and label.endswith('group'):
    label = label[:-len('group')]
    is_group = True
  if label not in name2label:
    raise ValueError(f"Label '{label}' not known.")
  return name2label[label], is_group


def _fill(img, polygon, value):
  pts = np.round(np.asarray(polygon, np.float64)).astype(np.int32)
  if len(pts) >= 3:
    cv2.fillPoly(img, [pts.reshape(-1, 1, 2)], value)


def create_label_image(annotation, encoding='ids'):
  """Rasterise class labels (json2labelImg.py:63-120).

  encoding: 'ids' | 'trainIds' | 'color'."""
  h, w = annotation.img_height, annotation.img_width
  bg = name2label['unlabeled']
  if encoding == 'color':
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = bg.color[::-1]           # cv2 is BGR
  else:
    img = np.full((h, w), getattr(bg, 'id' if encoding == 'ids'
                                  else 'trainId'), np.uint8)
  for label, polygon in annotation.objects:
    lt, _ = _resolve_label(label)
    if lt.id < 0:
      continue
    if encoding == 'ids':
      val = lt.id
    elif encoding == 'trainIds':
      val = lt.trainId
    elif encoding == 'color':
      val = lt.color[::-1]
    else:
      raise ValueError(f'Unknown encoding {encoding!r}')
    _fill(img, polygon, val)
  return img


def create_instance_image(annotation, encoding='ids'):
  """Rasterise instance ids (json2instanceImg.py:100-165).

  encoding: 'ids' | 'trainIds'."""
  if encoding not in ('ids', 'trainIds'):
    raise ValueError(f'Unknown encoding {encoding!r}')
  h, w = annotation.img_height, annotation.img_width
  attr = 'id' if encoding == 'ids' else 'trainId'
  img = np.full((h, w), getattr(name2label['unlabeled'], attr), np.int32)
  nb_instances = {lt.name: 0 for lt in labels if lt.hasInstances}
  for label, polygon in annotation.objects:
    lt, is_group = _resolve_label(label)
    value = getattr(lt, attr)
    if lt.hasInstances and not is_group:
      value = value * 1000 + nb_instances[lt.name]
      nb_instances[lt.name] += 1
    if value < 0:
      continue
    _fill(img, polygon, int(value))
  return img


def json2label_img(in_json, out_img, encoding='ids'):
  img = create_label_image(Annotation.from_json_file(in_json), encoding)
  cv2.imwrite(out_img, img)


def json2instance_img(in_json, out_img, encoding='ids'):
  img = create_instance_image(Annotation.from_json_file(in_json), encoding)
  # instance ids exceed uint8; official files are 16-bit (int32 for 'I').
  cv2.imwrite(out_img, img.astype(np.uint16))


def create_ground_truth_images(cityscapes_path, encoding='ids',
                               kinds=('instance', 'label')):
  """Batch driver over every `*_polygons.json` under gtFine/gtCoarse
  (createTrainIdInstanceImgs.py:34-80 and its label sibling).

  Returns the number of annotations converted."""
  log = logger.get()
  files = sorted(
      glob.glob(os.path.join(cityscapes_path, 'gtFine', '*', '*',
                             '*_gt*_polygons.json'))
      + glob.glob(os.path.join(cityscapes_path, 'gtCoarse', '*', '*',
                               '*_gt*_polygons.json')))
  if not files:
    raise FileNotFoundError(
        f'No *_polygons.json under {cityscapes_path}/gtFine|gtCoarse')
  suffix = 'TrainIds' if encoding == 'trainIds' else 'Ids'
  for i, f in enumerate(files):
    if 'instance' in kinds:
      json2instance_img(f, f.replace('_polygons.json',
                                     f'_instance{suffix}.png'), encoding)
    if 'label' in kinds:
      json2label_img(f, f.replace('_polygons.json',
                                  f'_label{suffix}.png'), encoding)
    if (i + 1) % 200 == 0:
      log.info(f'Converted {i + 1}/{len(files)} annotations')
  log.info(f'Converted {len(files)} annotations')
  return len(files)


def main(argv=None):
  import argparse
  parser = argparse.ArgumentParser(
      description='Regenerate labelIds/instanceIds images from polygon '
      'JSON annotations (official preparation twin).')
  parser.add_argument('--dataset',
                      default=os.environ.get('CITYSCAPES_DATASET'))
  parser.add_argument('--encoding', default='ids',
                      choices=['ids', 'trainIds'])
  parser.add_argument('--kinds', default='instance,label')
  args = parser.parse_args(argv)
  create_ground_truth_images(args.dataset, args.encoding,
                             tuple(args.kinds.split(',')))


if __name__ == '__main__':
  main()
