"""Synthetic shapes dataset: self-contained data for tests and benchmarks.

Fills the role of the reference's ``synth_shape`` dataset name
(cmd_args_parser.py:33-36; its implementation was not shipped): random
ellipses/rectangles on a noisy background, written in the standard H5
format so the whole pipeline (assembler -> dataset -> training -> eval)
runs without external downloads.
"""

from __future__ import annotations

import cv2
import numpy as np

from rec_attend_tpu.data.assembler import InsSegAssembler
from rec_attend_tpu.data.dataset import InsSegDataset


class SyntheticAssembler(InsSegAssembler):
  """Generates images on the fly and assembles them like any other set.

  num_semantic_classes > 1 assigns each instance a semantic class by shape
  family (ellipse=0, rectangle=1, alternating beyond two) — the synthetic
  analogue of Cityscapes' 8 instance classes, enabling multiclass fg/box
  training without external data."""

  def __init__(self, opt, output_fname, num_examples=32, seed=3,
               max_objects=4, num_semantic_classes=1):
    self.num_examples = num_examples
    self.seed = seed
    self.max_objects = max_objects
    self.num_semantic_classes = num_semantic_classes
    self.height = opt.get('gen_height', opt['height'])
    self.width = opt.get('gen_width', opt['width'])
    self._cache = {}
    super().__init__(opt, output_fname)

  def read_ids(self):
    return list(range(self.num_examples))

  def get_str_id(self, img_id):
    return f'synth{img_id:04d}'

  def _generate(self, img_id):
    if img_id in self._cache:
      return self._cache[img_id]
    rng = np.random.RandomState(self.seed * 10007 + img_id)
    h, w = self.height, self.width
    img = (rng.rand(h, w, 3) * 40 + 20).astype('uint8')
    num_obj = rng.randint(1, self.max_objects + 1)
    masks = []
    classes = []
    for _ in range(num_obj):
      mask = np.zeros((h, w), np.uint8)
      cy, cx = rng.randint(h // 6, 5 * h // 6), rng.randint(w // 6,
                                                            5 * w // 6)
      ry, rx = rng.randint(h // 12, h // 5), rng.randint(w // 12, w // 5)
      colour = tuple(int(c) for c in rng.randint(90, 255, 3))
      shape = rng.randint(0, max(2, self.num_semantic_classes))
      if shape % 2 == 0:
        cv2.ellipse(mask, (cx, cy), (rx, ry), rng.rand() * 180, 0, 360, 1,
                    -1)
        cv2.ellipse(img, (cx, cy), (rx, ry), 0, 0, 360, colour, -1)
      else:
        cv2.rectangle(mask, (cx - rx, cy - ry), (cx + rx, cy + ry), 1, -1)
        cv2.rectangle(img, (cx - rx, cy - ry), (cx + rx, cy + ry), colour,
                      -1)
      # Occlusion: later shapes overwrite earlier masks.
      for m in masks:
        m &= (1 - mask)
      masks.append(mask)
      classes.append(shape % max(1, self.num_semantic_classes))
    keep = [i for i, m in enumerate(masks) if m.sum() > 0]
    masks = [masks[i] for i in keep]
    classes = [classes[i] for i in keep]
    self._cache[img_id] = (img, masks, classes)
    return img, masks, classes

  def get_image(self, img_id):
    return self._generate(img_id)[0]

  def get_segmentations(self, img_id):
    _, masks, classes = self._generate(img_id)
    nsc = max(1, self.num_semantic_classes)
    sem = [np.zeros((self.height, self.width), np.uint8)
           for _ in range(nsc)]
    for m, c in zip(masks, classes):
      sem[c] = np.maximum(sem[c], m)
    return masks, sem, list(classes)


class Synthetic(InsSegDataset):

  def __init__(self, h5_fname, num_semantic_classes=1, **kw):
    super().__init__(h5_fname, **kw)
    self._num_semantic_classes = num_semantic_classes

  def get_name(self):
    return 'synth'

  def get_fname(self, idx):
    """Cityscapes-style ``{run}_{seq}_{frame}.png`` stem so the official
    prediction/GT pairing machinery (instance_eval.find_prediction_file,
    stem = first three underscore fields) works on synthetic output."""
    num = str(idx).replace('synth', '') or '0'
    return f'synth_{int(num):06d}_000000.png'

  def get_default_timespan(self):
    return 6

  def get_num_semantic_classes(self):
    return self._num_semantic_classes


# Synthetic semantic class c -> Cityscapes labelID, matching the submission
# writer's table (analysis.RenderCityScapesOutputAnalyzer.LABELS): class 0
# renders as person(24), class 1 as rider(25), ...  GT written with the
# same mapping makes the official AP evaluation well-defined on synth data.
CS_INSTANCE_LABEL_IDS = (24, 25, 26, 27, 28, 31, 32, 33)
# Background pixels get an in-eval, non-instance label (road) so that
# false positives on background COUNT as FPs instead of being void-ignored
# (unlabeled=0 is ignoreInEval, which would inflate AP).
CS_BACKGROUND_LABEL_ID = 7


def write_instance_id_gt(ds, out_folder):
  """Render official-convention ``*_gtFine_instanceIds.png`` ground truth
  for a synthetic split (full-size masks + per-instance semantic classes
  from the H5), enabling the end-to-end Cityscapes AP evaluation
  (ref run_cityscapes_eval.sh:27-55) without the real archives.

  Instance k of semantic class c is encoded as
  ``CS_INSTANCE_LABEL_IDS[c] * 1000 + k`` (id>=1000 convention,
  ref cityscapes.py:88-119); background is CS_BACKGROUND_LABEL_ID.
  Returns the list of written PNG paths, ordered like ds.img_ids."""
  import os
  import h5py
  from rec_attend_tpu.data.assembler import png_decode

  os.makedirs(out_folder, exist_ok=True)
  out = []
  with h5py.File(ds.h5_fname, 'r') as h5f:
    for idx in ds.img_ids:
      group = h5f[ds.get_str_id(idx)]
      classes = (group['instance_semantic_classes'][:]
                 if 'instance_semantic_classes' in group else None)
      seg_group = group['label_segmentation_full_size']
      num_obj = len(seg_group.keys())
      gt_img = None
      for jj in range(num_obj):
        mask = png_decode(seg_group[f'{jj:02d}'][:], cv2.IMREAD_GRAYSCALE)
        if gt_img is None:
          gt_img = np.full(mask.shape, CS_BACKGROUND_LABEL_ID, np.uint16)
        cls = int(classes[jj]) if classes is not None else 0
        label_id = CS_INSTANCE_LABEL_IDS[cls % len(CS_INSTANCE_LABEL_IDS)]
        gt_img[mask > 0] = label_id * 1000 + jj
      stem = ds.get_fname(idx)[:-len('.png')]
      fname = os.path.join(out_folder, f'{stem}_gtFine_instanceIds.png')
      cv2.imwrite(fname, gt_img)
      out.append(fname)
  return out


def make_synthetic_h5(path, height=64, width=64, num_examples=32, seed=3,
                      max_objects=4, num_semantic_classes=1):
  """One-call helper: build a synthetic H5 and return a Synthetic dataset."""
  opt = {'height': height, 'width': width}
  SyntheticAssembler(opt, path, num_examples=num_examples, seed=seed,
                     max_objects=max_objects,
                     num_semantic_classes=num_semantic_classes).assemble()
  return Synthetic(path, num_semantic_classes=num_semantic_classes)
