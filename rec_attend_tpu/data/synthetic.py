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
  """Generates images on the fly and assembles them like any other set."""

  def __init__(self, opt, output_fname, num_examples=32, seed=3,
               max_objects=4):
    self.num_examples = num_examples
    self.seed = seed
    self.max_objects = max_objects
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
    for _ in range(num_obj):
      mask = np.zeros((h, w), np.uint8)
      cy, cx = rng.randint(h // 6, 5 * h // 6), rng.randint(w // 6,
                                                            5 * w // 6)
      ry, rx = rng.randint(h // 12, h // 5), rng.randint(w // 12, w // 5)
      colour = tuple(int(c) for c in rng.randint(90, 255, 3))
      if rng.rand() < 0.5:
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
    masks = [m for m in masks if m.sum() > 0]
    self._cache[img_id] = (img, masks)
    return img, masks

  def get_image(self, img_id):
    return self._generate(img_id)[0]

  def get_segmentations(self, img_id):
    _, masks = self._generate(img_id)
    sem = [np.zeros((self.height, self.width), np.uint8)]
    for m in masks:
      sem[0] = np.maximum(sem[0], m)
    return masks, sem, [0] * len(masks)


class Synthetic(InsSegDataset):

  def get_name(self):
    return 'synth'

  def get_default_timespan(self):
    return 6


def make_synthetic_h5(path, height=64, width=64, num_examples=32, seed=3,
                      max_objects=4):
  """One-call helper: build a synthetic H5 and return a Synthetic dataset."""
  opt = {'height': height, 'width': width}
  SyntheticAssembler(opt, path, num_examples=num_examples, seed=seed,
                     max_objects=max_objects).assemble()
  return Synthetic(path)
