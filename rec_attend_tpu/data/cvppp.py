"""CVPPP leaf segmentation dataset (ref data_api/cvppp.py)."""

from __future__ import annotations

import os
import re

import cv2
import numpy as np

from rec_attend_tpu.data import sep_labels
from rec_attend_tpu.data.assembler import InsSegAssembler
from rec_attend_tpu.data.dataset import InsSegDataset


class CVPPPAssembler(InsSegAssembler):
  """Assembles plantNNN_{rgb,label,fg}.png folders into the H5 format,
  writing the deterministic 80/20 split files (seed 2, ref cvppp.py:65-102).
  """

  def __init__(self, folder, opt, split=None, output_fname=None):
    self.folder = folder
    self.split = split
    self.image_regex = re.compile(r'plant(?P<imgid>[0-9]{3})_rgb.png')
    if output_fname is None:
      output_fname = os.path.join(
          folder, '{}_{}x{}.h5'.format(split, opt['height'], opt['width']))
    super().__init__(opt, output_fname)

  def read_ids(self):
    id_fname = os.path.join(self.folder, f'{self.split}.txt')
    if not os.path.exists(id_fname):
      self.write_split()
    with open(id_fname) as f:
      return [int(l.strip()) for l in f.readlines()]

  def get_str_id(self, idx):
    return f'plant{idx:03d}'

  def get_image(self, img_id):
    fname = os.path.join(self.folder, f'{self.get_str_id(img_id)}_rgb.png')
    img = cv2.imread(fname)
    if img is None:
      raise FileNotFoundError(fname)
    return img

  def get_segmentations(self, img_id):
    sid = self.get_str_id(img_id)
    gt_fname = os.path.join(self.folder, f'{sid}_label.png')
    if not os.path.exists(gt_fname):
      self.log.warning(f'GT file not found: {gt_fname}')
      gt_fname = os.path.join(self.folder, f'{sid}_fg.png')
      if not os.path.exists(gt_fname):
        raise FileNotFoundError(gt_fname)
    gt_img = cv2.imread(gt_fname)
    segm, _ = sep_labels.get_separate_labels(gt_img)
    sem_segm = [np.zeros(segm[0].shape)] if segm else []
    for ss in segm:
      sem_segm[0] = np.maximum(ss, sem_segm[0])
    return segm, sem_segm, [0] * len(segm)

  def write_split(self):
    random = np.random.RandomState(2)
    ids = sorted({int(self.image_regex.search(f).group('imgid'))
                  for f in os.listdir(self.folder)
                  if self.image_regex.search(f)})
    image_ids = np.array(ids)
    num_train = int(np.ceil(image_ids.size * 0.8))
    idx = np.arange(len(image_ids))
    random.shuffle(idx)
    train_ids = image_ids[idx[:num_train]]
    valid_ids = image_ids[idx[num_train:]]
    with open(os.path.join(self.folder, 'train.txt'), 'w') as f:
      f.writelines(f'{i}\n' for i in train_ids)
    with open(os.path.join(self.folder, 'valid.txt'), 'w') as f:
      f.writelines(f'{i}\n' for i in valid_ids)
    with open(os.path.join(self.folder, 'all.txt'), 'w') as f:
      f.writelines(f'{i}\n' for i in list(train_ids) + list(valid_ids))


class CVPPP(InsSegDataset):

  def get_name(self):
    return 'cvppp'

  def get_str_id(self, idx):
    # Reference-produced H5s store raw integer plant ids in index_map
    # (cvppp.py:119-120); ours store the formatted group names directly.
    s = str(idx)
    return f'plant{int(s):03d}' if s.isdigit() else s

  def get_fname(self, idx, fg=False):
    sid = self.get_str_id(idx)
    return f'{sid}_fg.png' if fg else f'{sid}_label.png'

  def get_default_timespan(self):
    return 21
