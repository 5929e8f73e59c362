"""KITTI car instance dataset (ref data_api/kitti.py)."""

from __future__ import annotations

import os

import cv2
import numpy as np

from rec_attend_tpu.data import sep_labels
from rec_attend_tpu.data.assembler import InsSegAssembler
from rec_attend_tpu.data.dataset import InsSegDataset


class KITTIAssembler(InsSegAssembler):

  def __init__(self, folder, opt, split='train', output_fname=None):
    self.folder = folder
    self.split = split
    if output_fname is None:
      output_fname = os.path.join(
          folder, '{}_{}x{}.h5'.format(split, opt['height'], opt['width']))
    gt = 'gt_man' if split in ('valid_man', 'test_man') else 'gt'
    self.gt_folder = os.path.join(folder, gt)
    self.image_folder = os.path.join(folder, 'images')
    super().__init__(opt, output_fname)

  def read_ids(self):
    with open(os.path.join(self.folder, f'{self.split}.txt')) as f:
      return [int(l.strip()) for l in f]

  def get_str_id(self, img_id):
    return f'{img_id:06d}'

  def get_image(self, img_id):
    fname = os.path.join(self.image_folder, f'{self.get_str_id(img_id)}.png')
    img = cv2.imread(fname)
    if img is None:
      raise FileNotFoundError(fname)
    return img

  def get_segmentations(self, img_id):
    fname = os.path.join(self.gt_folder, f'{self.get_str_id(img_id)}.png')
    gt_img = cv2.imread(fname)
    if gt_img is None:
      raise FileNotFoundError(fname)
    segm, _ = sep_labels.get_separate_labels(gt_img)
    sem_segm = [np.zeros(segm[0].shape)] if segm else []
    for ss in segm:
      sem_segm[0] = np.maximum(ss, sem_segm[0])
    return segm, sem_segm, [0] * len(segm)


class KITTI(InsSegDataset):

  def get_name(self):
    return 'kitti'

  def get_str_id(self, idx):
    s = str(idx)
    return f'{int(s):06d}' if s.isdigit() else s

  def get_fname(self, idx):
    return f'{self.get_str_id(idx)}.png'

  def get_default_timespan(self):
    return 20
