"""Cityscapes 8-class instance dataset (ref data_api/cityscapes.py)."""

from __future__ import annotations

import os

import cv2
import numpy as np

from rec_attend_tpu.data import sep_labels
from rec_attend_tpu.data.assembler import InsSegAssembler
from rec_attend_tpu.data.cityscapes_labels import id2label
from rec_attend_tpu.data.dataset import InsSegDataset


class CityscapesAssembler(InsSegAssembler):
  """Walks leftImg8bit runs and decodes *_instanceIds.png: pixel ids >1000
  encode semClass*1000+instance; ids map through the label table to the 8
  instance trainIds (ref cityscapes.py:88-119)."""

  def __init__(self, folder, opt, split='train', output_fname=None,
               coarse_label=False):
    self.folder = folder
    self.split = split
    if output_fname is None:
      output_fname = os.path.join(
          folder, '{}_{}x{}.h5'.format(split, opt['height'], opt['width']))
    splitname = 'val' if split == 'valid' else split
    img_folder = ('leftImg8bit_trainextra/leftImg8bit'
                  if split == 'train_extra' else 'leftImg8bit')
    gt_folder = 'gtCoarse' if coarse_label else 'gtFine'
    self.gt_subfolder = gt_folder
    self.gt_folder = os.path.join(folder, gt_folder, splitname)
    self.image_folder = os.path.join(folder, img_folder, splitname)
    super().__init__(opt, output_fname)

  def read_ids(self):
    image_ids = []
    for run in sorted(os.listdir(self.image_folder)):
      run_folder = os.path.join(self.image_folder, run)
      image_ids.extend(f.split('_leftImg8bit.png')[0]
                       for f in sorted(os.listdir(run_folder)))
    return image_ids

  def get_str_id(self, img_id):
    return img_id

  def get_image(self, img_id):
    run = img_id.split('_')[0]
    fname = os.path.join(self.image_folder, run,
                         img_id + '_leftImg8bit.png')
    img = cv2.imread(fname)
    if img is None:
      raise FileNotFoundError(fname)
    return img

  def get_segmentations(self, img_id):
    run = img_id.split('_')[0]
    fname = os.path.join(
        self.gt_folder, run,
        f'{img_id}_{self.gt_subfolder}_instanceIds.png')
    gt_img = cv2.imread(fname, -1)
    if gt_img is None:
      self.log.warning(f'GT image does not exist: {fname}')
      segm, colors = [], []
    else:
      segm, colors = sep_labels.get_separate_labels(gt_img)
    sem_segm = [None] * 8
    segm_final = []
    segm_sem_cls = []
    for ss, cc in zip(segm, colors):
      if cc > 1000:
        sem_cls = int(cc) // 1000
        label = id2label[sem_cls]
        if label.trainId > 0:
          train_id = label.trainId
          segm_final.append(ss)
          if sem_segm[train_id - 1] is None:
            sem_segm[train_id - 1] = np.zeros(ss.shape)
          sem_segm[train_id - 1] = np.maximum(sem_segm[train_id - 1], ss)
          segm_sem_cls.append(train_id - 1)
    return segm_final, sem_segm, segm_sem_cls


class Cityscapes(InsSegDataset):

  def get_name(self):
    return 'cityscapes'

  def get_str_id(self, idx):
    return str(idx)

  def get_fname(self, idx):
    return f'{self.get_str_id(idx)}_gtFine_instanceIds.png'

  def get_num_semantic_classes(self):
    return 8

  def get_default_timespan(self):
    return 20

  def get_batch(self, idx, timespan=None, variables=None):
    """Adds per-example sem/ori weights downweighting coarse train_extra
    data (ref cityscapes.py:140-158)."""
    batch = super().get_batch(idx, timespan=timespan, variables=variables)
    sem_weights = np.ones(len(idx))
    ori_weights = np.ones(len(idx))
    if 'source' in batch:
      for kk, src in enumerate(batch['source']):
        if src == 'train_extra':
          sem_weights[kk] = 0.1
          ori_weights[kk] = 0.0
        elif src in ('train', 'valid'):
          sem_weights[kk] = 1.0
          ori_weights[kk] = 1.0
        else:
          raise ValueError(f'Unknown data source "{src}"')
    batch['sem_weights'] = sem_weights
    batch['ori_weights'] = ori_weights
    return batch
