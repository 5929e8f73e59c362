"""Offline dataset assembly: raw images -> HDF5 with PNG-encoded blobs.

Capability twin of the reference's ``ins_seg_assembler.py:12-155``; the H5
layout is byte-compatible so files are interchangeable:

  <id>/input                     PNG, resized input image
  <id>/input_full_size           PNG, original resolution
  <id>/label_segmentation/NN     PNG, resized instance mask
  <id>/label_segmentation_full_size/NN
  <id>/label_semantic_segmentation{,_full_size}/NN
  <id>/orientation               PNG, class-encoded 8-bin orientation
  <id>/instance_semantic_classes [T] ints
  <id>/orig_size                 [2] ints
  index_map                      root-level id list

The deterministic shuffle (seed 2) matches the reference
(ins_seg_assembler.py:24-29).
"""

from __future__ import annotations

import cv2
import h5py
import numpy as np

from rec_attend_tpu.data import orientation as orient
from rec_attend_tpu.utils import logger


def png_encode(img):
  return cv2.imencode('.png', img)[1]


def png_decode(buf, flags=-1):
  return cv2.imdecode(np.asarray(buf), flags)


class InsSegAssembler:
  """Subclass and implement read_ids/get_str_id/get_image/get_segmentations."""

  def __init__(self, opt, output_fname):
    self.opt = opt
    self.log = logger.get()
    self.output_fname = output_fname
    self.img_ids = self.read_ids()
    random = np.random.RandomState(2)
    shuffle = np.arange(len(self.img_ids))
    random.shuffle(shuffle)
    self.img_ids = [self.img_ids[shuffle[i]]
                    for i in range(len(self.img_ids))]

  def read_ids(self):
    raise NotImplementedError

  def get_str_id(self, img_id):
    raise NotImplementedError

  def get_image(self, img_id):
    raise NotImplementedError

  def get_segmentations(self, img_id):
    """Returns (instance masks T*[H,W], semantic masks C*[H,W] (entries may
    be None), per-instance semantic class list)."""
    raise NotImplementedError

  def _save(self, key, data, group):
    if key in group:
      del group[key]
    group[key] = data

  def assemble(self):
    inp_height = self.opt['height']
    inp_width = self.opt['width']
    inp_shape = (inp_width, inp_height)
    num_ex = len(self.img_ids)
    self.log.info(f'Writing {num_ex} examples to {self.output_fname}')
    idx_map = []
    max_num_obj = 0
    with h5py.File(self.output_fname, 'a') as h5f:
      for idx in range(num_ex):
        img_id = self.img_ids[idx]
        img_id_str = self.get_str_id(img_id)
        group = h5f.require_group(img_id_str)
        idx_map.append(img_id_str)

        img = self.get_image(img_id)
        self._save('orig_size', np.array(img.shape[:2]), group)
        self._save('input_full_size', png_encode(img), group)
        segm, sem_segm, segm_sem_cls = self.get_segmentations(img_id)

        img_r = cv2.resize(img, inp_shape, interpolation=cv2.INTER_CUBIC)
        self._save('input', png_encode(img_r), group)

        max_num_obj = max(max_num_obj, len(segm))
        if len(segm) > 0:
          all_segs = []
          for jj, ss in enumerate(segm):
            seg = cv2.resize(ss, inp_shape, interpolation=cv2.INTER_NEAREST)
            self._save(f'label_segmentation/{jj:02d}', png_encode(seg), group)
            all_segs.append(seg.reshape([1, 1, inp_height, inp_width]))
            self._save(f'label_segmentation_full_size/{jj:02d}',
                       png_encode(ss), group)
          all_segs = np.concatenate(all_segs, axis=1)
          ori = np.squeeze(
              orient.get_orientation(all_segs, encoding='class'), axis=0)
          self._save('orientation', png_encode(ori), group)

        for jj, ss in enumerate(sem_segm):
          if ss is not None:
            seg = cv2.resize(ss, inp_shape, interpolation=cv2.INTER_NEAREST)
            self._save(f'label_semantic_segmentation/{jj:02d}',
                       png_encode(seg), group)
            self._save(f'label_semantic_segmentation_full_size/{jj:02d}',
                       png_encode(ss), group)

        self._save('instance_semantic_classes', np.array(segm_sem_cls),
                   group)

      self._save('index_map',
                 np.array([s.encode() if isinstance(s, str) else s
                           for s in idx_map]), h5f)
    self.log.info(f'Maximum number of objects: {max_num_obj}')
