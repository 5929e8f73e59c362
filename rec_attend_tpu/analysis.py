"""Streaming metric analyzers and output renderers.

Capability twin of the reference's ``analysis.py``: a ``create_analyzer``
factory producing streaming ``stage(results)/finalize()`` analyzers over a
results dict with keys

  y_out, y_gt  - lists of [T, H, W] binary masks (variable sizes per image)
  s_out, s_gt  - [B, T] scores
  iou_pairwise - list of [T, T] prediction x GT IoU matrices
  indices      - image ids

Metric functions return per-example arrays; StatsAnalyzer accumulates
mean/std and writes per-example CSVs (analysis.py:790-831).  Renderers dump
instance colormaps, GT-matched colours, orientation/foreground maps and the
official Cityscapes submission format (mask PNGs + txt with labelID+conf).
"""

from __future__ import annotations

import os
import time

import cv2
import numpy as np

from rec_attend_tpu.data import orientation as orient_lib
from rec_attend_tpu.utils import logger


# ---------------------------------------------------------------------------
# Numpy scoring primitives (ref analysis.py:300-388)
# ---------------------------------------------------------------------------

def f_iou(a, b):
  inter = (a * b).sum(axis=-1).sum(axis=-1)
  union = (a + b).sum(axis=-1).sum(axis=-1) - inter
  return inter / (union + np.equal(union, 0).astype('float32'))


def f_iou_pairwise(a, b):
  """[T, H, W] x [T', H, W] -> [T, T']."""
  return f_iou(np.expand_dims(a, 1), np.expand_dims(b, 0))


def _f_pr(a, b):
  inter = (a * b).sum(axis=-1).sum(axis=-1)
  asum = a.sum(axis=-1).sum(axis=-1)
  return inter / (asum + np.equal(asum, 0).astype('float32'))


def _f_dice(a, b):
  card_a = a.sum(axis=-1).sum(axis=-1)
  card_b = b.sum(axis=-1).sum(axis=-1)
  card_ab = (a * b).sum(axis=-1).sum(axis=-1)
  card_sum = card_a + card_b
  return 2 * card_ab / (card_sum + np.equal(card_sum, 0).astype('float32'))


def _f_best_dice(a, b):
  bd = np.zeros([a.shape[0]])
  for ii in range(a.shape[0]):
    bd[ii] = _f_dice(a[ii:ii + 1], b).max(axis=0)
  return bd


def f_count_out(y_out):
  return np.array([(_y.sum(axis=-1).sum(axis=-1) > 0).astype('float32')
                   for _y in y_out])


def _f_num_obj(s_gt):
  return np.maximum(s_gt.sum(axis=1), 1)


# ---------------------------------------------------------------------------
# Metric functions over the results dict (ref analysis.py:404-787)
# ---------------------------------------------------------------------------

def f_symmetric_best_dice(results):
  """SBD = min(BestDice(pred->gt), BestDice(gt->pred)), averaged over the
  first num_obj GT slots (ref analysis.py:434-460)."""
  y_out, y_gt = results['y_out'], results['y_gt']
  num_obj = _f_num_obj(results['s_gt'])

  def f_bd(a, b):
    num_ex = len(a)
    bd_mean = np.zeros([num_ex])
    for ii in range(num_ex):
      bd = _f_best_dice(a[ii], b[ii])
      bd_mean[ii] = bd[:int(num_obj[ii])].mean()
    return bd_mean

  return np.minimum(f_bd(y_out, y_gt), f_bd(y_gt, y_out))


def f_ins_iou(results):
  """Average instance IoU under Hungarian matching (ref analysis.py:404-431,
  which called the TF custom op; we use the in-package matcher)."""
  from rec_attend_tpu.ops import native
  y_gt = results['y_gt']
  num_obj = _f_num_obj(results['s_gt'])
  num_ex = len(y_gt)
  out = np.zeros([num_ex])
  for ii in range(num_ex):
    iou_pw = results['iou_pairwise'][ii]
    iou_pw = np.maximum(1e-4, iou_pw)
    iou_pw = np.round(iou_pw * 1e4) / 1e4
    match, _, _ = native.hungarian_native(iou_pw.astype('float32'))
    n = int(num_obj[ii])
    match[n:, :] = 0.0
    match[:, n:] = 0.0
    out[ii] = (iou_pw * match).sum() / n
  return out


def _f_coverage(results, weighted=False):
  y_gt = results['y_gt']
  num_obj = _f_num_obj(results['s_gt'])
  num_ex = len(y_gt)
  cov = np.array([iou_.max(axis=0) for iou_ in results['iou_pairwise']])
  timespan = y_gt[0].shape[0]
  weights = np.zeros([num_ex, timespan])
  for ii in range(num_ex):
    if weighted:
      y_gt_sum = y_gt[ii].sum()
      weights[ii] = (y_gt[ii].sum(axis=-1).sum(axis=-1) /
                     (y_gt_sum + np.equal(y_gt_sum, 0).astype('float32')))
    else:
      weights[ii] = 1 / num_obj[ii]
  cov = cov * weights
  return np.array([cov[ii, :int(num_obj[ii])].sum() for ii in range(num_ex)])


def f_wt_coverage(results):
  return _f_coverage(results, weighted=True)


def f_unwt_coverage(results):
  return _f_coverage(results, weighted=False)


def f_fg_iou(results):
  y_out, y_gt = results['y_out'], results['y_gt']
  out = np.zeros([len(y_gt)])
  for ii in range(len(y_gt)):
    a, b = y_out[ii], y_gt[ii]
    if a.ndim == 3:
      a, b = a.max(axis=0), b.max(axis=0)
    out[ii] = f_iou(a, b)
  return out


def f_fg_dice(results):
  y_out, y_gt = results['y_out'], results['y_gt']
  out = np.zeros([len(y_gt)])
  for ii in range(len(y_gt)):
    a, b = y_out[ii], y_gt[ii]
    if a.ndim == 3:
      a, b = a.max(axis=0), b.max(axis=0)
    out[ii] = _f_dice(a, b)
  return out


def f_fp(results):
  """False positives: nonempty predictions with zero IoU against all GT."""
  y_out = results['y_out']
  num_ex = len(y_out)
  fp = np.zeros([num_ex])
  for ii in range(num_ex):
    y_out_sum = (y_out[ii].sum(axis=-1).sum(axis=-1) > 0).astype('float32')
    unmatch = np.equal(results['iou_pairwise'][ii].sum(axis=1),
                       0).astype('float32')
    fp[ii] = (y_out_sum * unmatch).sum()
  return fp


def f_fn(results):
  """False negatives: GT instances with zero IoU against all predictions."""
  s_gt = results['s_gt']
  num_ex = s_gt.shape[0]
  fn = np.zeros([num_ex])
  for ii in range(num_ex):
    unmatch = np.equal(results['iou_pairwise'][ii].sum(axis=0),
                       0).astype('float32')
    fn[ii] = (s_gt[ii] * unmatch).sum()
  return fn


def f_pixel_pr(results):
  y_out, y_gt = results['y_out'], results['y_gt']
  count_out = f_count_out(y_out)
  vals = []
  for ii in range(len(y_gt)):
    y_gt_sum = y_gt[ii].max(axis=0, keepdims=True)
    pr = _f_pr(y_out[ii], y_gt_sum)
    for jj in range(y_gt[ii].shape[0]):
      if count_out[ii, jj] > 0:
        vals.append(pr[jj])
  return np.array(vals) if vals else np.zeros([0])


def f_pixel_re(results):
  y_out, y_gt = results['y_out'], results['y_gt']
  count_gt = results['s_gt'].sum(axis=1)
  vals = []
  for ii in range(len(y_gt)):
    y_out_sum = y_out[ii].max(axis=0, keepdims=True)
    re = _f_pr(y_gt[ii], y_out_sum)
    for jj in range(int(count_gt[ii])):
      vals.append(re[jj])
  return np.array(vals) if vals else np.zeros([0])


def f_obj_pr(results):
  y_out = results['y_out']
  count_out = f_count_out(y_out)
  vals = []
  for ii in range(len(y_out)):
    matched = (results['iou_pairwise'][ii].max(axis=1) >=
               0.5).astype('float32')
    for jj in range(y_out[ii].shape[0]):
      if count_out[ii, jj] > 0:
        vals.append(matched[jj])
  return np.array(vals) if vals else np.zeros([0])


def f_obj_re(results):
  count_gt = results['s_gt'].sum(axis=1)
  vals = []
  for ii in range(len(results['y_gt'])):
    matched = (results['iou_pairwise'][ii].max(axis=0) >=
               0.5).astype('float32')
    for jj in range(int(count_gt[ii])):
      vals.append(matched[jj])
  return np.array(vals) if vals else np.zeros([0])


def f_count_acc(results):
  count_out = f_count_out(results['y_out']).sum(axis=1)
  count_gt = results['s_gt'].sum(axis=1)
  return (count_out == count_gt).astype('float')


def f_count_mse(results):
  count_out = f_count_out(results['y_out']).sum(axis=1)
  count_gt = results['s_gt'].sum(axis=1)
  return (count_out - count_gt).astype('float') ** 2


def f_dic(results):
  count_out = f_count_out(results['y_out']).sum(axis=1)
  count_gt = results['s_gt'].sum(axis=1)
  return count_out - count_gt


def f_dic_abs(results):
  return np.abs(f_dic(results))


# ---------------------------------------------------------------------------
# Analyzer framework (ref analysis.py:52-64, 790-906)
# ---------------------------------------------------------------------------

class AnalyzerBase:

  def __init__(self, name):
    self.name = name
    self.log = logger.get()

  def stage(self, results):
    pass

  def finalize(self):
    pass


class StatsAnalyzer(AnalyzerBase):
  """Streaming mean/std with a per-example CSV."""

  def __init__(self, name, func, fname=None):
    super().__init__(name)
    self.sum = 0.0
    self.sum2 = 0.0
    self.num_ex = 0
    self.func = func
    self.fname = fname
    self.mean = None
    self.std = None
    if fname:
      os.makedirs(os.path.dirname(fname) or '.', exist_ok=True)
      with open(fname, 'w') as f:
        f.write('ID,Score\n')

  def stage(self, results):
    start = time.time()
    vals = self.func(results)
    n = vals.shape[0]
    self.num_ex += n
    self.sum += vals.sum()
    self.sum2 += (vals ** 2).sum()
    if self.fname:
      ids = results.get('indices', [0] * n)
      with open(self.fname, 'a') as f:
        for ii in range(n):
          idx = ids[ii] if ii < len(ids) else 0
          f.write(f'{idx},{vals[ii]:.4f}\n')
    self.log.debug(
        f'{self.name} finished in {(time.time() - start) * 1000:.2f}ms')

  def finalize(self):
    mean = self.sum / max(self.num_ex, 1)
    std = np.sqrt(max(0.0, self.sum2 / max(self.num_ex, 1) - mean ** 2))
    self.mean, self.std = mean, std
    self.log.info(f'{self.name:17s}{mean:7.4f} ({std:6.4f})')
    if self.fname:
      with open(self.fname, 'a') as f:
        f.write(f'Mean,{mean:.4f}\nStd,{std:.4f}\n')
    return mean, std


class ForegroundIOUAnalyzer(AnalyzerBase):
  """Dataset-level FG IoU (single accumulated inter/union)."""

  def __init__(self, name='FG IOU ALL', fname=None, background=False):
    super().__init__(name)
    self.inter = 0.0
    self.union = 0.0
    self.background = background
    self.mean = None

  def stage(self, results):
    for a, b in zip(results['y_out'], results['y_gt']):
      if a.ndim == 3:
        a, b = a.max(axis=0), b.max(axis=0)
      if self.background:
        a, b = 1 - a, 1 - b
      inter = (a * b).sum()
      self.inter += inter
      self.union += a.sum() + b.sum() - inter

  def finalize(self):
    iou = self.inter / max(self.union, 1e-7)
    self.mean = iou
    self.log.info(f'{self.name:17s}{iou:7.4f}')
    return iou, 0.0


class CountAnalyzer(AnalyzerBase):

  def __init__(self, fname, name='count_rec'):
    super().__init__(name)
    self.fname = fname
    os.makedirs(os.path.dirname(fname) or '.', exist_ok=True)
    with open(fname, 'w') as f:
      f.write('Image ID,Count Out,Count GT\n')

  def stage(self, results):
    count_out = f_count_out(results['y_out']).sum(axis=1)
    count_gt = results['s_gt'].sum(axis=1)
    with open(self.fname, 'a') as f:
      for ii, idx in enumerate(results['indices']):
        f.write(f'{idx},{int(count_out[ii]):d},{int(count_gt[ii]):d}\n')


_ANALYZERS = {
    'sbd': f_symmetric_best_dice,
    'ins_iou': f_ins_iou,
    'wt_cov': f_wt_coverage,
    'unwt_cov': f_unwt_coverage,
    'fg_dice': f_fg_dice,
    'fg_iou': f_fg_iou,
    'avg_fp': f_fp,
    'avg_fn': f_fn,
    'avg_pr': f_pixel_pr,
    'avg_re': f_pixel_re,
    'obj_pr': f_obj_pr,
    'obj_re': f_obj_re,
    'count_acc': f_count_acc,
    'count_mse': f_count_mse,
    'dic': f_dic,
    'dic_abs': f_dic_abs,
}


def create_analyzer(name, display_name=None, fname=None):
  if display_name is None:
    display_name = name
  name = name.lower()
  if name == 'fg_iou_all':
    return ForegroundIOUAnalyzer(display_name, fname=fname)
  if name == 'bg_iou_all':
    return ForegroundIOUAnalyzer(display_name, fname=fname, background=True)
  if name == 'count':
    return CountAnalyzer(fname=fname)
  if name in _ANALYZERS:
    return StatsAnalyzer(display_name, _ANALYZERS[name], fname=fname)
  raise ValueError(f'Analyzer not found: {name}')


# ---------------------------------------------------------------------------
# Renderers (ref analysis.py:95-311)
# ---------------------------------------------------------------------------

_CMAP = np.array(
    [[192, 57, 43], [243, 156, 18], [26, 188, 156], [41, 128, 185],
     [142, 68, 173], [44, 62, 80], [127, 140, 141], [17, 75, 95],
     [2, 128, 144], [228, 253, 225], [69, 105, 144], [244, 91, 105],
     [91, 192, 235], [253, 231, 76], [155, 197, 61], [229, 89, 52],
     [250, 121, 33], [124, 82, 47], [86, 15, 94], [38, 63, 77], [1, 52, 55],
     [63, 29, 82]], dtype='uint8')


class RenderInstanceAnalyzer(AnalyzerBase):
  """Instance colormap PNG per image (ref analysis.py:95-153)."""

  def __init__(self, folder, dataset, semantic_labels=None):
    super().__init__('render_ins')
    self.folder = folder
    self.dataset = dataset
    self.cmap = _CMAP
    os.makedirs(folder, exist_ok=True)

  def _fname(self, idx):
    get_fname = getattr(self.dataset, 'get_fname', None)
    if get_fname is not None:
      try:
        return get_fname(idx)
      except Exception:
        pass
    return f'{idx}.png'

  def stage(self, results):
    for ii in range(len(results['y_out'])):
      y = results['y_out'][ii]
      total = np.zeros([y.shape[1], y.shape[2], 3], dtype='uint8')
      for jj in range(y.shape[0]):
        y_jj = y[jj].astype('uint8')
        if y_jj.sum() > 0:
          total += np.expand_dims(y_jj, 2) * self.cmap[jj % len(self.cmap)]
      cv2.imwrite(os.path.join(self.folder,
                               self._fname(results['indices'][ii])),
                  total[:, :, ::-1])


class RenderGroundtruthInstanceAnalyzer(RenderInstanceAnalyzer):
  """GT instances coloured by their best-matching prediction's colour
  (ref analysis.py:156-193)."""

  def stage(self, results):
    num_color = len(self.cmap)
    for ii in range(len(results['y_gt'])):
      y_gt = results['y_gt'][ii]
      iou_pw = results['iou_pairwise'][ii]
      total = np.zeros([y_gt.shape[1], y_gt.shape[2], 3], dtype='uint8')
      flag = np.zeros(num_color)
      for jj in range(y_gt.shape[0]):
        y_jj = y_gt[jj].astype('uint8')
        max_idx = int(np.argmax(iou_pw[:, jj]))
        if flag[max_idx] == 0:
          color = self.cmap[max_idx]
          flag[max_idx] = 1
        else:
          color = self.cmap[-1]
          for kk in range(num_color):
            idx = num_color - kk - 1
            if flag[idx] == 0:
              color = self.cmap[idx]
              flag[idx] = 1
              break
        total += ((total == 0).astype('uint8') * np.expand_dims(y_jj, 2)
                  * color)
      cv2.imwrite(os.path.join(self.folder,
                               self._fname(results['indices'][ii])),
                  total[:, :, ::-1])


class RenderCityScapesOutputAnalyzer(AnalyzerBase):
  """Official Cityscapes submission writer: per-instance mask PNGs + a txt
  listing (file, labelID, confidence) (ref analysis.py:196-267).

  Class decision per instance: average the semantic-channel vector under the
  mask; skip if background prob > 0.7 else argmax of the 8 classes."""

  LABELS = [('person', 24), ('rider', 25), ('car', 26), ('truck', 27),
            ('bus', 28), ('train', 31), ('motorcycle', 32), ('bicycle', 33)]

  def __init__(self, folder, dataset):
    super().__init__('render_cs')
    self.folder = folder
    self.dataset = dataset
    os.makedirs(folder, exist_ok=True)

  def stage(self, results):
    y_out = results['y_out']
    fg = results['y_in']         # [H, W, 1+8] semantic probabilities
    score = results['conf']
    for ii in range(len(y_out)):
      fn1 = self.dataset.get_fname(results['indices'][ii])
      runname = fn1.split('_')[0]
      runfolder = os.path.join(self.folder, runname)
      os.makedirs(runfolder, exist_ok=True)
      text_fn = os.path.join(runfolder, fn1[:-len('.png')] + '.txt')
      with open(text_fn, 'w') as text_file:
        for jj in range(y_out[ii].shape[0]):
          if score[ii][jj] > 0.5:
            seg = y_out[ii][jj]
            mask_area = seg.sum()
            if mask_area == 0:
              continue
            channel_vec = (np.expand_dims(seg, -1) * fg[ii]).mean(
                axis=0).mean(axis=0)
            if channel_vec[0] <= 0.7:
              sem_idx = int(np.argmax(channel_vec[1:]))
              label_num = self.LABELS[sem_idx][1]
              img_file = fn1[:-len('.png')] + f'_{jj:03d}.png'
              cv2.imwrite(os.path.join(runfolder, img_file),
                          (seg * 255).astype('uint8'))
              text_file.write(
                  f'{img_file} {label_num:d} {score[ii, jj]:f}\n')


class RenderOrientationAnalyzer(RenderInstanceAnalyzer):

  def stage(self, results):
    for ii in range(len(results['mask'])):
      img = orient_lib.build_orientation_img(results['d_out'][ii],
                                             results['mask'][ii])
      cv2.imwrite(os.path.join(self.folder,
                               self._fname(results['indices'][ii])),
                  img)


class RenderForegroundAnalyzer(AnalyzerBase):

  def __init__(self, folder, dataset):
    super().__init__('render_fg')
    self.folder = folder
    self.dataset = dataset
    os.makedirs(folder, exist_ok=True)

  def stage(self, results):
    for ii in range(len(results['y_out'])):
      y = (results['y_out'][ii] * 255).astype('uint8')
      fname = getattr(self.dataset, 'get_fname',
                      lambda i: f'{i}.png')(results['indices'][ii])
      cv2.imwrite(os.path.join(self.folder, fname), y)
