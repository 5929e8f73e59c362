"""Official Cityscapes pixel-level semantic evaluation.

Capability twin of the vendored ``evalPixelLevelSemanticLabeling.py`` +
its Cython confusion-matrix kernel: accumulate a [256, 256] label confusion
matrix with the native C++ kernel (native/confusion_matrix.cc) and report
per-class and mean IoU over the evaluation classes.
"""

from __future__ import annotations

import numpy as np

from rec_attend_tpu.data.cityscapes_labels import labels
from rec_attend_tpu.ops import native
from rec_attend_tpu.utils import logger

NUM_LABELS = 256   # label ids are uint8


def eval_labels():
  return [l for l in labels if not l.ignoreInEval]


class PixelEvaluator:
  """Streaming confusion-matrix pixel evaluator."""

  def __init__(self):
    self.conf = np.zeros((NUM_LABELS, NUM_LABELS), dtype=np.uint64)
    self.log = logger.get()

  def add_pair(self, prediction, groundtruth):
    """prediction/groundtruth: [H, W] uint8 labelId images."""
    if prediction.shape != groundtruth.shape:
      raise ValueError('prediction/groundtruth shape mismatch')
    native.add_to_confusion_matrix(prediction, groundtruth, NUM_LABELS,
                                   self.conf)

  def class_iou(self, label_id):
    tp = float(self.conf[label_id, label_id])
    fn = float(self.conf[label_id, :].sum()) - tp
    # FP: predictions of this class on pixels whose gt participates in eval.
    eval_ids = [l.id for l in eval_labels()]
    fp = float(self.conf[eval_ids, label_id].sum()) - tp
    denom = tp + fn + fp
    return tp / denom if denom > 0 else float('nan')

  def finalize(self):
    result = {'classes': {}}
    ious = []
    for l in eval_labels():
      iou = self.class_iou(l.id)
      result['classes'][l.name] = iou
      if not np.isnan(iou):
        ious.append(iou)
    result['meanIoU'] = float(np.mean(ious)) if ious else float('nan')
    self.log.info(f"mean IoU: {result['meanIoU']:.4f}")
    return result
