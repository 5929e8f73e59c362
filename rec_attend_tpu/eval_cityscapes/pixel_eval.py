"""Official Cityscapes pixel-level semantic evaluation.

Capability twin of the vendored ``evalPixelLevelSemanticLabeling.py`` +
its Cython confusion-matrix kernel (ref
data_api/cityscapes_scripts/evaluation/evalPixelLevelSemanticLabeling.py):

- [256, 256] label confusion matrix accumulated with the native C++ kernel
  (native/confusion_matrix.cc);
- per-class IoU and instance-weighted iIoU (ref :215-266, :575-616);
- per-category IoU / iIoU (ref :285-340);
- the four averages the official script reports (ref :342-365).

Instance-level (iIoU) scores need the groundtruth *instanceIds* image per
pair (ids > 1000 encode labelId*1000+instance; ref :582-616).
"""

from __future__ import annotations

import numpy as np

from rec_attend_tpu.data.cityscapes_labels import labels
from rec_attend_tpu.ops import native
from rec_attend_tpu.utils import logger

NUM_LABELS = 256   # label ids are uint8

# Official average instance sizes (pixels) used for instance weighting
# (ref evalPixelLevelSemanticLabeling.py:135-146 — dataset statistics).
AVG_CLASS_SIZE = {
    'bicycle': 4672.3249222261,
    'caravan': 36771.8241758242,
    'motorcycle': 6298.7200839748,
    'rider': 3930.4788056518,
    'bus': 35732.1511111111,
    'train': 67583.7075812274,
    'car': 12794.0202738185,
    'person': 3462.4756337644,
    'truck': 27855.1264367816,
    'trailer': 16926.9763313609,
}

_ID2LABEL = {l.id: l for l in labels}


def eval_labels():
  return [l for l in labels if not l.ignoreInEval]


def _category2labels():
  cats = {}
  for l in labels:
    cats.setdefault(l.category, []).append(l)
  return cats


def instance_categories():
  """Categories whose labels ALL have instances (ref :183-200)."""
  result = {}
  for cat, ls in _category2labels().items():
    if all(l.hasInstances for l in ls):
      result[cat] = [l.id for l in ls]
  return result


class PixelEvaluator:
  """Streaming confusion-matrix + instance-stats pixel evaluator."""

  def __init__(self):
    self.conf = np.zeros((NUM_LABELS, NUM_LABELS), dtype=np.uint64)
    self.log = logger.get()
    # Per-class / per-category instance-weighted tp/fn (ref :171-202).
    self.inst_classes = {
        l.name: dict(tp=0.0, fn=0.0, tp_weighted=0.0, fn_weighted=0.0)
        for l in labels if l.hasInstances and not l.ignoreInEval}
    self.inst_categories = {
        cat: dict(tp=0.0, fn=0.0, tp_weighted=0.0, fn_weighted=0.0,
                  label_ids=ids)
        for cat, ids in instance_categories().items()}

  def add_pair(self, prediction, groundtruth, instance_img=None):
    """prediction/groundtruth: [H, W] uint8 labelId images.

    instance_img: optional [H, W] int32 gt instanceIds image (ids > 1000);
    enables the instance-weighted iIoU statistics (ref :575-616).
    """
    if prediction.shape != groundtruth.shape:
      raise ValueError('prediction/groundtruth shape mismatch')
    native.add_to_confusion_matrix(prediction, groundtruth, NUM_LABELS,
                                   self.conf)
    if instance_img is None:
      return

    category_masks = {
        cat: np.isin(prediction, stats['label_ids'])
        for cat, stats in self.inst_categories.items()}
    for inst_id in np.unique(instance_img[instance_img > 1000]):
      label_id = int(inst_id) // 1000
      label = _ID2LABEL.get(label_id)
      if label is None or label.ignoreInEval:
        continue
      mask = instance_img == inst_id
      inst_size = float(mask.sum())
      tp = float((prediction[mask] == label_id).sum())
      fn = inst_size - tp
      weight = AVG_CLASS_SIZE[label.name] / inst_size
      st = self.inst_classes[label.name]
      st['tp'] += tp
      st['fn'] += fn
      st['tp_weighted'] += tp * weight
      st['fn_weighted'] += fn * weight
      cat = label.category
      if cat in self.inst_categories:
        cat_tp = float(np.logical_and(mask, category_masks[cat]).sum())
        cat_fn = inst_size - cat_tp
        cst = self.inst_categories[cat]
        cst['tp'] += cat_tp
        cst['fn'] += cat_fn
        cst['tp_weighted'] += cat_tp * weight
        cst['fn_weighted'] += cat_fn * weight

  # -- scores ------------------------------------------------------------

  def _fp(self, label_id):
    """FP over non-ignored gt rows, excluding the label itself
    (ref :232-238)."""
    rows = [l.id for l in eval_labels() if l.id != label_id]
    return float(self.conf[rows, label_id].sum())

  def class_iou(self, label_id):
    tp = float(self.conf[label_id, label_id])
    fn = float(self.conf[label_id, :].sum()) - tp
    denom = tp + fn + self._fp(label_id)
    return tp / denom if denom > 0 else float('nan')

  def class_inst_iou(self, label_id):
    """Instance-weighted iIoU (ref getInstanceIouScoreForLabel :245-266)."""
    label = _ID2LABEL[label_id]
    if label.name not in self.inst_classes:
      return float('nan')
    st = self.inst_classes[label.name]
    denom = st['tp_weighted'] + st['fn_weighted'] + self._fp(label_id)
    return st['tp_weighted'] / denom if denom > 0 else float('nan')

  def category_iou(self, category):
    """ref getIouScoreForCategory :285-317."""
    ids = [l.id for l in _category2labels().get(category, ())
           if not l.ignoreInEval]
    if not ids:
      return float('nan')
    sub = self.conf[np.ix_(ids, ids)]
    tp = float(sub.sum())
    fn = float(self.conf[ids, :].sum()) - tp
    rows = [l.id for l in eval_labels() if l.category != category]
    fp = float(self.conf[np.ix_(rows, ids)].sum())
    denom = tp + fn + fp
    return tp / denom if denom > 0 else float('nan')

  def category_inst_iou(self, category):
    """ref getInstanceIouScoreForCategory :319-340."""
    if category not in self.inst_categories:
      return float('nan')
    st = self.inst_categories[category]
    ids = st['label_ids']
    rows = [l.id for l in eval_labels() if l.category != category]
    fp = float(self.conf[np.ix_(rows, ids)].sum())
    denom = st['tp_weighted'] + st['fn_weighted'] + fp
    return st['tp_weighted'] / denom if denom > 0 else float('nan')

  @staticmethod
  def _avg(scores):
    vals = [v for v in scores.values() if not np.isnan(v)]
    return float(np.mean(vals)) if vals else float('nan')

  def finalize(self):
    """All four score families + averages (ref writeJSONFile :342-365)."""
    result = {'classes': {}, 'classesInst': {},
              'categories': {}, 'categoriesInst': {}}
    for l in eval_labels():
      result['classes'][l.name] = self.class_iou(l.id)
      result['classesInst'][l.name] = self.class_inst_iou(l.id)
    for cat in sorted({l.category for l in eval_labels()}):
      result['categories'][cat] = self.category_iou(cat)
      result['categoriesInst'][cat] = self.category_inst_iou(cat)
    result['meanIoU'] = self._avg(result['classes'])
    result['meanInstIoU'] = self._avg(result['classesInst'])
    result['meanCategoryIoU'] = self._avg(result['categories'])
    result['meanCategoryInstIoU'] = self._avg(result['categoriesInst'])
    self.log.info(
        f"mean IoU: {result['meanIoU']:.4f}  "
        f"iIoU: {result['meanInstIoU']:.4f}  "
        f"category IoU: {result['meanCategoryIoU']:.4f}  "
        f"category iIoU: {result['meanCategoryInstIoU']:.4f}")
    return result


def main(argv=None):
  """CLI mirroring the official pixel-eval driver: pairs each gt
  `*_labelIds.png` under the dataset with a prediction png of the same
  city_seq_frame stem under --predictions (ref
  evalPixelLevelSemanticLabeling.py:638-658)."""
  import argparse
  import glob
  import json
  import os

  import cv2

  parser = argparse.ArgumentParser()
  parser.add_argument('--predictions',
                      default=os.environ.get('CITYSCAPES_RESULTS'))
  parser.add_argument('--dataset',
                      default=os.environ.get('CITYSCAPES_DATASET'))
  parser.add_argument('--split',
                      default=os.environ.get('CITYSCAPES_SPLIT', 'val'))
  parser.add_argument('--export', default=None)
  args = parser.parse_args(argv)

  gt_files = sorted(glob.glob(os.path.join(
      args.dataset, 'gtFine', args.split, '*', '*_gtFine_labelIds.png')))
  if not gt_files:
    raise FileNotFoundError(
        f'no *_labelIds.png under {args.dataset}/gtFine/{args.split}')
  ev = PixelEvaluator()
  for gt_file in gt_files:
    stem = '_'.join(os.path.basename(gt_file).split('_')[:3])
    hits = glob.glob(os.path.join(args.predictions, '**', f'{stem}*.png'),
                     recursive=True)
    if not hits:
      raise FileNotFoundError(f'no prediction for {gt_file}')
    # Deterministic pick: the shortest basename is the bare prediction
    # (not a *_overlay/per-class sibling sharing the stem).
    hits.sort(key=lambda p: (len(os.path.basename(p)), p))
    pred = cv2.imread(hits[0], cv2.IMREAD_GRAYSCALE)
    gt = cv2.imread(gt_file, cv2.IMREAD_GRAYSCALE)
    inst_file = gt_file.replace('labelIds', 'instanceIds')
    inst = (cv2.imread(inst_file, -1) if os.path.exists(inst_file)
            else None)
    ev.add_pair(pred, gt,
                instance_img=None if inst is None
                else inst.astype('int64'))
  result = ev.finalize()
  if args.export:
    with open(args.export, 'w') as f:
      json.dump(result, f, indent=2)
  return result


if __name__ == '__main__':
  main()
