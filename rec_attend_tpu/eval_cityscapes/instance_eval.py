"""Official Cityscapes instance-level AP evaluation.

Capability twin of the vendored toolkit script the reference drives
(``data_api/cityscapes_scripts/evaluation/evalInstanceLevelSemanticLabeling
.py``), implemented fresh against the same algorithm:

  - overlaps 0.5:0.05:0.95, min region size 100 px (distance-based variants
    — 50m/100m with min size 1000 — computed only when distance data is
    available, as the official script);
  - predictions are (mask PNG, labelID, confidence) triples listed in a
    per-image txt, the submission format our
    ``analysis.RenderCityScapesOutputAnalyzer`` writes;
  - matching semantics: a prediction matches a gt instance at threshold o
    if intersection / union > o; double matches of one gt demote the lower
    score to a false positive; unmatched predictions are ignored when the
    proportion of void/group/undersized-gt pixels exceeds the threshold;
  - AP is the step-integrated precision-recall curve over unique score
    thresholds, averaged over overlaps then classes (NaN-mean over classes
    without gt+pred).

Returns the same headline numbers: AP, AP_50% (+ per class).
"""

from __future__ import annotations

import glob
import json
import os

import cv2
import numpy as np

from rec_attend_tpu.data.cityscapes_labels import id2label, labels
from rec_attend_tpu.utils import logger

OVERLAPS = np.arange(0.5, 1.0, 0.05)
MIN_REGION_SIZES = [100, 1000, 1000]
DISTANCE_THS = [float('inf'), 100.0, 50.0]
DISTANCE_CONFS = [-float('inf'), 0.5, 0.5]


def instance_labels():
  return [l.name for l in labels if l.hasInstances and not l.ignoreInEval]


# Nominal Cityscapes stereo rig (per-image camera JSONs override these):
# baseline in metres, focal length in pixels at full 2048x1024 resolution.
NOMINAL_BASELINE = 0.209313
NOMINAL_FX = 2262.52


def disparity_to_distance(disp_png, baseline=NOMINAL_BASELINE,
                          fx=NOMINAL_FX):
  """Decode an official `_disparity.png` into metric distance [m].

  Cityscapes encoding: pixel value p > 0 means disparity d = (p - 1) / 256
  (p == 0 marks invalid measurements); depth = baseline * fx / d.  This is
  the disparity->distance step the vendored toolkit left to an external
  depth pipeline (the reference's Instance keeps medDist = -1,
  instance.py:10), completing AP_100m / AP_50m end-to-end.

  Returns float32 distances with NaN where invalid.
  """
  disp_png = np.asarray(disp_png, np.float32)
  d = (disp_png - 1.0) / 256.0
  dist = np.where(disp_png > 0, baseline * fx / np.maximum(d, 1e-9),
                  np.nan)
  return dist.astype(np.float32)


def load_camera(camera_json):
  """(baseline, fx) from an official `_camera.json`."""
  with open(camera_json) as f:
    cam = json.load(f)
  return (float(cam['extrinsic']['baseline']),
          float(cam['intrinsic']['fx']))


def get_gt_instances(gt_img, distance_img=None):
  """Extract gt instances from an instanceIds image.

  distance_img: optional [H, W] metric distance map (NaN = invalid, e.g.
  from ``disparity_to_distance``); fills medDist (median distance over
  valid pixels) and distConf (valid-pixel fraction), enabling the
  distance-limited AP rows
  (ref evalInstanceLevelSemanticLabeling.py:134-140, :416).

  Returns dict labelName -> list of instance dicts."""
  inst = {}
  ids, counts = np.unique(gt_img, return_counts=True)
  for inst_id, count in zip(ids.tolist(), counts.tolist()):
    label_id = inst_id // 1000 if inst_id >= 1000 else inst_id
    if label_id not in id2label:
      continue
    label = id2label[label_id]
    if not label.hasInstances:
      continue
    med_dist, dist_conf = -1.0, 0.0
    if distance_img is not None:
      dists = distance_img[gt_img == inst_id]
      valid = dists[np.isfinite(dists)]
      if valid.size:
        med_dist = float(np.median(valid))
        dist_conf = float(valid.size) / float(count)
    inst.setdefault(label.name, []).append({
        'instID': int(inst_id), 'labelID': int(label_id),
        'pixelCount': int(count), 'medDist': med_dist,
        'distConf': dist_conf,
    })
  return inst


def read_pred_info(pred_txt):
  """Parse a prediction txt: relPath labelID confidence per line."""
  preds = []
  base = os.path.dirname(pred_txt)
  with open(pred_txt) as f:
    for line in f:
      parts = line.split()
      if len(parts) != 3:
        raise ValueError(
            f'Invalid prediction line in {pred_txt}: {line!r}')
      preds.append({
          'maskFile': os.path.join(base, parts[0]),
          'labelID': int(float(parts[1])),
          'conf': float(parts[2]),
      })
  return preds


def assign_gt_to_preds(gt_instances, gt_img, pred_info, inst_labels):
  """Cross-populate matchedGt / matchedPred with intersections."""
  pred_instances = {l: [] for l in inst_labels}
  gt_instances = {l: [dict(g, matchedPred=[]) for g in gl]
                  for l, gl in gt_instances.items() if l in inst_labels}

  void_ids = [l.id for l in labels if l.ignoreInEval]
  bool_void = np.isin(gt_img, void_ids)

  count = 0
  for pred in pred_info:
    if pred['labelID'] not in id2label:
      continue
    label_name = id2label[pred['labelID']].name
    if label_name not in inst_labels:
      continue
    pred_img = cv2.imread(pred['maskFile'], cv2.IMREAD_GRAYSCALE)
    if pred_img is None:
      raise FileNotFoundError(pred['maskFile'])
    bool_pred = pred_img != 0
    pixel_count = int(np.count_nonzero(bool_pred))
    if pixel_count == 0:
      continue
    pred_instance = {
        'imgName': pred['maskFile'], 'predID': count,
        'labelID': pred['labelID'], 'pixelCount': pixel_count,
        'confidence': pred['conf'],
        'voidIntersection': int(np.count_nonzero(bool_void & bool_pred)),
        'matchedGt': [],
    }
    for gt_num, gt in enumerate(gt_instances.get(label_name, [])):
      intersection = int(np.count_nonzero(
          (gt_img == gt['instID']) & bool_pred))
      if intersection > 0:
        gt_copy = {k: v for k, v in gt.items() if k != 'matchedPred'}
        pred_copy = {k: v for k, v in pred_instance.items()
                     if k != 'matchedGt'}
        gt_copy['intersection'] = intersection
        pred_copy['intersection'] = intersection
        pred_instance['matchedGt'].append(gt_copy)
        gt_instances[label_name][gt_num]['matchedPred'].append(pred_copy)
    count += 1
    pred_instances[label_name].append(pred_instance)
  return gt_instances, pred_instances


def evaluate_matches(matches, inst_labels, distance_available=False):
  """AP per (distance setting, class, overlap)."""
  if distance_available:
    min_sizes, dist_ths, dist_confs = (MIN_REGION_SIZES, DISTANCE_THS,
                                       DISTANCE_CONFS)
  else:
    min_sizes, dist_ths, dist_confs = ([MIN_REGION_SIZES[0]],
                                       [DISTANCE_THS[0]],
                                       [DISTANCE_CONFS[0]])
  ap = np.zeros((len(dist_ths), len(inst_labels), len(OVERLAPS)))

  for d_i, (min_size, dist_th, dist_conf) in enumerate(
      zip(min_sizes, dist_ths, dist_confs)):
    for o_i, overlap_th in enumerate(OVERLAPS):
      for l_i, label_name in enumerate(inst_labels):
        y_true = []
        y_score = []
        hard_fns = 0
        have_gt = False
        have_pred = False
        for img in matches:
          preds = matches[img]['prediction'].get(label_name, [])
          gts = matches[img]['groundTruth'].get(label_name, [])
          gts = [g for g in gts
                 if g['instID'] >= 1000 and g['pixelCount'] >= min_size
                 and g['medDist'] <= dist_th and g['distConf'] >= dist_conf]
          if gts:
            have_gt = True
          if preds:
            have_pred = True

          cur_true = [1.0] * len(gts)
          cur_score = [-float('inf')] * len(gts)
          cur_match = [False] * len(gts)

          for gt_i, gt in enumerate(gts):
            found_match = False
            for pred in gt['matchedPred']:
              overlap = pred['intersection'] / (
                  gt['pixelCount'] + pred['pixelCount']
                  - pred['intersection'])
              if overlap > overlap_th:
                confidence = pred['confidence']
                if cur_match[gt_i]:
                  # Second match: lower score becomes a false positive.
                  max_s = max(cur_score[gt_i], confidence)
                  min_s = min(cur_score[gt_i], confidence)
                  cur_score[gt_i] = max_s
                  cur_true.append(0.0)
                  cur_score.append(min_s)
                  cur_match.append(True)
                else:
                  found_match = True
                  cur_match[gt_i] = True
                  cur_score[gt_i] = confidence
            if not found_match:
              hard_fns += 1

          cur_true = [t for t, m in zip(cur_true, cur_match) if m]
          cur_score = [s for s, m in zip(cur_score, cur_match) if m]

          for pred in preds:
            found_gt = False
            for gt in pred['matchedGt']:
              overlap = gt['intersection'] / (
                  gt['pixelCount'] + pred['pixelCount']
                  - gt['intersection'])
              if overlap > overlap_th:
                found_gt = True
                break
            if not found_gt:
              nb_ignore = pred['voidIntersection']
              for gt in pred['matchedGt']:
                if gt['instID'] < 1000:        # group region
                  nb_ignore += gt['intersection']
                if (gt['pixelCount'] < min_size or gt['medDist'] > dist_th
                    or gt['distConf'] < dist_conf):
                  nb_ignore += gt['intersection']
              if nb_ignore / pred['pixelCount'] <= overlap_th:
                cur_true.append(0.0)
                cur_score.append(pred['confidence'])

          y_true.extend(cur_true)
          y_score.extend(cur_score)

        if have_gt and have_pred:
          ap[d_i, l_i, o_i] = _average_precision(
              np.array(y_true), np.array(y_score), hard_fns)
        elif have_gt:
          ap[d_i, l_i, o_i] = 0.0
        else:
          ap[d_i, l_i, o_i] = float('nan')
  return ap


def _average_precision(y_true, y_score, hard_fns):
  """Step-integrated PR curve (official convolution formulation)."""
  order = np.argsort(y_score)
  y_score_sorted = y_score[order]
  y_true_sorted = y_true[order]
  cumsum = np.cumsum(y_true_sorted)
  thresholds, unique_idx = np.unique(y_score_sorted, return_index=True)
  nb_pr = len(unique_idx) + 1
  nb_examples = len(y_score_sorted)
  nb_true = cumsum[-1] if len(cumsum) else 0
  precision = np.zeros(nb_pr)
  recall = np.zeros(nb_pr)
  cumsum = np.append(cumsum, 0)
  for idx_res, idx_scores in enumerate(unique_idx):
    cs = cumsum[idx_scores - 1]
    tp = nb_true - cs
    fp = nb_examples - idx_scores - tp
    fn = cs + hard_fns
    precision[idx_res] = tp / (tp + fp)
    recall[idx_res] = tp / (tp + fn)
  precision[-1] = 1.0
  recall[-1] = 0.0
  recall_conv = np.append(np.append(recall[0], recall), 0.0)
  step_widths = np.convolve(recall_conv, [-0.5, 0, 0.5], 'valid')
  return float(np.dot(precision, step_widths))


def compute_averages(aps, inst_labels, distance_available=False):
  d_inf = 0
  o50 = np.where(np.isclose(OVERLAPS, 0.5))[0]
  avg = {
      'allAp': float(np.nanmean(aps[d_inf, :, :])),
      'allAp50%': float(np.nanmean(aps[d_inf, :, o50])),
      'classes': {},
  }
  if distance_available and aps.shape[0] >= 3:
    avg['allAp100m'] = float(np.nanmean(aps[1, :, :]))
    avg['allAp50m'] = float(np.nanmean(aps[2, :, :]))
  for l_i, name in enumerate(inst_labels):
    avg['classes'][name] = {
        'ap': float(np.average(aps[d_inf, l_i, :])),
        'ap50%': float(np.average(aps[d_inf, l_i, o50])),
    }
  return avg


def evaluate_instance_predictions(prediction_txts, gt_files,
                                  export_file=None, quiet=False,
                                  distance_files=None,
                                  camera_files=None):
  """Full evaluation given aligned lists of prediction txts and gt
  instanceIds images.  Returns the averages dict.

  distance_files: optional aligned list of official `_disparity.png`
  paths (entries may be None); enables AP_100m / AP_50m.  camera_files:
  optional aligned `_camera.json` paths overriding the nominal stereo
  rig per image."""
  log = logger.get()
  inst_labels = instance_labels()
  distance_available = bool(distance_files) and any(
      d is not None for d in distance_files)
  matches = {}
  for i, (pred_txt, gt_file) in enumerate(zip(prediction_txts, gt_files)):
    gt_img = cv2.imread(gt_file, -1)
    if gt_img is None:
      raise FileNotFoundError(gt_file)
    gt_img = gt_img.astype(np.int64)
    distance_img = None
    if distance_files and distance_files[i] is not None:
      disp = cv2.imread(distance_files[i], -1)
      if disp is None:
        raise FileNotFoundError(distance_files[i])
      baseline, fx = NOMINAL_BASELINE, NOMINAL_FX
      if camera_files and camera_files[i] is not None:
        baseline, fx = load_camera(camera_files[i])
      distance_img = disparity_to_distance(disp, baseline, fx)
    gt_instances = get_gt_instances(gt_img, distance_img=distance_img)
    pred_info = read_pred_info(pred_txt)
    gts, preds = assign_gt_to_preds(gt_instances, gt_img, pred_info,
                                    inst_labels)
    matches[os.path.abspath(gt_file)] = {
        'groundTruth': gts, 'prediction': preds}
  aps = evaluate_matches(matches, inst_labels,
                         distance_available=distance_available)
  avg = compute_averages(aps, inst_labels,
                         distance_available=distance_available)
  if not quiet:
    extra = (f"  AP_100m: {avg['allAp100m']:.3f}  "
             f"AP_50m: {avg['allAp50m']:.3f}"
             if 'allAp100m' in avg else '')
    log.info(f"AP: {avg['allAp']:.3f}  AP_50%: {avg['allAp50%']:.3f}"
             + extra)
    for name, d in avg['classes'].items():
      log.info(f"  {name:12s} ap {d['ap']:.3f}  ap50% {d['ap50%']:.3f}")
  if export_file:
    os.makedirs(os.path.dirname(export_file) or '.', exist_ok=True)
    with open(export_file, 'w') as f:
      json.dump({'averages': avg, 'aps': aps.tolist()}, f, indent=2)
  return avg


def find_gt_files(cityscapes_path, split='val'):
  pattern = os.path.join(cityscapes_path, 'gtFine', split, '*',
                         '*_gtFine_instanceIds.png')
  return sorted(glob.glob(pattern))


def find_side_file(gt_file, cityscapes_path, split, kind, ext):
  """Locate a `disparity`/`camera` sibling of a gt file by stem, or None.

  Official layout: {root}/{kind}/{split}/{city}/{stem}_{kind}.{ext}."""
  base = os.path.basename(gt_file)
  stem = '_'.join(base.split('_')[:3])
  city = stem.split('_')[0]
  path = os.path.join(cityscapes_path, kind, split, city,
                      f'{stem}_{kind}.{ext}')
  return path if os.path.exists(path) else None


def find_prediction_file(gt_file, prediction_path):
  """Locate the txt matching a gt file (by city_seq_frame stem)."""
  base = os.path.basename(gt_file)
  stem = '_'.join(base.split('_')[:3])
  hits = glob.glob(os.path.join(prediction_path, '**', f'{stem}*.txt'),
                   recursive=True)
  if not hits:
    raise FileNotFoundError(
        f'Found no prediction for ground truth {gt_file}')
  return hits[0]


def main(argv=None):
  """CLI mirroring the official script's env-var interface
  (CITYSCAPES_RESULTS / CITYSCAPES_DATASET / CITYSCAPES_SPLIT,
  ref run_cityscapes_eval.sh:22-52)."""
  import argparse
  parser = argparse.ArgumentParser()
  parser.add_argument('--predictions',
                      default=os.environ.get('CITYSCAPES_RESULTS'))
  parser.add_argument('--dataset',
                      default=os.environ.get('CITYSCAPES_DATASET'))
  parser.add_argument('--split',
                      default=os.environ.get('CITYSCAPES_SPLIT', 'val'))
  parser.add_argument('--export', default=None)
  parser.add_argument('--use_distance', action='store_true',
                      help='derive per-instance distances from the '
                      'official disparity/ images for AP_100m / AP_50m')
  args = parser.parse_args(argv)
  gt_files = find_gt_files(args.dataset, args.split)
  pred_txts = [find_prediction_file(g, args.predictions) for g in gt_files]
  distance_files = camera_files = None
  if args.use_distance:
    distance_files = [find_side_file(g, args.dataset, args.split,
                                     'disparity', 'png') for g in gt_files]
    camera_files = [find_side_file(g, args.dataset, args.split,
                                   'camera', 'json') for g in gt_files]
  return evaluate_instance_predictions(pred_txts, gt_files,
                                       export_file=args.export,
                                       distance_files=distance_files,
                                       camera_files=camera_files)


if __name__ == '__main__':
  main()
