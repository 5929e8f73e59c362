"""compare_runs.py — the side-by-side run-comparison table used for the
counting-lever and bf16-vs-f32 experiments (RESULTS.md commentary).

CPU-only fixture test: crafts two model result folders (one with a full
artifact set — sweep CSVs, calibrated headline, loss curve — one with a
bare non-sweep eval) and checks the rendered markdown plus the notes.md
append contract (appends accumulate; regeneration is the caller's job).
"""

import json
import os

from pipelines import compare_runs


def _write_csv(path, mean, std):
  os.makedirs(os.path.dirname(path), exist_ok=True)
  with open(path, 'w') as f:
    f.write('example,score\n0,0.0\n')
    f.write(f'Mean,{mean}\nStd,{std}\n')


def _make_run(results, logs, mid, sweep=True, headline=True, loss=True):
  folder = os.path.join(results, mid, 'output_valid')
  if sweep:
    # two thresholds; 40 is best-by-sbd and must be the one reported
    _write_csv(os.path.join(folder, 'sbd_30.csv'), 0.70, 0.1)
    _write_csv(os.path.join(folder, 'count_acc_30.csv'), 0.60, 0.1)
    _write_csv(os.path.join(folder, 'dic_abs_30.csv'), 0.50, 0.1)
    _write_csv(os.path.join(folder, 'sbd_40.csv'), 0.80, 0.1)
    _write_csv(os.path.join(folder, 'count_acc_40.csv'), 0.65, 0.1)
    _write_csv(os.path.join(folder, 'dic_abs_40.csv'), 0.40, 0.1)
  else:
    _write_csv(os.path.join(folder, 'sbd.csv'), 0.55, 0.1)
  if headline:
    with open(os.path.join(results, mid, 'count_calibration.json'),
              'w') as f:
      json.dump({'headline': {'mask_threshold': 0.4,
                              'score_threshold': 0.3,
                              'metrics': {'sbd': [0.78, 0.1],
                                          'count_acc': [0.64, 0.2]}}}, f)
  if loss:
    os.makedirs(os.path.join(logs, mid), exist_ok=True)
    with open(os.path.join(logs, mid, 'loss.csv'), 'w') as f:
      f.write('step,time,train loss,valid loss\n')
      f.write('100,t,-1.0,\n200,t,-1.25,\n')


def test_compare_runs_table_and_notes_append(tmp_path, capsys):
  results, logs = str(tmp_path / 'res'), str(tmp_path / 'logs')
  _make_run(results, logs, 'run_a')
  _make_run(results, logs, 'run_b', sweep=False, headline=False,
            loss=False)
  notes = str(tmp_path / 'notes.md')

  argv = ['--ids', 'run_a,run_b', '--labels', 'A,B',
          '--results', results, '--logs', logs,
          '--title', 'lever smoke', '--notes', notes]
  rows = compare_runs.main(argv)
  out = capsys.readouterr().out

  assert '### lever smoke' in out
  assert '| metric | A | B |' in out
  # run_a: best-of-sweep picks threshold 0.40 (sbd 0.80 > 0.70)
  assert rows[0]['sweep_best_thr'] == 0.40
  assert '| sbd (best-of-sweep) | 0.8000 |' in out
  # run_a headline from count_calibration.json
  assert '| sbd (headline) | 0.7800 | — |' in out
  # run_b: non-sweep eval falls back to the plain metrics row
  assert '| sbd (best-of-sweep) | 0.8000 | 0.5500 |' in out
  # loss-curve provenance (last row of loss.csv, train channel)
  assert 'loss -1.250@200' in out
  assert 'thr 0.40/0.30' in out

  # notes.md append contract: two calls -> two tables
  compare_runs.main(argv)
  doc = open(notes).read()
  assert doc.count('### lever smoke') == 2


def test_compare_runs_drops_all_empty_headline_rows(tmp_path, capsys):
  # Lever finetunes skip calibrate_count.py; a table where NO run has a
  # calibrated headline must not render rows of em-dashes.
  results, logs = str(tmp_path / 'res'), str(tmp_path / 'logs')
  _make_run(results, logs, 'run_a', headline=False)
  _make_run(results, logs, 'run_b', headline=False)
  compare_runs.main(['--ids', 'run_a,run_b', '--results', results,
                     '--logs', logs])
  out = capsys.readouterr().out
  assert '(headline)' not in out
  assert '| sbd (best-of-sweep) | 0.8000 | 0.8000 |' in out


def test_compare_runs_missing_run_renders_dashes(tmp_path, capsys):
  results, logs = str(tmp_path / 'res'), str(tmp_path / 'logs')
  _make_run(results, logs, 'run_a')
  compare_runs.main(['--ids', 'run_a,ghost', '--results', results,
                     '--logs', logs])
  out = capsys.readouterr().out
  # a missing run degrades to em-dashes, never crashes the queue
  assert '| sbd (best-of-sweep) | 0.8000 | — |' in out
