"""Utils tests: time-series logger, log manager, dashboard generator,
profiling, step counter, logger."""

import os

import numpy as np

from rec_attend_tpu.utils import dashboard
from rec_attend_tpu.utils.log_manager import LazyRegisterer, LogManager
from rec_attend_tpu.utils.profiling import StepTimer
from rec_attend_tpu.utils.step_counter import StepCounter
from rec_attend_tpu.utils.time_series_logger import TimeSeriesLogger


def test_time_series_logger_roundtrip(tmp_path):
  fname = str(tmp_path / 'loss.csv')
  lg = TimeSeriesLogger(fname, ['train loss', 'valid loss'], buffer_size=2)
  lg.add(1, [0.5, None])
  lg.add(2, [0.4, None])
  lg.add(3, [None, 0.45])
  lg.flush()
  lines = open(fname).read().strip().splitlines()
  assert lines[0] == 'step,time,train loss,valid loss'
  assert len(lines) == 4
  assert lines[1].startswith('1,')
  assert lines[3].endswith(',0.45')


def test_time_series_restore_truncation(tmp_path):
  fname = str(tmp_path / 'loss.csv')
  lg = TimeSeriesLogger(fname, ['v'])
  for s in (10, 20, 30, 40):
    lg.add(s, s / 100)
  lg.flush()
  # Resume at step 20: rows past it must be dropped.
  lg2 = TimeSeriesLogger(fname, ['v'], restore_step=20)
  lines = open(fname).read().strip().splitlines()
  steps = [int(l.split(',')[0]) for l in lines[1:]]
  assert steps == [10, 20]


def test_log_manager_catalog(tmp_path):
  lm = LogManager(str(tmp_path))
  lm.register(str(tmp_path / 'a.csv'), 'csv', 'metric a')
  lm.register(str(tmp_path / 'a.csv'), 'csv', 'metric a')  # dedup
  lines = open(lm.catalog).read().strip().splitlines()
  assert len(lines) == 2
  # Lazy registration waits for the file.
  lr = LazyRegisterer(lm, str(tmp_path / 'img.png'), 'image', 'plot')
  lr.register()
  assert not lr.is_registered()
  open(str(tmp_path / 'img.png'), 'wb').write(b'x')
  lr.register()
  assert lr.is_registered()


def test_dashboard_generation(tmp_path):
  lm = LogManager(str(tmp_path))
  csv = str(tmp_path / 'loss.csv')
  lg = TimeSeriesLogger(csv, ['train loss'])
  for s in range(5):
    lg.add(s, 1.0 / (s + 1))
  lg.flush()
  lm.register(csv, 'csv', 'loss')
  import cv2
  img = str(tmp_path / 'plot.png')
  cv2.imwrite(img, np.zeros((4, 4, 3), np.uint8))
  lm.register(img, 'image', 'plot')
  out = dashboard.generate(str(tmp_path))
  html = open(out).read()
  assert '<svg' in html
  assert 'data:image/png;base64' in html
  assert 'loss' in html


def test_step_timer():
  t = StepTimer()
  for _ in range(3):
    t.start()
    t.stop()
  s = t.summary()
  assert s['n'] == 3
  assert s['mean_ms'] >= 0


def test_step_counter():
  c = StepCounter(5)
  assert c.get() == 5
  assert c.increment() == 6
  c.reset()
  assert c.get() == 0


def test_threshold_sweep_csvs_and_parsing(tmp_path):
  """A threshold sweep writes per-threshold analyzer CSVs that don't
  truncate each other, and write_results groups them per threshold."""
  import sys
  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  from pipelines.write_results import (read_analyzer_csvs, split_sweep,
                                       best_threshold)
  from rec_attend_tpu import analysis

  for thresh, val in ((0.3, 0.8), (0.5, 0.9)):
    stem = f'{int(thresh * 100):02d}'
    a = analysis.create_analyzer(
        'sbd', fname=str(tmp_path / f'sbd_{stem}.csv'))
    a.sum, a.sum2, a.num_ex = val, val * val, 1
    a.finalize()
  metrics = read_analyzer_csvs(str(tmp_path))
  plain, sweep = split_sweep(metrics)
  assert not plain
  assert set(sweep) == {0.3, 0.5}
  assert sweep[0.5]['sbd'][0] == 0.9
  assert best_threshold(sweep) == 0.5


def test_results_section_markers():
  """Rewriting the RESULTS head or one three-stage section must leave the
  other sections intact (write_results main() marker logic)."""
  import sys
  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  from pipelines.write_results import SECTION_FLAVORS, SECTION_MARKER

  # every flavor title is found by the shared marker scan
  for title, _, _ in SECTION_FLAVORS.values():
    assert f'## {title}'.startswith(SECTION_MARKER)

  head = '# RESULTS\n\nhead text\n'
  s3 = f'## {SECTION_FLAVORS["synth3"][0]}\n\nkitti body\n'
  scs = f'## {SECTION_FLAVORS["synthcs"][0]}\n\ncs body\n'
  doc = head + '\n' + s3 + '\n' + scs

  # head rewrite keeps both trailing sections (mirrors main()'s tail scan)
  idx = doc.find(SECTION_MARKER)
  tail = doc[idx:]
  assert tail.startswith(f'## {SECTION_FLAVORS["synth3"][0]}')
  assert f'## {SECTION_FLAVORS["synthcs"][0]}' in tail

  # replacing the synth3 section keeps the synthcs one (main()'s
  # section-replacement scan)
  marker = f'## {SECTION_FLAVORS["synth3"][0]}'
  start = doc.index(marker)
  nxt = doc.find(SECTION_MARKER, start + len(marker))
  assert doc[nxt:].startswith(f'## {SECTION_FLAVORS["synthcs"][0]}')


def test_apply_confidence_threshold():
  """Calibrated stop-score gate: hardened scores follow the threshold
  argument (reference default 0.5, postprocess.py:15-28)."""
  from rec_attend_tpu.utils import postprocess as pp
  y = np.ones((1, 3, 4, 4), 'float32')
  s = np.array([[0.9, 0.45, 0.2]], 'float32')
  yw, sh = pp.apply_confidence(y, s)
  assert sh.tolist() == [[1.0, 0.0, 0.0]]
  np.testing.assert_allclose(yw[0, 1], 0.45)
  _, sh_lo = pp.apply_confidence(y, s, threshold=0.4)
  assert sh_lo.tolist() == [[1.0, 1.0, 0.0]]
