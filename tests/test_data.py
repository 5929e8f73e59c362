"""Data layer tests: assembler H5 format, dataset read semantics, iterators,
orientation/sep_labels, pack-predictions message bus."""

import numpy as np
import pytest

from rec_attend_tpu.data import orientation, sep_labels
from rec_attend_tpu.data.batch_iter import BatchIterator, ConcurrentBatchIterator
from rec_attend_tpu.data.dataset import pack_predictions
from rec_attend_tpu.data.synthetic import make_synthetic_h5


@pytest.fixture(scope='module')
def synth_ds(tmp_path_factory):
  path = str(tmp_path_factory.mktemp('synth') / 'train_32x32.h5')
  return make_synthetic_h5(path, height=32, width=32, num_examples=8)


def test_sep_labels_roundtrip():
  img = np.zeros((10, 10, 3), np.uint8)
  img[2:5, 2:5] = [255, 0, 0]
  img[6:9, 6:9] = [0, 255, 0]
  segs, colors = sep_labels.get_separate_labels(img)
  assert len(segs) == 2
  assert sum(s.sum() for s in segs) == 18
  assert all(s.dtype == np.uint8 for s in segs)


def test_orientation_classes_valid():
  y = np.zeros((1, 2, 16, 16), np.float32)
  y[0, 0, 2:8, 2:8] = 1
  y[0, 1, 10:14, 10:14] = 1
  cls = orientation.get_orientation(y, encoding='class')
  assert cls.shape == (1, 16, 16)
  assert cls.max() < 8
  one_hot = orientation.get_orientation(y, encoding='one_hot')
  assert one_hot.shape == (1, 16, 16, 8)
  # one-hot coverage matches mask union
  assert one_hot.sum() == y.max(axis=1).sum()


def test_synthetic_multiclass(tmp_path):
  """num_semantic_classes>1 assigns shape-family classes: the H5 carries
  per-class semantic maps + instance class ids, and get_batch produces the
  (nsc+1)-channel c_gt with a background channel (Cityscapes convention)."""
  from rec_attend_tpu.data.synthetic import make_synthetic_h5
  ds = make_synthetic_h5(str(tmp_path / 'mc.h5'), height=32, width=32,
                         num_examples=6, num_semantic_classes=2)
  assert ds.get_num_semantic_classes() == 2
  batch = ds.get_batch([0, 1, 2, 3], variables={'c_gt', 'c_gt_idx', 'y_gt'})
  assert batch['c_gt'].shape == (4, 32, 32, 3)
  # Background channel complements the class channels.
  np.testing.assert_allclose(
      batch['c_gt'][..., 0], 1 - batch['c_gt'][..., 1:].max(axis=-1))
  # Per-instance class one-hots live in channels 1..nsc.
  idx = batch['c_gt_idx']
  assert idx.shape == (4, ds.get_default_timespan(), 3)
  present = batch['y_gt'].sum(axis=(2, 3)) > 0
  assert (idx[present][:, 1:].sum(axis=-1) == 1).all()
  # Both shape families occur somewhere in the split.
  assert idx[present][:, 1].sum() > 0 and idx[present][:, 2].sum() > 0


def test_synthetic_assembler_format(synth_ds):
  import h5py
  with h5py.File(synth_ds.h5_fname, 'r') as f:
    assert 'index_map' in f
    key = [k for k in f.keys() if k != 'index_map'][0]
    g = f[key]
    for k in ('input', 'input_full_size', 'orig_size',
              'instance_semantic_classes'):
      assert k in g, k
    assert 'label_segmentation' in g
    assert 'orientation' in g


def test_get_batch_semantics(synth_ds):
  batch = synth_ds.get_batch(
      [0, 1], variables={'x', 'y_gt', 's_gt', 'd_gt', 'idx_map',
                         'orig_size', 'c_gt'})
  assert batch['x'].shape == (2, 32, 32, 3)
  assert batch['x'].max() <= 1.0
  T = synth_ds.get_default_timespan()
  assert batch['y_gt'].shape == (2, T, 32, 32)
  # Area-sorted descending.
  areas = batch['y_gt'].sum(axis=(2, 3))
  for b in range(2):
    nz = areas[b][areas[b] > 0]
    assert np.all(np.diff(nz) <= 0)
  # s_gt marks presence of first-k objects.
  np.testing.assert_array_equal(batch['s_gt'], (areas > 0).astype('float32'))
  assert batch['d_gt'].shape == (2, 32, 32, 8)
  assert batch['orig_size'].shape == (2, 2)


def test_full_size_labels(synth_ds):
  labels = synth_ds.get_full_size_labels([synth_ds.img_ids[0]], timespan=6)
  assert len(labels) == 1
  assert labels[0].shape[0] == 6


def test_pack_roundtrip(synth_ds):
  """The H5-as-message-bus: pack predictions, read them back as inputs."""
  sid = synth_ds.get_str_id(synth_ds.img_ids[0])
  rng = np.random.RandomState(0)
  fg = rng.rand(32, 32).astype('float32')
  ori = rng.rand(32, 32, 8).astype('float32')
  ins = (rng.rand(6, 32, 32) > 0.5).astype('float32')
  score = rng.rand(6).astype('float32')
  pack_predictions(synth_ds.h5_fname, sid, foreground=fg, orientation=ori,
                   instance=ins, score=score)
  batch = synth_ds.get_batch([0], variables={'y_out', 'd_out', 'y_out_ins',
                                             's_out'})
  np.testing.assert_allclose(batch['y_out'][0, :, :, 0], fg, atol=1 / 255.0)
  np.testing.assert_allclose(batch['d_out'][0], ori, atol=1 / 255.0)
  np.testing.assert_allclose(batch['y_out_ins'][0], ins, atol=1 / 255.0)
  np.testing.assert_allclose(batch['s_out'][0], score, rtol=1e-6)


def test_batch_iterator_cycle_and_shuffle():
  it = BatchIterator(10, batch_size=4, cycle=True, shuffle=True, seed=2)
  seen = []
  for _ in range(5):
    idx = next(it)
    assert len(idx) == 4
    seen.extend(idx.tolist())
  assert set(seen) == set(range(10))  # everything visited across epochs


def test_batch_iterator_noncycle_stops():
  it = BatchIterator(5, batch_size=2, cycle=False, shuffle=False)
  batches = list(it)
  assert [len(b) for b in batches] == [2, 2, 1]
  np.testing.assert_array_equal(np.concatenate(batches), np.arange(5))


def test_concurrent_iterator_exhausts():
  base = BatchIterator(7, batch_size=3, cycle=False, shuffle=False,
                       get_fn=lambda idx: idx.copy())
  it = ConcurrentBatchIterator(base, max_queue_size=4, num_threads=2)
  got = sorted(np.concatenate(list(it)).tolist())
  assert got == list(range(7))


def test_concurrent_iterator_relaunches_dead_producer():
  """A get_fn that crashes once per thread must not end the epoch early:
  scan() relaunches the dead workers and the full epoch drains
  (ref concurrent_batch_iter.py:110-133)."""
  import threading
  crashes = [2]
  lock = threading.Lock()

  def flaky_get(idx):
    with lock:
      if crashes[0] > 0:
        crashes[0] -= 1
        raise OSError('simulated transient decode failure')
    return idx.copy()

  base = BatchIterator(20, batch_size=2, cycle=False, shuffle=False,
                       get_fn=flaky_get)
  it = ConcurrentBatchIterator(base, max_queue_size=4, num_threads=2)
  got = sorted(np.concatenate(list(it)).tolist())
  # The two crashed batches are lost (their indexes were consumed before
  # the crash) but every other index arrives and iteration ends cleanly.
  assert len(got) >= 16
  assert it._relaunches >= 1


def test_concurrent_iterator_crash_loop_gives_up():
  """Deterministically-crashing workers must raise, not hang."""
  def always_crash(idx):
    raise OSError('permanent failure')

  base = BatchIterator(1000, batch_size=1, cycle=True, shuffle=False,
                       get_fn=always_crash)
  it = ConcurrentBatchIterator(base, max_queue_size=2, num_threads=2)
  it.MAX_RELAUNCH = 3
  with pytest.raises(RuntimeError, match='giving up'):
    next(it)
  it.stop()


def test_provider_synth(tmp_path):
  from rec_attend_tpu.data import provider
  ds = provider.get('synth', {'height': 32, 'width': 32,
                              'folder': str(tmp_path)}, split='train')
  assert ds.get_dataset_size() > 0
  b = ds.get_batch([0], variables={'x'})
  assert b['x'].shape[1:] == (32, 32, 3)


def test_write_instance_id_gt_mapping(tmp_path):
  """Synthetic gtFine instanceIds export: class c -> Cityscapes labelID
  from the submission writer's table, encoded labelID*1000+k; background
  is an in-eval non-instance label so FPs on it count."""
  import cv2
  from rec_attend_tpu.data import synthetic
  from rec_attend_tpu.data.cityscapes_labels import id2label

  h5 = str(tmp_path / 'v.h5')
  ds = synthetic.make_synthetic_h5(h5, height=48, width=48, num_examples=3,
                                   num_semantic_classes=2, max_objects=3)
  out = synthetic.write_instance_id_gt(ds, str(tmp_path / 'gt'))
  assert len(out) == 3
  assert all(f.endswith('_gtFine_instanceIds.png') for f in out)
  import h5py
  with h5py.File(h5, 'r') as f:
    for fname, idx in zip(out, ds.img_ids):
      img = cv2.imread(fname, -1)
      assert img is not None
      ids = set(np.unique(img).tolist())
      classes = f[ds.get_str_id(idx)]['instance_semantic_classes'][:]
      n_obj = len(f[ds.get_str_id(idx)]['label_segmentation'])
      # background + one id per instance
      assert synthetic.CS_BACKGROUND_LABEL_ID in ids
      inst_ids = sorted(i for i in ids if i >= 1000)
      assert len(inst_ids) == n_obj
      for k, iid in enumerate(inst_ids):
        label_id = iid // 1000
        assert label_id == synthetic.CS_INSTANCE_LABEL_IDS[
            classes[iid % 1000]]
        assert id2label[label_id].hasInstances
