"""Dataset registry (ref data_api/data_provider.py:15-67): name -> Dataset
with the ``{split}_{H}x{W}.h5`` filename convention and default folders."""

from __future__ import annotations

import os

DEFAULT_FOLDERS = {
    'cvppp': 'data/cvppp/A1',
    'cvppp_test': 'data/cvppp_test/A1',
    'kitti': 'data/kitti',
    'cityscapes': 'data/cityscapes',
    'synth': 'data/synth',
}


def get(dataset_name, data_opt, split='train', h5_fname=None):
  """data_opt: DataConfig or dict with folder/height/width."""
  opt = data_opt if isinstance(data_opt, dict) else data_opt.to_dict()
  folder = opt.get('folder')
  if dataset_name == 'cvppp':
    if folder is None:
      folder = (DEFAULT_FOLDERS['cvppp'] if split != 'test'
                else DEFAULT_FOLDERS['cvppp_test'])
    from rec_attend_tpu.data.cvppp import CVPPP
    cls = CVPPP
  elif dataset_name == 'kitti':
    folder = folder or DEFAULT_FOLDERS['kitti']
    from rec_attend_tpu.data.kitti import KITTI
    cls = KITTI
  elif dataset_name == 'cityscapes':
    folder = folder or DEFAULT_FOLDERS['cityscapes']
    from rec_attend_tpu.data.cityscapes import Cityscapes
    cls = Cityscapes
  elif dataset_name == 'synth':
    folder = folder or DEFAULT_FOLDERS['synth']
    from rec_attend_tpu.data.synthetic import Synthetic, make_synthetic_h5
    if h5_fname is None:
      h5_fname = os.path.join(folder, '{}_{}x{}.h5'.format(
          split, opt['height'], opt['width']))
    import json
    seed = {'train': 3, 'valid': 4, 'test': 5}.get(split, 6)
    num = int(opt.get('num_examples', 32) or 32)
    if split != 'train':
      num = max(num // 4, 8)
    nsc = int(opt.get('num_semantic_classes', 1) or 1)
    gen = dict(num_examples=num, seed=seed,
               max_objects=int(opt.get('max_objects', 4) or 4))
    if nsc > 1:   # key absent for nsc=1 keeps pre-round-3 metas valid
      gen['num_semantic_classes'] = nsc
    meta_fname = h5_fname + '.meta.json'
    if os.path.exists(h5_fname):
      # The generation knobs are not part of the filename convention, so
      # a stale file with different knobs must not be silently reused.
      meta = None
      if os.path.exists(meta_fname):
        with open(meta_fname) as f:
          meta = json.load(f)
      if meta == gen:
        return Synthetic(h5_fname, num_semantic_classes=nsc)
      from rec_attend_tpu.utils import logger
      logger.get().warning(
          f'Regenerating {h5_fname}: generation knobs changed '
          f'({meta} -> {gen}); packed predictions, if any, are lost')
      os.remove(h5_fname)
    os.makedirs(os.path.dirname(h5_fname), exist_ok=True)
    ds = make_synthetic_h5(h5_fname, height=opt['height'],
                           width=opt['width'], **gen)
    with open(meta_fname, 'w') as f:
      json.dump(gen, f)
    return ds
  else:
    raise ValueError(f'Unknown dataset name: {dataset_name}')
  if h5_fname is None:
    h5_fname = os.path.join(folder, '{}_{}x{}.h5'.format(
        split, opt['height'], opt['width']))
  return cls(h5_fname)
