#!/usr/bin/env python
"""Dataset assembly driver: raw image folders -> standard H5 files.

Capability twin of the reference's ``setup_cvppp.{sh,py}`` /
``setup_kitti.{sh,py}`` / ``setup_cityscapes.{sh,py}`` (minus the downloads
— point --folder at an already-downloaded dataset root):

  python setup_dataset.py --dataset cvppp --folder data/cvppp/A1 \
      --splits train,valid
  python setup_dataset.py --dataset kitti --folder data/kitti \
      --splits train,valid,test
  python setup_dataset.py --dataset cityscapes --folder data/cityscapes \
      --splits train,valid
  python setup_dataset.py --dataset synth --folder data/synth
"""

from __future__ import annotations

import argparse

from rec_attend_tpu import config as C
from rec_attend_tpu.utils import logger


def main():
  parser = argparse.ArgumentParser(description='Assemble dataset H5 files')
  parser.add_argument('--dataset', required=True,
                      choices=['cvppp', 'kitti', 'cityscapes', 'synth'])
  parser.add_argument('--folder', required=True)
  parser.add_argument('--splits', default='train,valid')
  parser.add_argument('--height', default=None, type=int)
  parser.add_argument('--width', default=None, type=int)
  parser.add_argument('--coarse_label', action='store_true',
                      help='cityscapes: use gtCoarse annotations')
  parser.add_argument('--num_examples', default=64, type=int,
                      help='synth: examples per split')
  args = parser.parse_args()
  log = logger.get()

  dims = C.DATASET_DIMS[args.dataset]
  opt = {'height': args.height or dims['inp_height'],
         'width': args.width or dims['inp_width']}

  for split in args.splits.split(','):
    log.info(f'Assembling {args.dataset} {split}...')
    if args.dataset == 'cvppp':
      from rec_attend_tpu.data.cvppp import CVPPPAssembler
      CVPPPAssembler(args.folder, opt, split=split).assemble()
    elif args.dataset == 'kitti':
      from rec_attend_tpu.data.kitti import KITTIAssembler
      KITTIAssembler(args.folder, opt, split=split).assemble()
    elif args.dataset == 'cityscapes':
      from rec_attend_tpu.data.cityscapes import CityscapesAssembler
      CityscapesAssembler(args.folder, opt, split=split,
                          coarse_label=args.coarse_label).assemble()
    elif args.dataset == 'synth':
      import os
      from rec_attend_tpu.data.synthetic import make_synthetic_h5
      os.makedirs(args.folder, exist_ok=True)
      h5 = os.path.join(
          args.folder, f"{split}_{opt['height']}x{opt['width']}.h5")
      seed = {'train': 3, 'valid': 4, 'test': 5}.get(split, 6)
      make_synthetic_h5(h5, height=opt['height'], width=opt['width'],
                        num_examples=args.num_examples, seed=seed)


if __name__ == '__main__':
  main()
