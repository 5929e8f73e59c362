#!/usr/bin/env python
"""Official Cityscapes AP evaluation driver (capability twin of
run_cityscapes_eval.sh + evalInstanceLevelSemanticLabeling.py)."""
from rec_attend_tpu.eval_cityscapes.instance_eval import main

if __name__ == '__main__':
  main()
