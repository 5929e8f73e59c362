#!/usr/bin/env python
"""CLI entry point (capability twin of the reference script of the same
name); see rec_attend_tpu/cli/cityscapes_eval.py."""
from rec_attend_tpu.cli.cityscapes_eval import main

if __name__ == '__main__':
  main()
