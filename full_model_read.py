#!/usr/bin/env python
"""CLI entry point (capability twin of the reference script of the same
name); see rec_attend_tpu/cli/read_weights.py."""
from rec_attend_tpu.cli.read_weights import full_main

if __name__ == '__main__':
  full_main()
