#!/usr/bin/env python
"""Print a timestamp model id (capability twin of the reference's
assign_model_id.py, used by the shell pipelines)."""
from rec_attend_tpu.engine.experiment import assign_model_id

if __name__ == '__main__':
  print(assign_model_id())
