#!/bin/bash
# One-shot TPU job queue for round 4: wait for the synth3@1024 chain's
# watchdog to exit (TPU is single-tenant), then run the synthcs@1024
# chain end-to-end (fg -> pack -> box -> full -> eval -> ap).  The
# 256-example synthcs run saturated at SBD 0.770 (RESULTS.md); 4x data
# broke the same saturation at CVPPP shape (0.77 -> 0.85), so this rerun
# targets the >=0.80 bar with a reference-scale step budget
# (full 30k @ bs4 = 120k examples vs ref run_cityscapes.sh 70k @ bs2).
set -u
mkdir -p logs && echo "$$" > logs/queue_synthcs.pid  # bench.py reaps by this
trap 'rm -f logs/queue_synthcs.pid' EXIT TERM INT    # no stale pid files
PREV_WDPID_FILE="${1:-logs/synth3-20260818a/chain.log.wdpid}"
if [ -f "$PREV_WDPID_FILE" ]; then
  PREV=$(cat "$PREV_WDPID_FILE")
  while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
sleep 30   # let the TPU claim settle
# exec replaces this shell without firing EXIT traps; the watchdog's own
# wdpid file covers the pid from here on.
rm -f logs/queue_synthcs.pid
exec bash "$(dirname "$0")/watchdog.sh" logs/synthcs-20260818a/chain.log 420 -- \
  python pipelines/run_pipeline.py --dataset synthcs --scale paper \
  --data_examples 1024 --model_id 20260818a \
  --fg_steps 3000 --box_steps 12000 --full_steps 30000 \
  --stages fg,pack,box,full,eval,ap --resume
