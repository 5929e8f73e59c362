#!/bin/bash
# Round-4 queue tail: after the synthcs@1024 chain's watchdog exits, run
# the packed-channel ablation at KITTI shape (VERDICT r3 weak #2: the
# synthcs-shape ablation exists, the synth3-shape one does not).  Trains a
# no-fg twin of box_model_synth3-20260818a on the same packed H5 data.
# TPU is single-tenant, so this waits for the chain's wdpid like
# queue_synthcs_1024.sh does.
set -u
mkdir -p logs && echo "$$" > logs/queue_ablate.pid  # bench.py reaps by this
trap 'rm -f logs/queue_ablate.pid' EXIT TERM INT    # no stale pid files
PREV_WDPID_FILE="${1:-logs/synthcs-20260818a/chain.log.wdpid}"
# The synthcs watchdog may not have STARTED yet (its queue waits on the
# synth3 chain) — wait for the wdpid file to appear first.
while [ ! -f "$PREV_WDPID_FILE" ]; do sleep 60; done
PREV=$(cat "$PREV_WDPID_FILE")
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
sleep 30   # let the TPU claim settle
# exec replaces this shell without firing EXIT traps; the watchdog's own
# wdpid file covers the pid from here on.
rm -f logs/queue_ablate.pid
exec bash "$(dirname "$0")/watchdog.sh" logs/ablate_synth3-20260818a/run.log 420 -- \
  python pipelines/ablate_packed.py --baseline_id box_model_synth3-20260818a \
  --steps 12000 --batch_size 8
