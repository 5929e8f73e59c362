#!/bin/bash
# Round-5 queue, part C: after the calibration pass (queue_round5b), land
# the analysis artifacts for the bf16-validation and counting-lever runs
# (comparison tables into notes.md -> RESULTS.md, committed), then spend
# any REMAINING round time on the synth3 data-scaling asymptote
# (VERDICT r4 next-step #3): a 4096-example full-stage point from the
# same fg/box stages, extending the 256 -> 1024 curve.  If the round
# boundary cuts the 4096 run, its checkpoints/logs are committed by the
# bench reaper's RESUME.md recipe + per-1000-step ckpts.
# usage: queue_round5c.sh PREV_PID
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5c.pid
trap 'rm -f logs/queue_round5c.pid' EXIT TERM INT
PREV="${1:?pass the predecessor pid}"
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
sleep 30

CPU="PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

commit_files() {
  local msg="$1"; shift
  local f specs=()
  for f in "$@"; do
    [ -e "$f" ] && git add -f "$f" 2>/dev/null && specs+=("$f")
  done
  [ ${#specs[@]} -gt 0 ] || return 0
  for try in 1 2 3; do
    git commit -m "$msg" -- "${specs[@]}" && break
    sleep 20
  done
}

BASE=full_model_synth1024-20260816
NOTES="results/${BASE}/notes.md"

# bf16 accuracy validation vs the f32 twin (same box weights, same data,
# same budget; VERDICT r4 #4)
env $CPU python pipelines/compare_runs.py \
  --ids ${BASE},full_model_synth1024bf16-r5 \
  --labels "f32 (r4)","bf16 (r5)" \
  --title "bf16 training accuracy validation (CVPPP shape, 1024 examples, full 30k from the same box weights)" \
  --notes "$NOTES" >> logs/r5c.log 2>&1

# counting levers vs the control finetune (VERDICT r4 #2)
env $CPU python pipelines/compare_runs.py \
  --ids full_model_s1024_ft0-r5,full_model_s1024_ftA-r5,full_model_s1024_ftV-r5,full_model_s1024_ftK-r5 \
  --labels "control ft8k","+segm_weight_alpha0.5","+dynamic_var","+slow knob" \
  --title "Counting levers: 8k finetunes of the 1024-example flagship (each vs the control)" \
  --notes "$NOTES" >> logs/r5c.log 2>&1

# re-render the cvppp head (notes.md feeds RESULTS.md)
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5c.log 2>&1
commit_files "round 5: bf16 + counting-lever comparison tables" \
  "$NOTES" RESULTS.md logs/r5c.log

# synth3 data-scaling: 4096-example full-stage point (leftover time only)
bash pipelines/watchdog.sh logs/r5c_synth3_4096/chain.log 420 -- \
  python pipelines/run_pipeline.py --dataset synth3 --scale paper \
    --data_examples 4096 --model_id 4096r5 \
    --fg_from fg_model_synth3-20260818a \
    --box_from box_model_synth3-20260818a \
    --stages pack,full,eval --full_steps 20000 --resume
# The scaling table lives in the 1024-run's notes.md: that run stays the
# synth3 section's flagship, and the section renderer pulls notes from
# the section full_id's folder.
env $CPU python pipelines/compare_runs.py \
  --ids full_model_synth3-20260818a,full_model_synth3-4096r5 \
  --labels "1024ex (30k)","4096ex (20k)" \
  --title "synth3 data scaling: 1024 -> 4096 examples (same fg/box stages)" \
  --notes results/full_model_synth3-20260818a/notes.md >> logs/r5c.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth3-20260818a \
  --box_id box_model_synth3-20260818a --fg_id fg_model_synth3-20260818a \
  --section synth3 >> logs/r5c.log 2>&1 || true
ID=full_model_synth3-4096r5
commit_files "synth3 4096-example data-scaling point" \
  "results/$ID"/ckpt-*.npz "results/$ID"/*.yaml \
  results/full_model_synth3-20260818a/notes.md \
  "results/$ID"/output_valid/*.csv "logs/$ID"/*.csv RESULTS.md logs/r5c.log
echo "[queue_round5c] done" >> logs/queue_round5c.done
