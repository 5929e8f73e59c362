#!/bin/bash
# Round-5 TPU job queue (single-tenant chip: strictly serial).  Waits for
# the synth3 packed-channel ablation (which itself waits for the synthcs
# chain) to exit, then runs the CVPPP-shape accuracy experiments:
#
#   C   bf16 baseline       fresh full 30k from the committed box weights
#                           at 1024 examples (VERDICT r4 #4: bf16 has a
#                           measured 1.43x step speedup but no accuracy
#                           validation; compare against the f32
#                           full_model_synth1024-20260816 twin)
#   L0  control finetune    8k from full_model_synth1024-20260816, no
#                           lever (isolates the finetune-restart effect —
#                           round-4's ft2 showed finetunes can regress)
#   L1  lever a             + --segm_weight_alpha 0.5 (small-instance
#                           segm upweighting)
#   L2  lever c             + --dynamic_var (ctrl-predicted attention var)
#   L3  lever d             + slower knob_segm decay
#
# Counting levers are VERDICT r4 weak #2 / next-step #2: the round-4
# ceiling analysis pinned the count deficit to trailing-instance DECODING
# and named exactly these levers; each run here either demonstrates or
# falsifies one, always judged against L0 (same budget, same restart).
# After each run: eval sweep (inside resume_synth_paper) + train-
# calibrated counting (calibrate_count) + artifact commit, so a round
# boundary can cut this queue anywhere without losing finished work.
#
# usage: queue_round5.sh PREV_PID   (the ablation queue/watchdog pid —
#        exec preserves it across queue_ablate_synth3.sh's exec)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5.pid   # bench.py reaps this
trap 'rm -f logs/queue_round5.pid' EXIT TERM INT
PREV="${1:?pass the predecessor pid}"
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
sleep 30   # let the TPU claim settle

BOX=box_model_synth-20260816104712
BASE1024=full_model_synth1024-20260816
DF=data/synth224

publish() {  # publish <model_id> <msg>  — per-file adds, explicit commit
  local id="$1" msg="$2" f specs=()
  for f in "results/$id"/ckpt-*.npz "results/$id"/*.yaml \
           "results/$id"/*.json "results/$id"/output_valid/*.csv \
           "results/$id"/output_valid_calibrated/*.csv \
           "logs/$id"/*.csv; do
    [ -e "$f" ] && git add -f "$f" 2>/dev/null && specs+=("$f")
  done
  [ ${#specs[@]} -gt 0 ] || return 0
  for try in 1 2 3; do   # survive index.lock races with the main session
    git commit -m "$msg" -- "${specs[@]}" && break
    sleep 20
  done
}

run_one() {  # run_one <full_id> <log_tag> <extra args...>
  local id="$1" tag="$2"; shift 2
  bash pipelines/watchdog.sh "logs/r5_${tag}/run.log" 420 -- \
    python pipelines/resume_synth_paper.py --box_id "$BOX" --skip_box \
      --dataset_folder "$DF" --data_examples 1024 --full_id "$id" \
      --dtype bfloat16 "$@"
  bash pipelines/watchdog.sh "logs/r5_${tag}/calib.log" 420 -- \
    python pipelines/calibrate_count.py --model_id "$id" \
      --dataset_folder "$DF" --batch_size 8
  publish "$id" "round 5 ${tag}: ${id} artifacts (queue autopublish)"
}

run_one full_model_synth1024bf16-r5 C_bf16 --full_steps 30000
run_one full_model_s1024_ft0-r5 L0_control \
  --finetune_from "$BASE1024" --full_steps 8000
run_one full_model_s1024_ftA-r5 L1_alpha \
  --finetune_from "$BASE1024" --full_steps 8000 --segm_weight_alpha 0.5
run_one full_model_s1024_ftV-r5 L2_dynvar \
  --finetune_from "$BASE1024" --full_steps 8000 --dynamic_var
run_one full_model_s1024_ftK-r5 L3_knob \
  --finetune_from "$BASE1024" --full_steps 8000 \
  --steps_per_knob_decay 1400 --knob_segm_offset 1500
echo "[queue_round5] all runs done" >> logs/queue_round5.done
