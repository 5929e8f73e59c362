#!/bin/bash
# Round-5 consolidated queue (replaces the stopped queue_round5{,b,c}.sh
# after the synthcs chain finished EARLY in the round): quick
# VERDICT-closing items first, long experiments after, so a round
# boundary cuts only the cheapest tail.
#
#   1. train-calibrated headlines for the three published sections
#      (synthcs / cvppp / synth3) + RESULTS re-render + commit
#   2. L0/L1/L2 counting-lever finetunes + lever comparison table
#      (VERDICT priority #2 — ahead of bf16)
#   3. C   bf16 baseline (full 30k) + bf16-vs-f32 comparison table
#   4. L3  slow-knob lever (leftover time)
#   5. synth3@4096 data-scaling point (leftover time)
#
# usage: queue_round5d.sh PREV_PID   (the ablation watchdog pid)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5d.pid
trap 'rm -f logs/queue_round5d.pid' EXIT TERM INT
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

calibrate_and_render() {  # calibrate_and_render ID BOX_ID FG_ID SECTION BS [extra...]
  local id="$1" box="$2" fg="$3" section="$4" bs="$5"; shift 5
  bash pipelines/watchdog.sh "logs/r5d_${section}/calib.log" 420 -- \
    python pipelines/calibrate_count.py --model_id "$id" \
      --batch_size "$bs" "$@"
  local wr=(--full_id "$id" --section "$section")
  [ -n "$box" ] && wr+=(--box_id "$box")
  [ -n "$fg" ] && wr+=(--fg_id "$fg")
  env $CPU python pipelines/write_results.py "${wr[@]}" \
    >> "logs/r5d_${section}/calib.log" 2>&1
  commit_files "Train-calibrated headline for the ${section} section" \
    "results/$id/count_calibration.json" \
    results/"$id"/output_valid_calibrated/*.csv \
    results/"$id"/output_train_calibrated/*.csv \
    "results/$id/output_valid/pixel_eval.json" RESULTS.md
}

# ---- 1. headlines (synthcs first: freshest section, includes pixel row)
calibrate_and_render full_model_synthcs-20260818a \
  box_model_synthcs-20260818a fg_model_synthcs-20260818a synthcs 4
calibrate_and_render full_model_synth-20260816104712 \
  box_model_synth-20260816104712 "" cvppp 8 --dataset_folder data/synth224
# The synth3 ablation regenerated data/synth/train_128x448.h5 WITHOUT
# the packed fg channels (environment restores wipe the gitignored H5);
# the packed-channel full model cannot eval without them — repack first.
bash pipelines/watchdog.sh logs/r5d_synth3/pack.log 420 -- \
  python fg_model_pack.py --model_id fg_model_synth3-20260818a \
    --dataset synth --split train,valid --batch_size 8
calibrate_and_render full_model_synth3-20260818a \
  box_model_synth3-20260818a fg_model_synth3-20260818a synth3 8

# ---- 2/3. bf16 baseline + counting levers (CVPPP shape) ----------------
BOX=box_model_synth-20260816104712
BASE1024=full_model_synth1024-20260816
DF=data/synth224
NOTES="results/${BASE1024}/notes.md"

publish_run() {
  local id="$1" msg="$2" f specs=()
  for f in "results/$id"/ckpt-*.npz "results/$id"/*.yaml \
           "results/$id"/*.json "results/$id"/output_valid/*.csv \
           "results/$id"/output_valid_calibrated/*.csv \
           "logs/$id"/*.csv; do
    [ -e "$f" ] && git add -f "$f" 2>/dev/null && specs+=("$f")
  done
  [ ${#specs[@]} -gt 0 ] || return 0
  for try in 1 2 3; do
    git commit -m "$msg" -- "${specs[@]}" && break
    sleep 20
  done
}

run_one() {  # run_one <full_id> <log_tag> <dtype> <calib|nocalib> <extra...>
  local id="$1" tag="$2" dt="$3" cal="$4"; shift 4
  bash pipelines/watchdog.sh "logs/r5d_${tag}/run.log" 420 -- \
    python pipelines/resume_synth_paper.py --box_id "$BOX" --skip_box \
      --dataset_folder "$DF" --data_examples 1024 --full_id "$id" \
      --dtype "$dt" "$@"
  # Lever runs skip the calibration pass (~15 min each): the eval sweep
  # already carries the count_acc/|DiC|/SBD the lever comparison needs.
  if [ "$cal" = calib ]; then
    bash pipelines/watchdog.sh "logs/r5d_${tag}/calib.log" 420 -- \
      python pipelines/calibrate_count.py --model_id "$id" \
        --dataset_folder "$DF" --batch_size 8
  fi
  publish_run "$id" "round 5 ${tag}: ${id} artifacts (queue autopublish)"
}

run_one full_model_s1024_ft0-r5 L0_control bfloat16 nocalib \
  --finetune_from "$BASE1024" --full_steps 8000
run_one full_model_s1024_ftA-r5 L1_alpha bfloat16 nocalib \
  --finetune_from "$BASE1024" --full_steps 8000 --segm_weight_alpha 0.5
run_one full_model_s1024_ftV-r5 L2_dynvar bfloat16 nocalib \
  --finetune_from "$BASE1024" --full_steps 8000 --dynamic_var
env $CPU python pipelines/compare_runs.py \
  --ids full_model_s1024_ft0-r5,full_model_s1024_ftA-r5,full_model_s1024_ftV-r5 \
  --labels "control ft8k","+segm_weight_alpha0.5","+dynamic_var" \
  --title "Counting levers: 8k finetunes of the 1024-example flagship (each vs the control)" \
  --notes "$NOTES" >> logs/r5d.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5d.log 2>&1
commit_files "round 5: counting-lever comparison table" "$NOTES" RESULTS.md \
  logs/r5d.log

# bf16 accuracy validation, cheap form first: an f32 finetune twin of the
# L0 control isolates dtype at identical budget/seed/data (VERDICT r4 #4);
# the full-30k bf16 baseline below then extends it if round time remains.
run_one full_model_s1024_ft0f32-r5 L0f32_control float32 nocalib \
  --finetune_from "$BASE1024" --full_steps 8000
env $CPU python pipelines/compare_runs.py \
  --ids full_model_s1024_ft0f32-r5,full_model_s1024_ft0-r5 \
  --labels "control ft8k f32","control ft8k bf16" \
  --title "bf16 vs f32 at identical finetune budget (dtype is the only difference)" \
  --notes "$NOTES" >> logs/r5d.log 2>&1
commit_files "round 5: bf16-vs-f32 dtype-isolation table" "$NOTES" logs/r5d.log

run_one full_model_synth1024bf16-r5 C_bf16 bfloat16 calib --full_steps 30000
env $CPU python pipelines/compare_runs.py \
  --ids ${BASE1024},full_model_synth1024bf16-r5 \
  --labels "f32 (r4)","bf16 (r5)" \
  --title "bf16 training accuracy validation (CVPPP shape, 1024 examples, full 30k from the same box weights)" \
  --notes "$NOTES" >> logs/r5d.log 2>&1
commit_files "round 5: bf16 accuracy-validation table" "$NOTES" logs/r5d.log

# ---- 4/5. leftover-time items ------------------------------------------
run_one full_model_s1024_ftK-r5 L3_knob bfloat16 nocalib \
  --finetune_from "$BASE1024" --full_steps 8000 \
  --steps_per_knob_decay 1400 --knob_segm_offset 1500

bash pipelines/watchdog.sh logs/r5d_synth3_4096/chain.log 420 -- \
  python pipelines/run_pipeline.py --dataset synth3 --scale paper \
    --data_examples 4096 --model_id 4096r5 \
    --fg_from fg_model_synth3-20260818a \
    --box_from box_model_synth3-20260818a \
    --stages pack,full,eval --full_steps 20000 --resume
env $CPU python pipelines/compare_runs.py \
  --ids full_model_synth3-20260818a,full_model_synth3-4096r5 \
  --labels "1024ex (30k)","4096ex (20k)" \
  --title "synth3 data scaling: 1024 -> 4096 examples (same fg/box stages)" \
  --notes results/full_model_synth3-20260818a/notes.md >> logs/r5d.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth3-20260818a \
  --box_id box_model_synth3-20260818a --fg_id fg_model_synth3-20260818a \
  --section synth3 >> logs/r5d.log 2>&1 || true
ID=full_model_synth3-4096r5
commit_files "synth3 4096-example data-scaling point" \
  "results/$ID"/ckpt-*.npz "results/$ID"/*.yaml \
  results/full_model_synth3-20260818a/notes.md \
  "results/$ID"/output_valid/*.csv "logs/$ID"/*.csv RESULTS.md logs/r5d.log
echo "[queue_round5d] done" >> logs/queue_round5d.done
