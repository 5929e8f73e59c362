#!/bin/bash
# Round-5 consolidated tail, v2 (replaces the remainder of queue_round5d.sh
# and queue_round5e.sh — both killed after the C_bf16 run_one started).
# Reprioritised so the cheap, VERDICT-explicit deliverables land before the
# multi-hour experiments:
#
#   1. C_bf16 tail: calibrate + publish full_model_synth1024bf16-r5 +
#      bf16-vs-f32 30k comparison table (VERDICT r4 #4)
#   2. FINISH the synth3 packed-channel ablation (VERDICT r4 #1's second
#      half; killed at step ~5.1k/12k on 2026-08-19 05:39 for the queue
#      handover and never resumed) + render its table into RESULTS synth3
#   3. L3 slow-knob counting lever + complete 4-lever table (VERDICT #2)
#   4. synth3@4096 data-scaling point (VERDICT #3)
#   5. glimpse filter 48->64 lever, fresh 30k bf16 twin (VERDICT #2)
#
# usage: queue_round5f.sh WDPID_FILE   (the C_bf16 watchdog pid file)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5f.pid
trap 'rm -f logs/queue_round5f.pid' EXIT TERM INT
WDPID_FILE="${1:?pass the C_bf16 watchdog pid file}"
PREV=$(cat "$WDPID_FILE" 2>/dev/null || echo 0)
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
sleep 30

CPU="PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
BOX=box_model_synth-20260816104712
BASE1024=full_model_synth1024-20260816
DF=data/synth224
NOTES="results/${BASE1024}/notes.md"

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

publish_run() {
  local id="$1" msg="$2" f specs=()
  for f in "results/$id"/ckpt-*.npz "results/$id"/*.yaml \
           "results/$id"/*.json "results/$id"/output_valid/*.csv \
           "results/$id"/output_valid_calibrated/*.csv \
           "results/$id"/output_train_calibrated/*.csv \
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
  bash pipelines/watchdog.sh "logs/r5f_${tag}/run.log" 420 -- \
    python pipelines/resume_synth_paper.py --box_id "$BOX" --skip_box \
      --dataset_folder "$DF" --data_examples 1024 --full_id "$id" \
      --dtype "$dt" "$@"
  if [ "$cal" = calib ]; then
    bash pipelines/watchdog.sh "logs/r5f_${tag}/calib.log" 420 -- \
      python pipelines/calibrate_count.py --model_id "$id" \
        --dataset_folder "$DF" --batch_size 8
  fi
  publish_run "$id" "round 5 ${tag}: ${id} artifacts (queue autopublish)"
}

# ---- 1. C_bf16 tail (the run itself finished under the old watchdog) ----
CB=full_model_synth1024bf16-r5
bash pipelines/watchdog.sh logs/r5f_C_bf16/calib.log 420 -- \
  python pipelines/calibrate_count.py --model_id "$CB" \
    --dataset_folder "$DF" --batch_size 8
# The f32 comparator never got a calibration pass (its original
# data/synth224x1024 folder was wiped by a VM restore; data/synth224 is
# the deterministic regeneration at the same example count) — calibrate
# it too so the dtype table compares train-calibrated headlines, not just
# best-of-sweep rows.
bash pipelines/watchdog.sh logs/r5f_f32base/calib.log 420 -- \
  python pipelines/calibrate_count.py --model_id "$BASE1024" \
    --dataset_folder "$DF" --batch_size 8
publish_run "$BASE1024" "round 5: f32 1024-flagship calibration artifacts"
publish_run "$CB" "round 5 C_bf16: ${CB} artifacts (queue autopublish)"
env $CPU python pipelines/compare_runs.py \
  --ids ${BASE1024},"$CB" \
  --labels "f32 (r4)","bf16 (r5)" \
  --title "bf16 training accuracy validation (CVPPP shape, 1024 examples, full 30k from the same box weights)" \
  --notes "$NOTES" >> logs/r5f.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5f.log 2>&1
commit_files "round 5: bf16 accuracy-validation table (30k)" "$NOTES" \
  RESULTS.md logs/r5f.log

# ---- 2. finish the synth3 packed-channel ablation ------------------------
bash pipelines/watchdog.sh logs/ablate_synth3-20260818a/run.log 420 -- \
  python pipelines/ablate_packed.py --baseline_id box_model_synth3-20260818a \
    --steps 12000 --batch_size 8 --resume
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth3-20260818a \
  --box_id box_model_synth3-20260818a --fg_id fg_model_synth3-20260818a \
  --section synth3 >> logs/r5f.log 2>&1
commit_files "synth3 packed-channel ablation table (VERDICT r4 #1)" \
  results/box_model_nofg_synth3-20260818a/ablation.json \
  logs/box_model_nofg_synth3-20260818a/loss.csv \
  logs/box_model_nofg_synth3-20260818a/iou_soft_box.csv \
  RESULTS.md logs/r5f.log

# ---- 3. L3 slow-knob lever + complete lever table -------------------------
run_one full_model_s1024_ftK-r5 L3_knob bfloat16 nocalib \
  --finetune_from "$BASE1024" --full_steps 8000 \
  --steps_per_knob_decay 1400 --knob_segm_offset 1500
env $CPU python pipelines/compare_runs.py \
  --ids full_model_s1024_ft0-r5,full_model_s1024_ftA-r5,full_model_s1024_ftV-r5,full_model_s1024_ftK-r5 \
  --labels "control ft8k","+segm_weight_alpha0.5","+dynamic_var","+slow knob decay" \
  --title "Counting levers, complete 4-way table (8k finetunes of the 1024-example flagship)" \
  --notes "$NOTES" >> logs/r5f.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5f.log 2>&1
commit_files "round 5: complete 4-way counting-lever table" "$NOTES" \
  RESULTS.md logs/r5f.log

# ---- 4. synth3@4096 data-scaling point ------------------------------------
bash pipelines/watchdog.sh logs/r5f_synth3_4096/chain.log 420 -- \
  python pipelines/run_pipeline.py --dataset synth3 --scale paper \
    --data_examples 4096 --model_id 4096r5 \
    --fg_from fg_model_synth3-20260818a \
    --box_from box_model_synth3-20260818a \
    --stages pack,full,eval --full_steps 20000 --resume
env $CPU python pipelines/compare_runs.py \
  --ids full_model_synth3-20260818a,full_model_synth3-4096r5 \
  --labels "1024ex (30k)","4096ex (20k)" \
  --title "synth3 data scaling: 1024 -> 4096 examples (same fg/box stages)" \
  --notes results/full_model_synth3-20260818a/notes.md >> logs/r5f.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth3-20260818a \
  --box_id box_model_synth3-20260818a --fg_id fg_model_synth3-20260818a \
  --section synth3 >> logs/r5f.log 2>&1 || true
ID=full_model_synth3-4096r5
commit_files "synth3 4096-example data-scaling point" \
  "results/$ID"/ckpt-*.npz "results/$ID"/*.yaml \
  results/full_model_synth3-20260818a/notes.md \
  "results/$ID"/output_valid/*.csv "logs/$ID"/*.csv RESULTS.md logs/r5f.log

# ---- 5. glimpse filter 48->64 lever (fresh 30k bf16 twin of C_bf16) -------
run_one full_model_s1024_f64-r5 L4_filter64 bfloat16 nocalib \
  --filter_size 64 --full_steps 30000
env $CPU python pipelines/compare_runs.py \
  --ids "$CB",full_model_s1024_f64-r5 \
  --labels "filter 48 (bf16 30k)","filter 64 (bf16 30k)" \
  --title "Counting lever: glimpse filter 48 -> 64 (fresh 30k twins, bf16, same box init)" \
  --notes "$NOTES" >> logs/r5f.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5f.log 2>&1
commit_files "round 5: glimpse filter 48->64 lever table" "$NOTES" \
  RESULTS.md logs/r5f.log
echo "[queue_round5f] done" >> logs/queue_round5f.done
