#!/bin/bash
# Round-5 queue, part B: after queue_round5.sh's experiments finish, give
# every PUBLISHED section a train-calibrated headline (VERDICT r4 weak #7)
# and re-render RESULTS.md:
#   - calibrate_count on the cvppp flagship, the synth3 chain, and the
#     synthcs chain (mask threshold AND stop score both picked on the
#     train split; see pipelines/calibrate_count.py step 2b);
#   - pixel-level semantic eval on the synthcs chain's packed fg output
#     (the one evaluator family never run end-to-end, VERDICT r4 #5);
#   - write_results per section + commit.
# usage: queue_round5b.sh PREV_PID
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5b.pid
trap 'rm -f logs/queue_round5b.pid' EXIT TERM INT
PREV="${1:?pass the predecessor pid}"
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
sleep 30

commit_files() {  # commit_files <msg> <files...>
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

CPU="PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

# -- cvppp flagship --------------------------------------------------------
ID=full_model_synth-20260816104712
bash pipelines/watchdog.sh logs/r5b_cvppp/calib.log 420 -- \
  python pipelines/calibrate_count.py --model_id "$ID" \
    --dataset_folder data/synth224 --batch_size 8
env $CPU python pipelines/write_results.py --full_id "$ID" \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5b_cvppp/calib.log 2>&1
commit_files "Train-calibrated headline for the cvppp section" \
  "results/$ID/count_calibration.json" \
  results/$ID/output_valid_calibrated/*.csv \
  results/$ID/output_train_calibrated/*.csv RESULTS.md

# -- synth3 chain ----------------------------------------------------------
ID=full_model_synth3-20260818a
bash pipelines/watchdog.sh logs/r5b_synth3/calib.log 420 -- \
  python pipelines/calibrate_count.py --model_id "$ID" --batch_size 8
env $CPU python pipelines/write_results.py --full_id "$ID" \
  --box_id box_model_synth3-20260818a --fg_id fg_model_synth3-20260818a \
  --section synth3 >> logs/r5b_synth3/calib.log 2>&1
commit_files "Train-calibrated headline for the synth3 section" \
  "results/$ID/count_calibration.json" \
  results/$ID/output_valid_calibrated/*.csv \
  results/$ID/output_train_calibrated/*.csv RESULTS.md

# -- synthcs chain: pixel-level eval + calibrated headline -----------------
ID=full_model_synthcs-20260818a
bash pipelines/watchdog.sh logs/r5b_synthcs/pixel.log 420 -- \
  python pipelines/run_pipeline.py --dataset synthcs --scale paper \
    --data_examples 1024 --model_id 20260818a --stages pixel
bash pipelines/watchdog.sh logs/r5b_synthcs/calib.log 420 -- \
  python pipelines/calibrate_count.py --model_id "$ID" --batch_size 4
env $CPU python pipelines/write_results.py --full_id "$ID" \
  --box_id box_model_synthcs-20260818a --fg_id fg_model_synthcs-20260818a \
  --section synthcs >> logs/r5b_synthcs/calib.log 2>&1
commit_files "synthcs: pixel-level eval + train-calibrated headline" \
  "results/$ID/count_calibration.json" \
  "results/$ID/output_valid/pixel_eval.json" \
  results/$ID/output_valid_calibrated/*.csv \
  results/$ID/output_train_calibrated/*.csv RESULTS.md
echo "[queue_round5b] done" >> logs/queue_round5b.done
