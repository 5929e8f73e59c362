#!/bin/bash
# Round-5 follower queue: the last named counting lever from VERDICT r4 #2
# that queue_round5d.sh did not carry — the glimpse filter 48 -> 64
# (`/root/reference/full_model.py` filter_height/width analogue).  A filter
# change alters the glimpse CNN/DCNN shapes, so this cannot be a finetune:
# it trains a fresh full model from the same box weights, bf16, 30k steps —
# the clean twin of full_model_synth1024bf16-r5 (queue_round5d item 3),
# which differs ONLY in filter size.
#
# usage: queue_round5e.sh PREV_PID   (the queue_round5d.sh pid)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5e.pid
trap 'rm -f logs/queue_round5e.pid' EXIT TERM INT
PREV="${1:?pass the predecessor pid}"
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
sleep 30

CPU="PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
BOX=box_model_synth-20260816104712
DF=data/synth224
NOTES=results/full_model_synth1024-20260816/notes.md

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
           "logs/$id"/*.csv; do
    [ -e "$f" ] && git add -f "$f" 2>/dev/null && specs+=("$f")
  done
  [ ${#specs[@]} -gt 0 ] || return 0
  for try in 1 2 3; do
    git commit -m "$msg" -- "${specs[@]}" && break
    sleep 20
  done
}

ID=full_model_s1024_f64-r5
bash pipelines/watchdog.sh logs/r5e_L4_filter64/run.log 420 -- \
  python pipelines/resume_synth_paper.py --box_id "$BOX" --skip_box \
    --dataset_folder "$DF" --data_examples 1024 --full_id "$ID" \
    --dtype bfloat16 --filter_size 64 --full_steps 30000
publish_run "$ID" "round 5 L4_filter64: ${ID} artifacts (queue autopublish)"

env $CPU python pipelines/compare_runs.py \
  --ids full_model_synth1024bf16-r5,"$ID" \
  --labels "filter 48 (bf16 30k)","filter 64 (bf16 30k)" \
  --title "Counting lever: glimpse filter 48 -> 64 (fresh 30k twins, bf16, same box init)" \
  --notes "$NOTES" >> logs/r5e.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5e.log 2>&1
commit_files "round 5: glimpse filter 48->64 lever table" "$NOTES" \
  RESULTS.md logs/r5e.log
echo "[queue_round5e] done" >> logs/queue_round5e.done
