#!/bin/bash
# Round-5 queue part G: lever COMBINATION run, after queue_round5f drains.
#
# Rationale (results/full_model_synth1024-20260816/notes.md): of the four
# decoder-side counting levers the r4 ceiling analysis named,
# segm_weight_alpha=0.5 is the only one that helped at the 8k-finetune
# screen (SBD 0.8347 vs 0.8160 control, count_acc +0.008, |DiC| -0.027);
# dynamic_var hurt; filter64 and slow-knob verdicts land in round5f.
# The bar (count_acc >=0.85, |DiC| <=0.25) needs the winning levers
# STACKED at full 30k budget, not screened individually at 8k — this runs
# the combo as a fresh 30k bf16 twin of full_model_synth1024bf16-r5
# (same box init, same data), so the comparison is one-variable-per-table.
#
# usage: queue_round5g.sh [ROUND5F_PID_FILE]
set -u
cd "$(dirname "$0")/.."
mkdir -p logs && echo "$$" > logs/queue_round5g.pid
trap 'rm -f logs/queue_round5g.pid' EXIT TERM INT
PIDF="${1:-logs/queue_round5f.pid}"
if [ -f "$PIDF" ]; then
  PREV=$(cat "$PIDF")
  while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
sleep 30   # let the TPU claim settle

CPU="PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
BOX=box_model_synth-20260816104712
DF=data/synth224
CB=full_model_synth1024bf16-r5
NOTES=results/full_model_synth1024-20260816/notes.md

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

# Stack the levers that won their individual screens.  alpha0.5 is in
# unconditionally (won at 8k).  slow-knob joins if the L3 screen beat the
# control on count_acc (the table lands in notes.md before this starts);
# filter64's fresh-30k verdict arrives too late to gate on, so the combo
# uses filter 48 and the round5f L4 row stays its isolated test.
KNOB_FLAGS=""
if env $CPU python - "$NOTES" <<'EOF'
import sys
txt = open(sys.argv[1]).read()
i = txt.find('Counting levers, complete 4-way table')
if i < 0: sys.exit(1)          # L3 row never landed -> leave knob out
j = txt.find('### ', i)
tbl = txt[i:] if j < 0 else txt[i:j]
rows = {l.split('|')[1].strip(): l for l in tbl.splitlines()
        if l.startswith('|') and l.count('|') >= 3}
row = rows.get('count_acc (best-of-sweep)', '')
cells = [c.strip() for c in row.split('|')[2:-1]]
try:
    vals = [float(c) for c in cells]
except ValueError:
    sys.exit(1)
# columns: control, alpha, dynvar, slow-knob
sys.exit(0 if len(vals) >= 4 and vals[3] > vals[0] else 1)
EOF
then
  KNOB_FLAGS="--steps_per_knob_decay 1400 --knob_segm_offset 1500"
  echo "[round5g] slow-knob lever joined the combo" >> logs/r5g.log
fi

ID=full_model_s1024_combo-r5
bash pipelines/watchdog.sh logs/r5g_combo/run.log 420 -- \
  python pipelines/resume_synth_paper.py --box_id "$BOX" --skip_box \
    --dataset_folder "$DF" --data_examples 1024 --full_id "$ID" \
    --dtype bfloat16 --segm_weight_alpha 0.5 --full_steps 30000 \
    $KNOB_FLAGS
bash pipelines/watchdog.sh logs/r5g_combo/calib.log 420 -- \
  python pipelines/calibrate_count.py --model_id "$ID" \
    --dataset_folder "$DF" --batch_size 8
publish_run "$ID" "round 5 combo: ${ID} artifacts (queue autopublish)"
env $CPU python pipelines/compare_runs.py \
  --ids "$CB","$ID" \
  --labels "bf16 control (30k)","bf16 + winning levers (30k)" \
  --title "Counting lever combo at full budget (fresh 30k bf16 twins, same box init)" \
  --notes "$NOTES" >> logs/r5g.log 2>&1
env $CPU python pipelines/write_results.py \
  --full_id full_model_synth-20260816104712 \
  --box_id box_model_synth-20260816104712 --section cvppp \
  >> logs/r5g.log 2>&1
git add -f "$NOTES" RESULTS.md logs/r5g.log 2>/dev/null
git commit -m "round 5: counting-lever combo table (30k bf16)" \
  -- "$NOTES" RESULTS.md logs/r5g.log || true
echo "[queue_round5g] done" >> logs/queue_round5g.done
