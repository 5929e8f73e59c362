#!/bin/bash
# Round-4 queue tail #2: when the synthcs@1024 chain's watchdog exits,
# render its metrics into RESULTS.md (write_results is CPU-only, safe to
# run while the ablation queue claims the TPU) and commit the stage
# checkpoints + results so a VM restore cannot wipe hours of training.
# Publication is idempotent (section markers), so a partial chain (e.g.
# round ends mid-full-stage) still commits whatever checkpoints exist.
set -u
WDPID_FILE="${1:-logs/synthcs-20260818a/chain.log.wdpid}"
while [ ! -f "$WDPID_FILE" ]; do sleep 60; done
PREV=$(cat "$WDPID_FILE")
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done

cd "$(dirname "$0")/.."
ID=20260818a
# Commit the raw stage artifacts first (checkpoints are gitignored ->
# force-add), then the rendered results if eval/ap CSVs exist.
for stage in fg box full; do
  d="results/${stage}_model_synthcs-${ID}"
  [ -d "$d" ] && git add -f "$d"/ckpt-*.npz "$d"/*.yaml "$d"/weights.h5 2>/dev/null
done
git add -f logs/full_model_synthcs-${ID}/*.csv \
          logs/box_model_synthcs-${ID}/*.csv \
          logs/fg_model_synthcs-${ID}/*.csv 2>/dev/null
# Durable per-run commentary rendered into RESULTS.md by write_results:
# carry forward the 256-example history this section replaces.
NOTES="results/full_model_synthcs-${ID}/notes.md"
if [ -d "results/full_model_synthcs-${ID}" ] && [ ! -f "$NOTES" ]; then
  cat > "$NOTES" <<'NOTESEOF'
- **4× data rerun.**  This model retrains the synthcs chain on a
  1024-example train split (256 before).  The 256-example run saturated
  at SBD 0.761 (16k) → 0.770 (40k) with AP 0.352 / AP50 0.602
  (`full_model_synthcs-20260816233144`); the same 4× data change broke
  the equivalent saturation at CVPPP shape (0.77 → 0.85).
- **Packed-channel ablation** (box stage, with vs without fg inputs) was
  run on the 256-example data: no-fg twin matched the packed baseline
  (negative result, `results/box_model_nofg_synthcs-20260816233144/
  ablation.json`, table preserved in git history of RESULTS.md).
NOTESEOF
  git add -f "$NOTES" 2>/dev/null
fi
if ls results/full_model_synthcs-${ID}/output_valid/*.csv >/dev/null 2>&1; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python pipelines/write_results.py \
      --full_id full_model_synthcs-${ID} \
      --box_id box_model_synthcs-${ID} \
      --fg_id fg_model_synthcs-${ID} \
      --section synthcs >> logs/synthcs-${ID}/publish.log 2>&1
  git add RESULTS.md
  git add -f results/full_model_synthcs-${ID}/output_valid 2>/dev/null
fi
git commit -m "synthcs@1024 chain artifacts (auto-published post-chain)" \
  >> logs/synthcs-${ID}/publish.log 2>&1 || true
