#!/bin/bash
# Post-chain publish tail (generalizes round-4's queue_publish_synthcs.sh).
# Waits for a watchdog-wrapped pipeline chain to exit, then commits its
# stage artifacts + rendered RESULTS.md section so a VM restore cannot wipe
# hours of training.  If the chain is INCOMPLETE (no eval CSVs for the full
# model) it instead appends an executable resume recipe to RESUME.md — the
# round boundary must never orphan a half-trained chain again (round 4 did).
#
# usage: publish_chain.sh WDPID_FILE DATASET ID [SECTION]
#   WDPID_FILE  logs/<chain>/chain.log.wdpid written by watchdog.sh
#   DATASET     results-dir dataset tag, e.g. synthcs / synth3 / synth
#   ID          model id suffix, e.g. 20260818a
#   SECTION     write_results --section (defaults to DATASET)
#
# Fixes from ADVICE r4: per-file git adds (a glob matching nothing no
# longer aborts the whole add), explicit commit pathspecs (never scoops the
# interactive session's staged files), ID is a parameter (not hardcoded).
set -u
WDPID_FILE="$1"; DATASET="$2"; ID="$3"; SECTION="${4:-$2}"
while [ ! -f "$WDPID_FILE" ]; do sleep 60; done
PREV=$(cat "$WDPID_FILE")
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done

cd "$(dirname "$0")/.."
CHAINLOG_DIR="$(dirname "$WDPID_FILE")"
FULL="full_model_${DATASET}-${ID}"
PATHSPECS=()

add_existing() {   # git add -f each file that exists; never all-or-nothing
  local f
  for f in "$@"; do
    if [ -e "$f" ]; then
      git add -f "$f" 2>/dev/null && PATHSPECS+=("$f")
    fi
  done
}

for stage in fg box full; do
  d="results/${stage}_model_${DATASET}-${ID}"
  [ -d "$d" ] || continue
  add_existing "$d"/ckpt-*.npz "$d"/*.yaml "$d"/weights.h5 "$d"/notes.md \
               "$d"/*.json
  ld="logs/${stage}_model_${DATASET}-${ID}"
  [ -d "$ld" ] && add_existing "$ld"/*.csv
done

if ls "results/${FULL}/output_valid"/*.csv >/dev/null 2>&1; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python pipelines/write_results.py \
      --full_id "$FULL" \
      --box_id "box_model_${DATASET}-${ID}" \
      --fg_id "fg_model_${DATASET}-${ID}" \
      --section "$SECTION" >> "${CHAINLOG_DIR}/publish.log" 2>&1
  add_existing RESULTS.md
  add_existing "results/${FULL}/output_valid"/*.csv
else
  # Chain incomplete: leave a committed, executable resume recipe.
  CMD_FILE="${CHAINLOG_DIR}/chain.log.cmd"
  {
    echo
    echo "## ${DATASET}-${ID} (publish tail, $(date -Is))"
    echo "Chain exited without eval output (results/${FULL}/output_valid missing)."
    echo "Stage checkpoints present:"
    for stage in fg box full; do
      d="results/${stage}_model_${DATASET}-${ID}"
      ck=$(ls "$d"/ckpt-*.npz 2>/dev/null | tail -1)
      echo "- ${stage}: ${ck:-none}"
    done
    echo 'Resume (watchdog-wrapped, safe to rerun):'
    echo '```'
    if [ -f "$CMD_FILE" ]; then cat "$CMD_FILE"; else
      echo "# no .cmd recorded; reconstruct from ${CHAINLOG_DIR}/chain.log.wd"
    fi
    echo '```'
  } >> RESUME.md
  add_existing RESUME.md
fi

if [ "${#PATHSPECS[@]}" -gt 0 ]; then
  git commit -m "${DATASET}@${ID} chain artifacts (auto-published post-chain)" \
    -- "${PATHSPECS[@]}" >> "${CHAINLOG_DIR}/publish.log" 2>&1 || true
fi
