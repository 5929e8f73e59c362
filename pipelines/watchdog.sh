#!/bin/bash
# Tunnel-stall watchdog for long TPU runs (see CLAUDE.md: the axon tunnel
# can freeze silently mid-training with no exception).  Launches CMD with
# stdout+stderr appended to LOG, polls the LOG mtime, and if the process
# is alive but silent for more than SILENT seconds, kills it BY PID
# (never by pattern) and relaunches.  CMD must be resume-safe (pipelines
# accept --resume, which is a no-op on a fresh run), so every relaunch
# continues from the last checkpoint.
#
# usage: watchdog.sh LOG SILENT_SEC -- CMD ARGS...
# WATCHDOG_POLL overrides the 60 s poll interval (tests use seconds).
set -u
LOG="$1"; SILENT="$2"; shift 2
[ "${1:-}" = "--" ] && shift
MAX_RETRIES=6
POLL="${WATCHDOG_POLL:-60}"
mkdir -p "$(dirname "$LOG")"
echo "$$" > "${LOG}.wdpid"   # bench.py's leftover-run reaper kills by this
child_state() {
  # Process state letter, robust to spaces in comm: field after the ')'.
  sed -e 's/^.*) //' "/proc/$1/stat" 2>/dev/null | cut -d' ' -f1
}
for attempt in $(seq 0 $MAX_RETRIES); do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "${LOG}.pid"
  echo "[watchdog] attempt $attempt pid $PID: $*" >> "${LOG}.wd"
  stalled=0
  while kill -0 "$PID" 2>/dev/null; do
    # An exited child stays a zombie until we wait() on it, and kill -0
    # succeeds on zombies — without this check a finished run would sit
    # here until SILENT elapsed and then be "stall-retried".
    [ "$(child_state "$PID")" = "Z" ] && break
    sleep "$POLL"
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$SILENT" ]; then
      echo "[watchdog] $(date -Is) stall: silent $((now - mt))s, killing $PID" >> "${LOG}.wd"
      kill "$PID" 2>/dev/null
      sleep 15
      kill -9 "$PID" 2>/dev/null
      stalled=1
      break
    fi
  done
  wait "$PID"; rc=$?
  if [ "$rc" -eq 0 ] && [ "$stalled" -eq 0 ]; then
    echo "[watchdog] $(date -Is) success after $attempt retries" >> "${LOG}.wd"
    exit 0
  fi
  echo "[watchdog] $(date -Is) rc=$rc stalled=$stalled; retrying" >> "${LOG}.wd"
  sleep 30   # let the TPU claim / axon backend registration settle
done
echo "[watchdog] giving up after $MAX_RETRIES retries" >> "${LOG}.wd"
exit 1
