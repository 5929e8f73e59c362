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
# Exact relaunch recipe: the reaper/publish tail quote this into RESUME.md
# so an interrupted chain is always one copy-paste from resuming.
printf 'bash %s %q %q -- ' "$(realpath "$0" 2>/dev/null || echo "$0")" \
  "$LOG" "$SILENT" > "${LOG}.cmd"
printf '%q ' "$@" >> "${LOG}.cmd"
echo >> "${LOG}.cmd"
# Never leave pid files behind: a reused PID would get an unrelated
# process killed by a later bench reap.  On TERM/INT also stop the child
# (the reaper SIGTERMs the watchdog first; without this the run would
# linger until its own .pid entry is processed).
PID=""
cleanup() { rm -f "${LOG}.wdpid" "${LOG}.pid"; }
trap 'cleanup' EXIT
trap '[ -n "$PID" ] && kill "$PID" 2>/dev/null; cleanup; exit 143' TERM INT
child_state() {
  # Process state letter, robust to spaces in comm: field after the ')'.
  sed -e 's/^.*) //' "/proc/$1/stat" 2>/dev/null | cut -d' ' -f1
}
child_cpu() {
  # Cumulative utime+stime jiffies of the child AND its descendants
  # (the pipeline may fork pack/eval workers that do the actual work).
  local total=0 pid
  for pid in $1 $(pgrep -P "$1" 2>/dev/null); do
    local t
    t=$(sed -e 's/^.*) //' "/proc/$pid/stat" 2>/dev/null \
        | awk '{print $12+$13}')
    total=$((total + ${t:-0}))
  done
  echo "$total"
}
for attempt in $(seq 0 $MAX_RETRIES); do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "${LOG}.pid"
  echo "[watchdog] attempt $attempt pid $PID: $*" >> "${LOG}.wd"
  stalled=0
  cpu_prev=$(child_cpu "$PID")
  while kill -0 "$PID" 2>/dev/null; do
    # An exited child stays a zombie until we wait() on it, and kill -0
    # succeeds on zombies — without this check a finished run would sit
    # here until SILENT elapsed and then be "stall-retried".
    [ "$(child_state "$PID")" = "Z" ] && break
    sleep "$POLL"
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    # A tunnel stall is silent in BOTH channels: no log lines AND no CPU
    # (observed round 4: frozen dispatch burns zero cycles).  Long silent
    #-but-busy phases (device-split decode/upload, 10-12 min big-shape
    # compiles) must not be killed, so CPU progress resets the clock.
    # Threshold: >1% of a core over the poll window (jiffies are 100/s).
    # Calibrated on round-5 observations: a stalled tunnel run's idle
    # heartbeat threads burn ~0.1-0.5% (the original 0.5% bar was fooled
    # in some windows and left a stall alive); a REMOTE XLA compile
    # through the tunnel burns only ~1.8% locally (a 2% bar false-killed
    # one mid-compile); local decode/compile burns 50-100%+.  1% sits
    # between the two observed regimes, and upload phases additionally
    # log per-tensor lines, resetting mtime anyway.
    cpu_min=$POLL; [ "$cpu_min" -lt 1 ] && cpu_min=1
    cpu_now=$(child_cpu "$PID")
    if [ "$cpu_now" -ge $((cpu_prev + cpu_min)) ]; then
      cpu_prev="$cpu_now"
      touch "$LOG"
      mt=$now
    fi
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
