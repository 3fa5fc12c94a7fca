#!/usr/bin/env bash
# Watchdog launcher for scripts/train_rehearsal.py on flaky device tunnels.
#
# The shared axon frontend can wedge ONE in-flight RPC forever while the
# link itself stays healthy for new connections (STATUS.md "environment
# lessons": a mid-run metrics fetch blocked >15 min with zero CPU while a
# fresh process round-tripped in 5 s). A multi-hour measurement cannot
# babysit that, so: restart the measurement process whenever its log stops
# advancing. Completed recipes are skipped via the results JSONL, and the
# in-flight recipe resumes from its newest checkpoint (train_rehearsal.py
# sets RESUME to the recipe's output dir), so a restart continues rather
# than redoes. Records flag `resumed_from_ckpt` when a recipe's wall_s spans
# only its final session; the honest suite wall-clock is the supervisor's
# start→finish time, stall-and-restart overhead included.
#
# Usage: bash scripts/run_train_rehearsal_supervised.sh [WORKSPACE] [LOG] [extra args...]
#   STALL_SECS=1200  restart when the log is silent this long. Must cover the
#                    longest legitimately-quiet phases: full-scale dataset
#                    build (~9 min first time), a new recipe geometry's first
#                    XLA compile, AND a fresh process's first device contact,
#                    which on a degraded tunnel can take up to ~10 min
#                    (STATUS.md environment lessons). 480 s was measured too
#                    tight at scale 1.0: it killed a healthy first compile
#                    and would kill every restart the same way (the compile
#                    cache only helps once a compile COMPLETES).
#   MAX_RESTARTS=40  give up after this many restarts (a real crash loops
#                    fast; 40 × a few minutes of stall is a tunnel outage)
#   touch $WS/STOP    ask the supervisor to stop: it kills the child, does
#                    NOT restart, and exits 0 (the results JSONL keeps the
#                    suite resumable). This is the supported way for an
#                    outer controller to end the measurement — killing the
#                    child alone makes it exit nonzero, which the rc!=0
#                    branch would otherwise treat as a crash and restart.
set -u
WS=${1:-/tmp/train_rehearsal}
LOG=${2:-/tmp/train_rehearsal.log}
shift 2>/dev/null || true
shift 2>/dev/null || true
STALL=${STALL_SECS:-1200}
MAX_RESTARTS=${MAX_RESTARTS:-40}
PY=${PYTHON:-/opt/venv/bin/python}
HERE=$(cd "$(dirname "$0")/.." && pwd)

mkdir -p "$WS"   # the child also creates it, but the pid-file write below
                 # must not race that (a fresh workspace would otherwise
                 # silently swallow the redirect failure — no set -e)
rm -f "$WS/STOP"
cleanup() { rm -f "$WS/child.pid"; }
trap cleanup EXIT

restarts=0
while true; do
  "$PY" "$HERE/scripts/train_rehearsal.py" --workspace "$WS" "$@" >> "$LOG" 2>&1 &
  PID=$!
  # pid file so an outer controller can stop the MEASUREMENT process
  # directly (kill $(cat child.pid)) instead of pattern-matching process
  # names. For an orderly stop use `touch $WS/STOP` (see header).
  echo "$PID" > "$WS/child.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    if [ -e "$WS/STOP" ]; then
      echo "[supervisor] STOP sentinel seen — ending measurement" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      exit 0
    fi
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALL" ]; then
      echo "[supervisor] log silent ${age}s — killing $PID to restart" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID"
  rc=$?
  if [ -e "$WS/STOP" ]; then
    echo "[supervisor] STOP sentinel seen — not restarting" >> "$LOG"
    exit 0
  fi
  if [ "$rc" -eq 0 ]; then
    echo "[supervisor] completed rc=0 after $restarts restart(s)" >> "$LOG"
    break
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
    echo "[supervisor] giving up after $restarts restarts (last rc=$rc)" >> "$LOG"
    exit 1
  fi
  echo "[supervisor] restart #$restarts (rc=$rc)" >> "$LOG"
  sleep 10
done
