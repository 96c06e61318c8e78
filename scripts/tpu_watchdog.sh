#!/bin/bash
# Retry wrapper for the flaky axon tunnel: the remote compile/init RPC
# sporadically never returns (process sits futex-waiting with ~0 CPU).
# Relaunches the command if its log hasn't grown within STALL_S seconds.
# Polls liveness every 10 s so a finished command is noticed promptly.
# usage: tpu_watchdog.sh <log> <stall_s> <max_tries> -- cmd args...
LOG=$1; STALL=$2; TRIES=$3; shift 4
for try in $(seq 1 "$TRIES"); do
  echo "[watchdog] attempt $try: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  SIZE0=$(stat -c %s "$LOG")
  LAST=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 10
    SIZE1=$(stat -c %s "$LOG" 2>/dev/null || echo "$SIZE0")
    if [ "$SIZE1" -ne "$SIZE0" ]; then
      SIZE0=$SIZE1; LAST=$(date +%s)
    elif [ $(( $(date +%s) - LAST )) -ge "$STALL" ]; then
      echo "[watchdog] stalled (no log growth in ${STALL}s); killing $PID" >> "$LOG"
      kill "$PID"; sleep 3; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; RC=$?
  if [ "$RC" -eq 0 ]; then echo "[watchdog] success" >> "$LOG"; exit 0; fi
done
echo "[watchdog] giving up after $TRIES attempts" >> "$LOG"; exit 1
