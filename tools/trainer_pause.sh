#!/bin/bash
# Pause/resume the detached artifact trainer (tools/train_more_artifacts.sh)
# around chip-timing windows on this 1-core host.  The trainer registers
# its bash pid in /tmp/cpu_heavy_artifacts.pid; we SIGSTOP/SIGCONT that
# pid's whole session (bash + timeout + python) found via PPID chain —
# no pattern matching, so our own shell can never be hit.
# Usage: trainer_pause.sh stop|cont
set -u
sig=${1:?stop|cont}
pidfile=/tmp/cpu_heavy_artifacts.pid
[ -f "$pidfile" ] || { echo "trainer not registered (done or waiting)"; exit 0; }
root=$(cat "$pidfile")
kill -0 "$root" 2>/dev/null || { echo "trainer pid $root gone"; exit 0; }
pids="$root"
frontier="$root"
for _ in 1 2 3 4; do
  next=""
  for p in $frontier; do
    kids=$(ps -o pid= --ppid "$p" 2>/dev/null)
    next="$next $kids"
  done
  frontier=$(echo "$next" | tr -s ' \n' ' ')
  [ -z "${frontier// /}" ] && break
  pids="$pids $frontier"
done
case "$sig" in
  stop) kill -STOP $pids 2>/dev/null; echo "paused: $pids";;
  cont) kill -CONT $pids 2>/dev/null; echo "resumed: $pids";;
  *) echo "usage: trainer_pause.sh stop|cont"; exit 1;;
esac
