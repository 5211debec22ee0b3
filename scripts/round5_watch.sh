#!/bin/bash
# Waits for the flagship_sh4 campaign to EXIT — the one-client tunnel rule:
# nothing may init the TPU backend while the trainer holds it — then fires
# the round-5 measurement chain.  Designed to run detached (setsid nohup).
#
# $1 (optional): supervisor PID.  CAUTION if passing one: `$!` after
# `setsid nohup cmd &` is setsid's short-lived wrapper PID, not the
# supervisor's — an early round-5 watcher launched with that wrapper PID
# concluded the campaign was already over and nearly started benching
# against a live trainer.  The default (no argument) polls the process
# table for the supervisor command line instead — WAIT-ONLY; never kill by
# pattern.
set -u
cd /root/repo

alive() {
  if [ -n "${1:-}" ]; then
    kill -0 "$1" 2>/dev/null
  else
    # pgrep -f for WAITING only (exact-script match); kills stay PID-exact.
    pgrep -f "supervise_train.py.*flagship_sh4" > /dev/null 2>&1
  fi
}

echo "watching flagship_sh4 supervisor ${1:-via process table} ($(date -u +%FT%TZ))"
# Require it alive once first (fail loud if the campaign never started).
if ! alive "${1:-}"; then
  echo "WARNING: no running flagship_sh4 supervisor found at watch start"
fi
while alive "${1:-}"; do sleep 60; done
echo "campaign exited; settling 120s before touching the TPU"
sleep 120
exec bash scripts/round5_wrapup.sh
