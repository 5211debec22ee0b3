#!/bin/bash
# Round-3 end-of-round wrap-up: reclaim the chip from the flagship campaign,
# measure everything the round owes (held-out eval, inference fps, final
# bench incl. a chunk-256 A/B), record + persist + commit.  Every leg is
# wall-clock bounded; a failure in one leg must not block the others.
set -u
cd /root/repo
LOG=outputs/round3
mkdir -p $LOG

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "--- $name: $* ($(date -u +%T)Z)" | tee -a $LOG/wrapup.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  echo "--- $name done rc=$? ($(date -u +%T)Z)" | tee -a $LOG/wrapup.log
  tail -3 "$LOG/$name.log" | tee -a $LOG/wrapup.log
}

# 1. stop the campaign cleanly (supervisor kills its process group on INT)
SUP_PID=$(awk '{print $4}' $LOG/flagship.pid 2>/dev/null || true)
if [ -n "${SUP_PID:-}" ] && kill -0 "$SUP_PID" 2>/dev/null; then
  echo "--- stopping supervisor $SUP_PID" | tee -a $LOG/wrapup.log
  kill -INT "$SUP_PID"
  for i in $(seq 1 30); do kill -0 "$SUP_PID" 2>/dev/null || break; sleep 2; done
  kill -0 "$SUP_PID" 2>/dev/null && kill -KILL "$SUP_PID"
  sleep 5
fi

# An interrupted run leaves only checkpoints — export the newest to PLY.
if ! ls outputs/flagship_vendor/iteration_*.ply >/dev/null 2>&1; then
  run ckpt_to_ply 300 env GSPLAT_PLATFORM=cpu JAX_PLATFORMS=cpu \
      python scripts/ckpt_to_ply.py outputs/flagship_vendor
fi
PLY=$(ls -t outputs/flagship_vendor/iteration_*.ply 2>/dev/null | head -1)
echo "--- newest PLY: ${PLY:-none}" | tee -a $LOG/wrapup.log

# 2. held-out eval on the trained model (the round's honest quality number)
if [ -n "$PLY" ]; then
  run eval_holdout 480 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --views 0,9,18,27 --max-pairs 8388608 \
      --save-renders $LOG/eval_holdout
fi

# 3. inference fps on the trained model (fast path)
if [ -n "$PLY" ]; then
  run renderfps_vendor 360 python render_cli.py --ply "$PLY" --orbit 4 \
      --out $LOG/renders_vendor --bench-frames 32 --white-background
fi

# 4. final bench + chunk-256 A/B
run bench_final 420 python bench.py
run bench_c256 300 env GSPLAT_BENCH_CHUNK=256 python bench.py

# 5. record, persist, commit
run report 300 python scripts/report_round3.py
run persist 300 python scripts/persist_artifacts.py
git add -A artifacts outputs/round3/wrapup.log 2>/dev/null
git commit -q -m "Persist round-3 campaign artifacts and wrap-up measurements" || true
echo "=== wrapup complete $(date -u +%FT%TZ) ===" | tee -a $LOG/wrapup.log
