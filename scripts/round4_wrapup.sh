#!/bin/bash
# Round-4 measurement + scale-campaign chain.  Run AFTER the flagship_vendor
# campaign finishes (it writes summary.json, incl. inline held-out eval).
# Every leg is deadline- and timeout-bounded; results are reported
# incrementally (scripts/report_round4.py is idempotent).
set -u
cd /root/repo
mkdir -p outputs/round4
LOG=outputs/round4

DEADLINE=${GSPLAT_ROUND_DEADLINE:-$(cat $LOG/deadline 2>/dev/null || echo $(($(date +%s) + 18000)))}
left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "--- $name: $* ($(date -u +%T)Z)" | tee -a $LOG/chain.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name done rc=$rc" | tee -a $LOG/chain.log
  tail -5 "$LOG/$name.log" | tee -a $LOG/chain.log
  return $rc
}

# 1. kernel parity on the real chip (cheap, catches regressions first)
run tpu_check 1200 python scripts/tpu_check.py

# 2. headline bench: snug probed budget; then the 32x32-tile and
#    3-pass-matmul A/Bs (adopted only if they win AND tpu_check passes)
run bench 1500 python bench.py
GSPLAT_BENCH_TILE=32 run bench_tile32 1500 python bench.py

# 3. stage breakdown at the probed-snug budget
run profile 2400 python scripts/profile_breakdown.py --size 800 \
    --gaussians 100000 --max-pairs 1474560 --fine

run report_early 600 python scripts/report_round4.py

# 4a. inference fps on a ~28k-gaussian model (ckpt_2000) — like-for-like
#     with the round-2 11.6 fps measurement (25k-gaussian model)
if [ -f outputs/flagship_vendor/ckpt_2000.npz ]; then
  run ckpt2k_ply 600 python scripts/ckpt_to_ply.py \
      outputs/flagship_vendor/ckpt_2000.npz -o /tmp/small_model.ply
  run renderfps_small 2400 python render_cli.py \
      --ply /tmp/small_model.ply --orbit 4 --out outputs/round4/renders_small \
      --bench-frames 64 --white-background
fi

# 4. inference fps on the trained flagship_vendor model
PLY=$(ls -t outputs/flagship_vendor/iteration_*.ply 2>/dev/null | head -1)
if [ -n "$PLY" ]; then
  run renderfps_vendor 2400 python render_cli.py \
      --ply "$PLY" --orbit 4 --out outputs/round4/renders_vendor \
      --bench-frames 64 --white-background
  # independent eval.py passes (campaign already evaluated inline)
  run eval_holdout 2400 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --views 0,9,18,27 --max-pairs 8388608 \
      --save-renders outputs/round4/eval_holdout
  run eval_all 3600 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --max-pairs 8388608
fi

run report_mid 600 python scripts/report_round4.py

# 5. SH4 scale campaign on the SAME independent imagery (aggressive densify
#    toward >100k gaussians; SH degree 4 like the reference's default).
#    Deadline-bounded; checkpoints every 2500 make any cutoff resumable
#    next round.  Tighter world-scale prune (1.5) keeps the exact pair
#    demand under the 2^24 fused-kernel budget ceiling at scale.
SH4_BUDGET=$(( $(left) - 1500 ))
if [ "$SH4_BUDGET" -gt 1200 ]; then
  echo "--- sh4: budget ${SH4_BUDGET}s ($(date -u +%T)Z)" | tee -a $LOG/chain.log
  timeout "$SH4_BUDGET" \
    python scripts/supervise_train.py --stall-timeout 900 --max-restarts 12 \
      --out outputs/scale_sh4 -- \
      python scripts/train_flagship_tpu.py --iters 30000 --sh-degree 4 \
        --dataset-root outputs/vendor_scene_800 --holdout 4 \
        --grad-threshold 1e-4 --densify-until 20000 \
        --checkpoint-interval 2500 --out outputs/scale_sh4 \
        --opacity-reset-interval 3000 --prune-world-scale 1.5 \
        --spatial-lr-scale auto --max-pairs 8388608 \
        --max-pairs-limit 16777216 \
        2>&1 | tee -a $LOG/scale_sh4.log
  echo "--- sh4 leg done rc=${PIPESTATUS[0]} ($(date -u +%T)Z)" | tee -a $LOG/chain.log
fi

# 6. final bench + report + persist
run bench_final 1500 python bench.py
run report 600 python scripts/report_round4.py
run persist 900 python scripts/persist_artifacts.py --round 4

echo "=== round4 chain complete: $(date -u +%FT%TZ) ===" | tee -a $LOG/chain.log
