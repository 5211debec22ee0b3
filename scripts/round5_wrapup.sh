#!/bin/bash
# Round-5 measurement chain.  Run AFTER the flagship_sh4 campaign finishes
# (it writes summary.json, incl. inline held-out eval).  Every leg is
# timeout-bounded and failure-isolated (a dead leg records its log and the
# chain moves on — no retry-into-wedge, one TPU client at a time); results
# are reported incrementally (scripts/report_round5.py is idempotent).
# Legs are ordered by VERDICT value — held-out quality proof and inference
# fps first — so a round-clock cutoff loses the least important tail.
set -u
cd /root/repo
mkdir -p outputs/round5
LOG=outputs/round5

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "--- $name: $* ($(date -u +%T)Z)" | tee -a $LOG/chain.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name done rc=$rc" | tee -a $LOG/chain.log
  tail -5 "$LOG/$name.log" | tee -a $LOG/chain.log
  return $rc
}

# 1. kernel parity on the real chip (cheap, catches regressions first;
#    includes the sorted-order training backward since round 5)
run tpu_check 1200 python scripts/tpu_check.py

# 2. held-out quality proof (VERDICT item 1) + inference fps (item 2)
PLY=$(ls -t outputs/flagship_sh4/iteration_*.ply 2>/dev/null | head -1)
if [ -n "$PLY" ]; then
  run eval_holdout 2400 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --views 0,9,18,27 --max-pairs 16777216 \
      --save-renders outputs/round5/eval_holdout
  run renderfps_sh4 2400 python render_cli.py \
      --ply "$PLY" --orbit 4 --out outputs/round5/renders_sh4 \
      --bench-frames 64 --bench-batch 8 --white-background
fi
# held-out forensics on the final checkpoint: which cull (floater / SH /
# giant) recovers the most dB — the next-knob signal if quality misses
CKPT=$(ls -t outputs/flagship_sh4/ckpt_*.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  run diagnose_holdout 2400 python scripts/diagnose_holdout.py "$CKPT" \
      --dataset-root outputs/vendor_scene_800 --max-pairs 16777216
fi
if [ -f outputs/flagship_sh4/ckpt_2500.npz ]; then
  run ckpt2k_ply 600 python scripts/ckpt_to_ply.py \
      outputs/flagship_sh4/ckpt_2500.npz -o /tmp/small_model.ply
  run renderfps_small 2400 python render_cli.py \
      --ply /tmp/small_model.ply --orbit 4 --out outputs/round5/renders_small \
      --bench-frames 64 --bench-batch 8 --white-background
fi
run report_quality 600 python scripts/report_round5.py

# 3. headline bench: sorted-train staging at 16x16 and 32x32 (bench.py
#    defaults to tile 32 since round 4 — set the tile explicitly on every
#    leg), the aligned-staging A/Bs, and the gather-records A/B
#    (3-column sort + post-sort record gather; bit-exact parity asserted in
#    tests/test_staging.py — adopted as default only if it wins)
run bench_t16 1500 env GSPLAT_BENCH_TILE=16 python bench.py
run bench_t32 1500 env GSPLAT_BENCH_TILE=32 python bench.py
run bench_t16_gatherrec 1500 \
    env GSPLAT_BENCH_TILE=16 GSPLAT_STAGE_RECORDS=gather python bench.py
run bench_t32_gatherrec 1500 \
    env GSPLAT_BENCH_TILE=32 GSPLAT_STAGE_RECORDS=gather python bench.py
run bench_t16_aligned 1500 \
    env GSPLAT_BENCH_TILE=16 GSPLAT_TRAIN_STAGING=aligned python bench.py
run bench_t32_aligned 1500 \
    env GSPLAT_BENCH_TILE=32 GSPLAT_TRAIN_STAGING=aligned python bench.py
# on-chip value parity for the gather-records path (the round-4 denormal
# lesson: validate representation changes on real hardware, not just
# interpret mode) — prerequisite for ever making it the default
run tpu_check_gatherrec 1200 \
    env GSPLAT_STAGE_RECORDS=gather python scripts/tpu_check.py
run report_bench 600 python scripts/report_round5.py

# 4. full-view eval + stage breakdown + at-scale grad parity
if [ -n "$PLY" ]; then
  run eval_all 3600 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --max-pairs 16777216
fi
run profile 2400 python scripts/profile_breakdown.py --size 800 \
    --gaussians 100000 --max-pairs 1474560 --fine
# tile-32 fine profile (the bench default tile): snug budget from the t32
# bench probe (552k pairs -> 573440 = 1.04x rounded to the 512 quantum)
run profile_t32 2400 python scripts/profile_breakdown.py --size 800 \
    --gaussians 100000 --tile 32 --max-pairs 573440 --fine
run sorted_grad_check 2400 python scripts/sorted_grad_scale_check.py

# 5. heavy+slow test sweep on CPU (VERDICT r4 item 8: the 2-process multihost
#    suites must be green at HEAD every round) — no TPU contention, and this
#    round they were ALSO run mid-round at HEAD during the campaign.
run tests_heavy 2400 env JAX_PLATFORMS=cpu GSPLAT_PLATFORM=cpu \
    python -m pytest tests/ -q -m "heavy or slow" -p no:cacheprovider

# 6. real-demo-data leg (environment-gated): this container has zero egress,
#    so the fetch fails fast and records a reasoned skip — but if connectivity
#    ever appears the reference's own lego demo scene trains end-to-end
#    (fetchers replicate ColmapDataLoader.swift:545-565's bootstrap).
if run fetch_lego 300 python -c "
from gaussiansplattingmlx_tpu.data.fetch import fetch_lego_colmap
print(fetch_lego_colmap('outputs/lego_demo'))
"; then
  run train_lego 7200 \
      python scripts/supervise_train.py --stall-timeout 900 --max-restarts 4 \
        --out outputs/lego_run -- \
        python train.py --dataset colmap --root outputs/lego_demo \
          --output outputs/lego_run --iterations 7000 --sh-degree 4 \
          --sh-warmup 1000 --resize-factor 0.5
else
  echo "--- fetch_lego skipped (no egress in this environment)" \
      | tee -a $LOG/chain.log
fi

# 7. final report + persist
run report 600 python scripts/report_round5.py
run persist 900 python scripts/persist_artifacts.py --round 5

echo "=== round5 chain complete: $(date -u +%FT%TZ) ===" | tee -a $LOG/chain.log
