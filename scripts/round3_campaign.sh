#!/bin/bash
# Round-3 TPU campaign chain — run when the chip is reachable.
# Order: cheap proofs first (parity, bench, profile, inference fps), then the
# long campaigns (independent-imagery flagship, SH4 resume) under the
# failure-detecting supervisor.
set -u
cd /root/repo
mkdir -p outputs/round3
LOG=outputs/round3

echo "=== round3 campaign chain start: $(date -u +%FT%TZ) ===" | tee -a $LOG/chain.log

# Round deadline (epoch seconds): SH4 — the open-ended leg — is bounded so
# the final bench + report always get wall-clock.  outputs/round3/deadline
# (or GSPLAT_ROUND_DEADLINE) holds the absolute cutoff; default 4h from now.
DEADLINE=${GSPLAT_ROUND_DEADLINE:-$(cat $LOG/deadline 2>/dev/null || echo $(($(date +%s) + 14400)))}
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

# 1. compiled-kernel parity incl. fused staging + inference paths.
#    Graded fallback if a kernel fails to compile or mis-compare on the real
#    chip: first drop the relayout kernel, then the merge kernels, then the
#    whole fused pipeline (round-2 split path).
if ! run tpu_check 1200 python scripts/tpu_check.py; then
  echo "!!! tpu_check failed — retrying with GSPLAT_RELAYOUT=gather" \
      | tee -a $LOG/chain.log
  export GSPLAT_RELAYOUT=gather
  if ! run tpu_check_norelayout 1200 python scripts/tpu_check.py; then
    echo "!!! still failing — retrying with GSPLAT_MERGE=sort" \
        | tee -a $LOG/chain.log
    export GSPLAT_MERGE=sort
    if ! run tpu_check_nomerge 1200 python scripts/tpu_check.py; then
      echo "!!! still failing — forcing GSPLAT_STAGING=split for the rest" \
          | tee -a $LOG/chain.log
      export GSPLAT_STAGING=split
    fi
  fi
fi

# 2. authoritative headline bench (fail-fast; free chip)
run bench 1500 python bench.py
cp $LOG/bench.log outputs/round3/bench_first.json 2>/dev/null

# 3. stage breakdown: split vs fused staging, inference render
run profile 2400 python scripts/profile_breakdown.py --size 800 \
    --gaussians 100000 --max-pairs 1572864
# 3b. chunk-size sweep: C=256 halves per-chunk overhead on the fwd/bwd
#     sweeps at 2x VMEM per buffer; record which wins for future campaigns.
run profile_c256 2400 python scripts/profile_breakdown.py --size 800 \
    --gaussians 100000 --max-pairs 1572864 --chunk 256

# 4. inference fps on a trained model.  The round-2 flagship PLY may have
#    been wiped with the workspace; fall back to a quick synthetic model so
#    the fast-path fps number lands early, then re-measure on the real
#    flagship_vendor model after that campaign completes (leg 5c).
if [ -f outputs/flagship/iteration_30000.ply ]; then
  run renderfps 2400 python render_cli.py \
      --ply outputs/flagship/iteration_30000.ply --orbit 4 \
      --out outputs/round3/renders --max-pairs 2097152 \
      --bench-frames 64 --white-background
fi

# Record the cheap measurements NOW (idempotent; re-run after each leg).
run report_early 600 python scripts/report_round3.py

# 5. flagship campaign on INDEPENDENT imagery (ray-traced 800x800 x 36 views,
#    4 held out) — the round's top deliverable. Supervisor restarts on RPC
#    wedges; checkpoints are bit-exact.
if [ ! -f outputs/vendor_scene_800/sparse/0/points3D.bin ]; then
  echo "--- generating outputs/vendor_scene_800 (ray tracer, CPU)" \
      | tee -a $LOG/chain.log
  run make_scene 1800 python scripts/make_vendor_scene.py \
      --out outputs/vendor_scene_800 --width 800 --height 800 --views 36 \
      --points 30000 --sky-points 4000 --rich \
      || { echo "scene generation FAILED — skipping flagship_vendor" \
           | tee -a $LOG/chain.log; }
fi
FLAG_BUDGET=$(( $(left) - 2400 ))  # leave 40 min for eval + sh4 gate + report
if [ -f outputs/vendor_scene_800/sparse/0/points3D.bin ] && \
   [ ! -f outputs/flagship_vendor/summary.json ] && \
   [ "$FLAG_BUDGET" -gt 900 ]; then
  echo "--- flagship_vendor: budget ${FLAG_BUDGET}s ($(date -u +%T)Z)" | tee -a $LOG/chain.log
  timeout "$FLAG_BUDGET" \
    python scripts/supervise_train.py --stall-timeout 600 --max-restarts 12 \
      --out outputs/flagship_vendor -- \
      python scripts/train_flagship_tpu.py \
        --dataset-root outputs/vendor_scene_800 --holdout 4 \
        --iters 30000 --sh-degree 3 --densify-until 15000 \
        --checkpoint-interval 2000 --out outputs/flagship_vendor \
        2>&1 | tee -a $LOG/flagship_vendor.log
  echo "--- flagship_vendor leg done rc=$? ($(date -u +%T)Z)" | tee -a $LOG/chain.log
fi

# 5b. independent eval.py pass on the trained model: held-out views
PLY=$(ls -t outputs/flagship_vendor/iteration_*.ply 2>/dev/null | head -1)
if [ -n "$PLY" ]; then
  run eval_holdout 2400 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --views 0,9,18,27 --max-pairs 4194304 \
      --save-renders outputs/round3/eval_holdout
  run eval_all 3600 python eval.py --dataset colmap \
      --root outputs/vendor_scene_800 --resize-factor 1.0 \
      --ply "$PLY" --max-pairs 4194304
fi

# 5c. inference fps on the freshly trained flagship_vendor model (the
#     round-2 PLY was wiped with the workspace; this is the real-model
#     fast-path fps measurement the round owes).
if [ -n "$PLY" ]; then
  run renderfps_vendor 2400 python render_cli.py \
      --ply "$PLY" --orbit 4 \
      --out outputs/round3/renders_vendor \
      --bench-frames 64 --white-background
fi

run report_mid 600 python scripts/report_round3.py

# 6. continue the SH4 scale campaign (resumes from the round-2 checkpoint;
#    flags MATCH the checkpoint's recorded config — iters feeds the LR
#    schedule, densify-until 20000 / ckpt 2500 are what the run used).
#    Deadline-bounded: leave 25 min for the final bench + report; checkpoints
#    every 2500 iters make any cutoff resumable next round.
SH4_BUDGET=$(( $(left) - 1500 ))
if [ "$SH4_BUDGET" -gt 1200 ]; then
  echo "--- sh4 resume: budget ${SH4_BUDGET}s ($(date -u +%T)Z)" | tee -a $LOG/chain.log
  timeout "$SH4_BUDGET" \
    python scripts/supervise_train.py --stall-timeout 900 --max-restarts 12 \
      --out outputs/flagship_sh4 -- \
      python scripts/train_flagship_tpu.py --iters 30000 --sh-degree 4 \
        --grad-threshold 5e-5 --densify-until 20000 \
        --checkpoint-interval 2500 --out outputs/flagship_sh4 \
        2>&1 | tee -a $LOG/flagship_sh4.log
  echo "--- sh4 leg done rc=$? ($(date -u +%T)Z)" | tee -a $LOG/chain.log
else
  echo "--- skipping sh4 resume: only $(left)s left before deadline" \
      | tee -a $LOG/chain.log
fi

# 7. re-bench at end (warm caches, post-campaign chip state)
run bench_final 1500 python bench.py

# 8. record whatever was measured into BASELINE.md (+ commit)
run report 600 python scripts/report_round3.py

echo "=== chain complete: $(date -u +%FT%TZ) ===" | tee -a $LOG/chain.log
