#!/bin/bash
# Round-2 TPU measurement burst: run after the flagship campaign frees the
# chip. Sequential; each step logs to outputs/.
set -x
cd /root/repo

# 1. Headline bench (exact binning, right-sized budget)
timeout 1200 python bench.py > outputs/bench_r2.json.log 2>&1

# 2. Stage breakdown with the real input-prep path
timeout 1200 python scripts/profile_breakdown.py --size 800 --gaussians 100000 \
  --max-pairs 2097152 > outputs/profile_r2.log 2>&1

# 3. Inference throughput + turntable video from the flagship model
timeout 1200 python render_cli.py --ply outputs/flagship/iteration_30000.ply \
  --out outputs/flagship_orbit --orbit 12 --width 800 --height 800 \
  --video outputs/flagship_orbit/turntable.gif --bench-frames 64 \
  --max-pairs 2097152 > outputs/renderfps_r2.log 2>&1

echo BURST_DONE
