"""Checkpoint health report: param distributions, NaN audit, pair-demand
drivers.  The forensics tool behind the round-4 divergence diagnosis
(docs/DESIGN.md round-4 section) — run it whenever a campaign's PSNR stalls
or collapses:

    python scripts/diagnose_ckpt.py outputs/flagship_vendor/ckpt_8000.npz
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def report(path: Path):
    d = np.load(path)
    n = int(d["num_active"])
    print(f"== {path} ==")
    print(f"step {int(d['step'])}  num_active {n}  "
          f"capacity {d['param_xyz'].shape[0]}")

    # --- NaN audit (any non-finite active row is a bug; densify culls them
    # since round 4 but a fresh appearance means a new gradient pathology)
    bad = np.zeros(n, bool)
    for k in ("param_xyz", "param_scales", "param_rotation", "param_opacity",
              "param_features_dc", "param_features_rest"):
        a = d[k][:n]
        bad |= ~np.isfinite(a.reshape(n, -1)).all(axis=1)
    if bad.any():
        idx = np.where(bad)[0]
        print(f"!! {bad.sum()} NON-FINITE active rows, first at {idx[0]} "
              f"(contiguous run: {idx[0]}..{idx[:200].max()})")
    else:
        print("finite: all active rows clean")

    ok = ~bad
    xyz = d["param_xyz"][:n][ok]
    sc = np.exp(d["param_scales"][:n][ok])
    op = sigmoid(d["param_opacity"][:n, 0][ok])
    smax = sc.max(axis=1)
    ext = np.linalg.norm(xyz - xyz.mean(0), axis=1)

    def pct(a, qs=(10, 50, 90, 99, 100)):
        return " ".join(f"p{q}={v:.4g}" for q, v in zip(qs, np.percentile(a, qs)))

    print(f"extent   {pct(ext)}")
    print(f"scale    {pct(smax)}")
    print(f"opacity  {pct(op)}  frac<0.011={np.mean(op < 0.011):.3f} "
          f"frac>0.9={np.mean(op > 0.9):.3f}")
    # opacity stuck at a reset ceiling (p50 == 0.01) or saturated (p50 == 1.0)
    p50 = float(np.percentile(op, 50))
    if abs(p50 - 0.01) < 1e-4:
        print("!! opacity p50 at the reset ceiling: post-reset recovery "
              "failed (see DESIGN.md round-4 divergence)")
    if p50 > 0.99:
        print("!! opacity saturated (reference pathology on large scenes): "
              "consider --opacity-reset-interval / --prune-world-scale")

    # --- crude pair-demand drivers by scale bucket (footprint ~ screen area)
    print("pair-demand drivers (count by world-scale bucket):")
    for lo, hi in ((0, 0.1), (0.1, 0.3), (0.3, 0.6), (0.6, 1.0), (1.0, 2.0),
                   (2.0, np.inf)):
        m = (smax >= lo) & (smax < hi)
        if m.any():
            print(f"  scale [{lo},{hi}): {m.sum():7d} gaussians")

    if "config_json" in d:
        cfg = json.loads(bytes(d["config_json"]).decode())
        print("densify cfg:", {k: cfg["densify"][k] for k in
                               ("grad_threshold", "opacity_reset_interval",
                                "prune_world_scale")
                               if k in cfg.get("densify", {})})
        print("raster budget:", cfg.get("raster", {}).get("max_pairs"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+",
                    help="checkpoint .npz files (or dirs of them)")
    args = ap.parse_args()
    for p in args.paths:
        p = Path(p)
        files = sorted(p.glob("ckpt_*.npz")) if p.is_dir() else [p]
        for f in files:
            report(f)
            print()


if __name__ == "__main__":
    main()
