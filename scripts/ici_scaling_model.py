"""Model-based multi-chip scaling estimate (SURVEY §2.4 / BASELINE north-star).

This environment has ONE physical TPU chip, so the ≥80%-at-2+-hosts scaling
target cannot be measured here; the virtual-CPU curve validates mechanics
only (8 virtual devices share 4 cores — wall-clock efficiency there is
core-bound by construction, outputs/scaling_curve_virtual.json).  What CAN be
produced honestly is the standard analytic estimate — the "Scaling Book"
recipe: compare per-step compute time against collective time derived from
bytes-on-the-wire and link bandwidth.

Camera data-parallelism (parallel/sharding.py) is embarrassingly parallel
except for ONE gradient all-reduce per step:

    bytes G   = 6 parameter leaves x capacity floats (xyz 3, dc 3, rest 3*15,
                scales 3, rot 4, opacity 1 -> 59 f32/gaussian at SH3)
    ring time = 2 * G * (k-1) / (k * BW)          (bidirectional ring)
    step'     = max(step_compute, ring_time) if overlapped else sum
    eff(k)    = step_compute / step'

Defaults below use the conservative NON-overlapped sum (the per-leaf
collectives do overlap with the projection backward in practice —
docs/DESIGN.md "Gradient collectives").  Bandwidths are configurable; the
defaults are public v5e figures (4 ICI links/chip at 400 Gbit/s => 200 GB/s,
pod-to-pod DCN ~ 25 GB/s per host).

    python scripts/ici_scaling_model.py --step-ms 159 --gaussians 100000 \
        --out outputs/ici_model.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def grad_bytes(num_gaussians: int, sh_degree: int = 3) -> int:
    rest = 3 * ((sh_degree + 1) ** 2 - 1)
    floats = 3 + 3 + rest + 3 + 4 + 1  # xyz, dc, rest, scales, rot, opacity
    return num_gaussians * floats * 4


def ring_allreduce_s(bytes_g: float, k: int, bw_bytes_s: float) -> float:
    if k <= 1:
        return 0.0
    return 2.0 * bytes_g * (k - 1) / (k * bw_bytes_s)


def efficiency(step_s, bytes_g, k, chips_per_host, ici_bw, dcn_bw,
               overlapped=False):
    """Weak-scaling efficiency at k chips: the slowest link leg bounds the
    ring (a host-contiguous ring crosses DCN 2*(hosts-1)/k of its hops)."""
    hosts = -(-k // chips_per_host)
    t_ici = ring_allreduce_s(bytes_g, k, ici_bw)
    # DCN legs: each of the (hosts) boundary crossings moves the same 2G/k
    # chunk stream; the ring is bound by its slowest hop sequence.
    t_dcn = 0.0
    if hosts > 1:
        t_dcn = 2.0 * bytes_g * (hosts - 1) / (hosts * dcn_bw) / chips_per_host
    t_coll = max(t_ici, t_dcn)
    step = max(step_s, t_coll) if overlapped else step_s + t_coll
    return step_s / step, t_coll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=159.0,
                    help="measured single-chip step time (BASELINE.md)")
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--chips-per-host", type=int, default=4)  # v5e tray
    ap.add_argument("--ici-gbytes", type=float, default=200.0,
                    help="per-chip ICI bandwidth, GB/s (v5e: 4x400Gbit links)")
    ap.add_argument("--dcn-gbytes", type=float, default=25.0,
                    help="per-host DCN bandwidth, GB/s")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    g = grad_bytes(args.gaussians, args.sh_degree)
    step_s = args.step_ms / 1e3
    rows = []
    for k in (1, 2, 4, 8, 16, 32, 64, 256):
        for overlapped in (False, True):
            eff, t_coll = efficiency(
                step_s, g, k, args.chips_per_host,
                args.ici_gbytes * 1e9, args.dcn_gbytes * 1e9,
                overlapped=overlapped,
            )
            if overlapped:
                rows[-1]["efficiency_overlapped"] = round(eff, 4)
            else:
                rows.append({
                    "chips": k,
                    "hosts": -(-k // args.chips_per_host),
                    "collective_ms": round(t_coll * 1e3, 3),
                    "efficiency_serialized": round(eff, 4),
                })
    result = {
        "model": "ring all-reduce vs measured step (see module docstring)",
        "inputs": {
            "step_ms": args.step_ms,
            "gaussians": args.gaussians,
            "sh_degree": args.sh_degree,
            "grad_mbytes": round(g / 1e6, 2),
            "chips_per_host": args.chips_per_host,
            "ici_gbytes_s": args.ici_gbytes,
            "dcn_gbytes_s": args.dcn_gbytes,
        },
        "curve": rows,
        "caveats": [
            "single-chip environment: this is an analytic estimate, not a "
            "measurement; scripts/scaling_curve.py produces the measured "
            "curve on real multi-chip hardware",
            "densify/capacity-growth recompiles are synchronized and "
            "identical on all chips (replicated params), so they scale as "
            "the single-chip step does",
            "per-step view batch I/O is host-local by construction "
            "(parallel/multihost.py): camera pixels never cross DCN",
        ],
    }
    text = json.dumps(result, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
