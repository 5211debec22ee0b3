"""Data-parallel scaling-efficiency harness.

Weak scaling over the mesh "data" axis: every device renders+trains one
W x H view per step, so perfect scaling is pixels/s proportional to device
count.  Reports pixels/s and efficiency vs the 1-device run at 1, 2, 4, ...
devices.

On this environment only one real TPU chip exists, so the default run uses
N virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)
— the collectives, shardings and step structure are identical to a pod
slice; only the absolute numbers differ.  On real multi-chip hardware the
same script produces the ICI curve (run without --cpu).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_curve.py --cpu --size 64 --iters 8

Writes one JSON line per point and a summary to --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--points", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--backend", default="reference")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gaussiansplattingmlx_tpu.config import (
        DensifyConfig, ModelConfig, RasterizerConfig, TrainConfig,
    )
    from gaussiansplattingmlx_tpu.models import gaussians
    from gaussiansplattingmlx_tpu.parallel import sharding
    from gaussiansplattingmlx_tpu.train import optimizer as adam
    from gaussiansplattingmlx_tpu.train.trainer import TrainState
    from gaussiansplattingmlx_tpu.utils.camera import Camera

    n_total = len(jax.devices())
    W = H = args.size
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(args.points, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(0.1, 0.9, size=(args.points, 3)).astype(np.float32)

    raster = RasterizerConfig(
        tile_h=16, tile_w=16, max_pairs=2**14,
        chunk_size=128, backend=args.backend,
    )
    cfg = TrainConfig(
        iterations=10**9, init_points=args.points, output_dir="",
        model=ModelConfig(sh_degree=1, initial_capacity=args.points),
        raster=raster, densify=DensifyConfig(from_iter=10**9),
    )

    sizes = []
    n = 1
    while n <= n_total:
        sizes.append(n)
        n *= 2

    results = []
    for ndata in sizes:
        params, num = gaussians.create_from_points(
            pts, cols, sh_degree=1, capacity=args.points
        )
        mesh = sharding.make_mesh(ndata, 1, devices=jax.devices()[:ndata])
        step = sharding.make_dp_train_step(
            cfg, W, H, 1, 10**9, mesh, backend=args.backend,
            batched_views=True,
        )
        state = TrainState(
            params=params, opt=adam.init(params), num_active=jnp.int32(num),
            grad_accum=jnp.zeros((params.capacity,), jnp.float32),
            grad_denom=jnp.float32(0.0), step=jnp.int32(0),
        )
        state = sharding.replicate_state(state, mesh)

        c2w = np.eye(4)
        c2w[2, 3] = -4.0
        cam = Camera.from_c2w(W, H, 1.2 * W, 1.2 * W, c2w)
        t = cam.tensors()
        batch_np = {
            k: np.stack([np.asarray(t[k], np.float32)] * ndata)
            for k in ("view", "proj", "camera_center", "fov_x", "fov_y",
                      "focal_x", "focal_y")
        }
        batch_np["target_rgb"] = rng.uniform(
            size=(ndata, H, W, 3)
        ).astype(np.float32)
        batch_np["target_depth"] = np.zeros((ndata, H, W), np.float32)
        batch_np["depth_mask"] = np.zeros((ndata, H, W), np.float32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = {
            k: jax.device_put(
                v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            )
            for k, v in batch_np.items()
        }

        # Device-to-host FETCHES as the sync points, not block_until_ready:
        # on this tunneled backend block_until_ready can return before
        # execution finishes (docs/DESIGN.md "measurement honesty"); fetching
        # the last iterate's loss waits for everything queued before it.
        for _ in range(args.warmup):
            state, metrics, _ = step(state, batch)
        float(metrics["loss"])
        t0 = time.time()
        for _ in range(args.iters):
            state, metrics, _ = step(state, batch)
        float(metrics["loss"])
        dt = time.time() - t0
        px_s = args.iters * ndata * W * H / dt
        row = {
            "devices": ndata, "pixels_per_s": px_s,
            "step_ms": 1e3 * dt / args.iters,
            "loss": float(metrics["loss"]),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]["pixels_per_s"]
    for r in results:
        r["efficiency"] = r["pixels_per_s"] / (base * r["devices"])
    summary = {
        "platform": jax.devices()[0].platform,
        "image": f"{W}x{H}", "backend": args.backend,
        "points": args.points, "curve": results,
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
