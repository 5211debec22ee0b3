"""Rasterizer tuning sweep on real TPU: tile size x chunk size.

Measures fwd-only and fwd+bwd wall time on a mid-size workload and prints a
table.  Usage: python scripts/kernel_tune.py [--size 400] [--gaussians 50000]
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--gaussians", type=int, default=50000)
    ap.add_argument("--tiles", default="16,32")
    ap.add_argument("--chunks", default="128,256")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussiansplattingmlx_tpu.config import RasterizerConfig
    from gaussiansplattingmlx_tpu.models import gaussians
    from gaussiansplattingmlx_tpu.ops import losses as losses_mod
    from gaussiansplattingmlx_tpu.render import render
    from gaussiansplattingmlx_tpu.utils.camera import Camera

    W = H = args.size
    N = args.gaussians
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(N, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
    params, _ = gaussians.create_from_points(pts, cols, sh_degree=3, capacity=N)
    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    cam = Camera.from_c2w(W, H, 1.4 * W, 1.4 * W, c2w)
    t = cam.tensors()
    target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    zeros_hw = jnp.zeros((H, W), jnp.float32)
    targs = (
        jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
        jnp.asarray(t["camera_center"]),
        t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
    )

    def build(cfg):
        def loss_fn(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            out, _ = render(
                means, shs, opacity, scales, rots, *targs,
                W, H, 3, raster_cfg=cfg,
            )
            loss, _ = losses_mod.total_loss(
                out.color, target, out.depth, zeros_hw, zeros_hw
            )
            return loss

        fwd = jax.jit(loss_fn)
        both = jax.jit(jax.value_and_grad(loss_fn))
        return fwd, both

    arglist = params.as_tuple()
    print(f"workload: {W}x{H}, {N} gaussians, SH3")
    print(f"{'tile':>5} {'chunk':>6} {'compile_s':>10} {'fwd_ms':>8} {'fwdbwd_ms':>10} {'Mpix/s':>8}")
    for tile in [int(x) for x in args.tiles.split(",")]:
        for chunk in [int(x) for x in args.chunks.split(",")]:
            cfg = RasterizerConfig(
                tile_h=tile, tile_w=tile, chunk_size=chunk,
                max_pairs=2**20, )
            fwd, both = build(cfg)
            t0 = time.time()
            jax.block_until_ready(both(arglist))
            jax.block_until_ready(fwd(arglist))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                r = fwd(arglist)
            jax.block_until_ready(r)
            fwd_ms = (time.time() - t0) / args.iters * 1e3
            t0 = time.time()
            for _ in range(args.iters):
                r = both(arglist)
            jax.block_until_ready(r)
            fb_ms = (time.time() - t0) / args.iters * 1e3
            print(
                f"{tile:>5} {chunk:>6} {compile_s:>10.1f} {fwd_ms:>8.2f} "
                f"{fb_ms:>10.2f} {W*H/fb_ms/1e3:>8.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
