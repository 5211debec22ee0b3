"""Headline benchmark: pixels/s/chip, forward+backward rasterize, lego-scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md): 800x800 image, lego-scale Gaussian count (100k after
densification), full differentiable step — projection, binning, Pallas
rasterizer forward, L1+SSIM loss, backward through the custom VJP.
`vs_baseline` is the ratio to BASELINE_PIXELS_PER_S, the recorded result of
this benchmark's first TPU v5e run (so later rounds track speedups); the
reference publishes no numbers (BASELINE.md).
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import json
import time

import numpy as np

# First measured value on TPU v5e-1 (round 1).  Later rounds report speedup
# against this anchor.
BASELINE_PIXELS_PER_S = 6_723_701.0


def main():
    import jax
    import jax.numpy as jnp

    from gaussiansplattingmlx_tpu.config import RasterizerConfig
    from gaussiansplattingmlx_tpu.models import gaussians
    from gaussiansplattingmlx_tpu.ops import losses as losses_mod
    from gaussiansplattingmlx_tpu.render import render
    from gaussiansplattingmlx_tpu.utils.camera import Camera

    W = H = 800
    N = 100_000
    SH_DEGREE = 3
    # Binning is exact (no per-gaussian truncation); this scene bins 1.41M
    # pairs, and the workload stats in the JSON line prove the budget is not
    # clipping it (overflow_pairs == 0 at the achieved num_pairs).  The
    # budget is sized with ~11% headroom because every static-axis stage
    # (sort, gathers, kernel DMA) pays for the full budget whether slots are
    # valid or not — a 2x budget would tax the honest number ~25%.
    cfg = RasterizerConfig(max_pairs=1_572_864)  # 12288 chunks of 128

    rng = np.random.default_rng(0)
    # Lego-like scene: points in a unit-ish volume, camera orbiting at r=4,
    # gaussian sizes matching a converged 3DGS scene (~3px screen sigma ->
    # 1-4 tiles footprint), opacities spread like a trained model.
    pts = rng.normal(size=(N, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
    params, num = gaussians.create_from_points(pts, cols, sh_degree=SH_DEGREE, capacity=N)
    import dataclasses
    import jax.numpy as _jnp
    params = dataclasses.replace(
        params,
        scales=_jnp.asarray(
            np.log(rng.uniform(0.004, 0.02, size=(N, 3))).astype(np.float32)
        ),
        opacity=_jnp.asarray(rng.normal(0.0, 2.0, size=(N, 1)).astype(np.float32)),
    )

    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    cam = Camera.from_c2w(W, H, 1111.0, 1111.0, c2w)
    t = cam.tensors()
    target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    zeros_hw = jnp.zeros((H, W), jnp.float32)

    @jax.jit
    def train_like_step(ptuple):
        p = gaussians.GaussianParams.from_tuple(ptuple)

        def loss_fn(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            out, aux = render(
                means, shs, opacity, scales, rots,
                jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
                W, H, SH_DEGREE, raster_cfg=cfg,
            )
            loss, _ = losses_mod.total_loss(
                out.color, target, out.depth, zeros_hw, zeros_hw
            )
            stats = (aux.num_pairs, aux.overflow_pairs,
                     aux.tile_depth_mean, aux.tile_depth_max)
            return loss, jax.lax.stop_gradient(stats)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(ptuple)
        return loss, stats, grads

    args = params.as_tuple()
    # Warmup/compile.  NOTE: device-to-host fetches (float()) are the sync
    # points — on tunneled backends jax.block_until_ready can return before
    # execution finishes, silently timing the enqueue instead of the work.
    # A fetch of the LAST iterate waits for everything queued before it
    # (single device executes in order).
    loss, stats, grads = train_like_step(args)
    float(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, stats, grads = train_like_step(args)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    num_pairs, ovfl_pairs, depth_mean, depth_max = (float(s) for s in stats)
    pixels_per_s = W * H / dt
    print(
        json.dumps(
            {
                "metric": "fwd+bwd pixels/s/chip (800x800, 100k gaussians, SH3)",
                "value": round(pixels_per_s),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 3),
                # Workload honesty (BASELINE.md): the compositing load behind
                # the headline number — pairs actually binned, budget clipping
                # (must be 0), and the per-tile depth distribution.
                "num_pairs": round(num_pairs),
                "overflow_pairs": round(ovfl_pairs),
                "tile_depth_mean": round(depth_mean, 1),
                "tile_depth_max": round(depth_max),
            }
        )
    )


if __name__ == "__main__":
    main()
