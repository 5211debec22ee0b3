"""Headline benchmark: pixels/s/chip, forward+backward rasterize, lego-scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md): 800x800 image, lego-scale Gaussian count (100k after
densification), full differentiable step — projection, binning, Pallas
rasterizer forward, L1+SSIM loss, backward through the custom VJP.
`vs_baseline` is the ratio to BASELINE_PIXELS_PER_S, the recorded result of
this benchmark's first TPU v5e run (so later rounds track speedups); the
reference publishes no numbers (BASELINE.md).

Failure tolerance: this environment's TPU sits behind a relay tunnel that can
wedge the client forever at device init (docs/DESIGN.md "tunnel traps"), so
the measurement runs in a CHILD process watched by this parent.  Device init,
compile, and the timed loop each have a wall-clock bound; a dead tunnel
yields a structured {"skipped": ...} JSON line in bounded time — never a hang
and never a raw traceback as the round's official record.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

# First measured value on TPU v5e-1 (round 1).  Later rounds report speedup
# against this anchor.
BASELINE_PIXELS_PER_S = 6_723_701.0
METRIC = "fwd+bwd pixels/s/chip (800x800, 100k gaussians, SH3)"

DEVICE_INIT_TIMEOUT = float(os.environ.get("GSPLAT_BENCH_INIT_TIMEOUT", 180))
TOTAL_TIMEOUT = float(os.environ.get("GSPLAT_BENCH_TOTAL_TIMEOUT", 1200))


def child(progress_path: str):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

    def mark(stage: str):
        with open(progress_path, "a") as f:
            f.write(f"{stage} {time.time():.1f}\n")
            f.flush()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend/tunnel init before anything else
    mark("devices_ok")

    from gaussiansplattingmlx_tpu.config import RasterizerConfig
    from gaussiansplattingmlx_tpu.models import gaussians
    from gaussiansplattingmlx_tpu.ops import losses as losses_mod
    from gaussiansplattingmlx_tpu.render import render
    from gaussiansplattingmlx_tpu.utils.camera import Camera

    W = H = 800
    N = 100_000
    SH_DEGREE = 3
    # Binning is exact (no per-gaussian truncation); the workload stats in
    # the JSON line prove the budget is not clipping it (overflow_pairs == 0
    # at the achieved num_pairs).  The pair budget is sized to the EXACT
    # demand (probed below with a cheap projection+footprint pass, +3%
    # rounded up to the merge-block quantum) because every static-axis stage
    # (sort, merge, relayout, kernel DMA) pays for the full budget whether
    # slots are valid or not — render_cli.py auto-sizes viewer budgets the
    # same way.  GSPLAT_BENCH_PAIRS overrides the probe.
    # GSPLAT_BENCH_CHUNK sweeps the kernel inner-chunk size (default 128),
    # GSPLAT_BENCH_TILE the tile edge — A/B knobs for the real chip, no code
    # edits.  Tile default 32: the round-4 on-chip A/B measured 8.87 Mpix/s
    # at 32x32 tiles vs 7.09 at 16x16 (2.6x fewer pairs at 4x pixels per
    # pair — staging scales with pairs and wins); compiled-Mosaic parity at
    # 32x32 is what scripts/tpu_check.py asserts.
    chunk = int(os.environ.get("GSPLAT_BENCH_CHUNK", 128))
    tile = int(os.environ.get("GSPLAT_BENCH_TILE", 32))

    rng = np.random.default_rng(0)
    # Lego-like scene: points in a unit-ish volume, camera orbiting at r=4,
    # gaussian sizes matching a converged 3DGS scene (~3px screen sigma ->
    # 1-4 tiles footprint), opacities spread like a trained model.
    pts = rng.normal(size=(N, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
    params, num = gaussians.create_from_points(pts, cols, sh_degree=SH_DEGREE, capacity=N)
    import dataclasses
    params = dataclasses.replace(
        params,
        scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.02, size=(N, 3))).astype(np.float32)
        ),
        opacity=jnp.asarray(rng.normal(0.0, 2.0, size=(N, 1)).astype(np.float32)),
    )

    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    cam = Camera.from_c2w(W, H, 1111.0, 1111.0, c2w)
    t = cam.tensors()
    target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    zeros_hw = jnp.zeros((H, W), jnp.float32)

    # --- probe the exact pair demand (projection + tile-footprint sum) ------
    env_pairs = os.environ.get("GSPLAT_BENCH_PAIRS")
    if env_pairs:
        max_pairs = int(env_pairs)
    else:
        from gaussiansplattingmlx_tpu.ops import binning as binning_mod
        from gaussiansplattingmlx_tpu.ops import projection as projection_mod

        @jax.jit
        def pair_demand(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            p = projection_mod.project_gaussians(
                means, scales, rots, shs,
                jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
                W, H, SH_DEGREE,
            )
            gw, gh = -(-W // tile), -(-H // tile)
            tmin_x, tmin_y, tmax_x, tmax_y = binning_mod._tile_bounds(
                p.rect_min, p.rect_max, tile, tile, gw, gh
            )
            foot = jnp.maximum(tmax_x - tmin_x, 0) * jnp.maximum(
                tmax_y - tmin_y, 0
            )
            return jnp.sum(jnp.where(p.radii > 0, foot, 0))

        demand = int(pair_demand(params.as_tuple()))
        import math
        quantum = 512 * chunk // math.gcd(512, chunk)  # lcm(merge BLOCK, chunk)
        max_pairs = -(-int(demand * 1.03) // quantum) * quantum
    mark("probed")

    cfg = RasterizerConfig(max_pairs=max_pairs, chunk_size=chunk,
                           tile_w=tile, tile_h=tile)

    @jax.jit
    def train_like_step(ptuple):
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
    mark("compiled")

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
                "metric": METRIC,
                "value": round(pixels_per_s),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 3),
                # Workload honesty (BASELINE.md): the compositing load behind
                # the headline number — pairs actually binned, budget clipping
                # (must be 0), and the per-tile depth distribution.
                "num_pairs": round(num_pairs),
                "max_pairs": max_pairs,
                "tile": tile,
                "overflow_pairs": round(ovfl_pairs),
                "tile_depth_mean": round(depth_mean, 1),
                "tile_depth_max": round(depth_max),
            }
        )
    )


def skip_line(reason: str):
    print(json.dumps({
        "metric": METRIC,
        "value": 0,
        "unit": "pixels/s",
        "vs_baseline": 0.0,
        "skipped": reason,
    }))


def run_attempt(progress_path: str):
    """Run one watched child. Returns (status, detail): status in
    {"ok", "init-timeout", "total-timeout", "crash"}."""
    open(progress_path, "w").close()
    env = dict(os.environ, GSPLAT_BENCH_CHILD="1",
               GSPLAT_BENCH_PROGRESS=progress_path)
    # stderr to a file, not a pipe: an unread pipe can fill and block the
    # child mid-traceback, turning a crash into a fake hang.
    err_path = progress_path + ".err"
    with open(err_path, "w") as errf:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, start_new_session=True, stderr=errf,
        )
    started = time.time()

    def stages():
        try:
            with open(progress_path) as f:
                return [ln.split()[0] for ln in f.read().splitlines() if ln]
        except OSError:
            return []

    def kill():
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()

    while True:
        rc = proc.poll()
        if rc is not None:
            if rc == 0:
                return "ok", ""
            try:
                with open(err_path) as f:
                    err = f.read().strip().splitlines()
            except OSError:
                err = []
            return "crash", err[-1] if err else f"rc={rc}"
        elapsed = time.time() - started
        if "devices_ok" not in stages() and elapsed > DEVICE_INIT_TIMEOUT:
            kill()
            return "init-timeout", (
                f"device init did not complete within {DEVICE_INIT_TIMEOUT:.0f}s"
            )
        if elapsed > TOTAL_TIMEOUT:
            kill()
            return "total-timeout", (
                f"bench did not finish within {TOTAL_TIMEOUT:.0f}s "
                f"(reached: {stages() or ['nothing']})"
            )
        time.sleep(2)


def main():
    if os.environ.get("GSPLAT_BENCH_CHILD") == "1":
        child(os.environ["GSPLAT_BENCH_PROGRESS"])
        return
    progress_path = tempfile.mktemp(prefix="gsplat_bench_")
    try:
        status, detail = run_attempt(progress_path)
        if status == "ok":
            return
        if status == "crash":
            # Transient backend crashes (tunnel reconnects) deserve one retry.
            status2, detail2 = run_attempt(progress_path)
            if status2 == "ok":
                return
            skip_line(f"tpu-unavailable after retry: {detail2 or detail}")
            return
        # A wedged device init will not fix itself within this process's
        # lifetime — fail fast rather than retry into a second long hang.
        skip_line(f"tpu-unavailable: {detail}")
    finally:
        for p in (progress_path, progress_path + ".err"):
            if os.path.exists(p):
                os.unlink(p)


if __name__ == "__main__":
    main()
