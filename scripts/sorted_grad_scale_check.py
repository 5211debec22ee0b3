"""At-scale gradient parity: sorted-order training path vs aligned path.

tpu_check.py validates the boundary-carry backward at 128x96 / 4k pairs;
the round-4 denormal bug only manifested at LARGE segmented grids.  This
runs the bench-scale workload (800x800, 100k gaussians, ~1.4M pairs,
2500 tiles at 16x16) through BOTH training staging paths end-to-end
(projection -> staging -> rasterize -> loss -> jax.grad w.r.t. raw params)
and reports per-leaf relative gradient norms plus coverage (fraction of
gaussians with any xyz grad) for each.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.config import RasterizerConfig
from gaussiansplattingmlx_tpu.models import gaussians
from gaussiansplattingmlx_tpu.ops import losses as losses_mod
from gaussiansplattingmlx_tpu.render import render
from gaussiansplattingmlx_tpu.utils.camera import Camera
import dataclasses

W = H = int(os.environ.get("CHECK_SIZE", 800))
N = int(os.environ.get("CHECK_N", 100_000))
SH_DEGREE = int(os.environ.get("CHECK_SH", 3))
TILE = int(os.environ.get("CHECK_TILE", 16))

rng = np.random.default_rng(0)
pts = rng.normal(size=(N, 3)).astype(np.float32) * 0.6
cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
params, num = gaussians.create_from_points(pts, cols, sh_degree=SH_DEGREE, capacity=N)
params = dataclasses.replace(
    params,
    scales=jnp.asarray(np.log(rng.uniform(0.004, 0.02, size=(N, 3))).astype(np.float32)),
    opacity=jnp.asarray(rng.normal(0.0, 2.0, size=(N, 1)).astype(np.float32)),
)

c2w = np.eye(4)
c2w[2, 3] = -4.0
cam = Camera.from_c2w(W, H, 1111.0, 1111.0, c2w)
t = cam.tensors()
target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
zeros_hw = jnp.zeros((H, W), jnp.float32)

cfg = RasterizerConfig(max_pairs=1452544 if W == 800 else 2 ** 21,
                       tile_w=TILE, tile_h=TILE)


def make_grad(train_staging):
    c = dataclasses.replace(cfg, train_staging=train_staging)

    @jax.jit
    def g(ptuple):
        def loss_fn(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            out, aux = render(
                means, shs, opacity, scales, rots,
                jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
                W, H, SH_DEGREE, raster_cfg=c,
            )
            loss, _ = losses_mod.total_loss(
                out.color, target, out.depth, zeros_hw, zeros_hw)
            return loss
        return jax.grad(loss_fn)(ptuple)

    return g


names = ["xyz", "features_dc", "features_rest", "scales", "rotation", "opacity"]
ptuple = params.as_tuple()
res = {}
for mode in ["aligned", "sorted"]:
    t0 = time.time()
    gr = make_grad(mode)(ptuple)
    gr = jax.tree.map(lambda x: np.asarray(x), gr)
    res[mode] = gr
    cov = float((np.abs(gr[0]).sum(axis=1) > 0).mean())
    print(f"{mode:8s} compile+run {time.time()-t0:.1f}s  xyz-grad coverage {cov:.4f}")

ok = True
for i, nm in enumerate(names):
    a, s = res["aligned"][i], res["sorted"][i]
    denom = np.linalg.norm(a) + 1e-30
    rel = np.linalg.norm(s - a) / denom
    print(f"{nm:14s} |aligned| {np.linalg.norm(a):12.5g}  relnorm(sorted-aligned) {rel:.3e}")
    if not np.isfinite(rel) or rel > 1e-3:
        ok = False
print("OK" if ok else "MISMATCH")
