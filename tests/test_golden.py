"""Golden-image regression: a fixed synthetic scene rendered by the oracle
must stay bit-stable (up to small f32 tolerance) across refactors.

The golden was produced by this same code (tests/golden_scene.npz committed
at round 1) — it guards against silent semantic drift in projection,
binning, or compositing between rounds, which per-commit parity tests can
miss if both sides drift together.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.config import RasterizerConfig
from gaussiansplattingmlx_tpu.models import gaussians
from gaussiansplattingmlx_tpu.render import render
from gaussiansplattingmlx_tpu.utils.camera import Camera

GOLDEN = Path(__file__).parent / "golden_scene.npz"
RASTER = RasterizerConfig(
    tile_h=16, tile_w=16, max_pairs=8192,
    chunk_size=32, backend="reference",
)
W = H = 64


def render_fixed_scene():
    rng = np.random.default_rng(1234)
    n = 120
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    params, _ = gaussians.create_from_points(pts, cols, sh_degree=2, capacity=n)
    import dataclasses

    params = dataclasses.replace(
        params,
        scales=jnp.asarray(
            np.log(rng.uniform(0.05, 0.15, size=(n, 3))).astype(np.float32)
        ),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.uniform(-1.0, 2.0, size=(n, 1)).astype(np.float32)),
        features_rest=jnp.asarray(
            rng.normal(size=(n, 8, 3)).astype(np.float32) * 0.1
        ),
    )
    c2w = np.eye(4)
    c2w[:3, 3] = [0.5, -0.3, -3.5]
    cam = Camera.from_c2w(W, H, 70.0, 72.0, c2w)
    t = cam.tensors()
    means, shs, opacity, scales, rots = gaussians.activations(params)
    out, _ = render(
        means, shs, opacity, scales, rots,
        jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
        jnp.asarray(t["camera_center"]),
        t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
        W, H, 2, raster_cfg=RASTER, backend="reference",
        white_background=True,
    )
    return out


def test_golden_image():
    out = render_fixed_scene()
    got = {
        "color": np.asarray(out.color),
        "depth": np.asarray(out.depth),
        "alpha": np.asarray(out.alpha),
        "n_contrib": np.asarray(out.n_contrib),
    }
    if not GOLDEN.exists():
        np.savez_compressed(GOLDEN, **got)
        raise AssertionError(
            "golden_scene.npz was missing and has been regenerated; commit it"
        )
    want = np.load(GOLDEN)
    assert got["color"].std() > 0.05  # scene is non-trivial
    np.testing.assert_allclose(got["color"], want["color"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["alpha"], want["alpha"], rtol=1e-4, atol=1e-5)
    mismatch = np.mean(got["n_contrib"] != want["n_contrib"])
    assert mismatch < 0.002
