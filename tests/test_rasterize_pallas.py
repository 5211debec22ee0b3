"""Pallas rasterizer vs oracle: forward parity + backward gradient parity.

Runs in Pallas interpret mode on CPU; the compiled Mosaic path is exercised
on real TPU hardware by bench.py and scripts/tpu_check.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingmlx_tpu.ops import binning, rasterize_pallas, rasterize_ref


def make_scene(rng, n=24, W=48, H=40, tw=16, th=8, opacity_range=(0.2, 0.9)):
    means2d = rng.uniform(2, max(W, H) - 2, size=(n, 2)).astype(np.float32)
    means2d[:, 0] *= W / max(W, H)
    means2d[:, 1] *= H / max(W, H)
    sigma = rng.uniform(1.0, 4.0, size=n).astype(np.float32)
    conic = np.zeros((n, 4), np.float32)
    conic[:, 0] = 1.0 / sigma**2
    conic[:, 3] = 1.0 / sigma**2
    # small off-diagonal to exercise the c01+c10 path
    off = rng.uniform(-0.02, 0.02, size=n).astype(np.float32)
    conic[:, 1] = off
    conic[:, 2] = off
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(*opacity_range, size=(n, 1)).astype(np.float32)
    depths = rng.uniform(1.0, 10.0, size=n).astype(np.float32)
    radii = (3 * sigma).astype(np.float32)
    rect_min = np.maximum(means2d - radii[:, None], 0.0)
    rect_max = np.minimum(
        means2d + radii[:, None], np.array([W - 1, H - 1], np.float32)
    )
    packed = rasterize_ref.pack_gaussians(
        jnp.asarray(means2d),
        jnp.asarray(conic),
        jnp.asarray(colors),
        jnp.asarray(opacity),
        jnp.asarray(depths),
    )
    b = binning.bin_gaussians(
        jnp.asarray(rect_min),
        jnp.asarray(rect_max),
        jnp.asarray(radii),
        jnp.asarray(depths),
        W,
        H,
        tw,
        th,
        max_pairs=512,
    )
    return packed, b, (W, H, tw, th)


def run_pallas(packed, b, W, H, tw, th, chunk=8):
    return rasterize_pallas.rasterize_pallas(
        packed,
        b.sorted_gauss_idx,
        b.pair_valid,
        b.tile_start,
        b.tile_count,
        W,
        H,
        tw,
        th,
        chunk_size=chunk,
        interpret=True,
    )


def run_oracle(packed, b, W, H, tw, th):
    return rasterize_ref.rasterize_reference(
        packed, b.sorted_gauss_idx, b.sorted_tile_id, W, H, tw, th
    )


def assert_outputs_close(got, want, img_tol=1e-5, ncon_slack=0.003):
    np.testing.assert_allclose(
        np.asarray(got.color), np.asarray(want.color), rtol=1e-4, atol=img_tol
    )
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(want.depth), rtol=1e-4, atol=img_tol * 10
    )
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(want.alpha), rtol=1e-4, atol=img_tol
    )
    # log-space vs linear transmittance: the include mask can flip on pixels
    # sitting exactly at the 1e-4 threshold; allow a tiny fraction.
    mismatch = np.mean(np.asarray(got.n_contrib) != np.asarray(want.n_contrib))
    assert mismatch <= ncon_slack, f"n_contrib mismatch fraction {mismatch}"


def test_forward_matches_oracle(rng):
    packed, b, dims = make_scene(rng)
    got = run_pallas(packed, b, *dims)
    want = run_oracle(packed, b, *dims)
    assert_outputs_close(got, want)


def test_forward_early_exit(rng):
    packed, b, dims = make_scene(rng, n=40, opacity_range=(0.95, 0.99))
    got = run_pallas(packed, b, *dims)
    want = run_oracle(packed, b, *dims)
    assert (np.asarray(want.n_contrib) < 40).any()
    assert_outputs_close(got, want)


def test_forward_chunk_boundaries(rng):
    # chunk sizes that do / don't divide the per-tile counts.
    packed, b, dims = make_scene(rng, n=30)
    want = run_oracle(packed, b, *dims)
    for chunk in (4, 8, 16):
        got = run_pallas(packed, b, *dims, chunk=chunk)
        assert_outputs_close(got, want)


def test_empty_tiles(rng):
    # All gaussians in one corner; most tiles empty.
    packed, b, dims = make_scene(rng, n=6)
    W, H, tw, th = dims
    got = run_pallas(packed, b, W, H, tw, th)
    want = run_oracle(packed, b, W, H, tw, th)
    assert_outputs_close(got, want)


def test_backward_matches_oracle_grad(rng):
    packed, b, dims = make_scene(rng, n=16, W=32, H=24)
    W, H, tw, th = dims
    target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

    def loss_pallas(p):
        out = run_pallas(p, b, W, H, tw, th)
        return (
            jnp.sum((out.color - target) ** 2)
            + 0.3 * jnp.sum(out.depth**2)
            + 0.7 * jnp.sum(out.alpha)
        )

    def loss_oracle(p):
        out = run_oracle(p, b, W, H, tw, th)
        return (
            jnp.sum((out.color - target) ** 2)
            + 0.3 * jnp.sum(out.depth**2)
            + 0.7 * jnp.sum(out.alpha)
        )

    g_pallas = np.asarray(jax.grad(loss_pallas)(packed))
    g_oracle = np.asarray(jax.grad(loss_oracle)(packed))
    assert np.isfinite(g_pallas).all()
    np.testing.assert_allclose(g_pallas, g_oracle, rtol=2e-3, atol=2e-4)


def test_backward_early_exit_grad(rng):
    packed, b, dims = make_scene(rng, n=30, W=32, H=24, opacity_range=(0.9, 0.99))
    W, H, tw, th = dims

    def mk_loss(runner):
        def loss(p):
            out = runner(p, b, W, H, tw, th)
            return jnp.sum(out.color**2) + jnp.sum(out.alpha)

        return loss

    g_pallas = np.asarray(jax.grad(mk_loss(run_pallas))(packed))
    g_oracle = np.asarray(jax.grad(mk_loss(run_oracle))(packed))
    np.testing.assert_allclose(g_pallas, g_oracle, rtol=5e-3, atol=5e-4)


def test_forward_tile32_matches_oracle(rng):
    """Tile size is a TPU tunable (SURVEY §7 'Known quirks': treat tile size
    as tunable); 32x32 tiles bin fewer pairs at more pixels per pair.  The
    kernel is parametric in (tile_w, tile_h) — verify against the oracle at
    the coarse setting used by the GSPLAT_BENCH_TILE=32 A/B."""
    packed, b, (W, H, tw, th) = make_scene(rng, n=32, W=64, H=64, tw=32, th=32)
    got = run_pallas(packed, b, W, H, tw, th, chunk=8)
    want = run_oracle(packed, b, W, H, tw, th)
    assert_outputs_close(got, want)
