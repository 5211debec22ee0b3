"""Gaussian model init and activations (GaussianModelTests counterpart, plus
the kNN correctness the reference's buggy distTopK never had)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.models import gaussians
from gaussiansplattingmlx_tpu.utils import sh as sh_utils


def test_knn_mean_sq_dist_cross():
    # 4-point cross around origin, k=2: two nearest at sqrt(0.5)... use the
    # reference test's scene (GaussianModelTests.swift:15-34): points at
    # (+-0.5, 0, 0), (0, +-0.5, 0); each point's 2 nearest are at distance
    # sqrt(0.5) -> mean squared distance 0.5.
    pts = np.array(
        [[0.5, 0, 0], [-0.5, 0, 0], [0, 0.5, 0], [0, -0.5, 0]], np.float32
    )
    d2 = gaussians.knn_mean_sq_dist(pts, k=2)
    np.testing.assert_allclose(d2, 0.5, rtol=1e-6)


def test_knn_chunked_matches_unchunked(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    a = gaussians.knn_mean_sq_dist(pts, k=3, chunk=300)
    b = gaussians.knn_mean_sq_dist(pts, k=3, chunk=37)
    # gemm-form distances differ in last-ulp cancellation across chunkings
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_create_from_points(rng):
    n = 50
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    params, num = gaussians.create_from_points(pts, cols, sh_degree=2, capacity=64)
    assert num == n
    assert params.capacity == 64
    assert params.features_rest.shape == (64, 8, 3)
    np.testing.assert_allclose(np.asarray(params.xyz[:n]), pts)
    # DC coefficients invert back to the input colors.
    back = np.asarray(sh_utils.sh2rgb(params.features_dc[:n, 0]))
    np.testing.assert_allclose(back, cols, rtol=1e-5, atol=1e-5)
    # identity quats, opacity logit of 0.1
    np.testing.assert_allclose(np.asarray(params.rotation[:n, 0]), 1.0)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(params.opacity[:n, 0])), 0.1, rtol=1e-5
    )
    # inactive slots render with ~zero opacity
    assert float(jax.nn.sigmoid(params.opacity[n:].max())) < 1e-9


def test_activations_mask(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cols = rng.uniform(size=(10, 3)).astype(np.float32)
    params, num = gaussians.create_from_points(pts, cols, sh_degree=1, capacity=16)
    mask = gaussians.active_mask(params, jnp.int32(num))
    means, shs, opacity, scales, rots = gaussians.activations(params, mask)
    assert shs.shape == (16, 4, 3)
    assert float(opacity[num:].max()) == 0.0
    assert (np.asarray(scales) > 0).all()


def test_learning_rate_schedule():
    lrs0 = gaussians.learning_rates(0, 30000)
    lrs_mid = gaussians.learning_rates(15000, 30000)
    lrs_end = gaussians.learning_rates(30000, 30000)
    assert abs(float(lrs0["xyz"]) - 1.6e-4) < 1e-9
    assert abs(float(lrs_mid["xyz"]) - 0.8e-4) < 1e-9
    # floor at 1% of base
    assert abs(float(lrs_end["xyz"]) - 1.6e-6) < 1e-12
    np.testing.assert_allclose(float(lrs0["features_rest"]), 2.5e-3 / 20, rtol=1e-6)
    np.testing.assert_allclose(float(lrs0["opacity"]), 2.5e-2, rtol=1e-6)
