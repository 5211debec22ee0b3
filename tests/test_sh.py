"""SH evaluation against a brute-force polynomial expansion (mirrors the
reference's ShUtilsTests.swift strategy: degrees 0-4, atol 1e-6 in f32)."""

import numpy as np
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.utils import sh


def brute_force_basis(dirs):
    """Independent re-derivation of the real SH basis values y_lm(dir)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    basis = [
        0.28209479177387814 * np.ones_like(x),
        -0.4886025119029199 * y,
        0.4886025119029199 * z,
        -0.4886025119029199 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.31539156525252005 * (2 * zz - xx - yy),
        -1.0925484305920792 * x * z,
        0.5462742152960396 * (xx - yy),
        -0.5900435899266435 * y * (3 * xx - yy),
        2.890611442640554 * x * y * z,
        -0.4570457994644658 * y * (4 * zz - xx - yy),
        0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
        -0.4570457994644658 * x * (4 * zz - xx - yy),
        1.445305721320277 * z * (xx - yy),
        -0.5900435899266435 * x * (xx - 3 * yy),
        2.5033429417967046 * x * y * (xx - yy),
        -1.7701307697799304 * y * z * (3 * xx - yy),
        0.9461746957575601 * x * y * (7 * zz - 1),
        -0.6690465435572892 * y * z * (7 * zz - 3),
        0.10578554691520431 * (zz * (35 * zz - 30) + 3),
        -0.6690465435572892 * x * z * (7 * zz - 3),
        0.47308734787878004 * (xx - yy) * (7 * zz - 1),
        -1.7701307697799304 * x * z * (xx - 3 * yy),
        0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
    ]
    return np.stack(basis, axis=-1)


def test_eval_sh_all_degrees(rng):
    n = 64
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    for degree in range(5):
        k = (degree + 1) ** 2
        coeffs = rng.normal(size=(n, k, 3)).astype(np.float32)
        got = np.asarray(sh.eval_sh(degree, jnp.asarray(coeffs), jnp.asarray(dirs)))
        basis = brute_force_basis(dirs)[:, :k]
        expected = np.einsum("nk,nkc->nc", basis, coeffs)
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_sh_to_color_clamps_and_shifts(rng):
    dirs = rng.normal(size=(10, 3)).astype(np.float32)
    coeffs = np.zeros((10, 1, 3), dtype=np.float32)
    coeffs[:, 0, 0] = -10.0  # strongly negative -> clamped to 0
    coeffs[:, 0, 1] = 0.0  # zero coeff -> 0.5 after shift
    out = np.asarray(sh.sh_to_color(0, jnp.asarray(coeffs), jnp.asarray(dirs)))
    np.testing.assert_allclose(out[:, 0], 0.0, atol=0)
    np.testing.assert_allclose(out[:, 1], 0.5, atol=1e-7)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(16, 3)).astype(np.float32)
    back = np.asarray(sh.sh2rgb(sh.rgb2sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, rtol=1e-6, atol=1e-6)
