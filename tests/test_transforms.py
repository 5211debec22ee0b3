"""Math utility tests (counterpart of GaussianSplattingMlxTests.swift:14-160)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.utils import transforms as tf


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9], dtype=jnp.float32)
    y = tf.inverse_sigmoid(x)
    np.testing.assert_allclose(jax.nn.sigmoid(y), x, rtol=1e-6)


def test_homogeneous():
    pts = jnp.ones((5, 3))
    h = tf.homogeneous(pts)
    assert h.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(h[:, 3]), 1.0)


def test_quat_identity_and_180():
    ident = tf.quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(ident[0]), np.eye(3), atol=1e-7)
    # 180 degrees about x: diag(1, -1, -1)
    rx = tf.quat_to_rotmat(jnp.asarray([[0.0, 1.0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(rx[0]), np.diag([1.0, -1.0, -1.0]), atol=1e-7)


def test_quat_unnormalized_matches_normalized(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32)
    scale = rng.uniform(0.5, 3.0, size=(8, 1)).astype(np.float32)
    r1 = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    r2 = np.asarray(tf.quat_to_rotmat(jnp.asarray(q * scale)))
    np.testing.assert_allclose(r1, r2, rtol=1e-4, atol=1e-5)
    # Proper rotations: R R^T = I, det = 1.
    rrt = np.einsum("nij,nkj->nik", r1, r1)
    np.testing.assert_allclose(rrt, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)


def test_build_cov3d_psd_and_symmetric(rng):
    scales = rng.uniform(0.1, 2.0, size=(16, 3)).astype(np.float32)
    quats = rng.normal(size=(16, 4)).astype(np.float32)
    cov = np.asarray(tf.build_cov3d(jnp.asarray(scales), jnp.asarray(quats)))
    np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-5)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > -1e-5).all()
    # Eigenvalues are the squared scales.
    np.testing.assert_allclose(
        np.sort(eig, axis=-1), np.sort(scales**2, axis=-1), rtol=1e-3, atol=1e-4
    )


def test_strip_lowerdiag():
    m = jnp.arange(9.0).reshape(1, 3, 3)
    v = np.asarray(tf.strip_lowerdiag(m))[0]
    np.testing.assert_allclose(v, [0.0, 1.0, 2.0, 4.0, 5.0, 8.0])


def test_inv3x3(rng):
    m = rng.normal(size=(12, 3, 3)).astype(np.float32)
    m = m @ np.swapaxes(m, -1, -2) + 0.5 * np.eye(3)  # well-conditioned
    inv = np.asarray(tf.inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(
        inv @ m, np.broadcast_to(np.eye(3), m.shape), atol=5e-4
    )


def test_mask_to_indices():
    mask = jnp.asarray([False, True, False, True, True, False])
    idx, count = tf.mask_to_indices(mask)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(idx), [1, 3, 4, -1, -1, -1])


def test_mask_to_indices_jits():
    f = jax.jit(tf.mask_to_indices)
    idx, count = f(jnp.asarray([True, False, True]))
    assert int(count) == 2
    np.testing.assert_array_equal(np.asarray(idx)[:2], [0, 2])
