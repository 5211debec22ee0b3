"""Loss / SSIM sanity (counterpart of TrainTests.swift testSSIM, with real
assertions the reference lacks)."""

import numpy as np
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.ops import losses, ssim


def test_ssim_identical_images(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(ssim.ssim(img, img)) > 0.9999


def test_ssim_noise_decreases(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=img.shape).astype(np.float32))
    s_noisy = float(ssim.ssim(img, noisy))
    assert s_noisy < 0.9


def test_ssim_opposite_images():
    a = jnp.zeros((16, 16, 3))
    b = jnp.ones((16, 16, 3))
    assert float(ssim.ssim(a, b)) < 0.05


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20.
    assert abs(float(losses.psnr(a, b)) - 20.0) < 1e-4


def test_depth_loss_masked():
    d = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    t = jnp.asarray([[1.5, 2.0], [0.0, 0.0]])
    mask = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])
    val = float(losses.depth_loss(d, t, mask))
    assert abs(val - 0.25) < 1e-6


def test_total_loss_weights(rng):
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    depth = jnp.zeros((16, 16))
    loss, aux = losses.total_loss(img, target, depth, depth, jnp.zeros((16, 16)))
    expected = 0.8 * float(aux["l1"]) + 0.2 * (1.0 - float(aux["ssim"]))
    assert abs(float(loss) - expected) < 1e-6


def test_smooth_l1_ohem(rng):
    pred = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    target = jnp.zeros((8, 8))
    full = float(losses.smooth_l1_ohem(pred, target, beta=1.0))
    # Hand formula check on a known diff.
    d = np.abs(np.asarray(pred))
    expect = np.where(d < 1.0, 0.5 * d * d, d - 0.5).mean()
    assert abs(full - expect) < 1e-6
    # OHEM keeps the hardest half -> loss at least the full mean.
    half = float(losses.smooth_l1_ohem(pred, target, ohem_fraction=0.5))
    assert half >= full
