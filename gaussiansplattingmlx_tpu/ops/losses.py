"""Loss and metric functions (Trainer/LossUtil.swift:39-81)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ssim as ssim_mod


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse2psnr(value):
    """LossUtil.swift:74-77: PSNR = -10 * log10(mse)."""
    return -10.0 * jnp.log10(value)


def psnr(pred, target):
    return mse2psnr(mse(pred, target))


def depth_loss(depth, target_depth, mask):
    """Masked mean absolute depth error (GaussianTrainer.swift:693-699)."""
    diff = jnp.abs(depth - target_depth)
    m = mask.astype(jnp.float32)
    weight = jnp.maximum(jnp.sum(m), 1e-6)
    return jnp.sum(diff * m) / weight


def total_loss(
    render,
    target_rgb,
    depth,
    target_depth,
    depth_mask,
    lambda_dssim: float = 0.2,
    lambda_depth: float = 0.0,
    ssim_window: int = 11,
    ssim_sigma: float = 1.5,
):
    """(1-l)*L1 + l*(1 - SSIM) + ld*depth (GaussianTrainer.swift:689-714)."""
    l1 = l1_loss(render, target_rgb)
    ssim_val = ssim_mod.ssim(render, target_rgb, ssim_window, ssim_sigma)
    d = depth_loss(depth, target_depth, depth_mask)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_val) + lambda_depth * d
    return loss, {"l1": l1, "ssim": ssim_val, "depth": d}


def smooth_l1_ohem(pred, target, beta: float = 1.0, ohem_fraction: float = 1.0):
    """Smooth-L1 with online hard example mining (SL1Loss,
    Trainer/LossUtil.swift:12-36; present in the reference but unused in its
    runtime loop).  Keeps the hardest `ohem_fraction` of per-element losses.
    The top-k cut uses a static element count, so this jits cleanly."""
    diff = jnp.abs(pred - target)
    per_elem = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    flat = per_elem.reshape(-1)
    if ohem_fraction >= 1.0:
        return jnp.mean(flat)
    k = max(1, int(flat.shape[0] * ohem_fraction))
    top = jax.lax.top_k(flat, k)[0]
    return jnp.mean(top)
