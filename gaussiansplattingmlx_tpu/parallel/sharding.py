"""Multi-chip distribution: camera data-parallelism + pixel-band sharding.

The reference is strictly single-device (SURVEY §2.4: no DP/TP/PP, no
collectives of any kind) — this layer is new TPU-first design:

  * mesh axis "data": each device trains on a DIFFERENT camera view per step.
    Gaussian parameters are replicated; per-view gradients are `pmean`'d over
    ICI — the 3DGS analogue of data parallelism.  With the reference's random
    camera sampling this is exact gradient accumulation over a batch of views
    (the single-view reference is the batch=1 special case).
  * mesh axis "tile": for very large renders, ONE camera's pixel-tile grid is
    split into horizontal bands, one band per device; per-Gaussian gradient
    partials from each band are `psum`'d.  Structurally the same pattern as
    sequence-sharded attention with KV all-gather (SURVEY §5).

Built on `shard_map` so the Pallas rasterizer runs rank-identical per shard
(no vmap over pallas_call), with XLA collectives over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import TrainConfig
from ..models import gaussians
from ..models.gaussians import GaussianParams
from ..ops import losses as losses_mod
from ..render import render as render_fn
from ..train import optimizer as adam
from ..train.trainer import TrainState


def make_mesh(
    data_parallel: int = 0,
    tile_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Mesh over (data, tile).  data_parallel=0 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data_parallel <= 0:
        data_parallel = n // tile_parallel
    assert data_parallel * tile_parallel == n, (
        f"{data_parallel} x {tile_parallel} != {n} devices"
    )
    return Mesh(devices.reshape(data_parallel, tile_parallel), ("data", "tile"))


def make_dp_train_step(
    cfg: TrainConfig,
    image_width: int,
    image_height: int,
    sh_degree: int,
    total_iterations: int,
    mesh: Mesh,
    backend: Optional[str] = None,
) -> Callable:
    """Data-parallel train step: view batch sharded over "data", params
    replicated, grads pmean'd.  Each device computes one camera's full
    forward/backward; the Adam update is replicated (identical on all
    devices after the collective)."""

    tile_devices = mesh.shape["tile"]
    assert image_height % tile_devices == 0, (
        "tile-parallel requires image_height divisible by the tile axis"
    )
    band_h = image_height // tile_devices
    # NOTE: when band_h is a multiple of tile_h the band tiling coincides with
    # the full-image tiling and band rendering is bit-for-bit the full render;
    # otherwise the conservative rect culling differs slightly at band seams.

    def per_device(state: TrainState, view_batch: Dict):
        # Leading batch dim is sharded to length 1 on this device.
        take = lambda k: view_batch[k][0]
        active = gaussians.active_mask(state.params, state.num_active)
        band = jax.lax.axis_index("tile") * band_h

        def loss_fn(ptuple):
            params = GaussianParams.from_tuple(ptuple)
            means3d, shs, opacity, scales, rotations = gaussians.activations(
                params, active
            )
            out, aux = render_fn(
                means3d, shs, opacity, scales, rotations,
                take("view"), take("proj"), take("camera_center"),
                take("fov_x"), take("fov_y"), take("focal_x"), take("focal_y"),
                image_width, band_h, sh_degree,
                raster_cfg=cfg.raster,
                white_background=cfg.white_background,
                backend=backend,
                pixel_y_offset=band,
            )
            target = jax.lax.dynamic_slice_in_dim(
                take("target_rgb"), band, band_h, axis=0
            )
            target_depth = jax.lax.dynamic_slice_in_dim(
                take("target_depth"), band, band_h, axis=0
            )
            depth_mask = jax.lax.dynamic_slice_in_dim(
                take("depth_mask"), band, band_h, axis=0
            )
            loss, parts = losses_mod.total_loss(
                out.color, target, out.depth, target_depth, depth_mask,
                lambda_dssim=cfg.loss.lambda_dssim,
                lambda_depth=cfg.loss.lambda_depth,
                ssim_window=cfg.loss.ssim_window,
                ssim_sigma=cfg.loss.ssim_sigma,
            )
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params.as_tuple()
        )
        grads = GaussianParams.from_tuple(grads)
        # Average over cameras (data) and sum over pixel bands (tile): band
        # losses are per-band means, so pmean over tile approximates the
        # full-image mean; gradients likewise.
        grads = jax.lax.pmean(jax.lax.pmean(grads, "tile"), "data")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "tile"), "data")
        parts = jax.lax.pmean(jax.lax.pmean(parts, "tile"), "data")

        grad_norm = jnp.sqrt(jnp.sum(grads.xyz * grads.xyz, axis=1))
        lrs = gaussians.learning_rates(
            state.step, total_iterations,
            lr_xyz=cfg.optim.lr_xyz,
            lr_features_dc=cfg.optim.lr_features_dc,
            lr_features_rest=cfg.optim.lr_features_rest,
            lr_scales=cfg.optim.lr_scales,
            lr_rotation=cfg.optim.lr_rotation,
            lr_opacity=cfg.optim.lr_opacity,
            xyz_lr_floor=cfg.optim.xyz_lr_floor,
        )
        lr_tree = GaussianParams(
            xyz=lrs["xyz"], features_dc=lrs["features_dc"],
            features_rest=lrs["features_rest"], scales=lrs["scales"],
            rotation=lrs["rotation"], opacity=lrs["opacity"],
        )
        new_params, new_opt = adam.update(
            state.params, grads, state.opt, lr_tree,
            beta1=cfg.optim.beta1, beta2=cfg.optim.beta2, eps=cfg.optim.eps,
            bias_correction=cfg.optim.bias_correction,
        )
        new_state = TrainState(
            params=new_params, opt=new_opt, num_active=state.num_active,
            grad_accum=state.grad_accum + grad_norm,
            grad_denom=state.grad_denom + 1.0,
            step=state.step + 1,
        )
        metrics = {"loss": loss, **parts}
        return new_state, metrics

    view_specs = P("data")
    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), view_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0,))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_view_batch(batch: Dict, mesh: Mesh) -> Dict:
    sharding = jax.sharding.NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
