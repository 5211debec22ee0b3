"""End-to-end differentiable render: projection -> binning -> rasterize.

Counterpart of GaussianRenderer.forward / forwardWithCameraParams
(Trainer/GaussianRenderer.swift:769-934), as one jit-friendly function.
Also serves as the inference renderer (the reference ships a separate
Metal viewer, Metal/MetalGaussianRenderer.swift; on TPU the training
rasterizer jitted without gradients IS the viewer backend).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RasterizerConfig
from .ops import binning as binning_mod
from .ops import projection, rasterize_pallas, rasterize_ref
from .ops import staging as staging_mod
from .ops.rasterize_ref import RenderOutputs


class RenderAux(NamedTuple):
    radii: jax.Array  # [N] screen radii (0 = culled)
    num_pairs: jax.Array  # [] pairs binned
    overflow_gaussians: jax.Array
    overflow_pairs: jax.Array
    means2d: jax.Array  # [N, 2] (for positional-gradient densification stats)
    tile_depth_mean: jax.Array  # [] mean pairs per tile (workload honesty)
    tile_depth_max: jax.Array  # [] max pairs in any tile


def resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "reference"


def render(
    means3d: jax.Array,
    shs: jax.Array,
    opacity: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    view: jax.Array,
    proj: jax.Array,
    camera_center: jax.Array,
    fov_x: jax.Array,
    fov_y: jax.Array,
    focal_x: jax.Array,
    focal_y: jax.Array,
    image_width: int,
    image_height: int,
    sh_degree: int,
    raster_cfg: RasterizerConfig = RasterizerConfig(),
    white_background: bool = False,
    backend: str | None = None,
    pixel_y_offset=None,
    full_image_height: int | None = None,
    active: jax.Array | None = None,
    inference: bool = False,
):
    """Render one view.  All array args may be traced; shapes/ints static.

    For pixel-band sharding (parallel/sharding.py), `image_height` is the
    band height, `full_image_height` the camera's full image height, and
    `pixel_y_offset` the band's first row: the camera projection uses the
    full image while binning/rasterization run in band-local coordinates.

    `inference=True` (pallas backend): the viewer/eval fast path — records
    stay in sorted order and the chunk-aligned relayout gather is skipped
    entirely (the forward kernel masks unaligned range heads).  Identical
    pixels, forward-only (no gradients).  Counterpart of the reference's
    dedicated inference renderer (Metal/MetalGaussianRenderer.swift:262-299).

    Returns (RenderOutputs with background applied to color, RenderAux).
    """
    cfg = raster_cfg
    backend = resolve_backend(backend if backend is not None else cfg.backend)
    proj_height = full_image_height if full_image_height is not None else image_height

    p = projection.project_gaussians(
        means3d,
        scales,
        rotations,
        shs,
        view,
        proj,
        camera_center,
        fov_x,
        fov_y,
        focal_x,
        focal_y,
        image_width,
        proj_height,
        sh_degree,
        z_cull=cfg.z_cull,
        ndc_w_eps=cfg.ndc_w_eps,
        tanfov_clip=cfg.tanfov_clip,
        cov2d_dilation=cfg.cov2d_dilation,
        radius_eigen_eps=cfg.radius_eigen_eps,
        quat_norm_eps=cfg.quat_norm_eps,
        active=active,
    )

    means2d = p.means2d
    rect_min, rect_max = p.rect_min, p.rect_max
    if pixel_y_offset is not None:
        # Shift to band-local pixel coordinates and re-clip the y rects to
        # the band window (x rects keep the full-image clamps).
        offs = jnp.asarray(pixel_y_offset, means2d.dtype)
        means2d = means2d - jnp.stack([jnp.zeros_like(offs), offs])
        y_band = jax.lax.stop_gradient(means2d[:, 1])
        rect_min = jnp.stack(
            [rect_min[:, 0], jnp.maximum(y_band - p.radii, 0.0)], axis=-1
        )
        rect_max = jnp.stack(
            [rect_max[:, 0], jnp.minimum(y_band + p.radii, image_height - 1.0)],
            axis=-1,
        )

    packed = rasterize_ref.pack_gaussians(
        means2d, p.conic, p.colors, opacity, p.depths
    )

    # GSPLAT_STAGING=split is the operational kill-switch: forces the split
    # pipeline (and the training-style viewer path) if the fused kernels
    # misbehave on a given backend — used by scripts/round3_campaign.sh when
    # the parity check fails.
    staging_mode = os.environ.get("GSPLAT_STAGING") or cfg.staging
    if backend in ("pallas", "pallas_interpret") and (
        staging_mode == "fused" or (inference and staging_mode != "split")
    ):
        # Fused staging (ops/staging.py): binning + sort + aligned relayout
        # as one wide-payload pipeline with its own gradient reduction.
        # Inference: sorted-order records, no relayout at all.
        sst = staging_mod.StagingStatic(
            image_width=image_width,
            image_height=image_height,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            max_pairs=cfg.max_pairs,
            chunk=cfg.chunk_size,
            num_rec=packed.shape[0],
            grad_reduce=cfg.grad_reduce,
            interpret=backend == "pallas_interpret",
        )
        train_staging = (
            os.environ.get("GSPLAT_TRAIN_STAGING") or cfg.train_staging
        )
        sorted_mode = False
        if inference:
            staged = staging_mod.stage_pairs_sorted(
                sst, packed, rect_min, rect_max, p.radii, p.depths
            )
            starts = staged.tile_start
        elif train_staging == "sorted":
            # Round-5 training fast path: raw sorted-order records, no
            # aligned relayout; backward = boundary-carry kernel
            # (bit-identical gradients to the aligned path).
            staged = staging_mod.stage_pairs_train(
                sst, packed, rect_min, rect_max, p.radii, p.depths
            )
            starts = staged.tile_start
            sorted_mode = True
        else:
            staged = staging_mod.stage_pairs(
                sst, packed, rect_min, rect_max, p.radii, p.depths
            )
            starts = staged.aligned_start
        out = rasterize_pallas.rasterize_staged(
            staged.records_cm,
            starts,
            staged.tile_count,
            image_width,
            image_height,
            cfg.tile_w,
            cfg.tile_h,
            chunk_size=cfg.chunk_size,
            alpha_clamp=cfg.alpha_clamp,
            transmittance_eps=cfg.transmittance_eps,
            undo_denom_floor=cfg.undo_denom_floor,
            interpret=backend == "pallas_interpret",
            sorted_mode=sorted_mode,
        )
        color = rasterize_ref.apply_background(
            out.color, out.alpha, white_background
        )
        out = RenderOutputs(
            color=color, depth=out.depth, alpha=out.alpha,
            n_contrib=out.n_contrib,
        )
        aux = RenderAux(
            radii=p.radii,
            num_pairs=staged.num_pairs,
            overflow_gaussians=staged.overflow_gaussians,
            overflow_pairs=staged.overflow_pairs,
            means2d=p.means2d,
            tile_depth_mean=jnp.mean(staged.tile_count.astype(jnp.float32)),
            tile_depth_max=jnp.max(staged.tile_count),
        )
        return out, aux

    b = binning_mod.bin_gaussians(
        rect_min,
        rect_max,
        p.radii,
        p.depths,
        image_width,
        image_height,
        cfg.tile_w,
        cfg.tile_h,
        cfg.max_pairs,
    )

    if backend == "reference":
        out = rasterize_ref.rasterize_reference(
            packed,
            b.sorted_gauss_idx,
            b.sorted_tile_id,
            image_width,
            image_height,
            cfg.tile_w,
            cfg.tile_h,
            alpha_clamp=cfg.alpha_clamp,
            transmittance_eps=cfg.transmittance_eps,
        )
    elif backend in ("pallas", "pallas_interpret"):
        out = rasterize_pallas.rasterize_pallas(
            packed,
            b.sorted_gauss_idx,
            b.pair_valid,
            b.tile_start,
            b.tile_count,
            image_width,
            image_height,
            cfg.tile_w,
            cfg.tile_h,
            chunk_size=cfg.chunk_size,
            alpha_clamp=cfg.alpha_clamp,
            transmittance_eps=cfg.transmittance_eps,
            undo_denom_floor=cfg.undo_denom_floor,
            grad_reduce=cfg.grad_reduce,
            interpret=backend == "pallas_interpret",
        )
    else:
        raise ValueError(f"unknown rasterizer backend {backend!r}")

    color = rasterize_ref.apply_background(out.color, out.alpha, white_background)
    out = RenderOutputs(
        color=color, depth=out.depth, alpha=out.alpha, n_contrib=out.n_contrib
    )
    aux = RenderAux(
        radii=p.radii,
        num_pairs=b.num_pairs,
        overflow_gaussians=b.overflow_gaussians,
        overflow_pairs=b.overflow_pairs,
        means2d=p.means2d,
        tile_depth_mean=jnp.mean(b.tile_count.astype(jnp.float32)),
        tile_depth_max=jnp.max(b.tile_count),
    )
    return out, aux


def render_many(
    means3d: jax.Array,
    shs: jax.Array,
    opacity: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    views: jax.Array,  # [B, 4, 4]
    projs: jax.Array,  # [B, 4, 4]
    camera_centers: jax.Array,  # [B, 3]
    fov_xs: jax.Array,  # [B]
    fov_ys: jax.Array,  # [B]
    focal_xs: jax.Array,  # [B]
    focal_ys: jax.Array,  # [B]
    image_width: int,
    image_height: int,
    sh_degree: int,
    raster_cfg: RasterizerConfig = RasterizerConfig(),
    white_background: bool = False,
    backend: str | None = None,
    inference: bool = True,
):
    """Render a BATCH of cameras of one model in a single traced graph.

    `lax.map` over the stacked camera tensors: the render body compiles once
    and runs sequentially on-device, so a frame sequence (orbit video,
    multi-view eval, a serving request for N poses) costs ONE dispatch
    instead of B — on a tunneled backend each dispatch pays a host RPC
    round-trip (~80 ms measured on this environment's v5e tunnel, which is
    how the round-4 "8 fps" misread happened; docs/DESIGN.md round-5).  The
    reference viewer's frame loop never leaves the GPU
    (Metal/MetalGaussianRenderer.swift:262-299); this is the jit-side
    counterpart.  Defaults to the inference fast path.

    Returns (colors [B,H,W,3], depths [B,H,W], num_pairs [B],
    overflow_pairs [B]).
    """

    def body(cam):
        view, proj, center, fx, fy, fovx, fovy = cam
        out, aux = render(
            means3d, shs, opacity, scales, rotations,
            view, proj, center, fovx, fovy, fx, fy,
            image_width, image_height, sh_degree,
            raster_cfg=raster_cfg,
            white_background=white_background,
            backend=backend,
            inference=inference,
        )
        return out.color, out.depth, aux.num_pairs, aux.overflow_pairs

    return jax.lax.map(
        body,
        (views, projs, camera_centers, focal_xs, focal_ys, fov_xs, fov_ys),
    )
