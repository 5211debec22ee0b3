"""Multi-device tests on the 8-virtual-CPU mesh: DP gradient equivalence,
band-render parity, and the combined data x tile mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingmlx_tpu.config import (
    DensifyConfig, ModelConfig, RasterizerConfig, TrainConfig,
)
from gaussiansplattingmlx_tpu.data.dataset import TrainData
from gaussiansplattingmlx_tpu.models import gaussians
from gaussiansplattingmlx_tpu.parallel import sharding
from gaussiansplattingmlx_tpu.render import render
from gaussiansplattingmlx_tpu.train import optimizer as adam
from gaussiansplattingmlx_tpu.train.trainer import (
    TrainState, make_train_step, stack_views,
)
from gaussiansplattingmlx_tpu.utils.point_cloud import PointCloud

from test_train_smoke import RASTER, W, H, orbit_cameras, synth_scene


def build_state(pts, cols, capacity=64):
    params, n = gaussians.create_from_points(
        pts, cols, sh_degree=0, capacity=capacity
    )
    return TrainState(
        params=params,
        opt=adam.init(params),
        num_active=jnp.int32(n),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        grad_denom=jnp.float32(0.0),
        step=jnp.int32(0),
    )


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    pts, cols, params = synth_scene(rng)
    cams = orbit_cameras(8)
    images = []
    for c in cams:
        means, shs, opacity, scales, rots = gaussians.activations(params)
        t = c.tensors()
        out, _ = render(
            means, shs, opacity, scales, rots,
            jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
            jnp.asarray(t["camera_center"]),
            t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
            W, H, 0, raster_cfg=RASTER, backend="reference",
        )
        images.append(np.asarray(out.color))
    return pts, cols, cams, np.stack(images).astype(np.float32)


def make_cfg():
    return TrainConfig(
        iterations=10, init_points=60, log_interval=1,
        snapshot_interval=10**9, checkpoint_interval=0, output_dir="",
        model=ModelConfig(sh_degree=0, initial_capacity=64),
        raster=RASTER, densify=DensifyConfig(from_iter=10**9),
    )


def test_band_render_matches_full(scene):
    """A 2-band split of one view must reproduce the full image rows."""
    pts, cols, cams, images = scene
    state = build_state(pts, cols)
    means, shs, opacity, scales, rots = gaussians.activations(
        state.params, gaussians.active_mask(state.params, state.num_active)
    )
    t = cams[0].tensors()
    args = (
        means, shs, opacity, scales, rots,
        jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
        jnp.asarray(t["camera_center"]),
        t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
    )
    full, _ = render(*args, W, H, 0, raster_cfg=RASTER, backend="reference")
    band_h = 16  # multiple of tile_h -> band tiling == full tiling, exact
    for b in range(H // band_h):
        band, _ = render(
            *args, W, band_h, 0, raster_cfg=RASTER, backend="reference",
            pixel_y_offset=jnp.float32(b * band_h), full_image_height=H,
        )
        np.testing.assert_allclose(
            np.asarray(band.color),
            np.asarray(full.color[b * band_h : (b + 1) * band_h]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(band.alpha),
            np.asarray(full.alpha[b * band_h : (b + 1) * band_h]),
            rtol=1e-4, atol=1e-5,
        )


def test_dp_matches_mean_of_single_steps(scene):
    """8-way DP step == single-device step on the averaged gradient."""
    pts, cols, cams, images = scene
    data = TrainData(cameras=cams, images=images)
    cfg = make_cfg()
    views = stack_views(data)

    mesh = sharding.make_mesh(data_parallel=8, tile_parallel=1)
    dp_step = sharding.make_dp_train_step(cfg, W, H, 0, cfg.iterations, mesh)
    state = sharding.replicate_state(build_state(pts, cols), mesh)
    batch = sharding.shard_view_batch(views, mesh)
    new_state, metrics = dp_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # Manual average of 8 single-view grads -> same params after one Adam step.
    single = build_state(pts, cols)
    active = gaussians.active_mask(single.params, single.num_active)

    @jax.jit
    def grad_one(ptuple, i):
        def loss_fn(ptuple):
            params = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(params, active)
            out, _ = render(
                means, shs, opacity, scales, rots,
                views["view"][i], views["proj"][i], views["camera_center"][i],
                views["fov_x"][i], views["fov_y"][i],
                views["focal_x"][i], views["focal_y"][i],
                W, H, 0, raster_cfg=RASTER, backend="reference",
            )
            from gaussiansplattingmlx_tpu.ops import losses as L

            loss, _ = L.total_loss(
                out.color, views["target_rgb"][i], out.depth,
                views["target_depth"][i], views["depth_mask"][i],
            )
            return loss

        return jax.value_and_grad(loss_fn)(ptuple)

    grads_sum = None
    losses = []
    for i in range(8):
        l, g = grad_one(single.params.as_tuple(), jnp.int32(i))
        losses.append(float(l))
        g = jax.tree.map(lambda x: x / 8.0, g)
        grads_sum = g if grads_sum is None else jax.tree.map(jnp.add, grads_sum, g)

    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses), rtol=1e-5)
    grads = gaussians.GaussianParams.from_tuple(grads_sum)
    lrs = gaussians.learning_rates(0, cfg.iterations)
    lr_tree = gaussians.GaussianParams(
        xyz=lrs["xyz"], features_dc=lrs["features_dc"],
        features_rest=lrs["features_rest"], scales=lrs["scales"],
        rotation=lrs["rotation"], opacity=lrs["opacity"],
    )
    expect_params, _ = adam.update(single.params, grads, single.opt, lr_tree)
    np.testing.assert_allclose(
        np.asarray(new_state.params.xyz), np.asarray(expect_params.xyz),
        rtol=1e-4, atol=1e-6,
    )


def test_data_x_tile_mesh(scene):
    """4 cameras x 2 pixel bands on the 8-device mesh runs and is finite."""
    pts, cols, cams, images = scene
    data = TrainData(cameras=cams[:4], images=images[:4])
    cfg = make_cfg()
    views = stack_views(data)
    mesh = sharding.make_mesh(data_parallel=4, tile_parallel=2)
    dp_step = sharding.make_dp_train_step(cfg, W, H, 0, cfg.iterations, mesh)
    state = sharding.replicate_state(build_state(pts, cols), mesh)
    batch = sharding.shard_view_batch(views, mesh)
    new_state, metrics = dp_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(new_state.params.xyz)).all()
