"""Projection op tests against independent numpy recomputation and geometric
invariants (reference math: slang/gaussian_projection_screen_shared.slang)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.ops import projection
from gaussiansplattingmlx_tpu.utils import camera as cam


def make_camera(width=64, height=48, focal=60.0, z=0.0):
    c2w = np.eye(4)
    c2w[2, 3] = z
    return cam.Camera.from_c2w(width, height, focal, focal, c2w)


def project(c, means, scales, quats, shs, degree=0):
    t = c.tensors()
    return projection.project_gaussians(
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(shs),
        jnp.asarray(t["view"]),
        jnp.asarray(t["proj"]),
        jnp.asarray(t["camera_center"]),
        t["fov_x"],
        t["fov_y"],
        t["focal_x"],
        t["focal_y"],
        c.width,
        c.height,
        degree,
    )


def default_gaussians(n, rng, z_range=(2.0, 6.0)):
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    means[:, 2] = rng.uniform(*z_range, size=n)
    scales = rng.uniform(0.05, 0.2, size=(n, 3)).astype(np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32)
    return means, scales, quats, shs


def test_center_point_projects_to_image_center(rng):
    c = make_camera()
    means = np.array([[0.0, 0.0, 4.0]], np.float32)
    scales = np.full((1, 3), 0.1, np.float32)
    quats = np.array([[1.0, 0, 0, 0]], np.float32)
    shs = np.zeros((1, 1, 3), np.float32)
    out = project(c, means, scales, quats, shs)
    np.testing.assert_allclose(
        np.asarray(out.means2d[0]), [(c.width - 1) / 2, (c.height - 1) / 2], atol=1e-3
    )
    assert float(out.depths[0]) == 4.0
    assert float(out.radii[0]) > 0
    # Zero SH -> color 0.5 everywhere.
    np.testing.assert_allclose(np.asarray(out.colors[0]), 0.5, atol=1e-6)


def test_behind_camera_culled(rng):
    c = make_camera()
    means = np.array([[0.0, 0.0, -3.0], [0.0, 0.0, 0.1], [0.0, 0.0, 3.0]], np.float32)
    scales = np.full((3, 3), 0.1, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (3, 1))
    shs = np.zeros((3, 1, 3), np.float32)
    out = project(c, means, scales, quats, shs)
    radii = np.asarray(out.radii)
    assert radii[0] == 0.0  # behind
    assert radii[1] == 0.0  # closer than z_cull=0.2
    assert radii[2] > 0.0


def test_isotropic_gaussian_radius_scales_with_size():
    c = make_camera()
    quats = np.array([[1.0, 0, 0, 0]], np.float32)
    shs = np.zeros((1, 1, 3), np.float32)
    means = np.array([[0.0, 0.0, 4.0]], np.float32)
    r_small = float(
        project(c, means, np.full((1, 3), 0.05, np.float32), quats, shs).radii[0]
    )
    r_big = float(
        project(c, means, np.full((1, 3), 0.5, np.float32), quats, shs).radii[0]
    )
    assert r_big > r_small
    # Isotropic world sigma s at depth z -> pixel sigma ~ focal*s/z; radius
    # = 3*ceil(sqrt(sigma_px^2 + 0.3)).
    sigma_px2 = (60.0 * 0.5 / 4.0) ** 2 + 0.3
    assert r_big == 3.0 * np.ceil(np.sqrt(sigma_px2))


def test_conic_is_inverse_cov2d(rng):
    c = make_camera()
    means, scales, quats, shs = default_gaussians(32, rng)
    out = project(c, means, scales, quats, shs)
    cov = np.asarray(out.cov2d).reshape(-1, 2, 2)
    conic = np.asarray(out.conic).reshape(-1, 2, 2)
    prod = cov @ conic
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(2), prod.shape), atol=1e-3)


def test_rect_clamped_to_image(rng):
    c = make_camera()
    means, scales, quats, shs = default_gaussians(64, rng)
    out = project(c, means, scales, quats, shs)
    rmin = np.asarray(out.rect_min)
    rmax = np.asarray(out.rect_max)
    assert (rmin >= 0).all()
    assert (rmax[:, 0] <= c.width - 1).all()
    assert (rmax[:, 1] <= c.height - 1).all()


def test_projection_gradients_finite(rng):
    c = make_camera()
    means, scales, quats, shs = default_gaussians(8, rng)
    t = c.tensors()

    def f(means, scales, quats, shs):
        out = projection.project_gaussians(
            means,
            scales,
            quats,
            shs,
            jnp.asarray(t["view"]),
            jnp.asarray(t["proj"]),
            jnp.asarray(t["camera_center"]),
            t["fov_x"],
            t["fov_y"],
            t["focal_x"],
            t["focal_y"],
            c.width,
            c.height,
            0,
        )
        return (
            jnp.sum(out.means2d)
            + jnp.sum(out.colors)
            + jnp.sum(out.conic)
            + jnp.sum(out.depths)
        )

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(shs)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # radii/rects are stop-grad: a function of only those has zero gradient.
    g0 = jax.grad(
        lambda m: jnp.sum(
            projection.project_gaussians(
                m,
                jnp.asarray(scales),
                jnp.asarray(quats),
                jnp.asarray(shs),
                jnp.asarray(t["view"]),
                jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"],
                t["fov_y"],
                t["focal_x"],
                t["focal_y"],
                c.width,
                c.height,
                0,
            ).radii
        )
    )(jnp.asarray(means))
    np.testing.assert_allclose(np.asarray(g0), 0.0)


def test_numpy_cross_check_full_pipeline(rng):
    """Independent numpy re-derivation of one Gaussian's projection."""
    c = make_camera(width=100, height=80, focal=90.0)
    mean = np.array([0.4, -0.2, 3.0], np.float32)
    scale = np.array([0.1, 0.15, 0.2], np.float32)
    quat = np.array([0.9, 0.1, -0.2, 0.3], np.float32)
    sh0 = np.array([[0.2, -0.1, 0.4]], np.float32)
    out = project(c, mean[None], scale[None], quat[None], sh0[None])

    # NDC via float64 matrices.
    w2c = np.linalg.inv(np.asarray(c.c2w, np.float64))
    pv = w2c[:3, :3] @ mean + w2c[:3, 3]
    P = cam.perspective_matrix(0.1, 100.0, c.fov_x, c.fov_y)
    clip = P @ np.append(pv, 1.0)
    ndc = clip / (clip[3] + 1e-6)
    px = ((ndc[0] + 1) * 100 - 1) / 2
    py = ((ndc[1] + 1) * 80 - 1) / 2
    np.testing.assert_allclose(np.asarray(out.means2d[0]), [px, py], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(out.depths[0]), pv[2], rtol=1e-6)

    # cov2d with the reference's t-clamp formulation.
    q = quat / np.linalg.norm(quat)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    L = R * scale[None, :]
    cov3d = L @ L.T
    tan_x = np.tan(c.fov_x / 2)
    tan_y = np.tan(c.fov_y / 2)
    t = pv
    clip_x = np.clip(t[2], -1.3 * tan_x, 1.3 * tan_x)
    clip_y = np.clip(t[2], -1.3 * tan_y, 1.3 * tan_y)
    tx, ty, tz = t[0] / clip_x * t[2], t[1] / clip_y * t[2], t[2]
    J = np.array(
        [[90.0 / tz, 0, -tx * 90.0 / tz**2], [0, 90.0 / tz, -ty * 90.0 / tz**2]]
    )
    Wm = w2c[:3, :3]
    B = J @ Wm
    cov2d = B @ cov3d @ B.T + 0.3 * np.eye(2)
    got = np.asarray(out.cov2d[0])
    np.testing.assert_allclose(
        got, [cov2d[0, 0], cov2d[0, 1], cov2d[1, 0], cov2d[1, 1]], rtol=1e-3, atol=1e-4
    )


def test_degenerate_gaussians_have_finite_gradients(rng):
    """Gaussians at or behind the camera plane are culled AND must not poison
    their own parameter gradients with 0 * inf = NaN (this killed training on
    depth-backprojected clouds containing near-camera points)."""
    c = make_camera()
    cam_pos = np.asarray(c.camera_center)
    means = np.array(
        [
            cam_pos,                       # exactly at the camera center
            cam_pos + [0.0, 0.0, 1e-8],    # epsilon in front
            cam_pos + [0.0, 0.0, -2.0],    # behind
            [0.0, 0.0, 4.0],               # normal visible gaussian
        ],
        np.float32,
    )
    scales = np.full((4, 3), 0.1, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (4, 1))
    shs = rng.normal(size=(4, 1, 3)).astype(np.float32)
    t = c.tensors()

    def f(means, scales, quats, shs):
        out = projection.project_gaussians(
            means, scales, quats, shs,
            jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
            jnp.asarray(t["camera_center"]),
            t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
            c.width, c.height, 0,
        )
        # Weight differentiable outputs by visibility, as rendering does.
        w = (out.radii > 0).astype(jnp.float32)
        return jnp.sum(
            (jnp.sum(out.means2d, 1) + jnp.sum(out.conic, 1) + jnp.sum(out.colors, 1))
            * w
        )

    out = projection.project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(shs),
        jnp.asarray(t["view"]), jnp.asarray(t["proj"]), jnp.asarray(t["camera_center"]),
        t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"], c.width, c.height, 0,
    )
    np.testing.assert_array_equal(np.asarray(out.radii[:3]), 0.0)
    assert float(out.radii[3]) > 0

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(shs)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all(), g
