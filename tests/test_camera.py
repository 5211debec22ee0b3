"""Camera math: conventions checked against hand-derived ground truth
(reference: Trainer/CameraUtil.swift)."""

import math

import numpy as np

from gaussiansplattingmlx_tpu.utils import camera as cam


def test_fov_focal_roundtrip():
    focal = 1111.0
    pixels = 800.0
    fov = cam.focal2fov(focal, pixels)
    assert math.isclose(cam.fov2focal(fov, pixels), focal, rel_tol=1e-12)


def test_perspective_matrix_structure():
    P = cam.perspective_matrix(0.1, 100.0, math.radians(60), math.radians(45))
    # Column-vector convention: clip.w picks view z.
    assert P[3, 2] == 1.0
    assert P[3, 3] == 0.0
    # znear maps to depth 0, zfar to 1.
    for z, expected in [(0.1, 0.0), (100.0, 1.0)]:
        clip = P @ np.array([0.0, 0.0, z, 1.0])
        assert math.isclose(clip[2] / clip[3], expected, abs_tol=1e-12)


def test_identity_camera_center_and_view():
    c2w = np.eye(4)
    c = cam.Camera.from_c2w(640, 480, 500.0, 500.0, c2w)
    np.testing.assert_allclose(c.camera_center, np.zeros(3), atol=0)
    # Row-vector: p_view = p @ world_view must equal w2c @ p.
    p = np.array([1.0, 2.0, 3.0, 1.0], dtype=np.float32)
    np.testing.assert_allclose(p @ c.world_view, p, atol=1e-6)


def test_camera_view_matches_w2c():
    rng = np.random.default_rng(3)
    # Random rigid transform.
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    t = rng.normal(size=3)
    c2w = np.eye(4)
    c2w[:3, :3] = R
    c2w[:3, 3] = t
    c = cam.Camera.from_c2w(800, 600, 700.0, 710.0, c2w)
    w2c = np.linalg.inv(c2w)
    pw = rng.normal(size=3)
    p_view_expected = w2c[:3, :3] @ pw + w2c[:3, 3]
    p_view = np.append(pw, 1.0).astype(np.float32) @ c.world_view
    np.testing.assert_allclose(p_view[:3], p_view_expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c.camera_center, t, rtol=1e-6, atol=1e-6)


def test_projection_of_centered_point():
    # A point on the optical axis projects to the image center in NDC.
    c2w = np.eye(4)
    c = cam.Camera.from_c2w(100, 100, 50.0, 50.0, c2w)
    p = np.array([0.0, 0.0, 5.0, 1.0], dtype=np.float32)
    clip = (p @ c.world_view) @ c.proj
    ndc = clip / clip[3]
    assert abs(ndc[0]) < 1e-6 and abs(ndc[1]) < 1e-6
    # Pixel mapping ((ndc+1)*size-1)/2 puts it at (W-1)/2.
    px = ((ndc[0] + 1) * 100 - 1) / 2
    assert math.isclose(px, 49.5, abs_tol=1e-5)


def test_opengl_to_opencv_roundtrip_properties():
    rng = np.random.default_rng(1)
    c2w = np.eye(4)
    c2w[:3, 3] = rng.normal(size=3)
    converted = cam.opengl_to_opencv_c2w(c2w)
    # Identity rotation: OpenGL -> OpenCV flips y and z axes of the rotation.
    np.testing.assert_allclose(converted[:3, 0], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(converted[:3, 1], [0, -1, 0], atol=1e-12)
    np.testing.assert_allclose(converted[:3, 2], [0, 0, -1], atol=1e-12)
    # Camera position is unchanged by the axis flip.
    np.testing.assert_allclose(converted[:3, 3], c2w[:3, 3], atol=1e-12)
