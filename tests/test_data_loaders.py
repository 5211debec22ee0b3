"""Data loader tests against synthetic on-disk fixtures (the reference only
tests one bundled info.json; we fabricate COLMAP binaries, Blender scenes and
NerfStudio transforms)."""

import json
import struct

import numpy as np
import pytest
from PIL import Image

from gaussiansplattingmlx_tpu.data import blender, colmap, nerfstudio


def write_colmap_fixture(root, rng, n_images=3, n_points=50, w=32, h=24):
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    img_dir = root / "images"
    img_dir.mkdir()

    # cameras.bin: one PINHOLE camera.
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 1, 1))  # id, PINHOLE
        f.write(struct.pack("<QQ", w, h))
        f.write(struct.pack("<dddd", 30.0, 31.0, w / 2, h / 2))

    # images.bin
    poses = []
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            poses.append((q, t))
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points, skipped
            f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
            img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"img_{i}.png")

    # points3D.bin
    xyz = rng.normal(size=(n_points, 3))
    rgb = rng.integers(0, 256, size=(n_points, 3))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for i in range(n_points):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return poses, xyz, rgb


def test_colmap_loader(tmp_path, rng):
    poses, xyz, rgb = write_colmap_fixture(tmp_path, rng)
    data, pcd = colmap.load_colmap(tmp_path)
    assert data.num_views == 3
    assert data.images.shape == (3, 24, 32, 3)
    assert pcd.size == 50
    np.testing.assert_allclose(pcd.coords, xyz, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pcd.colors, rgb)
    # Pose convention: c2w = [R^T | -R^T t] from the stored w2c quaternion.
    q, t = poses[0]
    w_, x_, y_, z_ = q
    R = colmap._quat_to_rot(w_, x_, y_, z_)
    expected_center = -R.T @ t
    np.testing.assert_allclose(
        data.cameras[0].camera_center, expected_center, rtol=1e-5, atol=1e-5
    )
    assert data.cameras[0].focal_x == pytest.approx(30.0)
    assert data.cameras[0].focal_y == pytest.approx(31.0)


def test_colmap_resize(tmp_path, rng):
    write_colmap_fixture(tmp_path, rng)
    data, _ = colmap.load_colmap(tmp_path, resize_factor=0.5)
    assert data.images.shape[1:3] == (12, 16)
    assert data.cameras[0].focal_x == pytest.approx(15.0)


def write_blender_fixture(root, rng, n_images=2, w=16, h=12):
    root.mkdir(exist_ok=True)
    images = []
    for i in range(n_images):
        rgb = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        depth = (rng.uniform(size=(h, w)) * 255).astype(np.uint8)
        alpha = np.full((h, w), 255, np.uint8)
        Image.fromarray(rgb).save(root / f"r_{i}.png")
        Image.fromarray(depth, mode="L").save(root / f"r_{i}_depth.png")
        Image.fromarray(alpha, mode="L").save(root / f"r_{i}_alpha.png")
        pose = np.eye(4)
        pose[:3, 3] = rng.normal(size=3)
        images.append(
            {
                "intrinsic": [[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                "pose": pose.tolist(),
                "rgb": f"r_{i}.png",
                "depth": f"r_{i}_depth.png",
                "alpha": f"r_{i}_alpha.png",
                "max_depth": 5.0,
                "HW": [h, w],
            }
        )
    info = {
        "backend": "test", "light_mode": "none", "fast_mode": False,
        "format_version": 1, "channels": ["rgb"], "scale": 1.0,
        "images": images, "bbox": [[-1, -1, -1], [1, 1, 1]],
    }
    (root / "info.json").write_text(json.dumps(info))


def test_blender_loader(tmp_path, rng):
    write_blender_fixture(tmp_path, rng)
    data, pcd = blender.load_blender(tmp_path)
    assert data.num_views == 2
    assert data.has_depth()
    assert data.depths.max() <= 5.0 + 1e-6
    # alpha==1 everywhere -> every pixel back-projects into the cloud.
    assert pcd.size == 2 * 12 * 16
    # OpenGL->OpenCV flip: identity rotation becomes diag(1,-1,-1).
    c2w = data.cameras[0].c2w
    np.testing.assert_allclose(np.asarray(c2w)[:3, 1], [0, -1, 0], atol=1e-6)


def test_nerfstudio_loader(tmp_path, rng):
    w, h = 20, 16
    frames = []
    for i in range(2):
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"frame_{i}.png")
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, float(i)]
        frames.append(
            {"file_path": f"frame_{i}.png", "transform_matrix": pose.tolist()}
        )
    meta = {
        "fl_x": 25.0, "fl_y": 26.0, "cx": w / 2, "cy": h / 2,
        "w": w, "h": h, "frames": frames,
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    data, pcd = nerfstudio.load_nerfstudio(tmp_path, init_points_fallback=500)
    assert data.num_views == 2
    assert data.cameras[0].focal_x == pytest.approx(25.0)
    assert pcd.size == 500
    np.testing.assert_allclose(
        data.cameras[1].camera_center, [0, 0, 1.0], atol=1e-6
    )


def test_nerfstudio_ply_init(tmp_path, rng):
    from gaussiansplattingmlx_tpu.data import ply as ply_mod

    w, h = 8, 8
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "f.png")
    meta = {
        "fl_x": 10.0, "fl_y": 10.0, "cx": 4, "cy": 4, "w": w, "h": h,
        "ply_file_path": "init.ply",
        "frames": [{"file_path": "f.png", "transform_matrix": np.eye(4).tolist()}],
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    rec = np.zeros(30, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
    rec["x"], rec["y"], rec["z"] = pts.T
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 30\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    (tmp_path / "init.ply").write_bytes(header.encode() + rec.tobytes())
    data, pcd = nerfstudio.load_nerfstudio(tmp_path)
    assert pcd.size == 30
    np.testing.assert_allclose(pcd.coords, pts, rtol=1e-6)


def test_native_parser_matches_python(tmp_path, rng):
    """C++ COLMAP parsers (native/gsplat_io.cpp) agree with the pure-Python
    reference parsers on the same fixture."""
    from gaussiansplattingmlx_tpu.data import native_io

    if native_io.library() is None:
        import pytest

        pytest.skip("native library not built")
    write_colmap_fixture(tmp_path, rng)
    sparse = tmp_path / "sparse" / "0"

    cams_n = native_io.parse_cameras((sparse / "cameras.bin").read_bytes())
    assert cams_n[1]["fx"] == 30.0 and cams_n[1]["fy"] == 31.0

    imgs_n = native_io.parse_images((sparse / "images.bin").read_bytes())
    assert len(imgs_n) == 3
    assert imgs_n[0]["name"] == "img_0.png"

    pts_n = native_io.parse_points3d((sparse / "points3D.bin").read_bytes())
    assert pts_n[0].shape == (50, 3)

    # And the high-level loader (which now uses the native path) still works.
    data, pcd = colmap.load_colmap(tmp_path)
    assert data.num_views == 3 and pcd.size == 50


# ---------------------------------------------------------------------------
# Demo fetchers (data/fetch.py) — offline: network is monkeypatched out.
# ---------------------------------------------------------------------------


def _zip_bytes(entries):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, payload in entries.items():
            zf.writestr(name, payload)
    return buf.getvalue()


def test_fetch_skip_if_present(tmp_path, monkeypatch):
    """Probe files short-circuit the download exactly like the reference
    (ColmapDataLoader.swift:546-550, BlenderDataLoader.swift:310-313)."""
    from gaussiansplattingmlx_tpu.data import fetch

    def boom(url, timeout):
        raise AssertionError("network touched despite probe file")

    monkeypatch.setattr(fetch, "_download_zip", boom)
    probe = tmp_path / "sparse" / "0" / "cameras.bin"
    probe.parent.mkdir(parents=True)
    probe.write_bytes(b"")
    assert fetch.fetch_lego_colmap(tmp_path) == tmp_path

    (tmp_path / "info.json").write_text("{}")
    assert fetch.fetch_chair_blender(tmp_path) == tmp_path


def test_fetch_extracts_zip(tmp_path, monkeypatch):
    from gaussiansplattingmlx_tpu.data import fetch

    payload = _zip_bytes({"sparse/0/cameras.bin": b"demo", "images/a.png": b"x"})
    urls = []
    monkeypatch.setattr(
        fetch, "_download_zip", lambda url, timeout: urls.append(url) or payload
    )
    root = fetch.fetch_lego_colmap(tmp_path / "lego")
    assert urls == [fetch.LEGO_COLMAP_URL]
    assert (root / "sparse" / "0" / "cameras.bin").read_bytes() == b"demo"
    # Second call: probe file now present, no new download.
    fetch.fetch_lego_colmap(root)
    assert len(urls) == 1


def test_fetch_rejects_path_traversal(tmp_path, monkeypatch):
    import pytest

    from gaussiansplattingmlx_tpu.data import fetch

    evil = _zip_bytes({"../escape.txt": b"nope"})
    monkeypatch.setattr(fetch, "_download_zip", lambda url, timeout: evil)
    with pytest.raises(fetch.FetchError, match="escapes"):
        fetch.fetch_chair_blender(tmp_path / "chair")


def test_fetch_no_network_error_message(tmp_path):
    """Without network the fetcher fails fast with a pointed message (no
    hang): unroutable address + tiny timeout."""
    import pytest

    from gaussiansplattingmlx_tpu.data import fetch

    with pytest.raises(fetch.FetchError, match="could not download"):
        fetch._download_zip("http://10.255.255.1/nope.zip", timeout=0.2)
