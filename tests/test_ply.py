"""Gaussian PLY format: byte-level header layout + roundtrip
(PlyWriter.swift:45-67 compatibility)."""

import numpy as np

from gaussiansplattingmlx_tpu.data import ply


def test_header_format(tmp_path, rng):
    n, m = 5, 8
    path = tmp_path / "g.ply"
    ply.write_gaussian_ply(
        path,
        rng.normal(size=(n, 3)),
        rng.normal(size=(n, 1, 3)),
        rng.normal(size=(n, m, 3)),
        rng.normal(size=(n, 1)),
        rng.normal(size=(n, 3)),
        rng.normal(size=(n, 4)),
    )
    raw = path.read_bytes()
    header = raw[: raw.index(b"end_header\n")].decode()
    lines = header.splitlines()
    assert lines[0] == "ply"
    assert lines[1] == "format binary_little_endian 1.0"
    assert lines[2] == f"comment features_rest_shape {m} 3"
    assert lines[3] == f"element vertex {n}"
    props = [l.split()[-1] for l in lines if l.startswith("property")]
    assert props[:6] == ["x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2"]
    assert props[6] == "f_rest_0"
    assert props[6 + 3 * m :] == [
        "opacity", "scale_0", "scale_1", "scale_2",
        "rot_0", "rot_1", "rot_2", "rot_3",
    ]
    body = raw[raw.index(b"end_header\n") + len(b"end_header\n") :]
    assert len(body) == n * (3 + 3 + 3 * m + 1 + 3 + 4) * 4


def test_roundtrip(tmp_path, rng):
    n, m = 17, 24  # sh degree 4 -> 24 rest coeffs
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    rest = rng.normal(size=(n, m, 3)).astype(np.float32)
    op = rng.normal(size=(n, 1)).astype(np.float32)
    sc = rng.normal(size=(n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    path = tmp_path / "g.ply"
    ply.write_gaussian_ply(path, xyz, dc, rest, op, sc, rot)
    back = ply.read_gaussian_ply(path)
    np.testing.assert_array_equal(back.xyz, xyz)
    np.testing.assert_array_equal(back.features_dc, dc)
    np.testing.assert_array_equal(back.features_rest, rest)
    np.testing.assert_array_equal(back.opacity, op)
    np.testing.assert_array_equal(back.scales, sc)
    np.testing.assert_array_equal(back.rotation, rot)


def test_generic_point_cloud_ascii(tmp_path):
    text = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
end_header
0 0 0 255 0 0
1 0 0 0 255 0
0 1 0 0 0 255
"""
    p = tmp_path / "pc.ply"
    p.write_text(text)
    pts, cols = ply.read_point_cloud_ply(p)
    assert pts.shape == (3, 3)
    np.testing.assert_allclose(cols[0], [1, 0, 0])
    np.testing.assert_allclose(pts[1], [1, 0, 0])


def test_generic_point_cloud_binary(tmp_path, rng):
    n = 10
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    rec["red"], rec["green"], rec["blue"] = cols[:, 0], cols[:, 1], cols[:, 2]
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex %d\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n" % n
    )
    p = tmp_path / "pc.ply"
    p.write_bytes(header.encode() + rec.tobytes())
    rpts, rcols = ply.read_point_cloud_ply(p)
    np.testing.assert_allclose(rpts, pts, rtol=1e-6)
    np.testing.assert_allclose(rcols, cols / 255.0, rtol=1e-6)
