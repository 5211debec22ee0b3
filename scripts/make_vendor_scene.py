"""Generate the vendored COLMAP test scene (tests/fixtures/vendor_scene).

The reference bootstraps a real photographic demo scene at runtime
(Data/ColmapDataLoader.swift:545-565); this environment has no network, so
the checked-in equivalent is a small multi-view scene whose images come from
an INDEPENDENT renderer — a vectorized numpy ray tracer (plane + spheres +
box, checker texture, Lambertian + specular shading) — so training/eval runs
against photo-like imagery that this framework's own gaussian renderer never
produced.  Output is genuine COLMAP binary format (cameras.bin PINHOLE,
images.bin with w2c quaternions, points3D.bin sparse surface samples), the
exact on-disk layout ColmapDataLoader.swift:61-200 parses.

Deterministic: re-running reproduces the fixture byte-for-byte.

    python scripts/make_vendor_scene.py [--out tests/fixtures/vendor_scene]
"""

from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

W, H = 256, 192
FOCAL = 290.0
N_VIEWS = 10
LIGHT = np.array([0.45, 0.8, -0.4])
LIGHT_DIR = LIGHT / np.linalg.norm(LIGHT)

SPHERES = [  # center, radius, base color, specular
    (np.array([0.0, 0.45, 0.0]), 0.45, np.array([0.82, 0.18, 0.12]), 0.5),
    (np.array([0.85, 0.28, 0.45]), 0.28, np.array([0.15, 0.35, 0.80]), 0.7),
    (np.array([-0.75, 0.33, -0.35]), 0.33, np.array([0.92, 0.75, 0.10]), 0.3),
]
# --rich additions (flagship campaigns): detail at several scales so the
# densifier has real work — small saturated spheres plus a ring of marbles.
RICH_SPHERES = [
    (np.array([0.35, 0.16, -0.80]), 0.16, np.array([0.20, 0.75, 0.35]), 0.6),
    (np.array([-0.45, 0.12, 0.70]), 0.12, np.array([0.85, 0.45, 0.10]), 0.4),
    (np.array([1.30, 0.18, -0.45]), 0.18, np.array([0.55, 0.15, 0.75]), 0.5),
    (np.array([-1.35, 0.22, 0.35]), 0.22, np.array([0.10, 0.60, 0.70]), 0.6),
    (np.array([0.10, 0.10, 1.20]), 0.10, np.array([0.95, 0.90, 0.20]), 0.8),
    (np.array([-0.15, 0.08, -1.25]), 0.08, np.array([0.90, 0.25, 0.55]), 0.7),
] + [
    (
        np.array([1.9 * np.cos(a), 0.07, 1.9 * np.sin(a)]),
        0.07,
        np.array([0.3 + 0.6 * ((i * 5) % 7) / 6.0,
                  0.2 + 0.7 * ((i * 3) % 5) / 4.0,
                  0.25 + 0.65 * ((i * 2) % 3) / 2.0]),
        0.5,
    )
    for i, a in enumerate(np.linspace(0, 2 * np.pi, 12, endpoint=False))
]
PLANE_Y = 0.0


def checker(x, z):
    c = ((np.floor(x * 2.5) + np.floor(z * 2.5)) % 2).astype(np.float32)
    base = np.stack([0.76 - 0.38 * c, 0.72 - 0.30 * c, 0.66 - 0.28 * c], -1)
    # low-frequency tint so the floor is not piecewise-constant
    base *= (0.9 + 0.1 * np.sin(1.7 * x + 0.9 * z))[..., None]
    return base


def trace(origins, dirs):
    """Vectorized single-bounce ray trace. origins/dirs: [..., 3]."""
    sh = dirs.shape[:-1]
    t_hit = np.full(sh, np.inf, np.float32)
    color = np.zeros(sh + (3,), np.float32)
    normal = np.zeros(sh + (3,), np.float32)
    albedo = np.zeros(sh + (3,), np.float32)
    spec = np.zeros(sh, np.float32)

    # ground plane y = PLANE_Y
    denom = dirs[..., 1]
    t_pl = np.where(np.abs(denom) > 1e-6, (PLANE_Y - origins[..., 1]) / denom, np.inf)
    t_pl = np.where(t_pl > 1e-3, t_pl, np.inf)
    px = origins[..., 0] + t_pl * dirs[..., 0]
    pz = origins[..., 2] + t_pl * dirs[..., 2]
    in_disk = px * px + pz * pz < 3.0 ** 2
    t_pl = np.where(in_disk, t_pl, np.inf)
    hit = t_pl < t_hit
    t_hit = np.where(hit, t_pl, t_hit)
    albedo = np.where(hit[..., None], checker(px, pz), albedo)
    normal = np.where(hit[..., None], np.array([0.0, 1.0, 0.0]), normal)
    spec = np.where(hit, 0.08, spec)

    for c, r, col, sp in SPHERES:
        oc = origins - c
        b = np.sum(oc * dirs, -1)
        cc = np.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        t_s = np.where(disc > 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
        t_s = np.where(t_s > 1e-3, t_s, np.inf)
        hit = t_s < t_hit
        t_hit = np.where(hit, t_s, t_hit)
        p = origins + t_s[..., None] * dirs
        n = (p - c) / r
        # banded texture on the spheres so SH has angular detail to fit
        band = 0.85 + 0.15 * np.sin(9.0 * np.arctan2(n[..., 2], n[..., 0]))
        albedo = np.where(hit[..., None], col * band[..., None], albedo)
        normal = np.where(hit[..., None], n, normal)
        spec = np.where(hit, sp, spec)

    hit_any = np.isfinite(t_hit)
    p = origins + np.where(hit_any, t_hit, 0.0)[..., None] * dirs

    # hard shadow: occlusion of the light by the spheres
    lit = np.ones(sh, np.float32)
    for c, r, _, _ in SPHERES:
        oc = p + 1e-3 * normal - c
        b = np.sum(oc * LIGHT_DIR, -1)
        cc = np.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        t_s = -b - np.sqrt(np.maximum(disc, 0))
        occ = np.logical_and(disc > 0, t_s > 1e-3)
        lit = np.where(occ, 0.25, lit)

    ndl = np.maximum(np.sum(normal * LIGHT_DIR, -1), 0.0)
    half = LIGHT_DIR - dirs
    half /= np.maximum(np.linalg.norm(half, axis=-1, keepdims=True), 1e-6)
    ndh = np.maximum(np.sum(normal * half, -1), 0.0)
    shade = 0.25 + 0.75 * ndl * lit
    color = albedo * shade[..., None] + (spec * lit * ndh ** 40)[..., None]
    sky = np.array([0.62, 0.74, 0.92]) + dirs[..., 1:2] * 0.25
    color = np.where(hit_any[..., None], color, sky)
    return np.clip(color, 0.0, 1.0), t_hit


def look_at_c2w(pos, target):
    fwd = target - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    # OpenCV basis (x right, y down, z forward): right x down = fwd.
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, pos
    return c2w


def render_view(c2w):
    i, j = np.meshgrid(np.arange(W), np.arange(H))
    x = (i + 0.5 - W / 2) / FOCAL
    y = (j + 0.5 - H / 2) / FOCAL
    d_cam = np.stack([x, y, np.ones_like(x)], -1)
    d_world = d_cam @ c2w[:3, :3].T
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d_world.shape)
    color, _ = trace(o.astype(np.float32), d_world.astype(np.float32))
    return color


def rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = np.copysign(np.sqrt(max(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2, R[2, 1] - R[1, 2])
    y = np.copysign(np.sqrt(max(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2, R[0, 2] - R[2, 0])
    z = np.copysign(np.sqrt(max(0.0, 1 - R[0, 0] - R[1, 1] + R[2, 2])) / 2, R[1, 0] - R[0, 1])
    return w, x, y, z


def sky_points(rng, n, radius=15.0):
    """Far-dome init points colored like the sky gradient.

    The ray-traced images have an opaque sky; real SfM yields no sky points,
    so 3DGS practice seeds unbounded regions with random far points (the
    INRIA trainer's random-background init).  A dome at ~6x the camera orbit
    radius gives the densifier something to grow sky coverage from."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v[:, 1] = np.abs(v[:, 1])  # upper hemisphere + horizon
    pts = v * radius
    col = np.array([0.62, 0.74, 0.92]) + v[:, 1:2] * 0.25
    return pts, np.clip(col * 255.0, 0, 255)


def surface_points(rng, n=4000):
    """SfM-like sparse cloud: noisy samples of the true surfaces w/ colors."""
    pts, cols = [], []
    n_pl = n // 3
    px = rng.uniform(-2.2, 2.2, n_pl)
    pz = rng.uniform(-2.2, 2.2, n_pl)
    pts.append(np.stack([px, np.zeros(n_pl), pz], -1))
    cols.append(checker(px, pz) * 0.8)
    rem = n - n_pl
    per = rem // len(SPHERES)
    for c, r, col, _ in SPHERES:
        v = rng.normal(size=(per, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pts.append(c + v * r)
        band = 0.85 + 0.15 * np.sin(9.0 * np.arctan2(v[:, 2], v[:, 0]))
        cols.append(col * band[:, None] * 0.8)
    pts = np.concatenate(pts).astype(np.float64)
    pts += rng.normal(scale=0.004, size=pts.shape)  # SfM noise
    cols = np.clip(np.concatenate(cols) * 255.0, 0, 255)
    return pts, cols


def write_colmap(dest: Path, c2ws, point_xyz, point_rgb):
    sparse = dest / "sparse" / "0"
    sparse.mkdir(parents=True, exist_ok=True)
    # cameras.bin — one shared PINHOLE (model 1) camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 1, 1))
        f.write(struct.pack("<QQ", W, H))
        f.write(struct.pack("<dddd", FOCAL, FOCAL, W / 2, H / 2))
    # images.bin — w2c quaternion + translation per view
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(c2ws)))
        for i, c2w in enumerate(c2ws):
            Rw2c = c2w[:3, :3].T
            t = -Rw2c @ c2w[:3, 3]
            qw, qx, qy, qz = rot_to_quat(Rw2c)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", qw, qx, qy, qz))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"frame_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points
    # points3D.bin
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", len(point_xyz)))
        for pid, (p, c) in enumerate(zip(point_xyz, point_rgb)):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", *p))
            f.write(struct.pack("<BBB", *(int(v) for v in c)))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))  # empty track


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/vendor_scene")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--focal", type=float, default=None,
                    help="default scales the fixture's 290px with width/256")
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--points", type=int, default=4000,
                    help="SfM-like sparse cloud size")
    ap.add_argument("--rich", action="store_true",
                    help="add extra primitives (flagship campaigns: detail "
                         "the densifier must resolve); the default fixture "
                         "stays byte-identical without it")
    ap.add_argument("--sky-points", type=int, default=0,
                    help="add this many far sky-dome init points (the scene "
                         "has an opaque sky; unbounded-region seeding)")
    args = ap.parse_args()
    from PIL import Image

    global W, H, FOCAL, N_VIEWS, SPHERES
    W, H, N_VIEWS = args.width, args.height, args.views
    FOCAL = args.focal if args.focal else 290.0 * W / 256.0
    if args.rich:
        SPHERES = SPHERES + RICH_SPHERES

    dest = Path(args.out)
    (dest / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)

    c2ws = []
    for i in range(N_VIEWS):
        ang = 2 * np.pi * i / N_VIEWS
        pos = np.array([2.6 * np.sin(ang), 1.3 + 0.25 * np.sin(2 * ang),
                        -2.6 * np.cos(ang)])
        c2w = look_at_c2w(pos, np.array([0.0, 0.35, 0.0]))
        c2ws.append(c2w)
        img = render_view(c2w)
        Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(
            dest / "images" / f"frame_{i:03d}.png"
        )
        print(f"rendered frame_{i:03d}.png", flush=True)

    pts, cols = surface_points(rng, n=args.points)
    if args.sky_points:
        sp, sc = sky_points(rng, args.sky_points)
        pts = np.concatenate([pts, sp])
        cols = np.concatenate([cols, sc])
    write_colmap(dest, c2ws, pts, cols)
    print(f"wrote {dest} ({N_VIEWS} views {W}x{H}, {len(pts)} points)")


if __name__ == "__main__":
    main()
