"""Point-cloud container and ray/back-projection utilities.

Counterpart of Trainer/PointCloudUtil.swift:13-192.  Host-side (numpy):
these run once at dataset load, not in the training hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class PointCloud:
    coords: np.ndarray  # [N, 3] float32
    colors: np.ndarray  # [N, 3] float32, 0..255 range like the reference
    alphas: Optional[np.ndarray] = None  # [N]

    @property
    def size(self) -> int:
        return self.coords.shape[0]

    def random_sample(self, count: int, seed: int = 0) -> "PointCloud":
        """PointCloudUtil.swift:155-170."""
        if count >= self.size:
            return self
        rng = np.random.default_rng(seed)
        idx = rng.choice(self.size, size=count, replace=False)
        return PointCloud(
            coords=self.coords[idx],
            colors=self.colors[idx],
            alphas=None if self.alphas is None else self.alphas[idx],
        )

    def centering(self, sigma_cull: float = 3.0) -> Tuple["PointCloud", np.ndarray]:
        """Outlier cull at `sigma_cull` std + centroid subtraction
        (PointCloudUtil.swift:171-191).  Returns (new cloud, centroid) so the
        caller can shift camera translations by the same centroid."""
        coords = self.coords
        centroid = coords.mean(axis=0)
        d = np.linalg.norm(coords - centroid, axis=1)
        keep = d <= d.mean() + sigma_cull * d.std()
        coords = coords[keep]
        centroid = coords.mean(axis=0)
        return (
            PointCloud(
                coords=(coords - centroid).astype(np.float32),
                colors=self.colors[keep],
                alphas=None if self.alphas is None else self.alphas[keep],
            ),
            centroid.astype(np.float32),
        )


def rays_from_camera(
    height: int, width: int, intrinsic: np.ndarray, c2w: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel ray origins/directions (PointCloudUtil.swift:49-94).

    Pixel (x, y) maps through K^-1 to the camera-space direction
    ((x-cx)/fx, (y-cy)/fy, 1), rotated by c2w.  Returns ([H,W,3], [H,W,3]).
    """
    K = np.asarray(intrinsic, np.float64)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xs = np.arange(width, dtype=np.float64)
    ys = np.arange(height, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys)
    dirs = np.stack([(gx - cx) / fx, (gy - cy) / fy, np.ones_like(gx)], axis=-1)
    R = np.asarray(c2w, np.float64)[:3, :3]
    t = np.asarray(c2w, np.float64)[:3, 3]
    world_dirs = dirs @ R.T
    origins = np.broadcast_to(t, world_dirs.shape)
    return origins.astype(np.float32), world_dirs.astype(np.float32)


def point_cloud_from_depth(
    rgbs: np.ndarray,  # [B, H, W, 3] in [0, 1]
    depths: np.ndarray,  # [B, H, W]
    alphas: np.ndarray,  # [B, H, W]
    intrinsics: np.ndarray,  # [B, 3, 3] or [B, 4, 4]
    c2ws: np.ndarray,  # [B, 4, 4]
) -> PointCloud:
    """Back-project depth maps where alpha == 1 (PointCloudUtil.swift:96-132)."""
    pts, cols = [], []
    for b in range(rgbs.shape[0]):
        h, w = depths[b].shape
        origins, dirs = rays_from_camera(h, w, intrinsics[b][:3, :3], c2ws[b])
        mask = alphas[b] >= 1.0
        p = origins[mask] + dirs[mask] * depths[b][mask][:, None]
        pts.append(p)
        cols.append(rgbs[b][mask] * 255.0)
    return PointCloud(
        coords=np.concatenate(pts, axis=0).astype(np.float32),
        colors=np.concatenate(cols, axis=0).astype(np.float32),
    )
