"""Training dataset container: stacked per-view tensors.

Counterpart of TrainData (Trainer/GaussianTrainer.swift:14-114).  Host-side
numpy; the trainer uploads one (or a sharded batch of) camera's tensors per
step.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..utils.camera import Camera


@dataclasses.dataclass
class TrainData:
    cameras: List[Camera]
    images: np.ndarray  # [B, H, W, 3] float32 in [0, 1]
    alphas: Optional[np.ndarray] = None  # [B, H, W]
    depths: Optional[np.ndarray] = None  # [B, H, W]

    def __post_init__(self):
        assert len(self.cameras) == self.images.shape[0]

    @property
    def num_views(self) -> int:
        return len(self.cameras)

    @property
    def height(self) -> int:
        return self.images.shape[1]

    @property
    def width(self) -> int:
        return self.images.shape[2]

    def has_depth(self) -> bool:
        return self.depths is not None

    def view_tensors(self, index: int) -> dict:
        """Device-ready dict for one view (camera + targets)."""
        cam = self.cameras[index]
        t = cam.tensors()
        t["target_rgb"] = self.images[index]
        if self.depths is not None:
            t["target_depth"] = self.depths[index]
            t["depth_mask"] = (
                (self.alphas[index] >= 1.0).astype(np.float32)
                if self.alphas is not None
                else np.ones(self.depths[index].shape, np.float32)
            )
        else:
            t["target_depth"] = np.zeros((self.height, self.width), np.float32)
            t["depth_mask"] = np.zeros((self.height, self.width), np.float32)
        return t

    def shift_cameras(self, centroid: np.ndarray) -> "TrainData":
        """Apply the point-cloud centering shift to all camera translations
        (PointCloudUtil.swift:171-191 applies it to data.c2ws)."""
        new_cams = []
        for cam in self.cameras:
            c2w = np.asarray(cam.c2w, np.float64).copy()
            c2w[:3, 3] -= centroid
            new_cams.append(
                Camera.from_c2w(
                    cam.width, cam.height, cam.focal_x, cam.focal_y, c2w,
                    znear=cam.znear, zfar=cam.zfar,
                )
            )
        return TrainData(
            cameras=new_cams, images=self.images, alphas=self.alphas, depths=self.depths
        )
