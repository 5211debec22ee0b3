"""Demo-dataset fetchers (network-guarded).

The reference self-bootstraps its two demo scenes at runtime:

  * lego (COLMAP format) — downloaded as a zip from the
    TinyGaussianSplattingDataset repo and unpacked into the data dir
    (GaussianSplattingMlx/Data/ColmapDataLoader.swift:545-565, zip URL at
    :558-560; skip-if-present check on `sparse/0/cameras.bin` at :546-550).
  * B075X65R3X chair (Blender/NeRF-synthetic format) — downloaded from the
    torch-splatting repo and unpacked
    (GaussianSplattingMlx/Data/BlenderDataLoader.swift:308-320; skip check
    on `info.json` at :310-313).

This module mirrors those semantics: same URLs, same skip-if-present probe
files, download-to-temp then extract.  Environments without network access
get a single clear error (URLError/timeout) instead of a hang — nothing here
is required by the rest of the framework; the loaders take any directory.
"""

from __future__ import annotations

import io
import urllib.error
import urllib.request
import zipfile
from pathlib import Path

# ColmapDataLoader.swift:558-560
LEGO_COLMAP_URL = (
    "https://raw.githubusercontent.com/tatsuya-ogawa/"
    "TinyGaussianSplattingDataset/refs/heads/main/colmap/lego.zip"
)
# BlenderDataLoader.swift:316
CHAIR_BLENDER_URL = (
    "https://raw.githubusercontent.com/hbb1/torch-splatting/"
    "refs/heads/main/B075X65R3X.zip"
)


class FetchError(RuntimeError):
    """Raised when a demo dataset cannot be downloaded (e.g. no network)."""


def _download_zip(url: str, timeout: float) -> bytes:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.read()
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        raise FetchError(
            f"could not download demo dataset from {url!r}: {e}. "
            "This environment may have no network access — point --root at "
            "an existing dataset directory instead."
        ) from e


def _extract(data: bytes, dest: Path) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for member in zf.infolist():
            # Defend against path traversal in hostile archives.
            target = dest / member.filename
            if not target.resolve().is_relative_to(dest.resolve()):
                raise FetchError(f"zip member escapes dest: {member.filename!r}")
        zf.extractall(dest)


def fetch_lego_colmap(dest: str | Path, *, timeout: float = 60.0) -> Path:
    """Download + unpack the lego COLMAP demo scene into `dest`.

    Skip-if-present on `sparse/0/cameras.bin`, exactly like the reference
    (ColmapDataLoader.swift:546-550).  Returns the dataset root to pass as
    train.py --root.
    """
    dest = Path(dest)
    if (dest / "sparse" / "0" / "cameras.bin").exists():
        return dest
    _extract(_download_zip(LEGO_COLMAP_URL, timeout), dest)
    return dest


def fetch_chair_blender(dest: str | Path, *, timeout: float = 60.0) -> Path:
    """Download + unpack the B075X65R3X chair Blender demo scene into `dest`.

    Skip-if-present on `info.json` (BlenderDataLoader.swift:310-313).
    """
    dest = Path(dest)
    if (dest / "info.json").exists() or (dest / "transforms_train.json").exists():
        return dest
    _extract(_download_zip(CHAIR_BLENDER_URL, timeout), dest)
    return dest


DEMOS = {
    "lego": ("colmap", fetch_lego_colmap),
    "chair": ("blender", fetch_chair_blender),
}
