"""Snapshot key campaign artifacts into the git-tracked artifacts/ dir.

outputs/ is gitignored and the workspace can be reset between rounds (round
2's SH4 checkpoints were lost exactly that way), so anything the next round
must resume from — or the judge must inspect — is copied into artifacts/
and committed.  Selective by design: latest checkpoint PLY + npz per
campaign (not every snapshot), full metrics history, summaries, and the
round-3 measurement logs.  Idempotent: re-runs overwrite in place.
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "outputs"

# Per-campaign: newest iteration_*.ply, newest ckpt_* dir (full resume
# state: params + Adam moments + RNG), metrics + summary.
CAMPAIGNS = ("flagship_vendor", "flagship_sh4", "scale_sh4")


def newest(pattern: str, root: Path):
    hits = sorted(root.glob(pattern), key=lambda p: p.stat().st_mtime)
    return hits[-1] if hits else None


def copy(src: Path, dst: Path):
    dst.parent.mkdir(parents=True, exist_ok=True)
    if src.is_dir():
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    print(f"persisted {src.relative_to(REPO)} -> {dst.relative_to(REPO)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    args = ap.parse_args()
    ART = REPO / "artifacts" / f"round{args.round}"
    copied = False
    for name in CAMPAIGNS:
        root = OUT / name
        if not root.is_dir():
            continue
        for fname in ("summary.json", "metrics.jsonl", "metrics.csv"):
            f = root / fname
            if f.exists():
                copy(f, ART / name / fname)
                copied = True
        ply = newest("iteration_*.ply", root)
        if ply is not None:
            copy(ply, ART / name / ply.name)
            copied = True
        ckpt = newest("ckpt_*.npz", root)
        if ckpt is not None:
            copy(ckpt, ART / name / ckpt.name)
            copied = True

    r3 = OUT / f"round{args.round}"
    if r3.is_dir():
        for f in sorted(r3.glob("*.log")):
            copy(f, ART / "logs" / f.name)
            copied = True
        for f in sorted(r3.glob("*.json")):
            copy(f, ART / "logs" / f.name)
            copied = True
    # a handful of held-out eval renders as visual evidence
    ev = r3 / "eval_holdout"
    if ev.is_dir():
        for f in sorted(ev.glob("*.png"))[:8]:
            copy(f, ART / "eval_holdout" / f.name)
            copied = True

    if not copied:
        print("nothing to persist yet")
        return
    subprocess.run(["git", "add", "-f", str(ART)], cwd=REPO, check=False)
    subprocess.run(
        ["git", "commit", "-q", "-m",
         f"Persist round-{args.round} campaign artifacts (checkpoints, metrics, logs)"],
        cwd=REPO, check=False,
    )


if __name__ == "__main__":
    main()
