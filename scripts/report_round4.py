"""Collect round-4 TPU campaign results into BASELINE.md.

Same contract as scripts/report_round3.py: reads whatever outputs/round4 and
the campaign dirs contain, replaces the marker-delimited section in
BASELINE.md, and commits — IDEMPOTENT, so the wrapup chain can call it after
every leg and partial results are recorded even if a later leg dies.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
MARK_BEGIN = "<!-- round4-measured-results:begin -->"
MARK_END = "<!-- round4-measured-results:end -->"


def read_json_line(path: Path):
    try:
        for line in path.read_text().splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
    except OSError:
        pass
    return None


def guarded(fn):
    """One malformed artifact must not block reporting the others."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — unattended chain step
        print(f"report_round4: skipping a row: {type(e).__name__}: {e}")


def main():
    lines = ["", "## Round-4 measured results (TPU v5e-1, appended by "
             "scripts/report_round4.py)", ""]

    for name, label in (
        ("bench.log", "headline bench (free chip)"),
        ("bench_tile32.log", "headline bench (32x32 tiles A/B)"),
        ("bench_mmhigh.log", "headline bench (3-pass matmul A/B)"),
        ("bench_final.log", "headline bench (final)"),
    ):
        b = read_json_line(REPO / "outputs/round4" / name)
        if b:
            lines.append(f"| {label} | {b.get('value', 0):,} px/s | "
                         f"vs_baseline {b.get('vs_baseline')} | pairs "
                         f"{b.get('num_pairs')} budget {b.get('max_pairs')} "
                         f"| {b.get('skipped', '')} |")

    for name, label in (
        ("renderfps_small.log",
         "inference, ~28k-gaussian model (like-for-like vs round-2 11.6 fps)"),
        ("renderfps_vendor.log", "inference, full flagship_vendor model"),
    ):
        fps_log = REPO / "outputs/round4" / name
        if fps_log.exists():
            m = re.search(r"([\d.]+) frames/s \(([\d.]+) ms/frame\)",
                          fps_log.read_text())
            if m:
                lines.append(f"| {label} (render_cli --bench-frames, 800x800)"
                             f" | {m.group(1)} fps ({m.group(2)} ms/frame) | "
                             f"round-2: 11.6 fps | | |")

    def flagship_row():
        s = json.loads((REPO / "outputs/flagship_vendor/summary.json")
                       .read_text())
        h = s.get("holdout", {})
        lines.append(
            f"| flagship on INDEPENDENT imagery (800x800, "
            f"{s['workload'].get('views')} train views, SH"
            f"{s['workload'].get('sh_degree')}, "
            f"{s['workload'].get('iterations')} iters, opacity-reset+"
            f"world-scale-prune) | train PSNR {s.get('final_psnr'):.2f} | "
            f"HELD-OUT PSNR {h.get('psnr_mean', float('nan')):.2f} / SSIM "
            f"{h.get('ssim_mean', float('nan')):.4f} | gaussians "
            f"{s.get('num_gaussians_final')} (peak "
            f"{s.get('num_gaussians_peak')}) | "
            f"{s.get('sustained_it_per_s', 0):.2f} it/s sustained |"
        )

    if (REPO / "outputs/flagship_vendor/summary.json").exists():
        guarded(flagship_row)

    def eval_rows():
        ev = read_json_line(REPO / "outputs/round4/eval_holdout.log")
        if ev:
            lines.append(f"| eval.py on held-out views (views 0,9,18,27) | "
                         f"PSNR {ev.get('psnr_mean'):.2f} | SSIM "
                         f"{ev.get('ssim_mean'):.4f} | L1 "
                         f"{ev.get('l1_mean'):.4f} | |")
        ev2 = read_json_line(REPO / "outputs/round4/eval_all.log")
        if ev2:
            lines.append(f"| eval.py over ALL 36 views | PSNR "
                         f"{ev2.get('psnr_mean'):.2f} | SSIM "
                         f"{ev2.get('ssim_mean'):.4f} | | |")

    guarded(eval_rows)

    def scale_row():
        s = json.loads((REPO / "outputs/scale_sh4/summary.json").read_text())
        h = s.get("holdout", {})
        held = (f"held-out PSNR {h.get('psnr_mean'):.2f}"
                if h.get("psnr_mean") is not None else "")
        lines.append(
            f"| SH4 scale campaign (independent imagery) | PSNR {s.get('final_psnr'):.2f} "
            f"at iter {s['workload'].get('iterations')} | gaussians "
            f"{s.get('num_gaussians_final')} (peak "
            f"{s.get('num_gaussians_peak')}) | "
            f"{s.get('sustained_it_per_s', 0) or 0:.2f} it/s | {held} |"
        )

    if (REPO / "outputs/scale_sh4/summary.json").exists():
        guarded(scale_row)

    if len(lines) <= 3:
        print("no results to report yet")
        return
    lines.insert(3, "| metric | value | | | notes |")
    lines.insert(4, "|---|---|---|---|---|")
    section = MARK_BEGIN + "\n" + "\n".join(lines) + "\n" + MARK_END + "\n"
    baseline = REPO / "BASELINE.md"
    text = baseline.read_text()
    if MARK_BEGIN in text and MARK_END in text:
        head, rest = text.split(MARK_BEGIN, 1)
        _, tail = rest.split(MARK_END, 1)
        text = head + section + tail
    else:
        text = text + "\n" + section
    baseline.write_text(text)
    print("\n".join(lines))
    subprocess.run(["git", "add", "BASELINE.md"], cwd=REPO, check=False)
    subprocess.run(
        ["git", "commit", "-q", "-m",
         "Record round-4 TPU campaign measurements in BASELINE"],
        cwd=REPO, check=False,
    )


if __name__ == "__main__":
    main()
