"""Collect round-3 TPU campaign results into BASELINE.md.

Reads whatever outputs/round3 and the campaign dirs contain, writes a
measured-results section into BASELINE.md, and commits it — so the numbers
are recorded even if the campaign chain finishes unattended.  IDEMPOTENT:
the section lives between marker comments and is replaced on re-run, so the
chain can call this after every major step (partial results get recorded
as soon as they exist, not only if the whole chain survives to the end).
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
MARK_BEGIN = "<!-- round3-measured-results:begin -->"
MARK_END = "<!-- round3-measured-results:end -->"


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
        print(f"report_round3: skipping a row: {type(e).__name__}: {e}")


def main():
    lines = ["", "## Round-3 measured results (TPU v5e-1, appended by "
             "scripts/report_round3.py)", ""]

    bench = read_json_line(REPO / "outputs/round3/bench.log")
    if bench:
        lines.append(f"| headline bench (first, free chip) | "
                     f"{bench.get('value', 0):,} px/s | vs_baseline "
                     f"{bench.get('vs_baseline')} | pairs "
                     f"{bench.get('num_pairs')} | {bench.get('skipped', '')} |")
    bench2 = read_json_line(REPO / "outputs/round3/bench_final.log")
    if bench2:
        lines.append(f"| headline bench (post-campaign) | "
                     f"{bench2.get('value', 0):,} px/s | vs_baseline "
                     f"{bench2.get('vs_baseline')} | | "
                     f"{bench2.get('skipped', '')} |")

    for log_name, label in (
        ("renderfps.log", "round-2 flagship model"),
        ("renderfps_vendor.log", "flagship_vendor model"),
    ):
        fps_log = REPO / "outputs/round3" / log_name
        if fps_log.exists():
            m = re.search(r"([\d.]+) frames/s \(([\d.]+) ms/frame\)",
                          fps_log.read_text())
            if m:
                lines.append(f"| inference (render_cli --bench-frames, "
                             f"800x800, {label}) | {m.group(1)} fps "
                             f"({m.group(2)} ms/frame) | round-2: 11.6 fps "
                             f"| | |")

    def flagship_row():
        s = json.loads((REPO / "outputs/flagship_vendor/summary.json")
                       .read_text())
        h = s.get("holdout", {})
        lines.append(
            f"| flagship on INDEPENDENT imagery (800x800, "
            f"{s['workload'].get('views')} train views, SH"
            f"{s['workload'].get('sh_degree')}, "
            f"{s['workload'].get('iterations')} iters) | train PSNR "
            f"{s.get('final_psnr'):.2f} | HELD-OUT PSNR "
            f"{h.get('psnr_mean', float('nan')):.2f} / SSIM "
            f"{h.get('ssim_mean', float('nan')):.4f} | gaussians "
            f"{s.get('num_gaussians_final')} (peak "
            f"{s.get('num_gaussians_peak')}) | "
            f"{s.get('sustained_it_per_s', 0):.2f} it/s sustained |"
        )

    if (REPO / "outputs/flagship_vendor/summary.json").exists():
        guarded(flagship_row)

    def eval_rows():
        ev = read_json_line(REPO / "outputs/round3/eval_holdout.log")
        if ev:
            lines.append(f"| eval.py on held-out views (views 0,9,18,27) | "
                         f"PSNR {ev.get('psnr_mean'):.2f} | SSIM "
                         f"{ev.get('ssim_mean'):.4f} | L1 "
                         f"{ev.get('l1_mean'):.4f} | |")
        ev2 = read_json_line(REPO / "outputs/round3/eval_all.log")
        if ev2:
            lines.append(f"| eval.py over ALL 36 views | PSNR "
                         f"{ev2.get('psnr_mean'):.2f} | SSIM "
                         f"{ev2.get('ssim_mean'):.4f} | | |")

    guarded(eval_rows)

    def sh4_row():
        s = json.loads((REPO / "outputs/flagship_sh4/summary.json")
                       .read_text())
        lines.append(
            f"| SH4 scale campaign (resumed) | PSNR {s.get('final_psnr'):.2f} "
            f"at iter {s['workload'].get('iterations')} | gaussians "
            f"{s.get('num_gaussians_final')} (peak "
            f"{s.get('num_gaussians_peak')}) | "
            f"{s.get('sustained_it_per_s', 0) or 0:.2f} it/s | |"
        )

    if (REPO / "outputs/flagship_sh4/summary.json").exists():
        guarded(sh4_row)

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
         "Record round-3 TPU campaign measurements in BASELINE"],
        cwd=REPO, check=False,
    )


if __name__ == "__main__":
    main()
