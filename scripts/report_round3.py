"""Collect round-3 TPU campaign results into BASELINE.md (chain final step).

Reads whatever outputs/round3 and the campaign dirs contain, appends a
measured-results section to BASELINE.md, and commits it — so the numbers are
recorded even if the campaign chain finishes unattended.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


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

    fps_log = REPO / "outputs/round3/renderfps.log"
    if fps_log.exists():
        m = re.search(r"([\d.]+) frames/s \(([\d.]+) ms/frame\)",
                      fps_log.read_text())
        if m:
            lines.append(f"| inference (render_cli --bench-frames, 800x800, "
                         f"round-2 flagship model) | {m.group(1)} fps "
                         f"({m.group(2)} ms/frame) | round-2: 11.6 fps | | |")

    summ = REPO / "outputs/flagship_vendor/summary.json"
    if summ.exists():
        s = json.loads(summ.read_text())
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
    ev = read_json_line(REPO / "outputs/round3/eval_holdout.log")
    if ev:
        lines.append(f"| eval.py on held-out views (views 0,9,18,27) | PSNR "
                     f"{ev.get('psnr_mean'):.2f} | SSIM "
                     f"{ev.get('ssim_mean'):.4f} | L1 {ev.get('l1_mean'):.4f} "
                     f"| |")
    ev2 = read_json_line(REPO / "outputs/round3/eval_all.log")
    if ev2:
        lines.append(f"| eval.py over ALL 36 views | PSNR "
                     f"{ev2.get('psnr_mean'):.2f} | SSIM "
                     f"{ev2.get('ssim_mean'):.4f} | | |")

    sh4 = REPO / "outputs/flagship_sh4/summary.json"
    if sh4.exists():
        s = json.loads(sh4.read_text())
        lines.append(
            f"| SH4 scale campaign (resumed) | PSNR {s.get('final_psnr'):.2f} "
            f"at iter {s['workload'].get('iterations')} | gaussians "
            f"{s.get('num_gaussians_final')} (peak "
            f"{s.get('num_gaussians_peak')}) | "
            f"{s.get('sustained_it_per_s', 0) or 0:.2f} it/s | |"
        )

    if len(lines) <= 3:
        print("no results to report yet")
        return
    lines.insert(3, "| metric | value | | | notes |")
    lines.insert(4, "|---|---|---|---|---|")
    with open(REPO / "BASELINE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    subprocess.run(["git", "add", "BASELINE.md"], cwd=REPO, check=False)
    subprocess.run(
        ["git", "commit", "-q", "-m",
         "Record round-3 TPU campaign measurements in BASELINE"],
        cwd=REPO, check=False,
    )


if __name__ == "__main__":
    main()
