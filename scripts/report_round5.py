"""Collect round-5 TPU campaign results into BASELINE.md.

Same contract as scripts/report_round4.py: reads whatever outputs/round5 and
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
MARK_BEGIN = "<!-- round5-measured-results:begin -->"
MARK_END = "<!-- round5-measured-results:end -->"


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
        print(f"report_round5: skipping a row: {type(e).__name__}: {e}")


def main():
    lines = ["", "## Round-5 measured results (TPU v5e-1, appended by "
             "scripts/report_round5.py)", ""]

    for name, label in (
        ("bench_t16.log", "headline bench (16x16, sorted-train staging)"),
        ("bench_t16_aligned.log", "headline bench (16x16, aligned A/B)"),
        ("bench_t32.log", "headline bench (32x32, sorted-train staging)"),
        ("bench_t32_aligned.log", "headline bench (32x32, aligned A/B)"),
        ("bench_t16_gatherrec.log",
         "headline bench (16x16, gather-records A/B)"),
        ("bench_t32_gatherrec.log",
         "headline bench (32x32, gather-records A/B)"),
        ("bench.log", "headline bench (free chip)"),
        ("bench_tile32.log", "headline bench (32x32 tiles A/B)"),
        ("bench_final.log", "headline bench (final)"),
    ):
        b = read_json_line(REPO / "outputs/round5" / name)
        if b:
            lines.append(f"| {label} | {b.get('value', 0):,} px/s | "
                         f"vs_baseline {b.get('vs_baseline')} | pairs "
                         f"{b.get('num_pairs')} budget {b.get('max_pairs')} "
                         f"| {b.get('skipped', '')} |")

    def fps_rows():
        for name, label in (
            ("renderfps_small.log",
             "inference, ~28k-gaussian model (like-for-like vs round-2)"),
            ("renderfps_sh4.log", "inference, flagship_sh4 final model"),
        ):
            fps_log = REPO / "outputs/round5" / name
            if not fps_log.exists():
                continue
            text = fps_log.read_text()
            m = re.search(
                r"([\d.]+) frames/s \(([\d.]+) ms/frame, (\d+) "
                r"frames/dispatch\)", text)
            md = re.search(
                r"per-dispatch: ([\d.]+) frames/s \(([\d.]+) ms/frame\)",
                text)
            if m:
                per = (f"per-dispatch {md.group(1)} fps "
                       f"({md.group(2)} ms/frame)" if md else "")
                lines.append(
                    f"| {label} (render_cli, 800x800) | {m.group(1)} fps "
                    f"({m.group(2)} ms/frame, {m.group(3)}/dispatch) | "
                    f"{per} | round-2 anchor: 11.6 fps per-dispatch | |")

    guarded(fps_rows)

    def flagship_row():
        s = json.loads((REPO / "outputs/flagship_sh4/summary.json")
                       .read_text())
        h = s.get("holdout", {})
        lines.append(
            f"| SH4 flagship on INDEPENDENT imagery (800x800, "
            f"{s['workload'].get('views')} train views, SH"
            f"{s['workload'].get('sh_degree')} + warmup 1000, "
            f"{s['workload'].get('iterations')} iters, opacity-reset+"
            f"world-scale/floater/needle-prunes) | train PSNR "
            f"{s.get('final_psnr'):.2f} | "
            f"HELD-OUT PSNR {h.get('psnr_mean', float('nan')):.2f} / SSIM "
            f"{h.get('ssim_mean', float('nan')):.4f} | gaussians "
            f"{s.get('num_gaussians_final')} (peak "
            f"{s.get('num_gaussians_peak')}) | "
            f"{s.get('sustained_it_per_s', 0):.2f} it/s sustained |"
        )

    if (REPO / "outputs/flagship_sh4/summary.json").exists():
        guarded(flagship_row)

    def eval_rows():
        ev = read_json_line(REPO / "outputs/round5/eval_holdout.log")
        if ev:
            lines.append(f"| eval.py on held-out views (views 0,9,18,27) | "
                         f"PSNR {ev.get('psnr_mean'):.2f} | SSIM "
                         f"{ev.get('ssim_mean'):.4f} | L1 "
                         f"{ev.get('l1_mean'):.4f} | |")
        ev2 = read_json_line(REPO / "outputs/round5/eval_all.log")
        if ev2:
            lines.append(f"| eval.py over ALL 36 views | PSNR "
                         f"{ev2.get('psnr_mean'):.2f} | SSIM "
                         f"{ev2.get('ssim_mean'):.4f} | | |")
        if ev and ev.get("per_view_psnr"):
            pv = ", ".join(f"{p:.1f}" for p in ev["per_view_psnr"])
            lines.append(f"| held-out per-view PSNR spread | {pv} | | | |")

    guarded(eval_rows)

    def gradcheck_row():
        text = (REPO / "outputs/round5/sorted_grad_check.log").read_text()
        rels = re.findall(r"relnorm\(sorted-aligned\) ([\de.+-]+)", text)
        if rels and "OK" in text:
            worst = max(float(r) for r in rels)
            lines.append(f"| sorted-vs-aligned training gradients at bench "
                         f"scale (800x800, 100k g, 1.4M pairs) | worst leaf "
                         f"relnorm {worst:.1e} | OK | | |")

    if (REPO / "outputs/round5/sorted_grad_check.log").exists():
        guarded(gradcheck_row)

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
         "Record round-5 TPU campaign measurements in BASELINE"],
        cwd=REPO, check=False,
    )


if __name__ == "__main__":
    main()
