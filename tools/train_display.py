"""Replay a training run offline: loss/metric curves + saved validation
image grids rendered into one standalone HTML page.

Parity target: /root/reference/tools/train_display.py (visdom replay of
pickled loss/accuracy logs + saved val images, port 9000). Visdom isn't in
this image and a server defeats offline replay, so this renders the same
content — curves and the per-epoch Val/images grids the runner saves into
the run dir — as <run>/replay.html viewable in any browser.

Usage:
  python tools/train_display.py --path ../logs/senas/train/promise12/<ts>/
  python tools/train_display.py --path <run> --no-images
"""

import argparse
import base64
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_series(run_dir):
    series = defaultdict(lambda: ([], []))
    path = os.path.join(run_dir, "scalars.jsonl")
    if os.path.isfile(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                xs, ys = series[rec["tag"]]
                xs.append(rec["step"])
                ys.append(rec["value"])
    return series


def svg_curve(tags_series, width=640, height=360):
    """Minimal dependency-free multi-line SVG chart."""
    pts_all = [p for _, (xs, ys) in tags_series for p in ys]
    if not pts_all:
        return "<p>(no data)</p>"
    xs_all = [x for _, (xs, _) in tags_series for x in xs]
    x0, x1 = min(xs_all), max(xs_all) or 1
    y0, y1 = min(pts_all), max(pts_all)
    if y1 == y0:
        y1 = y0 + 1
    colors = ["#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#ff7f0e",
              "#8c564b", "#17becf"]
    parts = [f'<svg width="{width}" height="{height}" '
             f'style="background:#fff;border:1px solid #ccc">']
    legend_y = 16
    for i, (tag, (xs, ys)) in enumerate(tags_series):
        color = colors[i % len(colors)]
        coords = " ".join(
            f"{40 + (x - x0) / max(x1 - x0, 1e-9) * (width - 60):.1f},"
            f"{height - 30 - (y - y0) / (y1 - y0) * (height - 50):.1f}"
            for x, y in zip(xs, ys))
        parts.append(f'<polyline fill="none" stroke="{color}" '
                     f'stroke-width="1.5" points="{coords}"/>')
        parts.append(f'<text x="{width - 200}" y="{legend_y}" fill="{color}" '
                     f'font-size="11">{tag}</text>')
        legend_y += 14
    parts.append(f'<text x="4" y="{height-32}" font-size="10">{y0:.4g}</text>')
    parts.append(f'<text x="4" y="14" font-size="10">{y1:.4g}</text>')
    parts.append("</svg>")
    return "".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True, help="run directory")
    ap.add_argument("--no-images", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    series = load_series(args.path)
    html = ["<html><head><title>senas-tpu run replay</title></head><body>",
            f"<h1>Run replay: {os.path.abspath(args.path)}</h1>"]

    groups = {
        "Loss": [t for t in series if "loss" in t.lower()],
        "Dice / metrics": [t for t in series
                           if "loss" not in t.lower()
                           and "steps_per_sec" not in t],
        "Throughput": [t for t in series if "steps_per_sec" in t],
    }
    for title, tags in groups.items():
        if not tags:
            continue
        html.append(f"<h2>{title}</h2>")
        html.append(svg_curve([(t, series[t]) for t in sorted(tags)]))

    if not args.no_images:
        pngs = sorted(glob.glob(os.path.join(args.path, "Val_images_*.png")))
        if pngs:
            html.append(f"<h2>Validation grids ({len(pngs)})</h2>")
            for p in pngs[-12:]:  # the last dozen epochs
                with open(p, "rb") as f:
                    b64 = base64.b64encode(f.read()).decode()
                html.append(f"<div><b>{os.path.basename(p)}</b><br>"
                            f'<img src="data:image/png;base64,{b64}" '
                            f'style="max-width:100%"></div>')

    html.append("</body></html>")
    out = args.out or os.path.join(args.path, "replay.html")
    with open(out, "w") as f:
        f.write("\n".join(html))
    print(out)


if __name__ == "__main__":
    main()
