"""Plot training curves from a run directory's scalars.jsonl (or a CSV).

Parity target: /root/reference/tools/log_display.py (CSV curve plot) and
tools/train_display.py (visdom replay of loss/accuracy logs) — folded into
one offline matplotlib tool over this framework's run-dir format
(scalars.jsonl written by senas_tpu.utils.logging.ScalarWriter).

Usage:
  python tools/log_display.py --path ../logs/senas/train/promise12/<ts>/
  python tools/log_display.py --csv log.csv            # reference CSV mode
  python tools/log_display.py --path <run> --tags Train/Loss Val/dice
"""

import argparse
import csv
import json
import os
import sys
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_jsonl(path):
    series = defaultdict(lambda: ([], []))
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", type=str, default="",
                    help="run directory containing scalars.jsonl")
    ap.add_argument("--csv", type=str, default="",
                    help="reference-style CSV (epoch in col 1, value in col 2)")
    ap.add_argument("--tags", nargs="*", default=None,
                    help="subset of tags to plot (default: all)")
    ap.add_argument("--out", type=str, default="",
                    help="output PNG (default: <path>/curves.png)")
    args = ap.parse_args()

    if args.csv:
        xs, ys = [], []
        with open(args.csv) as f:
            for row in csv.reader(f):
                if len(row) >= 3:
                    xs.append(float(row[1]))
                    ys.append(float(row[2]))
        plt.plot(xs, ys)
        plt.xlabel("epoch")
        plt.ylabel("mIoU")
        out = args.out or os.path.splitext(args.csv)[0] + ".png"
        plt.savefig(out, dpi=150, bbox_inches="tight")
        print(out)
        return

    if not args.path:
        print("need --path or --csv", file=sys.stderr)
        sys.exit(1)
    jsonl = os.path.join(args.path, "scalars.jsonl")
    series = load_jsonl(jsonl)
    tags = args.tags or sorted(series)
    if not tags:
        print(f"no scalars in {jsonl}", file=sys.stderr)
        sys.exit(1)

    loss_tags = [t for t in tags if "loss" in t.lower()]
    metric_tags = [t for t in tags if t not in loss_tags]
    n_panels = (1 if loss_tags else 0) + (1 if metric_tags else 0)
    fig, axes = plt.subplots(1, max(n_panels, 1), figsize=(7 * max(n_panels, 1), 5),
                             squeeze=False)
    panel = 0
    for group, title in [(loss_tags, "loss"), (metric_tags, "metrics")]:
        if not group:
            continue
        ax = axes[0][panel]
        for tag in group:
            xs, ys = series[tag]
            ax.plot(xs, ys, label=tag)
        ax.set_xlabel("epoch")
        ax.set_title(title)
        ax.legend()
        panel += 1
    out = args.out or os.path.join(args.path, "curves.png")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
