"""Render the down/up cell DAGs of a genotype.

Parity target: /root/reference/tools/cell_visualize.py:10-25 (renders
DownC/UpC diagrams for a genotype). Here the genotype comes from the CLI
(--genotype string via the safe parser, or a built-in name via
--geno-name) instead of being hardcoded, and the Windows graphviz PATH
shim is unnecessary — DOT text is always written, binary rendering is
best-effort.

Usage:
  python tools/cell_visualize.py --geno-name senas_node_4 --format png
  python tools/cell_visualize.py --genotype "Genotype(down=[...], ...)"
"""

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.core.genotype import parse_genotype
from senas_tpu.models import geno_searched
from senas_tpu.utils.visualize import plot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genotype", type=str, default="",
                    help="genotype string (parsed safely, not eval'd)")
    ap.add_argument("--geno-name", type=str, default="senas_node_4",
                    help="built-in genotype name from geno_searched")
    ap.add_argument("--format", type=str, default="pdf",
                    choices=["jpeg", "png", "pdf", "svg", "bmp", "tif", "tiff"])
    ap.add_argument("--directory", type=str, default="./cell_visualize")
    args = ap.parse_args()

    if args.genotype:
        genotype = parse_genotype(args.genotype)
    else:
        genotype = getattr(geno_searched, args.geno_name)

    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    for tag, gene in [("DownC", genotype.down), ("UpC", genotype.up)]:
        out = plot(gene, f"{tag}-{stamp}", format=args.format,
                   directory=args.directory)
        print(f"{tag}: {out}")


if __name__ == "__main__":
    main()
