"""Compute per-dataset normalization constants (mean/std).

Parity target: /root/reference/utils/datasets/calc_mean_std.py
(DicomFormatDataset/NormalFormatDataset + CalcMeanAndStd over a DataLoader,
used to produce the hardcoded per-dataset mean/std constants, e.g.
heart.py:22-23). Here it runs over any registered senas_tpu dataset and
streams Welford-style accumulators instead of loading everything at once.

Usage:
  python tools/calc_mean_std.py --dataset promise12 --data-root ../data/imgseg/
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.data import get_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--data-root", default=os.environ.get(
        "SENAS_DATA_ROOT", "../data/imgseg/"))
    ap.add_argument("--split", default="train")
    ap.add_argument("--limit", type=int, default=0,
                    help="optional cap on number of samples")
    args = ap.parse_args()

    ds = get_dataset(args.dataset, path=args.data_root, split=args.split,
                     mode="val")  # val mode: deterministic center crop, no aug
    n = len(ds) if not args.limit else min(args.limit, len(ds))

    count = 0
    s1 = None  # per-channel pixel sum
    s2 = None  # per-channel squared-pixel sum
    for i in range(n):
        img, _ = ds[i]
        img = np.asarray(img, np.float64)
        c = img.shape[-1] if img.ndim == 3 else 1
        flat = img.reshape(-1, c)
        if s1 is None:
            s1, s2 = np.zeros(c), np.zeros(c)
        s1 += flat.sum(0)
        s2 += (flat ** 2).sum(0)
        count += flat.shape[0]
    mean = s1 / count
    std = np.sqrt(np.maximum(s2 / count - mean ** 2, 0))
    # loaders hand out already-normalized tensors when the spec carries
    # constants; invert that so the tool reports RAW [0,1] statistics like
    # the reference script does
    spec = ds.spec
    if spec.mean is not None:
        prior_m = np.asarray(spec.mean, np.float64)
        prior_s = np.asarray(spec.std, np.float64)
        mean = prior_m + prior_s * mean
        std = prior_s * std
    print(f"dataset={args.dataset} n={n}")
    print(f"mean = {[round(v, 7) for v in mean.tolist()]}")
    print(f"std  = {[round(v, 7) for v in std.tolist()]}")


if __name__ == "__main__":
    main()
