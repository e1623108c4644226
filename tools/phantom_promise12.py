#!/usr/bin/env python
"""Generate a synthetic PROMISE12-format dataset (the "phantom").

Writes `<dest>/PROMISE2012/TrainingData/Case{NN}.mhd/.raw` (int16 MR-like
volumes) + `Case{NN}_segmentation.mhd/.raw` (uint8 masks) plus a small
TestData/ — the exact directory layout both frameworks' PROMISE12 loaders
consume (reference utils/datasets/promise12.py:239-319 data_to_array; ours
senas_tpu/data/promise12.py build_cache). Cases are geometric prostate-like
blobs: a smoothly-perturbed ellipsoid of brighter tissue inside low-frequency
background anatomy with speckle noise.

Purpose: the Dice-parity rehearsal (tools/dice_rehearsal.py) — train BOTH
frameworks' FULL pipelines (CLAHE -> curvature flow -> npy cache -> joint
augmentation -> trainer/schedule) on identical phantom data and compare val
Dice. No real PROMISE12 data exists in this environment (zero egress).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.data.io import MetaImage, write_mhd


def _smooth_noise(rs: np.random.RandomState, shape, sigma_px: float) -> np.ndarray:
    """Low-frequency noise field: blur white noise with a separable box
    cascade (approximates a Gaussian; avoids a scipy dependency)."""
    x = rs.randn(*shape).astype(np.float32)
    k = max(3, int(sigma_px) | 1)
    for axis in range(x.ndim):
        c = np.cumsum(np.pad(x, [(k, k) if a == axis else (0, 0)
                                 for a in range(x.ndim)], mode="edge"),
                      axis=axis)
        x = (np.take(c, range(2 * k, c.shape[axis]), axis=axis)
             - np.take(c, range(0, c.shape[axis] - 2 * k), axis=axis)) / (2 * k)
    x -= x.mean()
    s = x.std()
    return x / (s + 1e-8)


def make_case(rs: np.random.RandomState, slices: int, size: int):
    """Returns (image int16 [z,y,x], mask uint8 [z,y,x])."""
    z = np.linspace(-1, 1, slices)[:, None, None]
    y = np.linspace(-1, 1, size)[None, :, None]
    x = np.linspace(-1, 1, size)[None, None, :]

    # prostate-like ellipsoid: jittered center + semi-axes, organic boundary
    cz, cy, cx = rs.uniform(-0.15, 0.15, 3)
    rz = rs.uniform(0.55, 0.8)
    ry, rx = rs.uniform(0.22, 0.4, 2)
    r2 = (((z - cz) / rz) ** 2 + ((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2)
    wobble = 0.12 * _smooth_noise(rs, (slices, size, size), size / 8)
    mask = (r2 + wobble < 1.0).astype(np.uint8)

    # anatomy: low-frequency background + brighter prostate + speckle
    bg = 380 + 120 * _smooth_noise(rs, (slices, size, size), size / 4)
    rim = np.clip(1.2 - np.abs(r2 - 1.0) * 4.0, 0, 1)  # darker capsule rim
    img = (bg
           + mask * (260 + 90 * _smooth_noise(rs, mask.shape, size / 10))
           - 110 * rim
           + 45 * rs.randn(slices, size, size))
    return (np.clip(img, 0, 2000).astype(np.int16), mask)


def generate(dest: str, n_cases: int = 10, n_test: int = 2,
             size: int = 320, seed: int = 0) -> str:
    base = os.path.join(dest, "PROMISE2012")
    train_dir = os.path.join(base, "TrainingData")
    test_dir = os.path.join(base, "TestData")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    for i in range(n_cases):
        slices = int(rs.randint(10, 17))
        img, mask = make_case(rs, slices, size)
        sp = (float(rs.uniform(0.5, 0.7)), float(rs.uniform(0.5, 0.7)),
              float(rs.uniform(2.2, 3.6)))
        write_mhd(os.path.join(train_dir, f"Case{i:02d}.mhd"),
                  MetaImage(array=img, spacing=sp))
        write_mhd(os.path.join(train_dir, f"Case{i:02d}_segmentation.mhd"),
                  MetaImage(array=mask, spacing=sp))
    for i in range(n_test):
        slices = int(rs.randint(10, 17))
        img, _ = make_case(rs, slices, size)
        write_mhd(os.path.join(test_dir, f"Case{i:02d}.mhd"),
                  MetaImage(array=img, spacing=(0.6, 0.6, 3.0)))
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", required=True,
                    help="data root; cases go to <dest>/PROMISE2012/")
    ap.add_argument("--cases", type=int, default=10,
                    help="training cases (val split uses the fixed case ids "
                         "[5,15,25,35,45] that exist; with 10 cases: case 05)")
    ap.add_argument("--test-cases", type=int, default=2)
    ap.add_argument("--size", type=int, default=320,
                    help="in-plane resolution of the raw volumes (the "
                         "loaders resize to their 256 crop)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    base = generate(args.dest, args.cases, args.test_cases, args.size,
                    args.seed)
    print(f"phantom PROMISE12 written to {base} "
          f"({args.cases} train cases, {args.test_cases} test cases)")


if __name__ == "__main__":
    main()
