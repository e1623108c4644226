"""Run-dir logging, scalar/image logging (observability subsystem).

Mirrors the reference's conventions (utils/utils.py:126-143, 253-282;
SURVEY.md §5): stdout + run.log file logger, run-dir layout
<log_root>/<model>/<phase>/<dataset>/<timestamp>/ with the config YAML copied
in, TensorBoard scalars/images when TensorFlow is available (tf.summary),
always-on JSONL scalar log (scalars.jsonl) as the dependency-free default.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import sys
import time
from typing import Dict, Optional

import numpy as np


def get_logger(log_dir: str, name: str = "senas_tpu") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"{name}:{log_dir}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        fh = logging.FileHandler(os.path.join(log_dir, "run.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def create_exp_dir(path: str, desc: str = "Experiment dir: {}") -> str:
    os.makedirs(path, exist_ok=True)
    print(desc.format(path))
    return path


def make_run_dir(log_root: str, model: str, phase: str, dataset: str,
                 config_path: Optional[str] = None) -> str:
    """<log_root>/<model>/<phase>/<dataset>/<phase>-<timestamp>/ with the
    config copied in (search_arc.py:51-59 convention)."""
    stamp = time.strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(log_root, model, phase, dataset, f"{phase}-{stamp}")
    os.makedirs(run_dir, exist_ok=True)
    if config_path and os.path.exists(config_path):
        shutil.copy(config_path, run_dir)
    return run_dir


def calc_time(seconds: float) -> str:
    m, s = divmod(int(seconds), 60)
    h, m = divmod(m, 60)
    d, h = divmod(h, 24)
    return f"{d}d {h}h {m}m {s}s"


class ScalarWriter:
    """Scalar/image logging: JSONL always; TensorBoard when tf is importable."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: deferred heavy import
                self._tb = tf.summary.create_file_writer(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step), "t": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.scalar(tag, value, step=step)

    def add_image_grid(self, tag: str, grid: np.ndarray, step: int):
        """grid: [H, W, 3] uint8."""
        path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.png")
        try:
            from PIL import Image
            Image.fromarray(grid).save(path)
        except Exception:
            np.save(path + ".npy", grid)
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.image(tag, grid[None], step=step)

    def export_scalars_to_json(self, path: str):
        # JSONL is already on disk; provide the reference's export hook
        shutil.copy(os.path.join(self.log_dir, "scalars.jsonl"), path)

    def close(self):
        self._jsonl.close()


_PALETTE = None


def get_mask_palette(nclass: int) -> np.ndarray:
    """VOC-style color palette (utils/encoder_colors.py:3-33)."""
    global _PALETTE
    if _PALETTE is None:
        n = 256
        pal = np.zeros((n, 3), np.uint8)
        for j in range(n):
            lab = j
            for i in range(8):
                pal[j, 0] |= ((lab >> 0) & 1) << (7 - i)
                pal[j, 1] |= ((lab >> 1) & 1) << (7 - i)
                pal[j, 2] |= ((lab >> 2) & 1) << (7 - i)
                lab >>= 3
        _PALETTE = pal
    return _PALETTE


def store_images(images: np.ndarray, preds: np.ndarray, labels: np.ndarray,
                 nclass: int) -> np.ndarray:
    """input | prediction | ground-truth grid (utils/utils.py:253-282).

    images: [B,H,W,C] float; preds/labels: [B,H,W] int. Returns [H*B, W*3, 3]
    uint8 (rows = samples, cols = input/pred/gt).
    """
    pal = get_mask_palette(nclass)
    rows = []
    for img, pred, lab in zip(images, preds, labels):
        x = img[..., 0] if img.ndim == 3 else img
        lo, hi = float(x.min()), float(x.max())
        gray = ((x - lo) / (hi - lo if hi > lo else 1) * 255).astype(np.uint8)
        gray3 = np.stack([gray] * 3, axis=-1)
        if nclass <= 2:
            p = np.stack([(pred * 255).astype(np.uint8)] * 3, -1)
            g = np.stack([(lab * 255).astype(np.uint8)] * 3, -1)
        else:
            p = pal[pred.astype(np.int32) % 256]
            g = pal[lab.astype(np.int32) % 256]
        rows.append(np.concatenate([gray3, p, g], axis=1))
    return np.concatenate(rows, axis=0)
