"""Evaluation runner (experiments/testing_model.py parity): load a
checkpoint, evaluate on the val split, save per-image predicted masks and
input|pred|gt grid PNGs."""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from senas_tpu.core.genotype import parse_genotype
from senas_tpu.data import DataLoader, get_dataset, get_dataset_spec
from senas_tpu.models import geno_searched
from senas_tpu.models.factory import get_segmentation_model
from senas_tpu.runner.common import (DEFAULT_DATA_ROOT, DEFAULT_LOG_ROOT,
                                     make_batch_placer,
                                     resolve_dataset_kwargs, setup_mesh)
from senas_tpu.train.checkpoint import CheckpointManager
from senas_tpu.train.loss import build_loss
from senas_tpu.train.metrics import AverageMeter, SegmentationMetric
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import FixedTrainState, make_eval_step
from senas_tpu.utils.logging import get_logger, make_run_dir, store_images


class TestRunner:
    __test__ = False  # not a pytest class, despite the name

    def __init__(self, cfg: Dict[str, Any], model_name: str = "senas",
                 genotype_str: str = "", resume: Optional[str] = None,
                 config_path: Optional[str] = None,
                 data_root: str = DEFAULT_DATA_ROOT,
                 log_root: str = DEFAULT_LOG_ROOT, batch_size: int = 6,
                 dtype=None):
        self.cfg = cfg
        t = cfg["training"]
        ds_name = cfg["data"]["dataset"]
        self.run_dir = make_run_dir(log_root, model_name, "testing", ds_name,
                                    config_path)
        self.logger = get_logger(self.run_dir)
        self.image_dir = os.path.join(self.run_dir, "images")
        os.makedirs(self.image_dir, exist_ok=True)

        dkw = resolve_dataset_kwargs(cfg)
        valset = get_dataset(ds_name, path=data_root,
                             split=cfg["data"].get("split", "val"), mode="val", **dkw)
        spec = get_dataset_spec(ds_name)
        self.n_classes = spec.num_class
        self.valid_queue = DataLoader(valset, batch_size, shuffle=False)

        if genotype_str:
            genotype = parse_genotype(genotype_str)
        else:
            genotype = getattr(geno_searched, t.get("geno_type", "senas"))
        self.model = get_segmentation_model(
            model_name, dataset=ds_name, c=t.get("init_channels", 32),
            depth=t.get("depth", 5), supervision=False, genotype=genotype,
            double_down_channel=t.get("double_down_channel", False), dtype=dtype)

        hw = spec.crop_size
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        x0 = jnp.zeros((batch_size, hw[0], hw[1], spec.in_channels), jnp.float32)
        variables = self.model.init({"params": rng}, x0, False)
        tx = build_optimizer({"name": "sgd", "lr": 1e-3})
        self.state = FixedTrainState.create(variables, tx)

        if resume is None:
            self.logger.error("resume checkpoint required for testing")
            sys.exit(1)
        mgr = CheckpointManager(resume)
        name = "best" if mgr.exists("best") else "last"
        if not mgr.exists(name):
            self.logger.error("checkpoint %s not found", resume)
            sys.exit(1)
        # target-free restore: eval must not depend on the training run's
        # optimizer structure — only params/batch_stats are consumed
        restored = mgr.restore_raw(name)
        raw = restored["state"]
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, raw["params"]),
            batch_stats=jax.tree.map(jnp.asarray, raw.get("batch_stats", {})))
        self.logger.info("loaded checkpoint %s (%s)", resume, name)

        loss_cfg = t.get("loss") or {}
        loss_name = loss_cfg.get("name", "dice_ce") if isinstance(loss_cfg, dict) else "dice_ce"
        self.loss_fn = build_loss(loss_name)
        self._eval = make_eval_step(self.model.apply, self.loss_fn)

        # multi_gpus config -> data-parallel eval over the mesh (partial
        # trailing batches fall back to replicated placement)
        self.mesh = setup_mesh(t, self.logger)
        self._place = make_batch_placer(
            self.mesh, spatial=t.get("mesh_spatial", 1) > 1)
        if self.mesh is not None:
            from senas_tpu.parallel.mesh import place_state
            self.state = place_state(self.mesh, self.state)

    def run(self, save_images: bool = True) -> Dict[str, float]:
        metric = SegmentationMetric(self.n_classes)
        loss_meter = AverageMeter()
        img_idx = 0
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image

        def write_images(batch, preds, img_idx):
            # preds arrive as device uint8 (4x smaller transfer); PIL/IO
            # runs on this worker thread while the device computes the next
            # batch (testing_model.py:172-190 did this synchronously)
            for i in range(preds.shape[0]):
                scale = 255 // max(1, self.n_classes - 1)
                Image.fromarray((preds[i] * scale).astype(np.uint8)).save(
                    os.path.join(self.image_dir, f"{img_idx + i:05d}.png"))
            grid = store_images(batch["image"], preds, batch["label"],
                                self.n_classes)
            Image.fromarray(grid).save(
                os.path.join(self.image_dir,
                             f"grid_{img_idx + preds.shape[0]:05d}.png"))

        writer = ThreadPoolExecutor(max_workers=1) if save_images else None
        pending = []
        for batch in self.valid_queue:
            out = self._eval(self.state.params, self.state.batch_stats,
                             self._place(batch))
            metric.update_counts(np.asarray(out["tp"]), np.asarray(out["fp"]),
                                 np.asarray(out["fn"]), float(out["acc"]))
            loss_meter.update(float(out["loss"]), n=batch["image"].shape[0])
            if save_images:
                preds = np.asarray(out["pred"])
                pending.append(writer.submit(write_images, batch, preds,
                                             img_idx))
                img_idx += preds.shape[0]
        if writer is not None:
            for f in pending:
                f.result()
            writer.shutdown()
        pixacc, miou, dice = metric.get()
        self.logger.info("val loss %f pixAcc %s mIoU %s dice %s",
                         loss_meter.avg, pixacc, miou, dice)
        return {"loss": loss_meter.avg, "pixAcc": pixacc, "mIoU": miou,
                "dice": dice}

    def run_promise12_submission(self, case_dir: str,
                                 dest: Optional[str] = None,
                                 queue: Optional[DataLoader] = None):
        """PROMISE12 challenge path (train_model.py:355-381 test() +
        store_test_seg.py): run inference over the (test) queue in case
        order, stitch the slice masks back into volumes with original
        origin/direction/spacing, and write <case>_segmentation.mhd files.
        Returns (written_paths, volumetric_summary_or_None)."""
        from senas_tpu.challenge import predict_test, volumetric_metrics

        queue = queue or self.valid_queue
        slices = []
        for batch in queue:
            out = self._eval(self.state.params, self.state.batch_stats,
                             self._place(batch))
            preds = np.asarray(out["pred"])
            slices.extend(preds[i] for i in range(preds.shape[0]))
        dest = dest or os.path.join(self.run_dir, "predictions")
        case_paths = sorted(
            os.path.join(case_dir, f) for f in os.listdir(case_dir)
            if f.endswith(".mhd") and "segm" not in f.lower())
        written = predict_test(slices, case_paths, dest=dest)
        summary = None
        has_gt = any("segm" in f.lower() for f in os.listdir(case_dir))
        if has_gt:
            summary = volumetric_metrics(slices, case_dir, logger=self.logger)
        self.logger.info("submission: %d volumes -> %s", len(written), dest)
        return written, summary
