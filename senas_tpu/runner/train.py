"""Fixed-model training runner.

Host-loop parity with experiments/train_model.py:186-381: genotype
resolution (safe parser instead of eval()), model build via the factory,
epoch loop of jitted train steps, val epoch with best-dice/mIoU tracking +
patience early stop, best-checkpoint copy, TB-style scalars and val image
grids.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from senas_tpu.core.genotype import parse_genotype
from senas_tpu.data import (DataLoader, PrefetchLoader, get_dataset,
                            get_dataset_spec)
from senas_tpu.models import geno_searched
from senas_tpu.models.factory import get_segmentation_model
from senas_tpu.runner.common import (DEFAULT_DATA_ROOT, DEFAULT_LOG_ROOT,
                                     DeferredMetrics, check_global_batch,
                                     make_batch_placer,
                                     resolve_dataset_kwargs, resolve_precision,
                                     run_eval_loop, setup_mesh)
from senas_tpu.train.checkpoint import CheckpointManager
from senas_tpu.train.loss import build_loss
from senas_tpu.train.metrics import AverageMeter, SegmentationMetric
from senas_tpu.train.optim import (build_optimizer, build_scheduler,
                                   set_learning_rate)
from senas_tpu.train.trainer import (FixedTrainState, make_eval_step,
                                     make_train_step)
from senas_tpu.utils.logging import (ScalarWriter, calc_time, get_logger,
                                     make_run_dir, store_images)
from senas_tpu.utils.misc import StepTimer, calc_parameters_count, set_seed


def resolve_genotype(cfg: Dict[str, Any], cli_genotype: str = ""):
    """--genotype string > cfg training.geno_type name (train_model.py:117-120)."""
    if cli_genotype:
        return parse_genotype(cli_genotype)
    name = cfg["training"].get("geno_type", "senas")
    return getattr(geno_searched, name)


class TrainRunner:
    def __init__(self, cfg: Dict[str, Any], model_name: str = "senas",
                 genotype_str: str = "", config_path: Optional[str] = None,
                 data_root: str = DEFAULT_DATA_ROOT, log_root: str = DEFAULT_LOG_ROOT,
                 ft: bool = False, dtype=None):
        self.cfg = cfg
        t = cfg["training"]
        set_seed(cfg.get("seed", 0))
        if dtype is None:
            dtype = resolve_precision(t.get("precision"))
        ds_name = cfg["data"]["dataset"]
        self.model_name = model_name
        self.run_dir = make_run_dir(log_root, model_name, "train", ds_name,
                                    config_path)
        self.logger = get_logger(self.run_dir)
        self.writer = ScalarWriter(self.run_dir)
        self.ckpt = CheckpointManager(os.path.join(self.run_dir, "ckpt"))

        dkw = resolve_dataset_kwargs(cfg)
        trainset = get_dataset(ds_name, path=data_root,
                               split=cfg["data"].get("train_split", "train"),
                               mode="train", **dkw)
        valset = get_dataset(ds_name, path=data_root,
                             split=cfg["data"].get("split", "val"), mode="val", **dkw)
        spec = get_dataset_spec(ds_name)
        self.n_classes = spec.num_class
        bs = t["batch_size"]
        self.train_queue = DataLoader(trainset, bs, shuffle=True, drop_last=True,
                                      seed=cfg.get("seed", 0))
        self.valid_queue = DataLoader(valset, bs, shuffle=False)

        genotype = resolve_genotype(cfg, genotype_str)
        self.model = get_segmentation_model(
            model_name, dataset=ds_name, c=t.get("init_channels", 32),
            depth=t.get("depth", 5), supervision=t.get("deep_supervision", False),
            genotype=genotype,
            double_down_channel=t.get("double_down_channel", False),
            remat=t.get("remat", False), dtype=dtype)

        hw = spec.crop_size
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        x0 = jnp.zeros((bs, hw[0], hw[1], spec.in_channels), jnp.float32)
        variables = self.model.init({"params": rng}, x0, False)
        self.logger.info("param size = %.3f MB",
                         calc_parameters_count(variables["params"]))

        loss_cfg = t.get("loss") or {}
        loss_name = loss_cfg.get("name", "dice_ce") if isinstance(loss_cfg, dict) else "dice_ce"
        self.loss_fn = build_loss(loss_name,
                                  supervision=t.get("deep_supervision", False))
        self.tx = build_optimizer(t.get("model_optimizer"))
        base_lr = float((t.get("model_optimizer") or {}).get("lr", 1e-2))
        sched_cfg = dict(t.get("lr_schedule") or {"name": "cos"})
        if sched_cfg.get("name") == "cos":
            sched_cfg.setdefault("T_max", t["epoch"])
            sched_cfg["T_max"] = t["epoch"]  # CLI rewires T_max := epochs
        self.scheduler = build_scheduler(base_lr, sched_cfg)

        self.train_step = make_train_step(self.model.apply, self.loss_fn, self.tx,
                                          grad_clip=t.get("grad_clip", 0.0))
        self._eval_raw = make_eval_step(self.model.apply, self.loss_fn)
        self.state = FixedTrainState.create(variables, self.tx)

        # multi_gpus config -> device mesh (train_model.py:135-137 equivalent)
        self.mesh = setup_mesh(t, self.logger)
        check_global_batch(self.mesh, bs, "training.batch_size")
        self._place = make_batch_placer(
            self.mesh, spatial=t.get("mesh_spatial", 1) > 1)
        if self.mesh is not None:
            from senas_tpu.parallel.mesh import place_state
            self.state = place_state(self.mesh, self.state)

        self.start_epoch = 0
        self.best_dice = 0.0
        self.best_miou = 0.0
        self.patience = 0
        self.dur_time = 0.0
        self._maybe_resume(t.get("resume"), ft)

    def _maybe_resume(self, resume: Optional[str], ft: bool):
        mgr = CheckpointManager(resume) if resume else self.ckpt
        if not mgr.exists("last"):
            return
        restored = mgr.restore(self.state, "last")
        if restored is None:
            return
        self.state = jax.tree.map(jnp.asarray, restored["state"])
        if self.mesh is not None:
            from senas_tpu.parallel.mesh import place_state
            self.state = place_state(self.mesh, self.state)
        meta = restored["meta"] or {}
        if not ft:  # --ft resets counters for fine-tuning (train_model.py:154-174)
            self.start_epoch = int(meta.get("epoch", 0))
            self.best_dice = float(meta.get("best_dice", 0.0))
            self.best_miou = float(meta.get("best_miou", 0.0))
            self.dur_time = float(meta.get("dur_time", 0.0))
        self.logger.info("resumed from %s at epoch %d", mgr.directory,
                         self.start_epoch)

    def eval_step(self, batch):
        return self._eval_raw(self.state.params, self.state.batch_stats, batch)

    # ------------------------------------------------------------------
    def run(self) -> Dict[str, float]:
        t = self.cfg["training"]
        epochs = t["epoch"]
        report_freq = t.get("report_freq", 10)
        max_patience = t.get("max_patience", 1 << 30)
        run_start = time.time()

        for epoch in range(self.start_epoch, epochs):
            lr = self.scheduler(epoch)
            set_learning_rate(self.state.opt_state, lr)
            self.logger.info("Epoch %d / %d lr %e", epoch, epochs, lr)

            metric = SegmentationMetric(self.n_classes)
            loss_meter = AverageMeter()
            acc = DeferredMetrics(metric, loss_meter)
            timer = StepTimer(trace_dir=os.environ.get("SENAS_TRACE_DIR"))
            for step, batch in enumerate(PrefetchLoader(self.train_queue)):
                with timer:
                    self.state, m = self.train_step(self.state,
                                                    self._place(batch))
                acc.push(m)
                if step % report_freq == 0:
                    acc.drain()
                    pixacc, miou, dice = metric.get()
                    self.logger.info("Train %03d loss %e dice %.5f", step + 1,
                                     loss_meter.avg, dice)
            acc.drain()
            _, _, train_dice = metric.get()
            self.writer.add_scalar("Train/Loss", loss_meter.avg, epoch)
            self.writer.add_scalar("Train/dice", train_dice, epoch)
            self.writer.add_scalar("Train/steps_per_sec", timer.steps_per_sec,
                                   epoch)

            # ---- validation ----
            vmetric, vloss = run_eval_loop(self.eval_step, self.valid_queue,
                                           self.n_classes,
                                           place_fn=self._place)
            # input|pred|gt grid of the first val batch (train_model.py:331)
            try:
                first = next(iter(self.valid_queue))
                out = self.eval_step(self._place(first))
                grid = store_images(first["image"], np.asarray(out["pred"]),
                                    first["label"], self.n_classes)
                self.writer.add_image_grid("Val/images", grid, epoch)
            except Exception as e:  # image logging must never kill training
                self.logger.warning("val image grid failed: %s", e)
            pixacc, miou, dice = vmetric.get()
            self.logger.info("Epoch %d Val loss: %f pixAcc: %s mIoU: %s dice: %s",
                             epoch, vloss.avg, pixacc, miou, dice)
            for tag, v in [("Val/Acc", pixacc), ("Val/mIoU", miou),
                           ("Val/dice", dice), ("Val/loss", vloss.avg)]:
                self.writer.add_scalar(tag, v, epoch)

            # best tracking + patience (train_model.py:344-353)
            is_best = False
            if dice > self.best_dice:
                self.best_dice = dice
                self.best_miou = max(self.best_miou, miou)
                is_best = True
                self.patience = 0
            elif miou > self.best_miou:
                self.best_miou = miou
                is_best = True
                self.patience = 0
            else:
                self.patience += 1

            self.ckpt.save(self.state, {
                "epoch": epoch + 1,
                "dur_time": self.dur_time + time.time() - run_start,
                "best_dice": self.best_dice,
                "best_miou": self.best_miou,
                "model_name": self.model_name,
            }, is_best=is_best)

            if self.patience >= max_patience:
                self.logger.info("Early stopping! patience %d", self.patience)
                break

        self.logger.info("End! best dice %.3f best mIoU %.3f dur %s",
                         self.best_dice, self.best_miou,
                         calc_time(self.dur_time + time.time() - run_start))
        self.writer.close()
        return {"best_dice": self.best_dice, "best_miou": self.best_miou}
