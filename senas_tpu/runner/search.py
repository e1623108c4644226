"""Supernet architecture search runner.

Host-loop parity with experiments/search_arc.py:177-330, jitted steps from
train/trainer.py. Flow per epoch: derive + log genotype; genotype-stability
patience (early stop) once arch updates begin (alpha_begin); bilevel train
loop (ONE compiled step does arch update on a val batch + weight update on a
train batch); eval epoch; checkpoint (arch params + both optimizer states).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from senas_tpu.data import (DataLoader, PrefetchLoader, get_dataset,
                            get_dataset_spec)
from senas_tpu.runner.common import (DEFAULT_DATA_ROOT, DEFAULT_LOG_ROOT,
                                     DeferredMetrics, check_global_batch,
                                     make_batch_placer,
                                     resolve_dataset_kwargs, resolve_precision,
                                     run_eval_loop, setup_mesh)
from senas_tpu.search.supernet import (SenasSearch, derive_genotype,
                                       init_arch_params, normalize_arch)
from senas_tpu.train.checkpoint import CheckpointManager
from senas_tpu.train.loss import build_loss
from senas_tpu.train.metrics import AverageMeter, SegmentationMetric
from senas_tpu.train.optim import (build_optimizer, build_scheduler,
                                   set_learning_rate)
from senas_tpu.train.trainer import (SearchTrainState, make_search_eval_step,
                                     make_search_step)
from senas_tpu.utils.logging import ScalarWriter, calc_time, get_logger, make_run_dir
from senas_tpu.utils.misc import StepTimer, calc_parameters_count, set_seed


class SearchRunner:
    def __init__(self, cfg: Dict[str, Any], config_path: Optional[str] = None,
                 data_root: str = DEFAULT_DATA_ROOT, log_root: str = DEFAULT_LOG_ROOT,
                 dtype=None):
        self.cfg = cfg
        s = cfg["searching"]
        set_seed(cfg.get("seed", 0))
        if dtype is None:
            dtype = resolve_precision(s.get("precision"))

        ds_name = cfg["data"]["dataset"]
        self.run_dir = make_run_dir(log_root, cfg["model"]["arch"], "search",
                                    ds_name, config_path)
        self.logger = get_logger(self.run_dir)
        self.writer = ScalarWriter(self.run_dir)
        self.ckpt = CheckpointManager(os.path.join(self.run_dir, "ckpt"))

        # dataset: ONE trainset split 50/50 (train_portion) into train/val
        # index sets (search_arc.py:78-94)
        dataset = get_dataset(ds_name, path=data_root, split=cfg["data"].get(
            "train_split", "train"), mode="train", **resolve_dataset_kwargs(cfg))
        spec = get_dataset_spec(ds_name)
        self.n_classes = spec.num_class
        n = len(dataset)
        indices = list(range(n))
        split = int(np.floor(s.get("train_portion", 0.5) * n))
        bs = s["batch_size"]
        self.train_queue = DataLoader(dataset, bs, shuffle=True, drop_last=True,
                                      indices=indices[:split], seed=cfg.get("seed", 0))
        self.valid_queue = DataLoader(dataset, bs, shuffle=True, drop_last=True,
                                      indices=indices[split:],
                                      seed=cfg.get("seed", 0) + 1)

        # model + arch params
        self.meta_node_num = s["meta_node_num"]
        self.depth = s["depth"]
        self.use_sharing = s.get("sharing_normal", True)
        self.net = SenasSearch(
            in_channels=spec.in_channels, c=s["init_channels"],
            nclass=self.n_classes, depth=self.depth,
            meta_node_num=self.meta_node_num,
            double_down_channel=s.get("double_down_channel", False),
            supervision=s.get("deep_supervision", False),
            remat=s.get("remat", False), dtype=dtype)
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        arch = init_arch_params(jax.random.split(rng)[1], self.meta_node_num,
                                self.depth, use_sharing=self.use_sharing)
        hw = spec.crop_size
        x0 = jnp.zeros((bs, hw[0], hw[1], spec.in_channels), jnp.float32)
        aw = normalize_arch(arch, self.meta_node_num,
                            s.get("beta_mode", "reference"))
        variables = self.net.init({"params": rng}, x0, aw, False)
        self.logger.info("param size = %.3f MB",
                         calc_parameters_count(variables["params"]))

        loss_name = s["loss"]["name"] if isinstance(s.get("loss"), dict) else "dice_ce"
        self.loss_fn = build_loss(loss_name, supervision=s.get("deep_supervision", False))
        self.w_tx = build_optimizer(s.get("model_optimizer"))
        self.a_tx = build_optimizer(s.get("arch_optimizer"))
        base_lr = float(s.get("model_optimizer", {}).get("lr", 1e-2))
        self.scheduler = build_scheduler(base_lr, {"name": "cos", "T_max": s["epoch"]})

        # beta grouping: "reference" reproduces the reference's overlapping
        # softmax groups; "grouped" is the disjoint variant (supernet.py)
        self.beta_mode = s.get("beta_mode", "reference")
        normalize = lambda a: normalize_arch(a, self.meta_node_num,
                                             self.beta_mode)
        # reference mode (default): the weight SGD also updates the arch
        # tables and the clip norm spans weight+arch grads, because the
        # reference's model_optimizer is built over model.parameters()
        # (search_arc.py:135). Set searching.arch_in_weight_step: false for
        # the "pure" DARTS variant.
        aiws = bool(s.get("arch_in_weight_step", True))
        self.search_step = make_search_step(self.net.apply, normalize, self.loss_fn,
                                            self.w_tx, self.a_tx,
                                            grad_clip=s.get("grad_clip", 5.0),
                                            arch_in_weight_step=aiws)
        _eval = make_search_eval_step(self.net.apply, normalize, self.loss_fn)
        self.state = SearchTrainState.create(variables, arch, self.w_tx, self.a_tx,
                                             arch_in_weight_step=aiws)
        self._eval_raw = _eval

        # multi_gpus config -> device mesh (the pjit generalization of the
        # reference's supernet replica path, search_arc.py:119-121 +
        # senas_search.py:262-279; arch tables stay replicated)
        self.mesh = setup_mesh(s, self.logger)
        check_global_batch(self.mesh, bs, "searching.batch_size")
        self._place = make_batch_placer(
            self.mesh, spatial=s.get("mesh_spatial", 1) > 1)
        if self.mesh is not None:
            from senas_tpu.parallel.mesh import place_state
            self.state = place_state(self.mesh, self.state)

        self.start_epoch = 0
        self.patience = 0
        self.geno_type = None
        self.dur_time = 0.0
        self._maybe_resume(s.get("resume"))

    # ------------------------------------------------------------------
    def _maybe_resume(self, resume: Optional[str]):
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
        self.start_epoch = int(meta.get("epoch", 0))
        self.patience = int(meta.get("cur_patience", 0))
        self.dur_time = float(meta.get("dur_time", 0.0))
        gt = meta.get("geno_type")
        self.geno_type = gt
        self.logger.info("resumed from %s at epoch %d", mgr.directory, self.start_epoch)

    def eval_step(self, batch):
        return self._eval_raw(self.state.params, self.state.batch_stats,
                              self.state.arch, batch)

    def derive(self):
        return derive_genotype(jax.device_get(self.state.arch),
                               self.meta_node_num, self.depth,
                               beta_mode=self.beta_mode)

    # ------------------------------------------------------------------
    def run(self) -> str:
        cfg_s = self.cfg["searching"]
        run_start = time.time()
        epochs = cfg_s["epoch"]
        alpha_begin = cfg_s.get("alpha_begin", 0)
        max_patience = cfg_s.get("max_patience", 1 << 30)
        report_freq = cfg_s.get("report_freq", 10)

        for epoch in range(self.start_epoch, epochs):
            lr = self.scheduler(epoch)
            set_learning_rate(self.state.w_opt_state, lr)
            self.logger.info("Epoch %d / %d lr %e", epoch, epochs, lr)

            genotype = self.derive()
            self.logger.info("genotype = %s", genotype)

            if epoch >= alpha_begin:
                if self.geno_type == repr(genotype):
                    self.patience += 1
                else:
                    self.patience = 0
                    self.geno_type = repr(genotype)
                self.logger.info("Current patience :%d", self.patience)
                if self.patience >= max_patience:
                    self.logger.info("Reach the max patience! best genotype %s",
                                     self.geno_type)
                    break

            # ---- train epoch (bilevel) ----
            train_metric = SegmentationMetric(self.n_classes)
            loss_meter = AverageMeter()
            acc = DeferredMetrics(train_metric, loss_meter)
            timer = StepTimer(trace_dir=os.environ.get("SENAS_TRACE_DIR"))
            do_arch = epoch >= alpha_begin
            val_iter = iter(self.valid_queue)
            for step, batch in enumerate(PrefetchLoader(self.train_queue)):
                try:
                    val_batch = next(val_iter)
                except StopIteration:
                    val_iter = iter(self.valid_queue)
                    val_batch = next(val_iter)
                with timer:
                    self.state, m = self.search_step(
                        self.state, self._place(batch),
                        self._place(val_batch), do_arch)
                acc.push(m)
                if step % report_freq == 0:
                    acc.drain()
                    pixacc, miou, dice = train_metric.get()
                    self.logger.info("Train %03d loss %e dice %.5f", step + 1,
                                     loss_meter.avg, dice)
            acc.drain()
            _, _, train_dice = train_metric.get()
            self.writer.add_scalar("Train/Loss", loss_meter.avg, epoch)
            self.writer.add_scalar("Train/dice", train_dice, epoch)
            self.writer.add_scalar("Train/steps_per_sec", timer.steps_per_sec,
                                   epoch)

            # ---- eval epoch ----
            metric, vloss = run_eval_loop(self.eval_step, self.valid_queue,
                                          self.n_classes,
                                          place_fn=self._place)
            pixacc, miou, dice = metric.get()
            self.logger.info("Epoch %d Val loss: %f, pixAcc: %s, mIoU: %s, dice: %s",
                             epoch, vloss.avg, pixacc, miou, dice)
            self.writer.add_scalar("Val/pixAcc", pixacc, epoch)
            self.writer.add_scalar("Val/mIoU", miou, epoch)
            self.writer.add_scalar("Val/dice", dice, epoch)
            self.writer.add_scalar("Val/loss", vloss.avg, epoch)

            self.ckpt.save(self.state, {
                "epoch": epoch + 1,
                "dur_time": self.dur_time + time.time() - run_start,
                "cur_patience": self.patience,
                "geno_type": self.geno_type,
            })
            self.logger.info("save checkpoint (epoch %d) in %s dur_time: %s", epoch,
                             self.ckpt.directory,
                             calc_time(self.dur_time + time.time() - run_start))

        final = self.geno_type or repr(self.derive())
        self.writer.export_scalars_to_json(os.path.join(self.run_dir,
                                                        "all_scalars.json"))
        self.writer.close()
        self.logger.info("End! best genotype %s", final)
        return final
