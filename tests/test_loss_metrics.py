"""Loss / metric numerics vs independent torch & numpy formulations."""

import numpy as np
import jax.numpy as jnp

from senas_tpu.train.loss import (
    build_loss,
    cross_entropy,
    dice_ce_loss,
    multi_segmentation_loss,
    soft_dice_loss,
    soft_dice_loss_squared,
)
from senas_tpu.train.metrics import (
    SegmentationMetric,
    confusion_counts,
    mean_pix_accuracy,
)


def _rand_batch(b=2, h=8, w=8, c=3, seed=0):
    rs = np.random.RandomState(seed)
    logits = rs.randn(b, h, w, c).astype(np.float32)
    target = rs.randint(0, c, size=(b, h, w)).astype(np.int32)
    return logits, target


class TestLosses:
    def test_cross_entropy_matches_torch(self):
        import torch
        import torch.nn.functional as F
        logits, target = _rand_batch()
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
        theirs = float(F.cross_entropy(
            torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target).long()))
        assert abs(ours - theirs) < 1e-5

    def test_soft_dice_matches_manual(self):
        logits, target = _rand_batch(seed=1)
        ours = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
        # manual numpy: batch dice per class, skip background
        x = np.exp(logits - logits.max(-1, keepdims=True))
        x = x / x.sum(-1, keepdims=True)
        y = np.eye(3)[target]
        tp = (x * y).sum((0, 1, 2))
        fp = (x * (1 - y)).sum((0, 1, 2))
        fn = ((1 - x) * y).sum((0, 1, 2))
        dc = (2 * tp + 1e-5) / (2 * tp + fp + fn + 1e-5 + 1e-8)
        expected = 1 - dc[1:].mean()
        assert abs(ours - expected) < 1e-5

    def test_dice_ce_is_sum(self):
        logits, target = _rand_batch(seed=2)
        lg, tg = jnp.asarray(logits), jnp.asarray(target)
        total = float(dice_ce_loss(lg, tg))
        assert abs(total - float(cross_entropy(lg, tg)) - float(soft_dice_loss(lg, tg))) < 1e-6

    def test_squared_dice_differs(self):
        logits, target = _rand_batch(seed=3)
        lg, tg = jnp.asarray(logits), jnp.asarray(target)
        assert abs(float(soft_dice_loss(lg, tg)) - float(soft_dice_loss_squared(lg, tg))) > 1e-6

    def test_multi_loss_mean_over_heads(self):
        logits, target = _rand_batch(seed=4)
        lg, tg = jnp.asarray(logits), jnp.asarray(target)
        single = float(build_loss("dice_ce")([lg], tg))
        multi = float(multi_segmentation_loss("dice_ce", [lg, lg, lg], tg))
        assert abs(single - multi) < 1e-6

    def test_build_loss_uses_last_head(self):
        logits1, target = _rand_batch(seed=5)
        logits2, _ = _rand_batch(seed=6)
        fn = build_loss("cross_entropy")
        only_last = float(fn([jnp.asarray(logits1), jnp.asarray(logits2)], jnp.asarray(target)))
        direct = float(cross_entropy(jnp.asarray(logits2), jnp.asarray(target)))
        assert abs(only_last - direct) < 1e-6


class TestMetrics:
    def test_confusion_counts_vs_numpy(self):
        logits, target = _rand_batch(b=3, c=4, seed=7)
        tp, fp, fn = confusion_counts(jnp.asarray(logits), jnp.asarray(target))
        pred = logits.argmax(-1)
        for c in range(1, 4):
            assert tp[c - 1] == ((pred == c) & (target == c)).sum()
            assert fp[c - 1] == ((pred == c) & (target != c)).sum()
            assert fn[c - 1] == ((pred != c) & (target == c)).sum()

    def test_metric_accumulator_dice(self):
        m = SegmentationMetric(nclass=2)
        # perfect prediction => dice 100
        target = np.zeros((1, 4, 4), np.int32)
        target[0, :2] = 1
        logits = np.zeros((1, 4, 4, 2), np.float32)
        logits[..., 1] = np.where(target > 0, 10.0, -10.0)[0]
        m.update(target, logits)
        pixacc, miou, dice = m.get()
        assert dice == 100.0 and miou == 100.0

    def test_mean_pix_accuracy_binary(self):
        target = np.zeros((1, 4, 4), np.int32)
        target[0, 0, :] = 1  # 4 foreground pixels
        logits = np.zeros((1, 4, 4, 2), np.float32)
        logits[0, 0, :2, 1] = 10.0  # predict half of them
        logits[..., 0] += 1e-3
        acc = float(mean_pix_accuracy(jnp.asarray(logits), jnp.asarray(target)))
        assert abs(acc - 0.5) < 1e-3

    def test_metric_accumulates_across_batches(self):
        m = SegmentationMetric(nclass=3)
        for seed in range(3):
            logits, target = _rand_batch(c=3, seed=seed)
            m.update(target, logits)
        pixacc, miou, dice = m.get()
        assert 0 <= miou <= 100 and 0 <= dice <= 100


class TestDeferredMetrics:
    """DeferredMetrics (runner/common.py) must accumulate identically to
    per-step synchronous updates — it only batches the readbacks."""

    def _mk(self, nclass=3):
        from senas_tpu.runner.common import DeferredMetrics
        from senas_tpu.train.metrics import AverageMeter, SegmentationMetric
        metric = SegmentationMetric(nclass)
        meter = AverageMeter()
        return DeferredMetrics(metric, meter, drain_every=4), metric, meter

    def test_matches_synchronous_updates(self):
        import jax.numpy as jnp
        from senas_tpu.train.metrics import AverageMeter, SegmentationMetric
        rs = np.random.RandomState(0)
        acc, metric, meter = self._mk()
        ref_metric = SegmentationMetric(3)
        ref_meter = AverageMeter()
        for i in range(11):  # crosses the drain_every=4 boundary unevenly
            m = {"loss": jnp.float32(rs.rand()),
                 "tp": jnp.asarray(rs.randint(0, 50, 2)),
                 "fp": jnp.asarray(rs.randint(0, 50, 2)),
                 "fn": jnp.asarray(rs.randint(0, 50, 2)),
                 "acc": jnp.float32(rs.rand())}
            acc.push(m, n=2)
            ref_meter.update(float(m["loss"]), n=2)
            ref_metric.update_counts(np.asarray(m["tp"]), np.asarray(m["fp"]),
                                     np.asarray(m["fn"]), float(m["acc"]))
        acc.drain()
        assert meter.count == ref_meter.count
        assert abs(meter.avg - ref_meter.avg) < 1e-6
        assert metric.get() == ref_metric.get()

    def test_drain_idempotent_and_extra_keys_ignored(self):
        import jax.numpy as jnp
        acc, metric, meter = self._mk()
        m = {"loss": jnp.float32(1.0), "tp": jnp.ones(2), "fp": jnp.zeros(2),
             "fn": jnp.zeros(2), "acc": jnp.float32(0.5),
             "pred": jnp.zeros((2, 8, 8))}  # must not be fetched/required
        acc.push(m)
        acc.drain()
        acc.drain()
        assert meter.count == 1 and meter.avg == 1.0
