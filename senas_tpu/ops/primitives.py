"""NAS op vocabulary and shared conv blocks, TPU-native (NHWC, Flax linen).

Semantics mirror the reference op library (/root/reference/utils/operations.py)
— same candidate-op names, same stride/dilation/padding arithmetic, same
BN-everywhere structure — but the implementation is JAX-first:

  * NHWC layout throughout (TPU conv native layout; torch reference is NCHW).
  * Explicit symmetric padding p = (k//2)*dilation, matching torch's
    Conv2d(padding=p) exactly, so spatial shapes agree with the reference at
    every stride/dilation combination.
  * Transposed convs are expressed as lhs-dilated convs
    (lax.conv_general_dilated with lhs_dilation=stride), the XLA-native form;
    output shape matches torch ConvTranspose2d(k, stride, padding=p,
    output_padding=op) = (H-1)*s - 2p + d*(k-1) + op + 1.
  * BatchNorm uses torch defaults (momentum 0.1 in torch convention ==
    flax momentum 0.9, eps 1e-5).
  * Weight init matches weights_init (utils/utils.py:240-251), which the
    reference applies to every model it trains: kaiming-normal fan_out/relu
    convs + transpose convs, xavier-normal dense (bias 0), BN scale=1 shift=0.

Candidate op registry parity: OPS/DownOps/UpOps/NormOps/OpType follow
utils/operations.py:8-54. Op-set list order is load-bearing (alpha columns).
"""

from __future__ import annotations

import enum
import os
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from senas_tpu.core.genotype import DownOps, NormOps, UpOps

# ---------------------------------------------------------------------------
# Initializers / norm / activation builders
# ---------------------------------------------------------------------------

# Init parity: the reference applies weights_init (utils/utils.py:240-251) to
# EVERY model it trains -- experiments/train_model.py:131-133 and the supernet
# at search/senas_search.py:126-127. Conv/ConvTranspose kernels get
# kaiming_normal_(mode='fan_out', nonlinearity='relu'), nn.Linear gets
# xavier_normal_, BatchNorm gets (weight=1, bias=0). Mirrored below.
#
# torch computes fans as fan_out = weight.size(0) * k*k, fan_in =
# weight.size(1) * k*k. On our [k, k, I, O] Conv kernel layout torch's
# Conv2d fan_out (O*k*k) is flax "fan_out"; but torch's ConvTranspose2d
# weight layout is [Cin, Cout/groups, k, k], so its "fan_out" there is
# Cin*k*k -- flax "fan_in" on our layout (groups == 1). Grouped/fused
# layouts whose torch fan is visible to neither flax mode use
# kaiming_normal_fan with the torch fan computed explicitly.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
kaiming_normal_transpose = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
xavier_normal = nn.initializers.xavier_normal()
xavier_uniform = nn.initializers.xavier_uniform()


def kaiming_normal_fan(fan: int):
    """kaiming_normal_(nonlinearity='relu') with an explicit torch fan."""
    std = (2.0 / fan) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_fans(fan_in: int, fan_out: int):
    """xavier_normal_ with explicit torch fans (for stacked/fused layouts
    whose flax-inferred fans would be wrong, e.g. [E, in, out])."""
    std = (2.0 / (fan_in + fan_out)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_conv_bias(fan_in: int):
    """torch Conv2d/ConvTranspose2d DEFAULT bias init: U(-b, b) with
    b = 1/sqrt(fan_in). weights_init only re-inits Linear biases (to 0);
    conv biases keep this torch default, so bias-carrying conv ports
    mirror it. fan_in is the torch weight fan_in (Cin/groups * k * k)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init

Dtype = Any


def get_same_padding(kernel_size: int) -> int:
    assert kernel_size % 2 > 0, "kernel size should be odd number"
    return kernel_size // 2


def _use_pallas_bn() -> bool:
    """Gate for routing every 4-D BatchNorm through the Pallas fused affine
    kernels (ops/grouped_epilogue.py with n=1): stats + apply over a
    [B,H,W*C] lane-filling view instead of XLA's C-minor elementwise graph.

    MEASURED NEGATIVE on the v5e (keep-the-winner, BASELINE.md round 3):
    fixed-train bf16 batch 12 @ 256² is 0.82x with the gate on (85.6 ->
    70.2 img/s) and HBM bytes/step RISE 87.5 -> 98.5 GB — a standalone
    Pallas BN opts the tensor out of XLA's larger conv/elementwise fusions,
    so it pays extra reads the fused XLA graph never issues. The win of the
    same kernels in GroupedMixedOp (n=6 branches, default ON there) comes
    from amortizing the stats/apply sweeps across branches + killing the
    alpha-mix pass; at n=1 there is nothing to amortize. Default stays OFF;
    the env var remains for tests/benches."""
    return os.environ.get("SENAS_PALLAS_BN", "0") == "1"


class BatchNorm(nn.Module):
    """BatchNorm with EXACT torch nn.BatchNorm2d semantics.

    flax.linen.BatchNorm updates the running variance with the BIASED batch
    estimate; torch uses the UNBIASED one (factor n/(n-1)) — a ~0.1%/update
    running-var drift that breaks strict eval parity. This module follows
    torch: normalize by biased batch stats in train mode, update running
    stats with momentum 0.1 and the unbiased variance. Variable layout
    matches flax ({params: scale, bias}, {batch_stats: mean, var}) and the
    class name keeps the "BatchNorm_0" auto-naming.
    """

    momentum: float = 0.1  # torch convention (flax equivalent: 0.9)
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if _use_pallas_bn() and x.ndim == 4:
            return self._pallas_path(x, scale, bias, ra_mean, ra_var,
                                     use_running_average)
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased: normalization
            self._update_stats(ra_mean, ra_var, mean, var, x.size // c)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)

    def _update_stats(self, ra_mean, ra_var, mean, var, n):
        if self.is_initializing():
            return
        unbiased = var * (n / max(n - 1, 1))
        m = self.momentum
        ra_mean.value = (1 - m) * ra_mean.value + m * mean
        ra_var.value = (1 - m) * ra_var.value + m * unbiased

    def _pallas_path(self, x, scale, bias, ra_mean, ra_var,
                     use_running_average):
        from senas_tpu.ops.grouped_epilogue import fused_group_epilogue
        ones = jnp.ones_like(scale)
        interpret = jax.default_backend() == "cpu"
        out_dtype = self.dtype or x.dtype
        if use_running_average:
            y, _ = fused_group_epilogue(
                [x], [scale], [bias], [ones], train=False,
                run_means=[ra_mean.value], run_vars=[ra_var.value],
                out_dtype=out_dtype, interpret=interpret)
            return y
        y, (mu, var) = fused_group_epilogue(
            [x], [scale], [bias], [ones], train=True,
            out_dtype=out_dtype, interpret=interpret)
        self._update_stats(ra_mean, ra_var, mu[0], var[0],
                           x.size // x.shape[-1])
        return y


def build_norm(dtype: Optional[Dtype] = None, name: Optional[str] = None) -> BatchNorm:
    """BatchNorm matching torch nn.BatchNorm2d defaults (see BatchNorm)."""
    return BatchNorm(dtype=dtype, name=name)


def relu(x):
    return nn.relu(x)


# ---------------------------------------------------------------------------
# Functional conv / pool / resize primitives (NHWC)
# ---------------------------------------------------------------------------

# Full-depthwise convolutions (feature_group_count == C) do not map onto the
# TPU MXU: XLA lowers them — and especially their KERNEL GRADIENTS — to VPU
# multiply+reduce loops. Profiled on the v5e chip, the supernet search step
# spent 380 ms/step (27%) in scalar-output multiply_reduce fusions that are
# exactly the dep-sep kernel grads at 256²/128² (~3 ms each for work a conv
# does in tens of µs). Rewriting a depthwise conv as a DENSE conv with a
# block-diagonal kernel is numerically identical (the off-block weights are
# exact zeros) but runs forward AND both backward convs on the MXU. The
# C× FLOP inflation only pays off for small C, so it is gated.
DENSE_DEPTHWISE_MAX_CHANNELS = int(
    os.environ.get("SENAS_DENSE_DEPTHWISE_MAX_CHANNELS", "64"))


def _densify_depthwise(w, c_in: int):
    """[k,k,1,C*mult] depthwise kernel -> block-diagonal dense [k,k,C,C*mult].

    XLA group semantics: with feature_group_count=C, output feature o uses
    input channel o // mult — the mask places each depthwise filter on that
    diagonal block and exact zeros elsewhere."""
    co = w.shape[3]
    mult = co // c_in
    sel = (jnp.arange(c_in)[:, None] == (jnp.arange(co)[None, :] // mult))
    return w[:, :, 0][:, :, None, :] * sel[None, None].astype(w.dtype)


def conv2d(x, w, stride: int = 1, dilation: int = 1, groups: int = 1):
    """2D conv, NHWC/HWIO, torch-style symmetric padding (k//2)*dilation."""
    k = w.shape[0]
    p = get_same_padding(k) * dilation if k > 1 else 0
    if groups > 1 and groups == x.shape[-1] and w.shape[2] == 1 \
            and groups <= DENSE_DEPTHWISE_MAX_CHANNELS:
        w = _densify_depthwise(w, groups)
        groups = 1
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv_transpose2d(x, w, stride: int = 2, dilation: int = 1, output_padding: int = 1,
                     groups: int = 1, torch_padding: Optional[int] = None):
    """Transposed conv as an lhs-dilated conv (XLA-native formulation).

    Output spatial size matches torch ConvTranspose2d(kernel, stride,
    padding=torch_padding, dilation, output_padding):
        out = (H-1)*stride - 2p + dilation*(k-1) + output_padding + 1
    """
    k = w.shape[0]
    p = get_same_padding(k) * dilation if torch_padding is None else torch_padding
    dk = dilation * (k - 1) + 1
    lo = dk - 1 - p
    hi = dk - 1 - p + output_padding
    if groups > 1 and groups == x.shape[-1] and w.shape[2] == 1 \
            and groups <= DENSE_DEPTHWISE_MAX_CHANNELS:
        w = _densify_depthwise(w, groups)
        groups = 1
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def avg_pool_3x3(x, stride: int = 1):
    """AvgPool2d(3, stride, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    window = (1, 3, 3, 1)
    strides = (1, stride, stride, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pad)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pad)
    return summed / counts


def max_pool_3x3(x, stride: int = 2):
    """MaxPool2d(3, stride, padding=1)."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, 3, 3, 1),
        (1, stride, stride, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def max_pool_2x2(x):
    """MaxPool2d(2, stride=2) — MixedOp partial-channel skip path."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)),
    )


def upsample2x(x):
    """Bilinear 2x upsample, align_corners=False (half-pixel centers)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def channel_shuffle(x, groups: int):
    """NHWC channel shuffle (utils/utils.py:32-40)."""
    if groups == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def spatial_dropout(x, rate: float, deterministic: bool, rng=None):
    """Dropout2d: drops whole channels per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[3]))
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Op-type vocabulary
# ---------------------------------------------------------------------------

class OpType(enum.Enum):
    UP = {"id": 1, "ops": UpOps}
    DOWN = {"id": 2, "ops": DownOps}
    NORM = {"id": 3, "ops": NormOps}


# ---------------------------------------------------------------------------
# Parametric blocks
# ---------------------------------------------------------------------------

class _ConvWeight(nn.Module):
    """[Dropout2d] + (Conv | ConvTranspose), bias-free (build_weight parity)."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    transpose: bool = False
    output_padding: int = 0
    dropout: float = 0.0
    groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout > 0:
            x = spatial_dropout(
                x, self.dropout, deterministic=not train,
                rng=self.make_rng("dropout") if train else None,
            )
        if self.dtype is not None:
            x = x.astype(self.dtype)  # bf16 compute: params stay f32 masters
        c_in = x.shape[-1]
        # torch fan_out: Conv2d -> c_out*k*k (flax "fan_out" on our layout,
        # any groups); ConvTranspose2d -> c_in*k*k (weight.size(0) is Cin)
        init = (kaiming_normal_fan(c_in * self.kernel_size ** 2)
                if self.transpose else kaiming_normal)
        w = self.param(
            "kernel",
            init,
            (self.kernel_size, self.kernel_size, c_in // self.groups, self.c_out),
            jnp.float32,
        )
        w = w.astype(self.dtype or x.dtype)
        if self.transpose:
            return conv_transpose2d(
                x, w, stride=self.stride, dilation=self.dilation,
                output_padding=self.output_padding, groups=self.groups,
            )
        return conv2d(x, w, stride=self.stride, dilation=self.dilation, groups=self.groups)


class ReLUConv(nn.Module):
    """act -> conv (segmentation head building block)."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    transpose: bool = False
    output_padding: int = 0
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = relu(x)
        return _ConvWeight(
            self.c_out, self.kernel_size, self.stride, self.dilation,
            self.transpose, self.output_padding, self.dropout, dtype=self.dtype,
        )(x, train)


class ConvBn(nn.Module):
    """conv -> BN."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    transpose: bool = False
    output_padding: int = 0
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvWeight(
            self.c_out, self.kernel_size, self.stride, self.dilation,
            self.transpose, self.output_padding, self.dropout, dtype=self.dtype,
        )(x, train)
        return build_norm(self.dtype)(x, use_running_average=not train)


class SEBlock(nn.Module):
    """Squeeze-and-Excitation, r=16 (utils/operations.py:186-203)."""

    r: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = c // self.r if c > self.r else 1
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        # reference SEBlock is nn.Linear (operations.py:193-195) -> weights_init
        # gives xavier_normal_ kernels (bias-free, matching bias=False)
        y = nn.Dense(mid, use_bias=False, kernel_init=xavier_normal, dtype=self.dtype)(y)
        y = relu(y)
        y = nn.Dense(c, use_bias=False, kernel_init=xavier_normal, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ConvBnSe(nn.Module):
    """conv -> BN -> SE."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    transpose: bool = False
    output_padding: int = 0
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBn(
            self.c_out, self.kernel_size, self.stride, self.dilation,
            self.transpose, self.output_padding, self.dropout, dtype=self.dtype,
        )(x, train)
        return SEBlock(dtype=self.dtype)(x)


class DepSepConv(nn.Module):
    """depthwise conv -> BN -> ReLU -> pointwise conv -> BN."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    transpose: bool = False
    output_padding: int = 0
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = _ConvWeight(
            c_in, self.kernel_size, self.stride, self.dilation,
            self.transpose, self.output_padding, self.dropout, groups=c_in,
            dtype=self.dtype, name="depth",
        )(x, train)
        x = build_norm(self.dtype, name="depth_norm")(x, use_running_average=not train)
        x = relu(x)
        x = _ConvWeight(self.c_out, 1, 1, 1, False, 0, self.dropout,
                        dtype=self.dtype, name="point")(x, train)
        return build_norm(self.dtype, name="point_norm")(x, use_running_average=not train)


class AdapterBlock(nn.Module):
    """Parameterless inner op (zero/identity/pool/upsample) + channel adapter.

    mode in {'none','identity','avg_pool','max_pool','up_sample'};
    stride applies to the pool modes (2 for DOWN, 1 for NORM).
    Mirrors AdapterBlock + build_ops pooling paths (utils/operations.py:9-13,
    61-64, 167-183): inner -> optional 1x1 conv (if c_in != c_out) -> BN.
    """

    c_out: int
    mode: str
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.mode == "none":
            out = jnp.zeros_like(x)
        elif self.mode == "identity":
            out = x
        elif self.mode == "avg_pool":
            out = avg_pool_3x3(x, stride=self.stride)
        elif self.mode == "max_pool":
            out = max_pool_3x3(x, stride=self.stride)
        elif self.mode == "up_sample":
            out = upsample2x(x)
        else:
            raise ValueError(f"unknown adapter mode {self.mode!r}")
        if x.shape[-1] != self.c_out:
            w = self.param("kernel", kaiming_normal, (1, 1, x.shape[-1], self.c_out), jnp.float32)
            out = conv2d(out, w.astype(out.dtype))
        return build_norm(self.dtype)(out, use_running_average=not train)


class RectifyResample(nn.Module):
    """Cell-input resampling (build_rectify, utils/operations.py:141-152).

    act -> {2x up (bilinear | 1x1 transpose) | 2x down (avgpool | 1x1 conv)}
    -> BN. The conv-free path is taken when c_in == c_out.
    """

    c_out: int
    cell_type: str  # 'up' | 'down'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out = relu(x)
        c_in = x.shape[-1]
        if self.cell_type == "up":
            if c_in == self.c_out:
                out = upsample2x(out)
            else:
                w = self.param("kernel", kaiming_normal_transpose,
                               (1, 1, c_in, self.c_out), jnp.float32)
                out = conv_transpose2d(out, w.astype(out.dtype), stride=2,
                                       output_padding=1, torch_padding=0)
        else:
            if c_in == self.c_out:
                out = avg_pool_3x3(out, stride=2)
            else:
                w = self.param("kernel", kaiming_normal, (1, 1, c_in, self.c_out), jnp.float32)
                out = conv2d(out, w.astype(out.dtype), stride=2)
        return build_norm(self.dtype)(out, use_running_average=not train)


class ShrinkBlock(nn.Module):
    """act -> 3x3 conv -> BN: maps grown skip-concat width back down."""

    c_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out = relu(x)
        w = self.param("kernel", kaiming_normal, (3, 3, x.shape[-1], self.c_out), jnp.float32)
        out = conv2d(out, w.astype(out.dtype))
        return build_norm(self.dtype)(out, use_running_average=not train)


class RectifyBlock(nn.Module):
    """3x3 conv -> BN: cell expand/post-process."""

    c_out: int
    cell_type: str = "down"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        w = self.param("kernel", kaiming_normal, (3, 3, x.shape[-1], self.c_out), jnp.float32)
        out = conv2d(x, w.astype(x.dtype))
        return build_norm(self.dtype)(out, use_running_average=not train)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (stem1 / resnet10 encoder building block)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        residual = x
        w1 = self.param("conv1", kaiming_normal,
                        (3, 3, x.shape[-1], self.planes), jnp.float32)
        out = conv2d(x, w1.astype(x.dtype), stride=self.stride, dilation=self.dilation)
        out = build_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = relu(out)
        w2 = self.param("conv2", kaiming_normal,
                        (3, 3, self.planes, self.planes), jnp.float32)
        # dilation applies to BOTH convs: smp's make_dilated patches every
        # Conv2d in the stage (encoders/_utils.py:48-56), not just the first
        out = conv2d(out, w2.astype(out.dtype), stride=1, dilation=self.dilation)
        out = build_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        if self.use_downsample:
            wd = self.param("down_conv", kaiming_normal,
                            (1, 1, x.shape[-1], self.planes), jnp.float32)
            residual = conv2d(x, wd.astype(x.dtype), stride=self.stride)
            residual = build_norm(self.dtype, name="down_bn")(
                residual, use_running_average=not train)
        return out + residual


# ---------------------------------------------------------------------------
# Candidate-op registry (OPS, utils/operations.py:8-21)
# ---------------------------------------------------------------------------

def make_op(name: str, c_in: int, c_out: int, op_type: OpType, dp: float = 0.0,
            dtype: Optional[Dtype] = None, module_name: Optional[str] = None) -> nn.Module:
    """Instantiate candidate op `name` with the reference's stride rules:
    NORM -> stride 1; DOWN -> stride-2 conv/pool; UP -> stride-2 transpose
    conv with output_padding 1 (pool ops become bilinear 2x upsample)."""
    stride = 1 if op_type == OpType.NORM else 2
    transpose = op_type == OpType.UP
    output_padding = 1 if op_type == OpType.UP else 0
    kw = dict(dtype=dtype, name=module_name)
    if name == "none":
        return AdapterBlock(c_out, mode="none", stride=1, **kw)
    if name == "identity":
        return AdapterBlock(c_out, mode="identity", stride=1, **kw)
    if name == "avg_pool":
        return AdapterBlock(c_out, mode="avg_pool", stride=stride, **kw)
    if name == "max_pool":
        return AdapterBlock(c_out, mode="max_pool", stride=stride, **kw)
    if name == "up_sample":
        return AdapterBlock(c_out, mode="up_sample", stride=1, **kw)
    if name == "conv_3":
        return ConvBn(c_out, 3, stride, 1, transpose, output_padding, dp, **kw)
    if name == "se_conv_3":
        return ConvBnSe(c_out, 3, stride, 1, transpose, output_padding, dp, **kw)
    if name == "dil_3_conv_5":
        return ConvBn(c_out, 5, stride, 3, transpose, output_padding, dp, **kw)
    if name == "dil_2_conv_5":
        return ConvBn(c_out, 5, stride, 2, transpose, output_padding, dp, **kw)
    if name == "dep_sep_conv_3":
        return DepSepConv(c_out, 3, stride, 1, transpose, output_padding, dp, **kw)
    if name == "dep_sep_conv_5":
        return DepSepConv(c_out, 5, stride, 1, transpose, output_padding, dp, **kw)
    raise NotImplementedError(name)


OPS: dict[str, Callable[..., nn.Module]] = {
    name: partial(make_op, name)
    for name in [
        "none", "identity", "avg_pool", "max_pool", "up_sample",
        "conv_3", "se_conv_3", "dil_3_conv_5", "dil_2_conv_5",
        "dep_sep_conv_3", "dep_sep_conv_5",
    ]
}
