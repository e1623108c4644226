"""NasUnet baseline (prior-work NAS model), NHWC Flax.

Re-implementation of reference models/nasunet/ (nas_unet.py:8-139,
prim_ops_set.py:4-22): its own op vocabulary (cweight SE-gates, dil/dep
convs, GroupNorm(c//16) + weight_norm_act ordering), NAS_UNET_V3 genotype,
stem_multiplier=4, and the interpolate-on-size-mismatch node merge (the
reference's up-transpose convs use output_padding=0, producing 2H-1 maps
that are then resized — reproduced here with nearest resizing).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.core.genotype import Genotype
from senas_tpu.ops.primitives import (conv2d, conv_transpose2d, kaiming_normal,
                                      kaiming_normal_transpose, relu,
                                      xavier_normal)

NAS_UNET_V3 = Genotype(
    down=[('down_dil_conv', 1), ('down_cweight', 0), ('down_cweight', 0),
          ('down_cweight', 1), ('down_cweight', 0), ('conv', 3),
          ('down_cweight', 0), ('conv', 4)],
    down_concat=range(2, 6),
    up=[('cweight', 0), ('up_cweight', 1), ('conv', 2), ('up_cweight', 1),
        ('up_cweight', 1), ('conv', 3), ('up_cweight', 1), ('conv', 4)],
    up_concat=range(2, 6),
    gamma=[])

NASUNET = NAS_UNET_V3


def _gn_groups(c: int) -> int:
    return c // 16 if c % 16 == 0 else 1


class ConvOps(nn.Module):
    """prim_ops_set.ConvOps: [act] -> [dropout] -> conv -> [GN] -> [act]
    with configurable ops_order."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_transpose: bool = False
    use_depthwise: bool = False
    output_padding: int = 0
    use_norm: bool = True
    act: bool = True
    ops_order: str = "weight_norm_act"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ops = self.ops_order.split("_")
        c_in = x.shape[-1]
        for op in ops:
            if op == "act" and self.act:
                x = relu(x)
            elif op == "weight":
                k = self.kernel_size
                if self.use_depthwise:
                    dw = self.param("depth_conv", kaiming_normal,
                                    (k, k, 1, c_in), jnp.float32).astype(x.dtype)
                    if self.use_transpose:
                        x = conv_transpose2d(x, dw, stride=self.stride,
                                             output_padding=self.output_padding,
                                             groups=c_in)
                    else:
                        x = conv2d(x, dw, stride=self.stride,
                                   dilation=self.dilation, groups=c_in)
                    pw = self.param("point_conv", kaiming_normal,
                                    (1, 1, c_in, self.c_out),
                                    jnp.float32).astype(x.dtype)
                    x = conv2d(x, pw)
                else:
                    # ConvTranspose2d torch fan_out is Cin*k*k (flax fan_in)
                    w = self.param("conv",
                                   kaiming_normal_transpose if self.use_transpose
                                   else kaiming_normal,
                                   (k, k, c_in, self.c_out),
                                   jnp.float32).astype(x.dtype)
                    if self.use_transpose:
                        x = conv_transpose2d(x, w, stride=self.stride,
                                             dilation=self.dilation,
                                             output_padding=self.output_padding)
                    else:
                        x = conv2d(x, w, stride=self.stride, dilation=self.dilation)
            elif op == "norm" and self.use_norm:
                # epsilon 1e-5: torch GroupNorm default (flax's is 1e-6)
                x = nn.GroupNorm(num_groups=_gn_groups(x.shape[-1]),
                                 epsilon=1e-5, dtype=self.dtype)(x)
        return x


class CWeightOp(nn.Module):
    """SE channel gate; stride>=2 adds conv(+GN) after gating
    (prim_ops_set.py:247-310)."""

    c_out: int
    stride: int = 1
    use_transpose: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        mid = max(1, c // 16)
        y = jnp.mean(x, axis=(1, 2))
        # nn.Linear (prim_ops_set.py:273-275) -> weights_init xavier_normal_
        y = nn.Dense(mid, kernel_init=xavier_normal, dtype=self.dtype)(y)
        y = relu(y)
        y = nn.Dense(self.c_out, kernel_init=xavier_normal, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        gated = x * y[:, None, None, :]
        if self.stride >= 2:
            w = self.param("conv",
                           kaiming_normal_transpose if self.use_transpose
                           else kaiming_normal,
                           (3, 3, c, self.c_out),
                           jnp.float32).astype(x.dtype)
            if self.use_transpose:
                out = conv_transpose2d(gated, w, stride=self.stride,
                                       output_padding=0)
            else:
                out = conv2d(gated, w, stride=self.stride)
            return nn.GroupNorm(num_groups=_gn_groups(self.c_out),
                                epsilon=1e-5, dtype=self.dtype)(out)
        return gated


class PoolingOp(nn.Module):
    pool_type: str
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jax import lax
        init = -jnp.inf if self.pool_type == "max" else 0.0
        fn = lax.max if self.pool_type == "max" else lax.add
        out = lax.reduce_window(x, init, fn, (1, 2, 2, 1), (1, 2, 2, 1),
                                ((0, 0), (0, 0), (0, 0), (0, 0)))
        if self.pool_type == "avg":
            out = out / 4.0
        return out


class ZeroOp(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x * 0.0


class IdentityOp(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


def make_nasunet_op(name: str, c: int, dtype=None, module_name=None) -> nn.Module:
    kw = dict(dtype=dtype, name=module_name)
    table = {
        "none": lambda: ZeroOp(**kw),
        "identity": lambda: IdentityOp(**kw),
        "cweight": lambda: CWeightOp(c, **kw),
        "dil_conv": lambda: ConvOps(c, dilation=2, **kw),
        "dep_conv": lambda: ConvOps(c, use_depthwise=True, **kw),
        "shuffle_conv": lambda: ConvOps(c, **kw),
        "conv": lambda: ConvOps(c, **kw),
        "avg_pool": lambda: PoolingOp("avg", **kw),
        "max_pool": lambda: PoolingOp("max", **kw),
        "down_cweight": lambda: CWeightOp(c, stride=2, **kw),
        "down_dil_conv": lambda: ConvOps(c, stride=2, dilation=2, **kw),
        "down_dep_conv": lambda: ConvOps(c, stride=2, use_depthwise=True, **kw),
        "down_conv": lambda: ConvOps(c, stride=2, **kw),
        "up_cweight": lambda: CWeightOp(c, stride=2, use_transpose=True, **kw),
        "up_dep_conv": lambda: ConvOps(c, stride=2, use_transpose=True,
                                       use_depthwise=True, **kw),
        "up_conv": lambda: ConvOps(c, stride=2, use_transpose=True, **kw),
        "up_dil_conv": lambda: ConvOps(c, stride=2, dilation=2,
                                       use_transpose=True, **kw),
    }
    return table[name]()


def _nearest(x, th: int, tw: int):
    """torch F.interpolate(mode='nearest') convention: src = floor(dst*in/out)
    (jax.image.resize 'nearest' uses half-pixel centers — different picks)."""
    h, w = x.shape[1], x.shape[2]
    yi = (jnp.arange(th) * h) // th
    xi = (jnp.arange(tw) * w) // tw
    return x[:, yi][:, :, xi]


def _match(h1, h2):
    """Interpolate the smaller map to the larger (nas_unet.py:58-64)."""
    if h1.shape[1:3] == h2.shape[1:3]:
        return h1, h2
    b1, a1 = h1.shape[1], h1.shape[2]
    b2, a2 = h2.shape[1], h2.shape[2]
    if b1 > b2 or a1 > a2:
        h2 = _nearest(h2, b1, a1)
    else:
        h1 = _nearest(h1, b2, a2)
    return h1, h2


class NasUnetCell(nn.Module):
    genotype: Genotype
    c: int
    cell_type: str
    dtype: Optional[Any] = None

    def setup(self):
        if self.cell_type == "down":
            self.preprocess0 = ConvOps(self.c, kernel_size=1, stride=2,
                                       ops_order="act_weight_norm", dtype=self.dtype)
            names, idx = zip(*self.genotype.down)
            concat = self.genotype.down_concat
        else:
            self.preprocess0 = ConvOps(self.c, kernel_size=1,
                                       ops_order="act_weight_norm", dtype=self.dtype)
            names, idx = zip(*self.genotype.up)
            concat = self.genotype.up_concat
        self.preprocess1 = ConvOps(self.c, kernel_size=1,
                                   ops_order="act_weight_norm", dtype=self.dtype)
        self._indices = list(idx)
        self._concat = list(concat)
        self._num_meta_node = len(names) // 2
        self.cell_ops = [make_nasunet_op(nm, self.c, self.dtype, f"op_{i}")
                         for i, nm in enumerate(names)]
        self.multiplier = len(self._concat)

    def __call__(self, s0, s1, train: bool = False):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        states = [s0, s1]
        for i in range(self._num_meta_node):
            h1 = self.cell_ops[2 * i](states[self._indices[2 * i]], train)
            h2 = self.cell_ops[2 * i + 1](states[self._indices[2 * i + 1]], train)
            h1, h2 = _match(h1, h2)
            states.append(h1 + h2)
        outs = [states[i] for i in self._concat]
        ref = outs[0]
        # defensive resize: with NAS_UNET_V3 every node matches to the larger
        # map so the reference's plain torch.cat never sees a mismatch
        outs = [o if o.shape[1:3] == ref.shape[1:3]
                else _nearest(o, ref.shape[1], ref.shape[2]) for o in outs]
        return jnp.concatenate(outs, axis=-1)


class NasUnet(nn.Module):
    nclass: int
    in_channels: int
    c: int = 32
    depth: int = 5
    double_down_channel: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        genotype = NASUNET
        stem_multiplier = 4
        c_curr = stem_multiplier * self.c
        c_prev_prev, c_prev, c_curr = c_curr, c_curr, self.c

        self.stem0 = ConvOps(c_prev_prev, kernel_size=1, ops_order="weight_norm",
                             dtype=self.dtype)
        self.stem1 = ConvOps(c_prev, kernel_size=3, stride=2,
                             ops_order="weight_norm", dtype=self.dtype)

        down_cells = []
        down_nf = [c_prev, c_prev_prev]
        for i in range(self.depth):
            c_curr = 2 * c_curr if self.double_down_channel else c_curr
            cell = NasUnetCell(genotype, c_curr, "down", dtype=self.dtype,
                               name=f"down_{i}")
            down_cells.append(cell)
            c_prev_prev, c_prev = c_prev, cell.multiplier * c_curr
            down_nf.append(c_prev)
        self.down_cells_l = down_cells

        up_cells = []
        for i in range(self.depth + 1):
            cell = NasUnetCell(genotype, c_curr, "up", dtype=self.dtype,
                               name=f"up_{i}")
            up_cells.append(cell)
            c_prev = cell.multiplier * c_curr
            c_curr = c_curr // 2 if self.double_down_channel else c_curr
        self.up_cells_l = up_cells

        self.head = ConvOps(self.nclass, kernel_size=1, ops_order="weight",
                            dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        s0, s1 = self.stem0(x, train), self.stem1(x, train)
        down_cs = [s0, s1]
        for cell in self.down_cells_l:
            s0, s1 = s1, cell(s0, s1, train)
            down_cs.append(s1)
        for i, cell in enumerate(self.up_cells_l):
            s0 = down_cs[-(i + 2)]
            s1 = cell(s0, s1, train)
        return [self.head(s1, train)]
