"""Encoder/decoder blocks: MBConv (inverted bottleneck + SE) and residual
conv blocks.

NHWC re-designs of /root/reference/model/src/backbones/uncrtaints.py:24-146
(ResidualConvBlock, PreNorm, SE, MBConv). The depthwise 3x3 uses reflect
padding; GELU is the exact (erf) variant to match nn.GELU().
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.models.layers import (
    Conv2d, ConvLayer, Norm2d, smart_apply, gelu,
    dense_kernel_init, bias_normal_init,
)


class SE(nn.Module):
    """Squeeze-and-excitation (uncrtaints.py:82-97): global avg pool ->
    Linear(oup -> inp/4, no bias) -> GELU -> Linear(-> oup, no bias) -> sigmoid."""
    inp: int
    oup: int
    expansion: float = 0.25

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(-3, -2))  # [N, C]
        y = nn.Dense(int(self.inp * self.expansion), use_bias=False,
                     kernel_init=dense_kernel_init)(y)
        y = gelu(y)
        y = nn.Dense(self.oup, use_bias=False, kernel_init=dense_kernel_init)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class MBConv(nn.Module):
    """MobileNet-style inverted bottleneck (uncrtaints.py:100-146).

    PreNorm -> pw 1x1 (inp->hidden) -> norm+GELU -> dw 3x3 reflect ->
    norm+GELU -> SE -> pw-linear (hidden->oup) -> norm; residual add.
    The reference's optional downsample branch (MaxPool + 1x1 proj) is kept
    for completeness though UnCRtainTS never enables it.
    """
    inp: int
    oup: int
    downsample: bool = False
    expansion: int = 4
    norm: str = "batch"
    n_groups: int = 4
    pad_value: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.inp * self.expansion)
        stride = 2 if self.downsample else 1

        def body(a):
            prenorm = Norm2d(self.norm, self.n_groups)
            pw1 = None
            if (self.norm == "batch" and not train and not self.downsample
                    and self.expansion != 1):
                # eval-mode BatchNorm is affine: fold PreNorm into the pw1
                # weights (one fewer full-tensor pass; exact)
                coef, offs = prenorm(a, train=train, fold_only=True)
                pw1 = Conv2d(hidden, kernel=1, stride=1, pad=0,
                             use_bias=False)
                h = pw1(a, input_affine=(coef, offs))
            else:
                h = prenorm(a, train=train)  # PreNorm
            if self.expansion == 1:
                h = Conv2d(hidden, kernel=3, stride=stride, pad=1,
                           padding_mode="reflect", use_bias=False, groups=hidden)(h)
                h = Norm2d(self.norm, self.n_groups)(h, train=train)
                h = gelu(h)
                h = Conv2d(self.oup, kernel=1, stride=1, pad=0, use_bias=False)(h)
                h = Norm2d(self.norm, self.n_groups)(h, train=train)
            else:
                if pw1 is None:
                    h = Conv2d(hidden, kernel=1, stride=stride, pad=0,
                               use_bias=False)(h)
                h = Norm2d(self.norm, self.n_groups)(h, train=train)
                h = gelu(h)
                h = Conv2d(hidden, kernel=3, stride=1, pad=1,
                           padding_mode="reflect", use_bias=False, groups=hidden)(h)
                h = Norm2d(self.norm, self.n_groups)(h, train=train)
                h = gelu(h)
                h = SE(self.inp, hidden)(h)
                h = Conv2d(self.oup, kernel=1, stride=1, pad=0, use_bias=False)(h)
                h = Norm2d(self.norm, self.n_groups)(h, train=train)
            if self.downsample:
                pooled = nn.max_pool(a, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
                proj = Conv2d(self.oup, kernel=1, stride=1, pad=0, use_bias=False)(pooled)
                return proj + h
            return a + h

        return smart_apply(body, x, self.pad_value)


class ResidualConvBlock(nn.Module):
    """3x ConvLayer(3x3, norm+ReLU) with residual add on the 3rd
    (uncrtaints.py:24-69)."""
    width: int
    norm: str = "batch"
    n_groups: int = 4
    k: int = 3
    s: int = 1
    p: int = 1
    padding_mode: str = "reflect"
    pad_value: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mk = lambda: ConvLayer([self.width, self.width], norm=self.norm,
                               k=self.k, s=self.s, p=self.p,
                               n_groups=self.n_groups, last_relu=True,
                               padding_mode=self.padding_mode)
        c1, c2, c3 = mk(), mk(), mk()

        def body(a):
            o1 = c1(a, train=train)
            o2 = c2(o1, train=train)
            return a + c3(o2, train=train)

        return smart_apply(body, x, self.pad_value)
