"""Encoder/decoder blocks: MBConv (inverted bottleneck + SE) and residual
conv blocks.

NHWC re-designs of /root/reference/model/src/backbones/uncrtaints.py:24-146
(ResidualConvBlock, PreNorm, SE, MBConv). The depthwise 3x3 uses reflect
padding; GELU is the exact (erf) variant to match nn.GELU().
"""

from __future__ import annotations

from typing import Optional

import jax
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
    def __call__(self, x, mean=None, scale_only=False):
        """``mean`` overrides the global-average-pool input (used by the
        fused eval path, which computes the pooled vector in its own fused
        reduction); ``scale_only=True`` returns the [N, C] sigmoid gate
        instead of applying it. Parameter names/shapes are identical in
        every mode."""
        if mean is None:
            # global average pool as an MXU matmul: a plain bf16
            # x.mean(axis=(-3,-2)) reduce ran ~25x below the HBM roofline
            # (profiled 8.6 ms/step across the SE blocks); contracting the
            # 64k pixels against a ones-vector on the MXU reads x at full
            # bandwidth and accumulates in fp32
            N, H, W, C = x.shape
            P = H * W
            ones = jnp.ones((P,), x.dtype)
            y = jax.lax.dot_general(
                ones, x.reshape(N, P, C), (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [N, C]
            y = (y / P).astype(x.dtype)
        else:
            y = mean  # [N, C]
        y = nn.Dense(int(self.inp * self.expansion), use_bias=False,
                     kernel_init=dense_kernel_init)(y)
        y = gelu(y)
        y = nn.Dense(self.oup, use_bias=False, kernel_init=dense_kernel_init)(y)
        y = nn.sigmoid(y)
        if scale_only:
            return y
        return x * y[:, None, None, :]


class MBConv(nn.Module):
    """MobileNet-style inverted bottleneck (uncrtaints.py:100-146).

    PreNorm -> pw 1x1 (inp->hidden) -> norm+GELU -> dw 3x3 reflect ->
    norm+GELU -> SE -> pw-linear (hidden->oup) -> norm; residual add.
    The reference's optional downsample branch (MaxPool + 1x1 proj) is kept
    for completeness though UnCRtainTS never enables it.

    ``fused_eval=True`` (TPU eval path) runs both pointwise GEMMs as fused
    Pallas kernels with the eval-mode BatchNorm affines, GELUs and the SE
    gate as prologue/epilogue -- eliminating every standalone elementwise
    HBM pass except the depthwise conv's (which XLA already fuses well).
    Parameter names/shapes are identical to the standard path.
    """
    inp: int
    oup: int
    downsample: bool = False
    expansion: int = 4
    norm: str = "batch"
    n_groups: int = 4
    pad_value: Optional[float] = None
    fused_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.inp * self.expansion)
        stride = 2 if self.downsample else 1

        if (self.fused_eval and not train and self.norm == "batch"
                and not self.downsample and self.expansion != 1
                and self.inp % 128 == 0 and hidden % 128 == 0):
            return smart_apply(self._fused_body(hidden), x, self.pad_value)

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
                # NOTE (round-3 negative result): computing the SE mean on an
                # optimization_barrier'd branch so gelu(norm(h)) is never
                # materialized (pw2 recomputes it as a prologue) was measured
                # 7% SLOWER end-to-end (178 vs 192 seq/s at B=8 256px) -- XLA
                # keeps the materialization anyway and the barrier adds a
                # full read pass. The straight-line form below fuses best.
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

    def _fused_body(self, hidden: int):
        """Eval-mode body with both pointwise GEMMs as Pallas kernels.

        Stage 1: gelu(bn1(pw1(prenorm(a)))) in ONE kernel (prenorm affine as
        prologue, bn1 affine + GELU as epilogue). Stage 2: XLA depthwise
        reflect conv. Stage 3: bn3(pw2(se .* gelu(bn2(h2)))) in ONE kernel
        (bn2 affine + GELU + SE gate as prologue, bn3 affine as epilogue);
        the SE pooled vector comes from a fused fp32 reduction over h2.
        Submodule creation order matches the standard body exactly, so the
        parameter tree is identical."""
        from uncrtaints_tpu.ops.pallas_mbconv import norm_gelu_matmul

        def body(a):
            NF, H, W, C = a.shape
            P = H * W
            f32 = jnp.float32
            zero, one = jnp.zeros((NF, 1), f32), jnp.ones((NF, 1), f32)

            c0, o0 = Norm2d(self.norm, self.n_groups)(
                a, train=False, fold_only=True)
            W1, _ = Conv2d(hidden, kernel=1, stride=1, pad=0,
                           use_bias=False)(a, weights_only=True)
            c1, o1 = Norm2d(self.norm, self.n_groups)(
                jnp.zeros((1, 1, 1, hidden), a.dtype),
                train=False, fold_only=True)
            h1, _, _ = norm_gelu_matmul(
                a.reshape(NF, P, C), zero, one,
                c0.astype(f32), o0.astype(f32), W1[0, 0],
                groups_in=1, do_gelu=False,
                out_affine=(c1, o1), out_gelu=True, do_stats=False)

            # NOTE: the lax.conv here makes XLA flip the fused graph to
            # channel-major layouts (~25 ms/step of relayout copies around
            # the row-major Pallas calls); a reflect-pad shift-add variant
            # was tried and measured WORSE (73 vs 65 ms/step) -- the
            # unfused 9-tap FMA costs more than the relayouts it avoids.
            h2 = Conv2d(hidden, kernel=3, stride=1, pad=1,
                        padding_mode="reflect", use_bias=False,
                        groups=hidden)(h1.reshape(NF, H, W, hidden))

            c2, o2 = Norm2d(self.norm, self.n_groups)(
                h2, train=False, fold_only=True)
            # SE pooled vector: fp32 gelu(bn2(h2)) mean, fused into one
            # reduction (reads h2 once, materializes nothing)
            g = jax.nn.gelu(h2.astype(f32) * c2 + o2, approximate=False)
            m2 = g.mean(axis=(-3, -2))                       # [NF, hidden]
            s = SE(self.inp, hidden)(h2, mean=m2, scale_only=True)

            W2, _ = Conv2d(self.oup, kernel=1, stride=1, pad=0,
                           use_bias=False)(h2, weights_only=True)
            c3, o3 = Norm2d(self.norm, self.n_groups)(
                jnp.zeros((1, 1, 1, self.oup), a.dtype),
                train=False, fold_only=True)
            y, _, _ = norm_gelu_matmul(
                h2.reshape(NF, P, hidden), zero, one,
                c2.astype(f32), o2.astype(f32), W2[0, 0],
                se=s.astype(f32), groups_in=1, do_gelu=True,
                out_affine=(c3, o3), do_stats=False)
            return a + y.reshape(NF, H, W, self.oup)

        return body


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
