"""U-Net blocks and the mono-temporal U-Net (pretraining backbone).

NHWC re-design of /root/reference/model/src/backbones/utae.py:27-201 (UNet)
and 523-623 (DownConvBlock/UpConvBlock). The transposed convolution uses
stride-2 'SAME' semantics (output = 2x input), functionally equivalent to
the reference's ConvTranspose2d(k=4, s=2, p=1).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.models.layers import (
    Conv2d, ConvLayer, ConvBlock, Norm2d, smart_apply, softplus_t20,
    conv_kernel_init, bias_normal_init,
)

S2_BANDS = 13


class DownConvBlock(nn.Module):
    """Strided down conv + residual conv pair (utae.py:523-556)."""
    d_in: int
    d_out: int
    k: int = 4
    s: int = 2
    p: int = 1
    norm: str = "group"
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False):
        down = ConvLayer([self.d_in, self.d_in], norm=self.norm, k=self.k,
                         s=self.s, p=self.p, padding_mode=self.padding_mode)
        conv1 = ConvLayer([self.d_in, self.d_out], norm=self.norm,
                          padding_mode=self.padding_mode)
        conv2 = ConvLayer([self.d_out, self.d_out], norm=self.norm,
                          padding_mode=self.padding_mode, last_relu=False)

        def body(a):
            o = down(a, train=train)
            o = conv1(o, train=train)
            return o + conv2(o, train=train)

        return smart_apply(body, x)


class UpConvBlock(nn.Module):
    """Transposed-conv upsampling + skip fusion (utae.py:567-623)."""
    d_in: int
    d_out: int
    d_skip: int
    k: int = 4
    s: int = 2
    norm_skip: str = "batch"
    norm_up: str = "batch"
    norm: str = "batch"
    n_groups: int = 4
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        d = self.d_skip
        # skip branch: 1x1 conv + norm + relu
        s = Conv2d(d, kernel=1, pad=0)(skip)
        if self.norm_skip in ("group", "batch", "instance"):
            s = Norm2d(self.norm_skip, self.n_groups)(s, train=train)
        s = nn.relu(s)

        # upsample branch: stride-2 transposed conv (out = 2 * in)
        # HIGHEST precision: XLA's default conv_transpose path computes in
        # reduced precision, which breaks checkpoint-import parity
        up = nn.ConvTranspose(self.d_out, kernel_size=(self.k, self.k),
                              strides=(self.s, self.s), padding="SAME",
                              precision=jax.lax.Precision.HIGHEST,
                              kernel_init=conv_kernel_init,
                              bias_init=bias_normal_init)(x)
        if self.norm_up in ("group", "batch", "instance"):
            up = Norm2d(self.norm_up, self.n_groups)(up, train=train)
        up = nn.relu(up)

        o = jnp.concatenate([up, s], axis=-1)
        o = ConvLayer([o.shape[-1], self.d_out], norm=self.norm,
                      padding_mode=self.padding_mode)(o, train=train)
        o2 = ConvLayer([self.d_out, self.d_out], norm=self.norm,
                       padding_mode=self.padding_mode,
                       last_relu=False)(o, train=train)
        return o + o2


def mean_var_heads(out, out_nonlin_mean: bool, out_nonlin_var: str,
                   scale_by: float = 1.0):
    """Split [., 13 + k] channels into mean/var and apply nonlinearities
    (utae.py:151-163,192-194 semantics)."""
    mean = out[..., :S2_BANDS]
    var = out[..., S2_BANDS:]
    if out_nonlin_mean:
        mean = scale_by * nn.sigmoid(mean)
    if var.shape[-1] > 0:
        if out_nonlin_var == "relu":
            var = nn.relu(var)
        elif out_nonlin_var == "softplus":
            var = softplus_t20(var)
        elif out_nonlin_var == "elu":
            var = nn.elu(var) + 1 + 1e-8
        return jnp.concatenate([mean, var], axis=-1)
    return mean


class UNet(nn.Module):
    """Mono-temporal U-Net (utae.py:27-201). Input [B, 1, H, W, C] or
    [B, H, W, C]; output [B, 1, H, W, out_conv[-1]]."""
    input_dim: int
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (S2_BANDS,)
    out_nonlin_mean: bool = False
    out_nonlin_var: str = "relu"
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    encoder_norm: str = "group"
    norm_skip: str = "batch"
    norm_up: str = "batch"
    decoder_norm: str = "batch"
    pad_value: float = 0.0
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        assert len(self.encoder_widths) == len(self.decoder_widths)
        assert self.encoder_widths[-1] == self.decoder_widths[-1]
        if x.ndim == 5:
            x = x[:, 0]
        n = len(self.encoder_widths)

        feats = [ConvBlock([self.input_dim, self.encoder_widths[0]],
                           k=1, s=1, p=0, norm=self.encoder_norm,
                           padding_mode=self.padding_mode,
                           name="in_conv")(x, train=train)]
        for i in range(n - 1):
            feats.append(DownConvBlock(
                self.encoder_widths[i], self.encoder_widths[i + 1],
                k=self.str_conv_k, s=self.str_conv_s, p=self.str_conv_p,
                norm=self.encoder_norm, padding_mode=self.padding_mode,
                name=f"down_block{i}")(feats[-1], train=train))

        out = feats[-1]
        for i in range(n - 1):
            out = UpConvBlock(
                d_in=self.decoder_widths[n - 1 - i],
                d_out=self.decoder_widths[n - 2 - i],
                d_skip=self.encoder_widths[n - 2 - i],
                k=self.str_conv_k, s=self.str_conv_s,
                norm_skip=self.norm_skip, norm_up=self.norm_up,
                norm=self.decoder_norm, padding_mode=self.padding_mode,
                name=f"up_block{i}")(out, feats[n - 2 - i], train=train)

        out = ConvBlock([self.decoder_widths[0]] + list(self.out_conv),
                        k=1, s=1, p=0, norm="none", last_relu=False,
                        name="out_conv")(out, train=train)
        out = mean_var_heads(out, self.out_nonlin_mean, self.out_nonlin_var)
        return out[:, None]  # [B, 1, H, W, C_out]
