"""U-TAE: U-Net encoder/decoder with L-TAE temporal attention bottleneck.

NHWC re-design of /root/reference/model/src/backbones/utae.py:205-406.
Temporal attention is computed at the bottleneck resolution; each skip level
is collapsed with the (resolution-matched) attention masks via the skip-level
Temporal_Aggregator, which -- unlike the compact aggregator -- has no
attention dropout (utae.py:626-688).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.models.layers import ConvBlock
from uncrtaints_tpu.models.ltae import LTAE2d
from uncrtaints_tpu.models.aggregator import TemporalAggregator
from uncrtaints_tpu.models.unet import DownConvBlock, UpConvBlock, mean_var_heads

S2_BANDS = 13


class UTAE(nn.Module):
    input_dim: int
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (S2_BANDS,)
    out_nonlin_mean: bool = False
    out_nonlin_var: str = "relu"
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    agg_mode: str = "att_group"
    encoder_norm: str = "group"
    norm_skip: str = "batch"
    norm_up: str = "batch"
    decoder_norm: str = "batch"
    n_head: int = 16
    d_model: int = 256
    d_k: int = 4
    pad_value: float = 0.0
    padding_mode: str = "reflect"
    positional_encoding: bool = True
    scale_by: float = 1.0

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        assert len(self.encoder_widths) == len(self.decoder_widths)
        assert self.encoder_widths[-1] == self.decoder_widths[-1]
        n = len(self.encoder_widths)
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))  # [B, T]

        # SPATIAL ENCODER over folded frames
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

        # TEMPORAL ENCODER at the bottleneck (full L-TAE with value path)
        out, att = LTAE2d(
            in_channels=self.encoder_widths[-1], d_model=self.d_model,
            n_head=self.n_head, d_k=self.d_k,
            mlp=(self.d_model, self.encoder_widths[-1]),
            positional_encoding=self.positional_encoding,
            use_dropout=True, name="temporal_encoder",
        )(feats[-1], batch_positions=batch_positions, pad_mask=pad_mask,
          train=train)

        # SPATIAL DECODER: aggregate each skip level with shared attention
        agg = TemporalAggregator(mode=self.agg_mode, dropout_rate=0.0,
                                 name="temporal_aggregator")
        for i in range(n - 1):
            skip = agg(feats[n - 2 - i], pad_mask=pad_mask, attn_mask=att,
                       train=train)
            out = UpConvBlock(
                d_in=self.decoder_widths[n - 1 - i],
                d_out=self.decoder_widths[n - 2 - i],
                d_skip=self.encoder_widths[n - 2 - i],
                k=self.str_conv_k, s=self.str_conv_s,
                norm_skip=self.norm_skip, norm_up=self.norm_up,
                norm=self.decoder_norm, padding_mode=self.padding_mode,
                name=f"up_block{i}")(out, skip, train=train)

        out = ConvBlock([self.decoder_widths[0]] + list(self.out_conv),
                        k=1, s=1, p=0, norm="none", last_relu=False,
                        name="out_conv")(out, train=train)
        out = mean_var_heads(out, self.out_nonlin_mean, self.out_nonlin_var,
                             self.scale_by)
        return out[:, None]
