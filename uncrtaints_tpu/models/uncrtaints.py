"""UnCRtainTS: the flagship multi-temporal cloud-removal model.

TPU-native re-design of /root/reference/model/src/backbones/uncrtaints.py:230-446.
Constant-resolution T->1 reconstruction with multivariate aleatoric
uncertainty:

  1x1 in_conv -> N x in_block (MBConv/Residual) -> adaptive-max-pool to
  low_res (32) -> L-TAE attention over day offsets -> temporal aggregation at
  full resolution with upsampled attention -> N x out_block -> 1x1 out_conv
  (shared or separate mean/var streams) -> mean & variance nonlinearities.

Layout: input [B, T, H, W, C_in] (NHWC), output [B, 1, H, W, mean+covar]
with mean channels [0:13] and variance channels [13:vars_idx].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.models.layers import ConvBlock, smart_apply, softplus_t20
from uncrtaints_tpu.models.blocks import MBConv, ResidualConvBlock
from uncrtaints_tpu.models.ltae import LTAE2d, LTAE2dtiny
from uncrtaints_tpu.models.aggregator import TemporalAggregator
from uncrtaints_tpu.models.layers import Conv2d
from uncrtaints_tpu.ops.pooling import adaptive_max_pool2d
from uncrtaints_tpu.ops.resize import upsample_bilinear

S2_BANDS = 13


def variance_nonlinearity(mode: str, eps: float):
    """uncrtaints.py:223-228 (the 'relu' branch is broken in the reference
    and unreachable via CLI; we give it working semantics)."""
    if mode == "relu":
        return lambda v: nn.relu(v) + eps
    if mode == "softplus":
        return lambda v: softplus_t20(v) + eps
    if mode == "elu":
        return lambda v: nn.elu(v) + 1 + eps
    return lambda v: v


class UNCRTAINTS(nn.Module):
    input_dim: int
    encoder_widths: Sequence[int] = (128,)
    decoder_widths: Sequence[int] = (128, 128, 128, 128, 128)
    out_conv: Sequence[int] = (S2_BANDS,)
    out_nonlin_mean: bool = False
    out_nonlin_var: str = "relu"
    agg_mode: str = "att_group"
    encoder_norm: str = "group"
    decoder_norm: str = "batch"
    n_head: int = 16
    d_model: int = 256
    d_k: int = 4
    pad_value: float = 0.0
    padding_mode: str = "reflect"
    positional_encoding: bool = True
    covmode: str = "diag"
    scale_by: float = 1.0
    separate_out: bool = False
    use_v: bool = False
    block_type: str = "mbconv"
    is_mono: bool = False
    low_res_size: int = 32
    remat: bool = False  # jax.checkpoint each conv block (trade FLOPs for HBM)
    fused_eval: bool = False  # Pallas-fused MBConv eval path (TPU)

    @property
    def mean_idx(self) -> int:
        return S2_BANDS

    @property
    def vars_idx(self) -> int:
        covar_dim = {"uni": S2_BANDS, "iso": 1, "diag": S2_BANDS}.get(self.covmode, 0)
        return self.mean_idx + covar_dim

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        assert self.encoder_widths[-1] == self.decoder_widths[-1]
        B, T, H, W, _ = x.shape
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))  # [B, T]

        # SPATIAL ENCODER (time folded into batch; uncrtaints.py:397-400)
        # static_argnums=(2,): `train` drives Python control flow (dropout
        # determinism) and must stay concrete under the remat trace
        mb_cls = nn.remat(MBConv, static_argnums=(2,)) if self.remat else MBConv
        res_cls = (nn.remat(ResidualConvBlock, static_argnums=(2,))
                   if self.remat else ResidualConvBlock)
        out = ConvBlock([self.input_dim, self.encoder_widths[0]],
                        k=1, s=1, p=0, norm=self.encoder_norm,
                        padding_mode=self.padding_mode,
                        name="in_conv")(x, train=train)
        for i, w in enumerate(self.encoder_widths):
            if self.block_type == "mbconv":
                out = mb_cls(w, w, expansion=2, norm=self.encoder_norm,
                             fused_eval=self.fused_eval,
                             name=f"in_block{i}")(out, train)
            elif self.block_type == "residual":
                out = res_cls(w, norm=self.encoder_norm,
                              padding_mode=self.padding_mode,
                              name=f"in_block{i}")(out, train)
            else:
                raise NotImplementedError(self.block_type)

        if not self.is_mono:
            # downsample to attention resolution (uncrtaints.py:403-404)
            ar = self.low_res_size
            down = smart_apply(
                lambda a: adaptive_max_pool2d(a, (ar, ar)), out)

            # TEMPORAL ENCODER
            if self.use_v:
                v, att = LTAE2d(
                    in_channels=self.encoder_widths[0], d_model=self.d_model,
                    n_head=self.n_head, d_k=self.d_k,
                    mlp=(self.d_model, self.encoder_widths[0]),
                    positional_encoding=self.positional_encoding,
                    use_dropout=False, name="temporal_encoder",
                )(down, batch_positions=batch_positions, pad_mask=pad_mask,
                  train=train)
            else:
                att = LTAE2dtiny(
                    in_channels=self.encoder_widths[0], d_model=self.d_model,
                    n_head=self.n_head, d_k=self.d_k,
                    positional_encoding=self.positional_encoding,
                    name="temporal_encoder",
                )(down, batch_positions=batch_positions, pad_mask=pad_mask)

            out = TemporalAggregator(mode=self.agg_mode, name="temporal_aggregator")(
                out, pad_mask=pad_mask, attn_mask=att, train=train)

            if self.use_v:
                up_v = upsample_bilinear(v, (H, W), hw_axes=(1, 2))
                out = Conv2d(self.encoder_widths[0], kernel=1, pad=0,
                             name="include_v")(
                    jnp.concatenate([out, up_v], axis=-1))
        else:
            out = out[:, 0]  # squeeze the singleton temporal dim

        # SPATIAL DECODER (uncrtaints.py:421-422)
        for i, w in enumerate(self.decoder_widths):
            if self.block_type == "mbconv":
                out = mb_cls(w, w, expansion=2, norm=self.decoder_norm,
                             fused_eval=self.fused_eval,
                             name=f"out_block{i}")(out, train)
            else:
                out = res_cls(w, norm=self.decoder_norm,
                              padding_mode=self.padding_mode,
                              name=f"out_block{i}")(out, train)

        # OUTPUT HEADS (uncrtaints.py:376-381, 424-432)
        if self.separate_out:
            mean_out = ConvBlock([self.decoder_widths[0], S2_BANDS], k=1, s=1,
                                 p=0, norm="none", last_relu=False,
                                 name="out_conv_mean_1")(out, train=train)
            if self.out_conv[-1] - self.mean_idx > 0:
                var_out = ConvBlock(
                    [self.decoder_widths[0], self.out_conv[-1] - S2_BANDS],
                    k=1, s=1, p=0, norm="none", last_relu=False,
                    name="out_conv_var_1")(out, train=train)
                out = jnp.concatenate([mean_out, var_out], axis=-1)
            else:
                out = mean_out
        else:
            out = ConvBlock([self.decoder_widths[0]] + list(self.out_conv),
                            k=1, s=1, p=0, norm="none", last_relu=False,
                            name="out_conv")(out, train=train)

        out = out[:, None]  # [B, 1, H, W, C_out]

        # output nonlinearities (uncrtaints.py:383-388, 441-445)
        eps = 1e-9 if self.scale_by == 1.0 else 1e-3
        if self.out_nonlin_mean:
            out_loc = self.scale_by * nn.sigmoid(out[..., :self.mean_idx])
        else:
            out_loc = out[..., :self.mean_idx]
        if self.covmode not in ("uni", "iso", "diag"):
            return out_loc
        out_cov = variance_nonlinearity(self.out_nonlin_var, eps)(
            out[..., self.mean_idx:self.vars_idx])
        return jnp.concatenate([out_loc, out_cov], axis=-1)
