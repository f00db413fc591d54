"""Recurrent baselines: ConvLSTM / ConvGRU cells via lax.scan, the recurrent
U-Net, segmentation heads, and the FPN+ConvLSTM baseline.

Re-designs of /root/reference/model/src/backbones/convlstm.py, convgru.py,
utae.py:691-852 (RecUNet) and fpn.py:7-216 (FPNConvLSTM). The per-timestep
Python loops of the reference become a single ``lax.scan`` so the whole
recurrence is one compiled XLA loop; states are NHWC.

Pad semantics: the reference selects the hidden state at the last unpadded
position per layer (convlstm.py:169-171 -- which indexes with a batch vector,
a latent bug; we gather per sample, the documented intent).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.models.layers import (
    Conv2d, ConvBlock, smart_apply, conv_kernel_init, bias_normal_init,
)
from uncrtaints_tpu.models.unet import DownConvBlock, UpConvBlock
from uncrtaints_tpu.models.aggregator import TemporalAggregator
from uncrtaints_tpu.config import Config, input_dim

S2_BANDS = 13


class ConvLSTMCell(nn.Module):
    """i/f/o/g gates from one conv over [x, h] (convlstm.py:10-64).
    Scan signature: (carry, x_t) -> (carry, y_t)."""
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        conv = nn.Conv(4 * self.hidden_dim,
                       kernel_size=(self.kernel, self.kernel),
                       padding=self.kernel // 2,
                       kernel_init=conv_kernel_init,
                       bias_init=bias_normal_init, name="gates")
        z = conv(jnp.concatenate([x, h], axis=-1))
        i, f, o, g = jnp.split(z, 4, axis=-1)
        c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return (h_next, c_next), (h_next, c_next)


class ConvGRUCell(nn.Module):
    """z/r gates + candidate state (convgru.py:10-59)."""
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, h, x):
        in_conv = nn.Conv(2 * self.hidden_dim,
                          kernel_size=(self.kernel, self.kernel),
                          padding=self.kernel // 2,
                          kernel_init=conv_kernel_init,
                          bias_init=bias_normal_init, name="in_conv")
        out_conv = nn.Conv(self.hidden_dim,
                           kernel_size=(self.kernel, self.kernel),
                           padding=self.kernel // 2,
                           kernel_init=conv_kernel_init,
                           bias_init=bias_normal_init, name="out_conv")
        zr = nn.sigmoid(in_conv(jnp.concatenate([x, h], axis=-1)))
        z, r = jnp.split(zr, 2, axis=-1)
        cand = jnp.tanh(out_conv(jnp.concatenate([x, r * h], axis=-1)))
        h_next = (1 - z) * h + z * cand
        return h_next, h_next


def _scan(cell_cls, name, **cell_kw):
    """Wrap a recurrent cell in nn.scan over the temporal axis (axis 1)."""
    return nn.scan(cell_cls, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=1,
                   out_axes=1)(name=name, **cell_kw)


class ConvLSTM(nn.Module):
    """Single-layer ConvLSTM over a sequence (convlstm.py:77-181).
    Returns (outputs [B,T,H,W,hid], (h_last, c_last)); with pad_mask, the
    last states are gathered at each sample's final unpadded position."""
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, pad_mask=None):
        B, T, H, W, _ = x.shape
        h0 = jnp.zeros((B, H, W, self.hidden_dim), x.dtype)
        scan = _scan(ConvLSTMCell, "cell", hidden_dim=self.hidden_dim,
                     kernel=self.kernel)
        (h, c), (hs, cs) = scan((h0, h0), x)
        if pad_mask is not None:
            last = jnp.clip((~pad_mask).sum(axis=1) - 1, 0, T - 1)  # [B]
            take = lambda seq: jnp.take_along_axis(
                seq, last[:, None, None, None, None], axis=1)[:, 0]
            h, c = take(hs), take(cs)
        return hs, (h, c)


class ConvGRU(nn.Module):
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, pad_mask=None):
        B, T, H, W, _ = x.shape
        h0 = jnp.zeros((B, H, W, self.hidden_dim), x.dtype)
        scan = _scan(ConvGRUCell, "cell", hidden_dim=self.hidden_dim,
                     kernel=self.kernel)
        h, hs = scan(h0, x)
        if pad_mask is not None:
            last = jnp.clip((~pad_mask).sum(axis=1) - 1, 0, T - 1)
            h = jnp.take_along_axis(
                hs, last[:, None, None, None, None], axis=1)[:, 0]
        return hs, h


class BConvLSTM(nn.Module):
    """Bidirectional ConvLSTM (convlstm.py:289-321): concat of forward and
    backward final cell states (backward input zero-filled at pads)."""
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, pad_mask=None):
        _, (h_f, c_f) = ConvLSTM(self.hidden_dim, self.kernel,
                                 name="forward")(x, pad_mask=pad_mask)
        x_rev = jnp.flip(x, axis=1)
        if pad_mask is not None:
            pmr = jnp.flip(pad_mask, axis=1)
            x_rev = jnp.where(pmr[:, :, None, None, None], 0.0, x_rev)
        _, (h_b, c_b) = ConvLSTM(self.hidden_dim, self.kernel,
                                 name="backward")(x_rev)
        return jnp.concatenate([c_f, c_b], axis=-1)


class ConvLSTMSeg(nn.Module):
    """ConvLSTM + conv classification head (convlstm.py:207-236)."""
    num_classes: int
    input_dim: int
    hidden_dim: int = 160
    kernel: int = 3
    pad_value: float = 0.0

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))
        _, (h, c) = ConvLSTM(self.hidden_dim, self.kernel,
                             name="convlstm_encoder")(x, pad_mask=pad_mask)
        # reference nn.Conv2d default zero padding (convlstm.py:230-235)
        out = Conv2d(self.num_classes, kernel=self.kernel, pad=1,
                     padding_mode="zeros", name="classification_layer")(c)
        return out[:, None]


class ConvGRUSeg(nn.Module):
    """ConvGRU + conv head (convgru.py:176-226)."""
    num_classes: int
    input_dim: int
    hidden_dim: int = 180
    kernel: int = 3
    pad_value: float = 0.0

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))
        _, h = ConvGRU(self.hidden_dim, self.kernel,
                       name="convgru_encoder")(x, pad_mask=pad_mask)
        out = Conv2d(self.num_classes, kernel=self.kernel, pad=1,
                     padding_mode="zeros", name="classification_layer")(h)
        return out[:, None]


class RecUNet(nn.Module):
    """Recurrent U-Net (utae.py:691-852): U-Net with ConvLSTM/BConvLSTM/mean
    bottleneck and mean-aggregated skips."""
    input_dim: int
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (S2_BANDS,)
    temporal: str = "lstm"  # lstm | blstm | mean | mono
    encoder_norm: str = "group"
    hidden_dim: int = 128
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    padding_mode: str = "reflect"
    pad_value: float = 0.0

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        assert self.encoder_widths[-1] == self.decoder_widths[-1]
        n = len(self.encoder_widths)
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))

        feats = [ConvBlock([self.input_dim, self.encoder_widths[0],
                            self.encoder_widths[0]],
                           norm=self.encoder_norm,
                           padding_mode=self.padding_mode,
                           name="in_conv")(x, train=train)]
        for i in range(n - 1):
            feats.append(DownConvBlock(
                self.encoder_widths[i], self.encoder_widths[i + 1],
                k=self.str_conv_k, s=self.str_conv_s, p=self.str_conv_p,
                norm=self.encoder_norm, padding_mode=self.padding_mode,
                name=f"down_block{i}")(feats[-1], train=train))

        agg = TemporalAggregator(mode="mean", dropout_rate=0.0,
                                 name="temporal_aggregator")
        if self.temporal == "mean":
            out = agg(feats[-1], pad_mask=pad_mask)
        elif self.temporal == "lstm":
            _, (h, c) = ConvLSTM(self.hidden_dim,
                                 name="temporal_encoder")(feats[-1],
                                                          pad_mask=pad_mask)
            # reference nn.Conv2d default zero padding (utae.py:782-787)
            out = Conv2d(self.encoder_widths[-1], kernel=3, pad=1,
                         padding_mode="zeros", name="out_convlstm")(c)
        elif self.temporal == "blstm":
            out = BConvLSTM(self.hidden_dim,
                            name="temporal_encoder")(feats[-1],
                                                     pad_mask=pad_mask)
            out = Conv2d(self.encoder_widths[-1], kernel=3, pad=1,
                         padding_mode="zeros", name="out_convlstm")(out)
        elif self.temporal == "mono":
            out = feats[-1][:, 0]
        else:
            raise NotImplementedError(self.temporal)

        for i in range(n - 1):
            if self.temporal != "mono":
                skip = agg(feats[n - 2 - i], pad_mask=pad_mask)
            else:
                skip = feats[n - 2 - i][:, 0]
            # reference RecUNet leaves UpConvBlock's norm_skip/norm_up at
            # their "batch" defaults (utae.py:758-768 passes only norm=)
            out = UpConvBlock(
                d_in=self.decoder_widths[n - 1 - i],
                d_out=self.decoder_widths[n - 2 - i],
                d_skip=self.encoder_widths[n - 2 - i],
                k=self.str_conv_k, s=self.str_conv_s,
                norm=self.encoder_norm, norm_skip="batch",
                norm_up="batch", padding_mode=self.padding_mode,
                name=f"up_block{i}")(out, skip, train=train)

        out = ConvBlock([self.decoder_widths[0]] + list(self.out_conv),
                        k=1, s=1, p=0, padding_mode=self.padding_mode,
                        name="out_conv")(out, train=train)
        return out[:, None]


class PyramidBlock(nn.Module):
    """Atrous feature pyramid (fpn.py:123-174): dilated convs concatenated
    with a spatially-broadcast global max feature."""
    n_channels: int = 64
    n_levels: int = 5

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.n_channels, kernel=3, pad=1, padding_mode="zeros",
                     name="inconv")(x)
        gmp = out.max(axis=(1, 2))  # [N, C] global max pool
        levels = []
        for i in range(self.n_levels - 1):
            d = 2 ** i
            # reference dilated convs use reflect padding (fpn.py:137-150)
            padded = jnp.pad(out, [(0, 0), (d, d), (d, d), (0, 0)],
                             mode="reflect")
            lvl = nn.Conv(self.n_channels, kernel_size=(3, 3),
                          kernel_dilation=(d, d), padding="VALID",
                          kernel_init=conv_kernel_init,
                          bias_init=bias_normal_init, name=f"dil{i}")(padded)
            levels.append(lvl)
        out = jnp.concatenate(levels, axis=-1)
        H, W = out.shape[1], out.shape[2]
        g = jnp.broadcast_to(gmp[:, None, None, :], (gmp.shape[0], H, W,
                                                     gmp.shape[-1]))
        return jnp.concatenate([out, g], axis=-1)


class FPNConvLSTM(nn.Module):
    """Feature pyramid + ConvLSTM baseline (fpn.py:7-83)."""
    input_dim: int
    num_classes: int
    inconv: Sequence[int] = (32, 64)
    n_levels: int = 5
    n_channels: int = 64
    hidden_size: int = 88
    mid_conv: bool = True
    pad_value: float = 0.0

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))
        out = ConvBlock([self.input_dim] + list(self.inconv), norm="group",
                        pad_value=self.pad_value,
                        name="inconv")(x, train=train)
        pyr = PyramidBlock(self.n_channels, self.n_levels, name="pyramid")
        out = smart_apply(pyr, out, self.pad_value)
        if self.mid_conv:
            dim = self.n_channels * self.n_levels // 2
            out = ConvBlock([out.shape[-1], dim], norm="group",
                            pad_value=self.pad_value,
                            name="mid_conv")(out, train=train)
        _, (h, c) = ConvLSTM(self.hidden_size, name="convlstm")(
            out, pad_mask=pad_mask)
        out = Conv2d(self.num_classes, kernel=1, pad=0, padding_mode="zeros",
                     name="outconv")(c)
        return out[:, None]


def build_recurrent(cfg: Config) -> nn.Module:
    """Dispatch for the code-selectable baselines (SURVEY.md section 2)."""
    dim = input_dim(cfg)
    out_ch = cfg.out_conv[-1]
    if cfg.model == "uconvlstm":
        return RecUNet(input_dim=dim, out_conv=tuple(cfg.out_conv),
                       temporal="lstm", pad_value=cfg.pad_value,
                       padding_mode=cfg.padding_mode)
    if cfg.model == "buconvlstm":
        return RecUNet(input_dim=dim, out_conv=tuple(cfg.out_conv),
                       temporal="blstm", pad_value=cfg.pad_value,
                       padding_mode=cfg.padding_mode)
    if cfg.model == "convlstm":
        return ConvLSTMSeg(num_classes=out_ch, input_dim=dim,
                           pad_value=cfg.pad_value)
    if cfg.model == "convgru":
        return ConvGRUSeg(num_classes=out_ch, input_dim=dim,
                          pad_value=cfg.pad_value)
    if cfg.model == "fpn":
        return FPNConvLSTM(input_dim=dim, num_classes=out_ch,
                           pad_value=cfg.pad_value)
    raise NotImplementedError(cfg.model)
