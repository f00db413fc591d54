"""EXPERIMENTAL TPU serving path: hand-fused inference forward for UNCRTAINTS.

Round-1 status: numerics drift ~1.7e-2 RMSE vs the flax forward and the
fused depthwise kernel is slower than XLA's (see ops/pallas_mbconv.py
STATUS); NOT used by bench.py or the CLIs yet. Kept as the integration
skeleton for the kernel-fusion work.

XLA's compiled eval step materializes every intermediate around the convs
and norm reductions of the MBConv stacks (measured at the zero-fusion
roofline, see ops/pallas_mbconv.py). This module rebuilds the UNCRTAINTS
*inference* forward as a pure function over the trained variables dict,
replacing each MBConv block's 10+ HBM passes with three fused Pallas kernels
plus two cheap fused elementwise stages:

  group-stats -> [norm -> pw GEMM]+stats -> [norm+GELU -> dw3x3]+stats
  -> SE (one fused read) -> [norm+GELU+SE-scale -> pw GEMM]+stats
  -> norm+residual (fused elementwise)

The non-MBConv pieces (in_conv, L-TAE, temporal aggregation, output heads)
reuse the flax modules applied to their parameter sub-trees, so numerics and
parameter layout stay identical to the training path. Training/backward
always uses the standard flax path -- this is a quarantined serving
experiment with no test coverage yet; the production eval path instead won
its speed via XLA-level fusion (see models/blocks.py eval-mode folding).

Usage:
    fn = build_serving_fn(cfg, variables)   # jitted
    out = fn(x, dates)                      # [B,1,H,W,C_out]
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, input_dim
from uncrtaints_tpu.models.layers import softplus_t20, gelu
from uncrtaints_tpu.models.ltae import LTAE2dtiny
from uncrtaints_tpu.models.aggregator import TemporalAggregator
from uncrtaints_tpu.models.uncrtaints import variance_nonlinearity
from uncrtaints_tpu.ops.pooling import adaptive_max_pool2d
from uncrtaints_tpu.ops.pallas_mbconv import norm_gelu_matmul, norm_gelu_dwconv3x3

S2_BANDS = 13
EPS = 1e-5


def _group_stats_from_tensor(x, G):
    """Per-(frame, group) mean/coef from an NHWC tensor (fp32 accumulate)."""
    N, H, W, C = x.shape
    xg = x.reshape(N, H * W, G, C // G)
    m = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3),
                  dtype=jnp.float32)
    v = jnp.maximum(m2 - jnp.square(m), 0.0)
    return m, jax.lax.rsqrt(v + EPS)


def _stats_from_partials(psum, psq, count_per_group):
    m = psum / count_per_group
    v = jnp.maximum(psq / count_per_group - jnp.square(m), 0.0)
    return m, jax.lax.rsqrt(v + EPS)


def _norm_params(p, bs, idx, kind, N, C):
    """Affine (scale, bias) and -- for batch norm -- running mean/coef
    expanded to [N, C]."""
    node = p[f"Norm2d_{idx}"]
    scale = node["scale"].astype(jnp.float32)
    bias = node["bias"].astype(jnp.float32)
    if kind == "batch":
        st = bs[f"Norm2d_{idx}"]
        m = jnp.broadcast_to(st["mean"][None], (N, C)).astype(jnp.float32)
        cf = jnp.broadcast_to(jax.lax.rsqrt(st["var"] + EPS)[None],
                              (N, C)).astype(jnp.float32)
        return scale, bias, m, cf
    return scale, bias, None, None


def fused_mbconv(x, p: Dict, bs: Dict, norm: str, n_groups: int = 4):
    """One MBConv block (expansion 2 + SE), inference, fused kernels.

    x: [N, H, W, C] bf16. p/bs: the block's params / batch_stats subtrees.
    norm: 'group' (stats computed per sample) or 'batch' (eval running
    stats). Returns [N, H, W, C] bf16.
    """
    N, H, W, C = x.shape
    w_pw1 = p["Conv2d_0"]["kernel"][0, 0].astype(jnp.bfloat16)  # [C,hid]
    w_dw = p["Conv2d_1"]["kernel"][:, :, 0, :]                  # [3,3,hid]
    w_pw2 = p["Conv2d_2"]["kernel"][0, 0].astype(jnp.bfloat16)  # [hid,C]
    hid = w_pw1.shape[1]
    se_w1 = p["SE_0"]["Dense_0"]["kernel"]
    se_w2 = p["SE_0"]["Dense_1"]["kernel"]

    cg_in, cg_hid = C // n_groups, hid // n_groups
    px = H * W

    # PreNorm (Norm2d_0 on C channels)
    s0, b0, m0, c0 = _norm_params(p, bs, 0, norm, N, C)
    if norm != "batch":
        m0g, c0g = _group_stats_from_tensor(x, n_groups)
        m0 = jnp.repeat(m0g, cg_in, -1)
        c0 = jnp.repeat(c0g, cg_in, -1)

    # [prenorm -> pw1], emits stats partials of h1
    h1, s1sum, s1sq = norm_gelu_matmul(
        x.reshape(N, px, C), m0, c0, s0, b0, w_pw1,
        se=None, groups_in=C, groups_out=n_groups, do_gelu=False)
    # NOTE: groups_in=C because mean/coef arrive pre-expanded to [N, C]

    s1, b1, m1, c1 = _norm_params(p, bs, 1, norm, N, hid)
    if norm != "batch":
        m1g, c1g = _stats_from_partials(s1sum, s1sq, px * cg_hid)
        m1 = jnp.repeat(m1g, cg_hid, -1)
        c1 = jnp.repeat(c1g, cg_hid, -1)

    # [norm1+gelu -> dw3x3], emits stats partials of h2
    h2, s2sum, s2sq = norm_gelu_dwconv3x3(
        h1.reshape(N, H, W, hid), m1, c1, s1, b1, w_dw,
        groups_in=hid, groups_out=n_groups)

    s2, b2, m2, c2 = _norm_params(p, bs, 2, norm, N, hid)
    if norm != "batch":
        m2g, c2g = _stats_from_partials(s2sum, s2sq, px * cg_hid)
        m2 = jnp.repeat(m2g, cg_hid, -1)
        c2 = jnp.repeat(c2g, cg_hid, -1)

    # SE: global mean of gelu(norm2(h2)) -- one fused elementwise+reduce pass
    h2f = h2.reshape(N, px, hid)
    se_in = jnp.mean(
        gelu((h2f.astype(jnp.float32) - m2[:, None]) * c2[:, None]
             * s2[None, None] + b2[None, None]),
        axis=1)                                           # [N, hid]
    se = jax.nn.sigmoid(gelu(se_in @ se_w1) @ se_w2)      # [N, hid]

    # [norm2+gelu+SE -> pw2], emits stats partials of h3
    h3, s3sum, s3sq = norm_gelu_matmul(
        h2f, m2, c2, s2, b2, w_pw2,
        se=se, groups_in=hid, groups_out=n_groups, do_gelu=True)

    s3, b3, m3, c3 = _norm_params(p, bs, 3, norm, N, C)
    if norm != "batch":
        m3g, c3g = _stats_from_partials(s3sum, s3sq, px * cg_in)
        m3 = jnp.repeat(m3g, cg_in, -1)
        c3 = jnp.repeat(c3g, cg_in, -1)

    # norm3 + residual (fused elementwise)
    out = x.astype(jnp.float32) + \
        (h3.astype(jnp.float32).reshape(N, H, W, C) - m3[:, None, None]) \
        * c3[:, None, None] * s3 + b3
    return out.astype(x.dtype)


def _in_conv(x, p, norm, n_groups=4):
    """1x1 conv + group/batch norm + relu (ConvBlock k1)."""
    k = p["ConvLayer_0"]["Conv2d_0"]["kernel"][0, 0]
    b = p["ConvLayer_0"]["Conv2d_0"]["bias"]
    y = jnp.einsum("nhwc,cd->nhwd", x, k.astype(x.dtype)) + b.astype(x.dtype)
    node = p["ConvLayer_0"]["Norm2d_0"]
    N, H, W, C = y.shape
    G = n_groups
    m, cf = _group_stats_from_tensor(y, G)
    mb = jnp.repeat(m, C // G, -1)[:, None, None].astype(y.dtype)
    cb = jnp.repeat(cf, C // G, -1)[:, None, None].astype(y.dtype)
    y = (y - mb) * cb * node["scale"].astype(y.dtype) + node["bias"].astype(y.dtype)
    return jax.nn.relu(y)


def build_serving_fn(cfg: Config, variables: Dict):
    """Jitted fused inference forward. Requirements: model 'uncrtaints',
    block_type 'mbconv', encoder_norm 'group', not separate_out/use_v
    (everything in the paper recipe); falls back to the flax forward
    otherwise."""
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    supported = (cfg.model == "uncrtaints" and cfg.block_type == "mbconv"
                 and cfg.encoder_norm == "group"
                 and cfg.decoder_norm in ("group", "batch")
                 and not cfg.separate_out and not cfg.use_v)
    if not supported:
        from uncrtaints_tpu.models import get_generator
        model = get_generator(cfg)
        return jax.jit(lambda x, dates: model.apply(
            variables, x, batch_positions=dates, train=False))

    n_enc = len(cfg.encoder_widths)
    n_dec = len(cfg.decoder_widths)
    mean_idx = S2_BANDS
    covar_dim = {"uni": S2_BANDS, "iso": 1, "diag": S2_BANDS}.get(cfg.covmode, 0)
    vars_idx = mean_idx + covar_dim
    eps = 1e-9 if cfg.scale_by == 1.0 else 1e-3

    ltae = LTAE2dtiny(in_channels=cfg.encoder_widths[0], d_model=cfg.d_model,
                      n_head=cfg.n_head, d_k=cfg.d_k,
                      positional_encoding=cfg.positional_encoding)
    agg = TemporalAggregator(mode=cfg.agg_mode)

    @jax.jit
    def forward(x, dates):
        B, T, H, W, Cin = x.shape
        pad_mask = jnp.all(x == cfg.pad_value, axis=(2, 3, 4))
        xb = x.astype(jnp.bfloat16).reshape(B * T, H, W, Cin)

        out = _in_conv(xb, params["in_conv"], cfg.encoder_norm)
        for i in range(n_enc):
            out = fused_mbconv(out, params[f"in_block{i}"],
                               bstats.get(f"in_block{i}", {}),
                               cfg.encoder_norm)

        out5 = out.reshape(B, T, H, W, -1)
        if not cfg.pretrain:
            ar = cfg.low_res_size
            down = adaptive_max_pool2d(out5, (ar, ar), hw_axes=(2, 3))
            att = ltae.apply({"params": params["temporal_encoder"]}, down,
                             batch_positions=dates, pad_mask=pad_mask)
            out = agg.apply({}, out5, pad_mask=pad_mask, attn_mask=att)
            out = out.astype(jnp.bfloat16)
        else:
            out = out5[:, 0]

        for i in range(n_dec):
            out = fused_mbconv(out, params[f"out_block{i}"],
                               bstats.get(f"out_block{i}", {}),
                               cfg.decoder_norm)

        k = params["out_conv"]["ConvLayer_0"]["Conv2d_0"]["kernel"][0, 0]
        b = params["out_conv"]["ConvLayer_0"]["Conv2d_0"]["bias"]
        out = jnp.einsum("nhwc,cd->nhwd", out, k.astype(out.dtype)) + \
            b.astype(out.dtype)
        out = out[:, None].astype(jnp.float32)  # [B,1,H,W,Cout]

        if cfg.mean_nonLinearity:
            loc = cfg.scale_by * jax.nn.sigmoid(out[..., :mean_idx])
        else:
            loc = out[..., :mean_idx]
        if covar_dim == 0:
            return loc
        var = variance_nonlinearity(cfg.var_nonLinearity, eps)(
            out[..., mean_idx:vars_idx])
        return jnp.concatenate([loc, var], axis=-1)

    return forward
