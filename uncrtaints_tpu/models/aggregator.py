"""Temporal aggregators: collapse T attention-weighted frames to one map.

Re-design of Compact_Temporal_Aggregator
(/root/reference/model/src/backbones/uncrtaints.py:149-221) and
Temporal_Aggregator (utae.py:626-688). The reference branches on
``pad_mask.any()`` at Python level; here the mask multiply is applied
unconditionally (a no-op for all-valid batches), keeping the graph static.

Attention layout: [B, T, H', W', n_head]; features: [B, T, H, W, C].
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.ops.pallas_aggregate import att_group_aggregate
from uncrtaints_tpu.ops.resize import upsample_bilinear, avg_pool2d


def _match_resolution(attn: jax.Array, hw: tuple) -> jax.Array:
    """Upsample (bilinear, half-pixel) or avg-pool attention to feature res.

    The reference gates on the H axis alone (uncrtaints.py:156-165), which
    breaks on non-square features whose H happens to equal the attention
    resolution (e.g. a wide custom mosaic with a small --low_res_size);
    compare both dims so W-only mismatches resize too."""
    H, W = hw
    h_att, w_att = attn.shape[2], attn.shape[3]
    if (H, W) == (h_att, w_att):
        return attn
    if H > h_att or W > w_att:
        return upsample_bilinear(attn, (H, W), hw_axes=(2, 3))
    return avg_pool2d(attn, w_att // W, hw_axes=(2, 3))


class TemporalAggregator(nn.Module):
    """mode att_group | att_mean | mean.

    ``dropout_rate=0.1`` reproduces the compact aggregator's post-upsampling
    attention dropout (uncrtaints.py:153-154,167); pass 0.0 for the U-TAE
    skip-level aggregator which has none (utae.py:626-688).
    """
    mode: str = "att_group"
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, pad_mask=None, attn_mask=None, train: bool = False):
        B, T, H, W, C = x.shape
        if attn_mask is not None:
            # keep the aggregation in the feature dtype (bf16 path)
            attn_mask = attn_mask.astype(x.dtype)
        if self.mode == "att_group":
            attn = _match_resolution(attn_mask, (H, W))       # [B,T,H,W,h]
            # dropout ONLY after an upsample (uncrtaints.py:163-167 applies
            # it in the Upsample branch alone, never after AvgPool)
            upsampled = (attn.shape[2] > attn_mask.shape[2]
                         or attn.shape[3] > attn_mask.shape[3])
            if upsampled and self.dropout_rate > 0:
                attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
            if pad_mask is not None:
                attn = attn * (~pad_mask)[:, :, None, None, None].astype(attn.dtype)
            heads = attn.shape[-1]
            # The fused Pallas kernel is OPT-IN (UNCR_AGG_KERNEL=1): on-chip
            # eval A/Bs at 256px T=3 keep favoring this XLA repeat form —
            # round 3: 230.3 vs 232.7 seq/s at B=8; round 4 (exact kernel):
            # 223.5 vs 232.1 at B=8, 235.3 vs 242.6 at B=16. (Round 3 also
            # saw 4.8e-3 max-abs fwd error on f32 inputs: the kernel
            # accumulates in f32, but the default-precision MXU indicator
            # matmul rounded the f32 attention to bf16; fixed in round 4
            # with Precision.HIGHEST — exact to <1e-6 on hardware since sel
            # is 0/1.) It remains available (and mesh-partitionable via its
            # custom_partitioning rule) for shapes where the XLA relayout
            # does hurt; UNCR_AGG_TRAIN=1 additionally enables the
            # custom-VJP train path.
            use_kernel = (C % heads == 0
                          and jax.default_backend() == "tpu"
                          and os.environ.get("UNCR_AGG_KERNEL") == "1"
                          and (not train
                               or os.environ.get("UNCR_AGG_TRAIN") == "1"))
            if use_kernel:
                return att_group_aggregate(x, attn)
            # head-major channel grouping (channel c belongs to head
            # c // (C//heads), uncrtaints.py:188-198) expressed as an
            # elementwise broadcast instead of an explicit head-split einsum
            # (the [B,T,H,W,heads,C/heads] reshape of a 6-D einsum cost 168 s
            # of XLA compile time on its own). Round-3 measurements at B=8
            # 256px: this repeat form 232 seq/s end-to-end; a 0/1
            # block-indicator MXU matmul that materializes the expanded
            # attention 221 seq/s (the extra 200 MB write+read loses to the
            # relayout it avoids).
            attn_c = jnp.repeat(attn, C // heads, axis=-1)    # [B,T,H,W,C]
            return (attn_c * x).sum(axis=1)
        if self.mode == "att_mean":
            attn = attn_mask.mean(axis=-1, keepdims=True)      # over heads
            attn = _match_resolution(attn, (H, W))
            if self.dropout_rate > 0:
                attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
            if pad_mask is not None:
                attn = attn * (~pad_mask)[:, :, None, None, None].astype(attn.dtype)
            return (x * attn).sum(axis=1)
        if self.mode == "mean":
            if pad_mask is not None:
                keep = (~pad_mask).astype(x.dtype)
                out = (x * keep[:, :, None, None, None]).sum(axis=1)
                return out / keep.sum(axis=1)[:, None, None, None]
            return x.mean(axis=1)
        raise NotImplementedError(self.mode)
