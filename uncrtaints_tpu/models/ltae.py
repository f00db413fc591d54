"""L-TAE: Lightweight Temporal Attention Encoder, TPU-native.

Re-design of /root/reference/model/src/backbones/ltae.py and
positional_encoding.py. The reference flattens B*H*W pixels into a giant
batch and runs Conv1d/GroupNorm/bmm per pixel-sequence; on TPU the same math
is expressed as dense einsums over the [B, T, H, W, C] tensor -- XLA maps the
projections onto the MXU and fuses the rest.

Key semantics preserved:
- GroupNorm(n_head groups) over each pixel's (channel-group x time) slice
  (ltae.py:191-194, applied to [B*H*W, C, T])
- sinusoidal positional encoding over day offsets with per-head channel
  repeat (positional_encoding.py:5-31)
- learned input-independent queries Q[n_head, d_k] (ltae.py:324-325), so
  attention is O(T) per pixel, not O(T^2)
- pad positions filled with -1e3 before softmax (ltae.py:434-435)
- attention dropout lives in the aggregator (after upsampling) for the tiny
  variant; the full variant keeps it on the attention matrix (ltae.py:393-416)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from uncrtaints_tpu.models.layers import (
    dense_kernel_init, bias_normal_init, conv1d_kernel_init, bn_scale_init,
)


def positional_encoding_table(positions: jax.Array, d: int, T: int = 1000,
                              repeat: Optional[int] = None) -> jax.Array:
    """Sin/cos table over scalar positions (days since launch).

    positions: [B, T_seq] float. Returns [B, T_seq, d * (repeat or 1)].
    denom_i = T^(2*(i//2)/d); sin on even channels, cos on odd.
    """
    i = np.arange(d)
    denom = np.power(float(T), 2.0 * (i // 2) / d).astype(np.float32)
    table = positions[..., None] / jnp.asarray(denom)  # [B, T, d]
    even = jnp.sin(table[..., 0::2])
    odd = jnp.cos(table[..., 1::2])
    # interleave back: channels alternate sin/cos
    out = jnp.stack([even, odd], axis=-1).reshape(*table.shape[:-1], -1)
    if d % 2 == 1:  # odd d: last stacked slot is padding, drop it
        out = out[..., :d]
    if repeat is not None:
        out = jnp.tile(out, (1,) * (out.ndim - 1) + (repeat,))
    return out


class GroupNormCT(nn.Module):
    """GroupNorm over each pixel-sequence's (channel-group x time) slice.

    Parity with nn.GroupNorm(n_head, C) applied to [B*H*W, C, T]
    (ltae.py:191-194): stats per (pixel, group) across the group's channels
    AND all time steps; affine scale/bias per channel.
    Input here: [B, T, H, W, C].
    """
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        xg = x.reshape(B, T, H, W, g, C // g)
        mean = xg.mean(axis=(1, 5), keepdims=True)
        var = xg.var(axis=(1, 5), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        x = xg.reshape(B, T, H, W, C)
        return (x * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(in_dtype)


class LTAE2dtiny(nn.Module):
    """Attention-only L-TAE (ltae.py:145-239): returns attention masks.

    Input:  x [B, T, H', W', C], positions [B, T], pad_mask [B, T] bool
    Output: attn [B, T, H', W', n_head] (softmax over T)
    """
    in_channels: int = 128
    n_head: int = 16
    d_k: int = 4
    d_model: int = 256
    T: int = 1000
    positional_encoding: bool = True

    @nn.compact
    def __call__(self, x, batch_positions=None, pad_mask=None):
        h, d_k = self.n_head, self.d_k
        out = GroupNormCT(num_groups=h)(x)

        # Conv1d(C -> d_model, 1) == pointwise Dense; N(0,1) init parity
        out = nn.Dense(self.d_model, kernel_init=conv1d_kernel_init,
                       bias_init=bias_normal_init, name="inconv")(out)

        if self.positional_encoding and batch_positions is not None:
            pe = positional_encoding_table(
                batch_positions.astype(jnp.float32),
                self.d_model // h, T=self.T, repeat=h)  # [B, T, d_model]
            out = out + pe[:, :, None, None, :].astype(out.dtype)

        # keys [B,T,H,W,h,d_k]; learned queries Q[h,d_k]
        k = nn.Dense(h * d_k, kernel_init=dense_kernel_init,
                     bias_init=bias_normal_init, name="fc1_k")(out)
        k = k.reshape(*k.shape[:-1], h, d_k)
        q = self.param("Q", nn.initializers.normal(np.sqrt(2.0 / d_k)), (h, d_k))

        logits = jnp.einsum("bthwnk,nk->bthwn", k, q,
                            preferred_element_type=jnp.float32) / np.sqrt(d_k)
        if pad_mask is not None:
            logits = jnp.where(pad_mask[:, :, None, None, None], -1e3, logits)
        attn = jax.nn.softmax(logits, axis=1)  # over T
        return attn


class LTAE2d(nn.Module):
    """Full L-TAE (ltae.py:10-141): attention-weighted values + MLP head.

    Input:  x [B, T, H', W', C], positions [B, T], pad_mask [B, T]
    Output: (out [B, H', W', mlp[-1]], attn [B, T, H', W', n_head])
    """
    in_channels: int = 128
    n_head: int = 16
    d_k: int = 4
    mlp: Sequence[int] = (256, 128)
    dropout: float = 0.2
    d_model: int = 256
    T: int = 1000
    positional_encoding: bool = True
    use_dropout: bool = True  # dropout on attention matrices (0.1)

    @nn.compact
    def __call__(self, x, batch_positions=None, pad_mask=None,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        h, d_k = self.n_head, self.d_k
        out = GroupNormCT(num_groups=h, name="in_norm")(x)
        out = nn.Dense(self.d_model, kernel_init=conv1d_kernel_init,
                       bias_init=bias_normal_init, name="inconv")(out)

        if self.positional_encoding and batch_positions is not None:
            pe = positional_encoding_table(
                batch_positions.astype(jnp.float32),
                self.d_model // h, T=self.T, repeat=h)
            out = out + pe[:, :, None, None, :].astype(out.dtype)

        k = nn.Dense(h * d_k, kernel_init=dense_kernel_init,
                     bias_init=bias_normal_init, name="fc1_k")(out)
        k = k.reshape(*k.shape[:-1], h, d_k)
        q = self.param("Q", nn.initializers.normal(np.sqrt(2.0 / d_k)), (h, d_k))

        logits = jnp.einsum("bthwnk,nk->bthwn", k, q) / np.sqrt(d_k)
        if pad_mask is not None:
            logits = jnp.where(pad_mask[:, :, None, None, None], -1e3, logits)
        attn = jax.nn.softmax(logits, axis=1)
        if self.use_dropout:
            attn = nn.Dropout(0.1, deterministic=not train)(attn)

        # values: d_model split into n_head contiguous channel groups
        B, T, H, W, _ = out.shape
        v = out.reshape(B, T, H, W, h, self.d_model // h)
        agg = jnp.einsum("bthwn,bthwnd->bhwnd", attn, v)
        agg = agg.reshape(B, H, W, self.d_model)  # concat heads

        # MLP: Linear(256 -> mlp[-1]) + BatchNorm1d + ReLU per stage
        y = agg
        for width in self.mlp[1:]:
            y = nn.Dense(width, kernel_init=dense_kernel_init,
                         bias_init=bias_normal_init)(y)
            # BatchNorm1d over the flattened B*H*W pixel batch
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=bn_scale_init,
                             axis_name=None)(y.reshape(-1, width)).reshape(B, H, W, width)
            y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        # out_norm: GroupNorm(n_head, mlp[-1]) applied to the flattened
        # [B*H*W, C] pixel batch (ltae.py:69-72,129) => per-pixel group stats,
        # NOT pooled over H,W
        width = y.shape[-1]
        y = nn.GroupNorm(num_groups=h, epsilon=1e-5, name="out_norm")(
            y.reshape(-1, width)).reshape(B, H, W, width)
        return y, attn
