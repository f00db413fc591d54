"""Adaptive max pooling with exact ``nn.AdaptiveMaxPool2d`` semantics.

The UnCRtainTS backbone downsamples features to 32x32 for attention via
``nn.AdaptiveMaxPool2d((32, 32))`` (/root/reference/model/src/backbones/
uncrtaints.py:403-404). PyTorch adaptive pooling uses windows
``[floor(i*H/o), ceil((i+1)*H/o))`` per output index i. For divisible sizes
(256 -> 32) this is a plain non-overlapping max reduce_window -- the fast
MXU-friendly path. A gather-based general path covers non-divisible sizes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _adaptive_windows(in_size: int, out_size: int):
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int32)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(np.int32)
    return starts, ends


def adaptive_max_pool2d(x: jax.Array, out_hw: tuple, hw_axes: tuple = (-3, -2)) -> jax.Array:
    """Adaptive max pool of the two spatial axes down to ``out_hw``."""
    h_ax = hw_axes[0] % x.ndim
    w_ax = hw_axes[1] % x.ndim
    H, W = x.shape[h_ax], x.shape[w_ax]
    oh, ow = out_hw

    if H % oh == 0 and W % ow == 0 and w_ax == h_ax + 1:
        # non-overlapping windows as a reshape + max: same forward speed as
        # lax.reduce_window, but the BACKWARD differentiates through an
        # axis-reduce (eq-mask) instead of lax.reduce_window's
        # SelectAndScatter transpose
        kh, kw = H // oh, W // ow
        shape = list(x.shape)
        new_shape = shape[:h_ax] + [oh, kh, ow, kw] + shape[w_ax + 1:]
        xr = x.reshape(new_shape)
        return xr.max(axis=(h_ax + 1, h_ax + 3))

    if H % oh == 0 and W % ow == 0:
        kh, kw = H // oh, W // ow
        dims = [1] * x.ndim
        dims[h_ax], dims[w_ax] = kh, kw
        return lax.reduce_window(x, -jnp.inf, lax.max, tuple(dims), tuple(dims), "VALID")

    # general (non-divisible) path: reduce one axis at a time with gathers
    def pool_axis(arr, axis, in_size, out_size):
        starts, ends = _adaptive_windows(in_size, out_size)
        max_len = int((ends - starts).max())
        # indices [out_size, max_len], clipped; mask out-of-window entries
        idx = starts[:, None] + np.arange(max_len)[None, :]
        valid = idx < ends[:, None]
        idx = np.minimum(idx, in_size - 1)
        gathered = jnp.take(arr, jnp.asarray(idx.reshape(-1)), axis=axis)
        new_shape = list(arr.shape)
        new_shape[axis:axis + 1] = [out_size, max_len]
        gathered = gathered.reshape(new_shape)
        mask_shape = [1] * len(new_shape)
        mask_shape[axis], mask_shape[axis + 1] = out_size, max_len
        gathered = jnp.where(jnp.asarray(valid).reshape(mask_shape), gathered, -jnp.inf)
        return gathered.max(axis=axis + 1)

    x = pool_axis(x, h_ax, H, oh)
    x = pool_axis(x, w_ax, W, ow)
    return x
