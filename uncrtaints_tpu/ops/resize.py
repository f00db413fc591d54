"""Bilinear resize & average pooling with PyTorch-parity semantics.

The reference uses ``nn.Upsample(mode='bilinear', align_corners=False)`` to
blow 32x32 attention masks up to feature resolution
(/root/reference/model/src/backbones/uncrtaints.py:163-169) and
``nn.AvgPool2d`` for the downscale branch. ``jax.image.resize`` with the
``'linear'`` method uses half-pixel sampling, which is exactly PyTorch's
``align_corners=False`` convention -- verified against torch in
tests/test_ops.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] linear-interpolation matrix, half-pixel-centers semantics
    (PyTorch align_corners=False / jax.image.resize 'linear'), edge-clamped."""
    scale = in_size / out_size
    pos = (np.arange(out_size) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    w_hi = (pos - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, in_size - 1)
    hi_c = np.clip(lo + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo_c), 1.0 - w_hi)
    np.add.at(m, (np.arange(out_size), hi_c), w_hi)
    return m


def upsample_bilinear(x: jax.Array, out_hw: tuple, hw_axes: tuple = (-3, -2)) -> jax.Array:
    """Bilinear resize of the two spatial axes to ``out_hw``.

    align_corners=False / half-pixel-centers semantics. Works on arrays of
    any rank; only the axes in ``hw_axes`` change size.

    Bilinear interpolation is a linear map per axis, so it contracts with a
    precomputed [out, in] matrix on the MXU instead of jax.image.resize's
    gather lowering (the gathers dominated the temporal aggregator's
    attention upsample on v5e)."""
    h_ax = hw_axes[0] % x.ndim
    w_ax = hw_axes[1] % x.ndim
    mh = jnp.asarray(_interp_matrix(x.shape[h_ax], out_hw[0])).astype(x.dtype)
    mw = jnp.asarray(_interp_matrix(x.shape[w_ax], out_hw[1])).astype(x.dtype)
    # each contraction appends the resized axis last, then moves it back,
    # so all other axes keep their positions between the two steps
    y = jnp.tensordot(x, mh, axes=[[h_ax], [1]])
    y = jnp.moveaxis(y, -1, h_ax)
    y = jnp.tensordot(y, mw, axes=[[w_ax], [1]])
    return jnp.moveaxis(y, -1, w_ax)


def avg_pool2d(x: jax.Array, kernel: int, hw_axes: tuple = (-3, -2)) -> jax.Array:
    """Non-overlapping average pooling (stride == kernel), NHWC-friendly.

    Matches ``nn.AvgPool2d(kernel_size=k)`` for inputs divisible by k
    (the only case exercised by the reference aggregators).
    """
    h_ax = hw_axes[0] % x.ndim
    w_ax = hw_axes[1] % x.ndim
    dims = [1] * x.ndim
    dims[h_ax] = kernel
    dims[w_ax] = kernel
    summed = lax.reduce_window(x, 0.0, lax.add, tuple(dims), tuple(dims), "VALID")
    return summed / float(kernel * kernel)
