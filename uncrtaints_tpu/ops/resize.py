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

import jax
import jax.numpy as jnp
from jax import lax


def upsample_bilinear(x: jax.Array, out_hw: tuple, hw_axes: tuple = (-3, -2)) -> jax.Array:
    """Bilinear resize of the two spatial axes to ``out_hw``.

    align_corners=False / half-pixel-centers semantics. Works on arrays of
    any rank; only the axes in ``hw_axes`` change size.
    """
    h_ax = hw_axes[0] % x.ndim
    w_ax = hw_axes[1] % x.ndim
    shape = list(x.shape)
    shape[h_ax], shape[w_ax] = out_hw
    return jax.image.resize(x, tuple(shape), method="linear")


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
