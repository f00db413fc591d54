"""On-device 2-D filters for the cloud/shadow detector.

The reference's threshold-based detector runs scipy's C kernels on the host
(/root/reference/util/detect_cloudshadow.py:38,69-70 -- ``medfilt2d``,
``grey_closing``, ``convolve2d``; /root/reference/data/dataLoader.py:99 --
``gaussian_filter``). Here they are rebuilt as XLA ops so masking can run on
TPU, fused into the input pipeline:

- median_filter2d: zero-padded kxk median (scipy.signal.medfilt2d parity)
- grey_closing:    reflect-padded max-then-min reduce_window
  (scipy.ndimage.grey_closing parity)
- box_filter2d:    zero-padded 'same' box convolution
  (scipy.signal.convolve2d(box, mode='same') parity)
- gaussian_filter2d: separable reflect-padded gaussian
  (scipy.ndimage.gaussian_filter parity, truncate=4.0)

All operate on the last two axes and preserve leading batch axes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _shifted_stack(x: jax.Array, k: int, pad_value: float) -> jax.Array:
    """Stack the k*k shifted views of zero/const-padded x on a new leading axis."""
    r = k // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    xp = jnp.pad(x, pad, constant_values=pad_value)
    H, W = x.shape[-2], x.shape[-1]
    views = []
    for dy in range(k):
        for dx in range(k):
            views.append(lax.slice_in_dim(lax.slice_in_dim(xp, dy, dy + H, axis=x.ndim - 2),
                                          dx, dx + W, axis=x.ndim - 1))
    return jnp.stack(views, axis=0)


def median_filter2d(x: jax.Array, k: int = 5) -> jax.Array:
    """k x k median filter, zero padding (scipy.signal.medfilt2d semantics)."""
    stack = _shifted_stack(x, k, 0.0)
    return jnp.median(stack, axis=0)


def _reduce2d(x, k, init, op, pad_mode):
    r = k // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    xp = jnp.pad(x, pad, mode=pad_mode)
    dims = [1] * x.ndim
    dims[-2] = dims[-1] = k
    return lax.reduce_window(xp, init, op, tuple(dims), (1,) * x.ndim, "VALID")


def grey_closing(x: jax.Array, k: int = 5) -> jax.Array:
    """Greyscale closing = erosion(dilation(x)) with kxk flat structuring
    element, reflect boundary (scipy.ndimage.grey_closing default)."""
    # scipy 'reflect' duplicates the edge sample == numpy/jnp 'symmetric'
    dil = _reduce2d(x, k, -jnp.inf, lax.max, "symmetric")
    ero = _reduce2d(dil, k, jnp.inf, lax.min, "symmetric")
    return ero


def box_filter2d(x: jax.Array, k: int = 7) -> jax.Array:
    """'same' convolution with a normalized kxk box, zero padding
    (scipy.signal.convolve2d(x, box, mode='same') parity for odd k)."""
    summed = _reduce2d(x.astype(jnp.float32), k, 0.0, lax.add, "constant")
    return summed / float(k * k)


def gaussian_filter2d(x: jax.Array, sigma: float = 2.0, truncate: float = 4.0) -> jax.Array:
    """Separable gaussian blur, reflect boundary
    (scipy.ndimage.gaussian_filter parity)."""
    radius = int(truncate * sigma + 0.5)
    t = np.arange(-radius, radius + 1)
    # scipy uses the sampled gaussian, normalized
    kernel = np.exp(-0.5 * (t / sigma) ** 2)
    kernel = (kernel / kernel.sum()).astype(np.float32)
    kern = jnp.asarray(kernel)

    def conv_axis(arr, axis):
        arr_m = jnp.moveaxis(arr, axis, -1)
        pad = [(0, 0)] * (arr_m.ndim - 1) + [(radius, radius)]
        # scipy 'reflect' duplicates the edge sample == numpy/jnp 'symmetric'
        ap = jnp.pad(arr_m, pad, mode="symmetric")
        # correlate along the last axis via dot with shifted windows
        n = arr_m.shape[-1]
        out = jnp.zeros_like(arr_m)
        for i in range(2 * radius + 1):
            out = out + kern[i] * lax.slice_in_dim(ap, i, i + n, axis=ap.ndim - 1)
        return jnp.moveaxis(out, -1, axis)

    x = conv_axis(x.astype(jnp.float32), x.ndim - 2)
    x = conv_axis(x, x.ndim - 1)
    return x
