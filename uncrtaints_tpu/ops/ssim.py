"""Gaussian-window SSIM.

Parity with the reference's custom implementation
(/root/reference/util/pytorch_ssim/__init__.py:7-73): 11x11 gaussian window
(sigma=1.5), per-channel depthwise convolution with zero 'same' padding,
C1=0.01^2, C2=0.03^2, mean over the full map.

Operates on NHWC images [B, H, W, C] (TPU-native layout; the reference is
NCHW).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _depthwise_blur(x: jax.Array, window: jax.Array) -> jax.Array:
    """Zero-padded 'same' depthwise 2-D correlation, NHWC."""
    C = x.shape[-1]
    k = window.shape[0]
    # kernel [k, k, 1, C] with feature_group_count=C
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, C))
    return lax.conv_general_dilated(
        x, kern,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True) -> jax.Array:
    """SSIM between two NHWC image batches in [0, 1]."""
    window = jnp.asarray(_gaussian_window(window_size))
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))

    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
