"""Gaussian-window SSIM.

Parity with the reference's custom implementation
(/root/reference/util/pytorch_ssim/__init__.py:7-73): 11x11 gaussian window
(sigma=1.5), per-channel depthwise convolution with zero 'same' padding,
C1=0.01^2, C2=0.03^2, mean over the full map.

Operates on NHWC images [B, H, W, C] (TPU-native layout; the reference is
NCHW).
"""

from __future__ import annotations

import os

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
    """Zero-padded 'same' depthwise 2-D correlation, NHWC.

    The gaussian window is an outer product, so the 2-D correlation is run
    SEPARABLY as a [k,1] pass then a [1,k] pass: 2k taps instead of k² (22
    vs 121 at the reference's k=11) — the fused-metrics eval step is
    SSIM-dominated, so this is a direct serving-throughput win. Zero 'same'
    padding commutes with separation exactly (row/col zero regions
    contribute 0 either way); only fp32 summation ORDER changes vs the 2-D
    window, golden-tested against the torch reference in
    tests/test_metrics.py. UNCR_SSIM_SEPARABLE=0 restores the 2-D window
    (A/B knob, read at trace time)."""
    C = x.shape[-1]
    k = window.shape[0]
    if os.environ.get("UNCR_SSIM_SEPARABLE", "1") == "0":
        kern = jnp.tile(window[:, :, None, None], (1, 1, 1, C))
        return lax.conv_general_dilated(
            x, kern, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
    g = window[:, k // 2] / jnp.sqrt(window[k // 2, k // 2])  # 1-D factor
    kcol = jnp.tile(g[:, None, None, None], (1, 1, 1, C))     # [k,1,1,C]
    krow = jnp.tile(g[None, :, None, None], (1, 1, 1, C))     # [1,k,1,C]
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        x, kcol, (1, 1), [(k // 2, k // 2), (0, 0)],
        dimension_numbers=dn, feature_group_count=C)
    return lax.conv_general_dilated(
        y, krow, (1, 1), [(0, 0), (k // 2, k // 2)],
        dimension_numbers=dn, feature_group_count=C)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True) -> jax.Array:
    """SSIM between two NHWC image batches in [0, 1]."""
    window = jnp.asarray(_gaussian_window(window_size))
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    # one blur pass over the 5 stacked moment images (fewer dispatches;
    # the separable blur above cuts the taps 121 -> 22)
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    C = img1.shape[-1]
    b = _depthwise_blur(stacked, window)
    mu1, mu2 = b[..., :C], b[..., C:2 * C]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b[..., 2 * C:3 * C] - mu1_sq
    sigma2_sq = b[..., 3 * C:4 * C] - mu2_sq
    sigma12 = b[..., 4 * C:] - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))

    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
