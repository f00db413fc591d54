"""Radiometric preprocessing: S2 multispectral & S1 SAR value rescaling.

Parity with /root/reference/data/dataLoader.py:24-59 (process_MS /
process_SAR / rescale), provided both as numpy (host pipeline) and jnp
(on-device fused path) implementations:

- MS 'default': clip to [0, 10000], rescale to [0, 1]
- MS 'resnet' : clip to [0, 10000], divide by 2000 -> [0, 5]
- SAR 'default': clip dB to [-25, 0], rescale to [0, 1]
- SAR 'resnet' : per-polarization clip ([-25,0] / [-32.5,0]) -> [0, 2]
- NaNs zeroed afterwards
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rescale(img, old_min, old_max):
    return (img - old_min) / (old_max - old_min)


def _process_ms(xp, img, method: str):
    if method == "default":
        img = xp.clip(img, 0.0, 10000.0)
        img = rescale(img, 0.0, 10000.0)
    elif method == "resnet":
        img = xp.clip(img, 0.0, 10000.0)
        img = img / 2000.0
    return xp.nan_to_num(img)


def _process_sar(xp, img, method: str, pol_axis: int):
    if method == "default":
        img = xp.clip(img, -25.0, 0.0)
        img = rescale(img, -25.0, 0.0)
    elif method == "resnet":
        vv = xp.take(img, xp.asarray([0]) if xp is jnp else [0], axis=pol_axis)
        vh = xp.take(img, xp.asarray([1]) if xp is jnp else [1], axis=pol_axis)
        vv = 2 * (xp.clip(vv, -25.0, 0.0) + 25.0) / 25.0
        vh = 2 * (xp.clip(vh, -32.5, 0.0) + 32.5) / 32.5
        img = xp.concatenate([vv, vh], axis=pol_axis)
    return xp.nan_to_num(img)


def process_MS(img: np.ndarray, method: str = "default") -> np.ndarray:
    """Host (numpy) S2 rescale; img any layout."""
    return _process_ms(np, img.astype(np.float32), method)


def process_SAR(img: np.ndarray, method: str = "default",
                pol_axis: int = 0) -> np.ndarray:
    """Host (numpy) S1 rescale; pol_axis indexes the 2 polarizations."""
    return _process_sar(np, img.astype(np.float32), method, pol_axis)


def process_MS_device(img, method: str = "default"):
    """On-device (jnp) S2 rescale, fusable into the input pipeline."""
    return _process_ms(jnp, img, method)


def process_SAR_device(img, method: str = "default", pol_axis: int = -1):
    """On-device (jnp) S1 rescale (NHWC default: polarizations last)."""
    return _process_sar(jnp, img, method, pol_axis)
