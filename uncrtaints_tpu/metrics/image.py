"""Image reconstruction metrics: RMSE / PSNR / MAE / SAM / SSIM (+ error &
uncertainty statistics).

Parity with /root/reference/model/src/learning/metrics.py:20-101, computed in
jnp so a whole eval batch's metrics run on-device in one fused call. Layout:
NHWC -- target/pred [B(=1 slice), H, W, C] or [T, H, W, C] with a leading
singleton, matching the per-item usage in the reference's iterate() loop.

SAM note: the spectral angle reduces over the channel axis (axis 1 in the
reference's NCHW, the last axis here).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.ops.ssim import ssim as _ssim


def img_metrics(target: jax.Array, pred: jax.Array,
                var: Optional[jax.Array] = None,
                pixelwise: bool = True) -> Dict:
    """Per-sample metric dict. target/pred: [1, H, W, C] (T=1 collapsed)."""
    rmse = jnp.sqrt(jnp.mean(jnp.square(target - pred)))
    psnr = 20.0 * jnp.log10(1.0 / rmse)
    mae = jnp.mean(jnp.abs(target - pred))

    # spectral angle mapper over the channel axis, in degrees
    dot = jnp.sum(target * pred, axis=-1)
    denom = jnp.sqrt(jnp.sum(target * target, axis=-1)) * \
        jnp.sqrt(jnp.sum(pred * pred, axis=-1))
    sam = jnp.mean(jnp.arccos(jnp.clip(dot / denom, -1.0, 1.0)) * 180.0 / jnp.pi)

    ssim_val = _ssim(target, pred)

    out = {
        "RMSE": float(rmse), "MAE": float(mae), "PSNR": float(psnr),
        "SAM": float(sam), "SSIM": float(ssim_val),
    }

    if var is not None:
        error = target - pred
        se = jnp.square(error)
        ae = jnp.abs(error)
        out.update({
            "error": float(jnp.nanmean(error)),
            "mean ae": float(jnp.nanmean(ae)),
            "mean se": float(jnp.nanmean(se)),
            "mean var": float(jnp.nanmean(var)),
        })
        if pixelwise:
            # per-pixel stats averaged over leading dim & channel
            # (reference nanmean(0).nanmean(0) on [T, C, H, W] collapses T, C
            #  -> flattened [H*W]; ours collapses the leading dim & channels)
            out.update({
                "pixelwise error": np.asarray(jnp.nanmean(error, axis=(0, -1)).reshape(-1)),
                "pixelwise ae": np.asarray(jnp.nanmean(ae, axis=(0, -1)).reshape(-1)),
                "pixelwise se": np.asarray(jnp.nanmean(se, axis=(0, -1)).reshape(-1)),
                "pixelwise var": np.asarray(jnp.nanmean(var, axis=(0, -1)).reshape(-1)),
            })
    return out


def _metrics_one(target: jax.Array, pred: jax.Array,
                 var: Optional[jax.Array] = None) -> Dict:
    """Scalar metrics for ONE sample [1, H, W, C] as jnp scalars (traceable)."""
    rmse = jnp.sqrt(jnp.mean(jnp.square(target - pred)))
    psnr = 20.0 * jnp.log10(1.0 / rmse)
    mae = jnp.mean(jnp.abs(target - pred))
    dot = jnp.sum(target * pred, axis=-1)
    denom = jnp.sqrt(jnp.sum(target * target, axis=-1)) * \
        jnp.sqrt(jnp.sum(pred * pred, axis=-1))
    sam = jnp.mean(jnp.arccos(jnp.clip(dot / denom, -1.0, 1.0)) * 180.0 / jnp.pi)
    out = {"RMSE": rmse, "MAE": mae, "PSNR": psnr, "SAM": sam,
           "SSIM": _ssim(target, pred)}
    if var is not None:
        error = target - pred
        out.update({
            "error": jnp.nanmean(error),
            "mean ae": jnp.nanmean(jnp.abs(error)),
            "mean se": jnp.nanmean(jnp.square(error)),
            "mean var": jnp.nanmean(var),
        })
    return out


@jax.jit
def _metrics_batch_var(target, pred, var):
    return jax.vmap(_metrics_one)(target, pred, var)


@jax.jit
def _metrics_batch_novar(target, pred):
    return jax.vmap(lambda t, p: _metrics_one(t, p))(target, pred)


def img_metrics_batch(target: jax.Array, pred: jax.Array,
                      var: Optional[jax.Array] = None) -> Dict:
    """Whole-batch metrics in ONE jitted device call (VERDICT r1 item 8:
    the reference's per-item img_metrics loop re-serialized what the fused
    eval step won). target/pred: [B, 1, H, W, C]; var same or None.

    Returns {metric: jax.Array [B]} -- RAW device arrays, NOT ndarrays: in a
    multi-host run the inputs are global sharded arrays, so the [B] outputs
    span non-addressable devices and np.asarray would raise. The caller
    (iterate()) owns the host transfer via its _to_host/process_allgather
    helper; it feeds the values per-sample into the nan-skipping
    AvgImgMetrics meter, numerically identical to B separate img_metrics
    calls."""
    if var is not None:
        return _metrics_batch_var(target, pred, var)
    return _metrics_batch_novar(target, pred)


class AvgImgMetrics:
    """NaN-skipping running mean of scalar metrics
    (metrics.py:65-101 parity)."""

    def __init__(self):
        self.metrics = ["RMSE", "MAE", "PSNR", "SAM", "SSIM",
                        "error", "mean se", "mean ae", "mean var"]
        self.reset()

    def reset(self):
        self.running = {m: float("nan") for m in self.metrics}
        self.counts = {m: 0 for m in self.metrics}
        self.extras = {}

    def add(self, d: Dict):
        for k, v in d.items():
            if k not in self.metrics:
                continue
            if isinstance(v, (np.ndarray, jnp.ndarray)) and np.ndim(v) > 0:
                continue
            v = float(v)
            if np.isnan(v):
                continue
            c = self.counts[k]
            if c == 0:
                self.running[k] = v
            else:
                self.running[k] = c / (c + 1) * self.running[k] + v / (c + 1)
            self.counts[k] = c + 1

    def value(self) -> Dict:
        return {**self.running, **self.extras}

    def __setitem__(self, key, val):
        # allow img_meter.value()['UCE SE'] = ... style post-hoc inserts
        self.extras[key] = val
