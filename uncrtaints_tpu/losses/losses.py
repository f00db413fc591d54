"""Reconstruction losses: l1 / l2 / GNLL / MGNLL.

Parity with /root/reference/model/src/losses.py, re-derived in closed form
for TPU:

- GNLL (losses.py:46-128): elementwise 0.5*(log var + (x-mu)^2/var), var
  clamped to eps with a stop-gradient (torch clamps under no_grad so the
  clamp never affects gradients), + 0.5*log(2*pi) when full=True.

- MGNLL (losses.py:131-218): the reference builds a per-pixel k=13 diagonal
  precision matrix with diag_embed and evaluates the Mahalanobis form with a
  double torch.vmap over H,W + bmm (chunk_size memory knob). For a diagonal
  covariance that is mathematically

      loss = k/2*log(2*pi) + 1/2*sum_c log(var_c) + 1/2*sum_c err_c^2/var_c

  which we compute elementwise -- no vmap, no bmm, no chunking needed; the
  whole thing fuses into a few VPU ops. Reference quirks preserved exactly:
  * iso mode broadcasts the scalar variance across all 13 bands (189-192)
  * the Mahalanobis term is nan_to_num'ed and clamped to min 1e-9 (141)
  * ONLY the first S2_BANDS variance channels are eps-clamped (205)
  * the per-(pixel) loss is `-(-k/2 log2pi - 1/2 logdet - 1/2 xTCx)` where
    logdet sums over channels (138)

Both NLL losses return ``(scalar_loss, variance)`` where variance is the
clamped [B, 1, H, W, C] tensor (the reference materializes a [B,1,C,C,H,W]
diagonal covariance; we keep the compact diagonal and expand only on export).

Layout: NHWC -- mean/target/var are [B, 1, H, W, C].
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

S2_BANDS = 13


def l1_loss(pred, target):
    return jnp.abs(pred - target).mean()


def l2_loss(pred, target):
    return jnp.square(pred - target).mean()


def _clamp_nograd(var, eps):
    """torch `var.clamp_(min=eps)` under no_grad: gradients flow as if the
    clamp never happened."""
    clamped = jnp.maximum(var, eps)
    return var + jax.lax.stop_gradient(clamped - var)


def gaussian_nll_loss(pred: jax.Array, target: jax.Array, var: jax.Array,
                      full: bool = True, eps: float = 1e-8,
                      reduction: str = "mean") -> Tuple[jax.Array, jax.Array]:
    """Univariate Gaussian NLL, heteroscedastic (losses.py:46-128)."""
    var = _clamp_nograd(var, eps)
    loss = 0.5 * (jnp.log(var) + jnp.square(pred - target) / var)
    if full:
        loss = loss + 0.5 * math.log(2 * math.pi)
    if reduction == "mean":
        return loss.mean(), var
    if reduction == "sum":
        return loss.sum(), var
    return loss, var


def multi_gaussian_nll_loss(pred: jax.Array, target: jax.Array, var: jax.Array,
                            full: bool = True, eps: float = 1e-8,
                            reduction: str = "mean", mode: str = "diag",
                            chunk=None) -> Tuple[jax.Array, jax.Array]:
    """Multivariate (diagonal / isotropic) Gaussian NLL over the spectral
    axis, one k=13 Gaussian per pixel (losses.py:131-218).

    pred/target: [B, 1, H, W, 13]; var: [B, 1, H, W, 13] (diag) or
    [..., 1] (iso). ``chunk`` is accepted for flag parity and ignored --
    the closed form needs no memory chunking.
    """
    del chunk
    if mode == "iso":
        var = jnp.broadcast_to(var, var.shape[:-1] + (S2_BANDS,))
    k = pred.shape[-1]
    # clamp only the first S2_BANDS variance channels (reference quirk,
    # losses.py:205: `variance[:, :, :S2_BANDS, ...].clamp_(min=eps)`);
    # channels beyond 13 -- none exist in any shipped covmode, where the
    # spectral axis is exactly S2_BANDS -- would pass through unclamped
    if var.shape[-1] > S2_BANDS:
        var = jnp.concatenate(
            [_clamp_nograd(var[..., :S2_BANDS], eps), var[..., S2_BANDS:]],
            axis=-1)
    else:
        var = _clamp_nograd(var, eps)

    err = pred - target
    logdet = jnp.log(var).sum(axis=-1)                     # [B,1,H,W]
    maha = (jnp.square(err) / var).sum(axis=-1)            # Mahalanobis, diag precision
    maha = jnp.maximum(jnp.nan_to_num(maha), 1e-9)          # losses.py:141
    loss = 0.5 * k * math.log(2 * math.pi) + 0.5 * logdet + 0.5 * maha
    if reduction == "mean":
        return loss.mean(), var
    if reduction == "sum":
        return loss.sum(), var
    return loss, var


def get_loss(config) -> Callable:
    """Loss factory (losses.py:14-32). Returns
    criterion(pred, target, var=None) -> (loss, variance_or_None)."""
    if config.loss == "GNLL":
        return lambda pred, targ, var: gaussian_nll_loss(
            pred, targ, var, full=True, eps=1e-8, reduction="mean")
    if config.loss == "MGNLL":
        return lambda pred, targ, var: multi_gaussian_nll_loss(
            pred, targ, var, full=True, eps=1e-8, reduction="mean",
            mode=config.covmode, chunk=config.chunk_size)
    if config.loss == "l1":
        return lambda pred, targ, var=None: (l1_loss(pred, targ), None)
    if config.loss == "l2":
        return lambda pred, targ, var=None: (l2_loss(pred, targ), None)
    raise NotImplementedError(config.loss)


def calc_loss(criterion, config, out, y, var=None):
    """losses.py:35-43 parity."""
    if config.loss in ("GNLL", "MGNLL"):
        return criterion(out, y, var)
    return criterion(out, y)
