"""Loss parity tests: closed-form TPU losses vs the reference formulas
re-derived in torch (diag_embed + bmm Mahalanobis form) on tiny tensors."""

import math

import numpy as np
import torch
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, derive
from uncrtaints_tpu.losses import (
    get_loss, calc_loss, gaussian_nll_loss, multi_gaussian_nll_loss,
)


def _torch_mgnll(pred, target, var, mode="diag", eps=1e-8):
    """Reference math (losses.py:131-218) re-derived: per-pixel k=13
    multivariate NLL with diagonal precision via bmm."""
    S2 = 13
    pred_t = torch.from_numpy(pred)
    target_t = torch.from_numpy(target)
    var_t = torch.from_numpy(var)
    if mode == "iso":
        var_t = var_t.expand(-1, -1, S2, -1, -1).contiguous()
    var_t = var_t.clamp(min=eps)
    B, _, C, H, W = pred_t.shape
    losses = torch.zeros(H, W, B)
    for i in range(H):
        for j in range(W):
            p = pred_t[:, 0, :, i, j]
            t = target_t[:, 0, :, i, j]
            v = var_t[:, 0, :, i, j]
            prec = torch.diag_embed(1 / v)
            logdetv = v.log().sum()  # NOTE: reference sums over the whole slice
            err = (p - t).unsqueeze(1)
            xTCx = torch.bmm(torch.bmm(err, prec), err.permute(0, 2, 1))
            xTCx = xTCx.squeeze().nan_to_num().clamp(min=1e-9)
            k = C
            losses[i, j] = -(-k / 2 * math.log(2 * math.pi)
                             - 0.5 * logdetv - 0.5 * xTCx)
    return losses.mean().item()


def test_gnll_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.random((2, 1, 13, 8, 8)).astype(np.float32)
    target = rng.random((2, 1, 13, 8, 8)).astype(np.float32)
    var = (0.1 + rng.random((2, 1, 13, 8, 8))).astype(np.float32)

    ref = torch.nn.functional.gaussian_nll_loss(
        torch.from_numpy(pred), torch.from_numpy(target),
        torch.from_numpy(var), full=True, eps=1e-8).item()
    # ours is NHWC
    loss, v = gaussian_nll_loss(
        jnp.asarray(pred.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(target.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(var.transpose(0, 1, 3, 4, 2)), full=True)
    assert abs(float(loss) - ref) < 1e-5


def test_mgnll_diag_matches_reference_math():
    """Key subtlety: the reference's per-pixel function sums log-var over the
    WHOLE [B, C] slice it is vmapped over (losses.py:138 `var.log().sum()`),
    i.e. per (H, W) position the log-det term is summed across the batch too.
    Our closed form computes the per-(B,H,W) NLL; the mean-reduced losses
    differ by exactly (B-1) * mean(log var) -- verify on B=1 where they agree."""
    rng = np.random.default_rng(1)
    B = 1
    pred = rng.random((B, 1, 13, 4, 4)).astype(np.float32)
    target = rng.random((B, 1, 13, 4, 4)).astype(np.float32)
    var = (0.05 + rng.random((B, 1, 13, 4, 4))).astype(np.float32)

    ref = _torch_mgnll(pred, target, var, mode="diag")
    loss, v = multi_gaussian_nll_loss(
        jnp.asarray(pred.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(target.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(var.transpose(0, 1, 3, 4, 2)), mode="diag")
    assert abs(float(loss) - ref) < 1e-4
    assert v.shape == (B, 1, 4, 4, 13)


def test_mgnll_iso_broadcasts_variance():
    rng = np.random.default_rng(2)
    pred = rng.random((1, 1, 13, 4, 4)).astype(np.float32)
    target = rng.random((1, 1, 13, 4, 4)).astype(np.float32)
    var = (0.05 + rng.random((1, 1, 1, 4, 4))).astype(np.float32)

    ref = _torch_mgnll(pred, target, var, mode="iso")
    loss, v = multi_gaussian_nll_loss(
        jnp.asarray(pred.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(target.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(var.transpose(0, 1, 3, 4, 2)), mode="iso")
    assert abs(float(loss) - ref) < 1e-4
    assert v.shape == (1, 1, 4, 4, 13)  # broadcast to all bands


def test_clamp_has_no_gradient_effect():
    """torch clamps var under no_grad; verify our stop-gradient clamp keeps
    d loss/d var equal to the unclamped analytic gradient above eps."""
    var = jnp.asarray([[0.5]])
    pred = jnp.asarray([[1.0]])
    targ = jnp.asarray([[0.0]])
    g = jax.grad(lambda v: gaussian_nll_loss(pred, targ, v)[0])(var)
    # d/dv [0.5(log v + e^2/v)] = 0.5(1/v - e^2/v^2); e=1, v=0.5 -> 0.5(2-4) = -1
    assert abs(float(g[0, 0]) - (-1.0)) < 1e-5


def test_loss_factory_and_calc_loss():
    cfg = derive(Config())  # MGNLL diag
    crit = get_loss(cfg)
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.random((2, 1, 4, 4, 13), dtype=np.float32))
    targ = jnp.asarray(rng.random((2, 1, 4, 4, 13), dtype=np.float32))
    var = jnp.asarray(0.1 + rng.random((2, 1, 4, 4, 13), dtype=np.float32))
    loss, v = calc_loss(crit, cfg, pred, targ, var=var)
    assert np.isfinite(float(loss))

    cfg2 = derive(Config(loss="l2", model="utae",
                         encoder_widths=[16, 16], decoder_widths=[16, 16]))
    crit2 = get_loss(cfg2)
    loss2, v2 = calc_loss(crit2, cfg2, pred, targ)
    assert v2 is None
    assert abs(float(loss2) - float(jnp.mean((pred - targ) ** 2))) < 1e-6


def test_mgnll_clamps_only_first_s2_bands():
    """Reference quirk (losses.py:205): only variance[..., :S2_BANDS] is
    eps-clamped. With a hypothetical >13-channel variance, channels past 13
    must pass through unclamped (and feed log() unprotected, as in torch)."""
    k = 15
    pred = jnp.zeros((1, 1, 2, 2, k))
    targ = jnp.ones((1, 1, 2, 2, k))
    # eps=0.25 is exactly representable so the stop-gradient clamp
    # (var + sg(clamped - var)) reproduces it bit-exactly in fp32
    var = jnp.full((1, 1, 2, 2, k), 0.5).at[..., 0].set(-1.0).at[..., 14].set(-1.0)
    _, v = multi_gaussian_nll_loss(pred, targ, var, eps=0.25, mode="diag",
                                   reduction="mean")
    assert float(v[0, 0, 0, 0, 0]) == 0.25     # clamped (band < 13)
    assert float(v[0, 0, 0, 0, 14]) == -1.0    # untouched (band >= 13)
    # the shipped 13-channel path still clamps everything
    var13 = jnp.full((1, 1, 2, 2, 13), -1.0)
    _, v13 = multi_gaussian_nll_loss(jnp.zeros((1, 1, 2, 2, 13)),
                                     jnp.ones((1, 1, 2, 2, 13)), var13,
                                     eps=0.25, mode="diag")
    assert float(v13.min()) == 0.25
