"""Metric parity tests vs the reference formulas (re-derived in torch/numpy)."""

import numpy as np
import torch
import jax.numpy as jnp

from uncrtaints_tpu.metrics import (
    img_metrics, AvgImgMetrics, compute_ece, compute_uce_auce,
)


def _ref_metrics(target_nchw, pred_nchw):
    """metrics.py:20-38 math re-derived (RMSE/PSNR/MAE/SAM)."""
    t, p = torch.from_numpy(target_nchw), torch.from_numpy(pred_nchw)
    rmse = torch.sqrt(torch.mean(torch.square(t - p)))
    psnr = 20 * torch.log10(1 / rmse)
    mae = torch.mean(torch.abs(t - p))
    mat = torch.sum(t * p, 1)
    mat = mat / torch.sqrt(torch.sum(t * t, 1))
    mat = mat / torch.sqrt(torch.sum(p * p, 1))
    sam = torch.mean(torch.acos(torch.clamp(mat, -1, 1)) * 180 / torch.pi)
    return rmse.item(), psnr.item(), mae.item(), sam.item()


def test_img_metrics_parity(rng):
    t = rng.random((1, 13, 32, 32)).astype(np.float32)
    p = np.clip(t + 0.05 * rng.standard_normal(t.shape).astype(np.float32), 0, 1)
    rmse, psnr, mae, sam = _ref_metrics(t, p)
    got = img_metrics(jnp.asarray(t.transpose(0, 2, 3, 1)),
                      jnp.asarray(p.transpose(0, 2, 3, 1)))
    assert abs(got["RMSE"] - rmse) < 1e-6
    assert abs(got["PSNR"] - psnr) < 1e-3
    assert abs(got["MAE"] - mae) < 1e-6
    assert abs(got["SAM"] - sam) < 1e-3
    assert 0.0 < got["SSIM"] <= 1.0


def test_img_metrics_with_var(rng):
    t = rng.random((1, 32, 32, 13)).astype(np.float32)
    p = rng.random((1, 32, 32, 13)).astype(np.float32)
    v = 0.01 + rng.random((1, 32, 32, 13)).astype(np.float32)
    got = img_metrics(jnp.asarray(t), jnp.asarray(p), var=jnp.asarray(v),
                      pixelwise=True)
    assert abs(got["mean se"] - np.mean((t - p) ** 2)) < 1e-6
    assert got["pixelwise var"].shape == (32 * 32,)


def test_avg_meter_nan_skipping():
    m = AvgImgMetrics()
    m.add({"RMSE": 1.0, "PSNR": float("nan")})
    m.add({"RMSE": 3.0, "PSNR": 10.0})
    v = m.value()
    assert v["RMSE"] == 2.0
    assert v["PSNR"] == 10.0
    m["UCE SE"] = 0.5  # post-hoc insert like the reference's img_meter
    assert m.value()["UCE SE"] == 0.5


def test_compute_ece_discard_curve():
    # 20 samples: error == uncertainty rank -> cumulative means are analytic
    variances = np.arange(20, dtype=np.float64)
    errors = np.arange(20, dtype=np.float64)
    curve = compute_ece(variances, errors, 20, percent=5)
    assert len(curve) == 20
    # bin r: mean of first r errors = (r-1)/2
    np.testing.assert_allclose(curve, [(r - 1) / 2 for r in range(1, 21)])


def test_compute_uce_auce_perfect_calibration():
    rng = np.random.default_rng(0)
    var = rng.uniform(0.01, 1.0, 500)
    # errors whose RMS exactly equals sqrt(var) in expectation
    err = np.sqrt(var) * rng.standard_normal(500)
    uce, auce, detail = compute_uce_auce(var, err, 500, percent=5)
    assert uce < 0.15
    assert np.isfinite(auce)
