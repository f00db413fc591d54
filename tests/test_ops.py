"""Golden parity tests for the TPU ops layer vs torch/scipy CPU kernels.

The framework itself never imports torch/scipy; they are used here only to
generate reference outputs for the library kernels the PyTorch codebase
delegates to (see SURVEY.md section 2 'native-backed ops')."""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F
import scipy.signal as scisig
import scipy.ndimage as ndi

from uncrtaints_tpu.ops import (
    upsample_bilinear, avg_pool2d, adaptive_max_pool2d,
    median_filter2d, grey_closing, box_filter2d, gaussian_filter2d, ssim,
)


def test_upsample_bilinear_matches_torch_align_corners_false(rng):
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)  # NCHW for torch
    ref = F.interpolate(torch.from_numpy(x), size=(256, 256), mode="bilinear",
                        align_corners=False).numpy()
    # ours is NHWC
    got = upsample_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (256, 256))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("src,dst", [((8, 8), (8, 72)),    # W-only upsample
                                     ((16, 8), (48, 40)),  # both, non-uniform
                                     ((8, 8), (24, 8))])   # H-only upsample
def test_upsample_bilinear_non_square_matches_torch(rng, src, dst):
    """Non-square / single-axis resizes: load-bearing for the aggregator's
    attention upsample on non-square scenes (custom mosaics)."""
    x = rng.standard_normal((2, 3, *src)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=dst, mode="bilinear",
                        align_corners=False).numpy()
    got = upsample_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), dst)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 4, 64, 64)).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), kernel_size=4).numpy()
    got = avg_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw,out", [((256, 256), (32, 32)), ((100, 80), (32, 32))])
def test_adaptive_max_pool_matches_torch(rng, hw, out):
    x = rng.standard_normal((2, 5, *hw)).astype(np.float32)
    ref = F.adaptive_max_pool2d(torch.from_numpy(x), out).numpy()
    got = adaptive_max_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), out)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-6, atol=1e-6)


def test_median_filter_matches_scipy(rng):
    x = rng.standard_normal((40, 56)).astype(np.float32)
    ref = scisig.medfilt2d(x, 5)
    got = median_filter2d(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_grey_closing_matches_scipy(rng):
    x = rng.standard_normal((48, 48)).astype(np.float32)
    ref = ndi.grey_closing(x, size=(5, 5))
    got = grey_closing(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_box_filter_matches_scipy(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    box = np.ones((7, 7)) / 49.0
    ref = scisig.convolve2d(x, box, mode="same")
    got = box_filter2d(jnp.asarray(x), 7)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_gaussian_filter_matches_scipy(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    ref = ndi.gaussian_filter(x, sigma=2.0)
    got = gaussian_filter2d(jnp.asarray(x), sigma=2.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_ssim_matches_reference_impl(rng):
    """Golden parity with util/pytorch_ssim/__init__.py:7-73 (re-derived here
    in torch, not imported)."""
    def torch_ssim(img1, img2, window_size=11):
        def gaussian(ws, sigma):
            g = torch.tensor([np.exp(-(i - ws // 2) ** 2 / (2.0 * sigma ** 2))
                              for i in range(ws)], dtype=torch.float32)
            return g / g.sum()
        ch = img1.shape[1]
        _1d = gaussian(window_size, 1.5).unsqueeze(1)
        _2d = _1d.mm(_1d.t()).unsqueeze(0).unsqueeze(0)
        w = _2d.expand(ch, 1, window_size, window_size).contiguous()
        pad = window_size // 2
        mu1 = F.conv2d(img1, w, padding=pad, groups=ch)
        mu2 = F.conv2d(img2, w, padding=pad, groups=ch)
        mu1_sq, mu2_sq, mu1mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, w, padding=pad, groups=ch) - mu1_sq
        s2 = F.conv2d(img2 * img2, w, padding=pad, groups=ch) - mu2_sq
        s12 = F.conv2d(img1 * img2, w, padding=pad, groups=ch) - mu1mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean().item()

    a = rng.random((1, 13, 64, 64)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    ref = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(ref - got) < 1e-4


def test_ssim_separable_matches_2d_window(rng, monkeypatch):
    """The separable-blur SSIM (default) and the 2-D-window form
    (UNCR_SSIM_SEPARABLE=0, the A/B knob) agree to fp32 reassociation
    noise — the gaussian window is exactly an outer product."""
    a = rng.random((2, 48, 48, 13)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1).astype(np.float32)
    monkeypatch.setenv("UNCR_SSIM_SEPARABLE", "0")
    ref = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    monkeypatch.setenv("UNCR_SSIM_SEPARABLE", "1")
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - got) < 1e-5


def test_adaptive_max_pool_grad_matches_reduce_window(rng):
    """The reshape-based divisible path must differentiate identically to
    the reduce_window formulation (routing gradient to the argmax)."""
    import jax
    from jax import lax
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))

    def via_reshape(a):
        return adaptive_max_pool2d(a, (4, 4)).sum()

    def via_reduce_window(a):
        return lax.reduce_window(a, -jnp.inf, lax.max,
                                 (1, 4, 4, 1), (1, 4, 4, 1), "VALID").sum()

    g0 = jax.grad(via_reshape)(x)
    g1 = jax.grad(via_reduce_window)(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)
