"""Gradient-parity tests for the hand-written VJPs in models/layers.py.

These rules exist for TPU performance (XLA's depthwise/pointwise conv
gradients impose channel-major layouts, and autodiff through the rational
erf GELU saves fp32 intermediates); numerically they must match -- and for
the depthwise kernel grad, BEAT -- the default autodiff. Ground truth is
float64 numpy where the default lowering itself is imprecise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uncrtaints_tpu.models.layers import (
    gelu, _dw_conv_same, _dw_conv_valid, _pw_conv,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _dw_ref(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def test_dw_same_grads_vs_float64(rng):
    N, H, W, C = 2, 6, 7, 4
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))

    out = _dw_conv_same(x, w)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dw_ref(x, w, [(1, 1), (1, 1)])),
                               atol=1e-5)

    gx, gw = jax.grad(lambda x, w: (_dw_conv_same(x, w) * g).sum(),
                      argnums=(0, 1))(x, w)
    # float64 ground truth for the kernel grad
    xn = np.asarray(x, np.float64)
    gn = np.asarray(g, np.float64)
    xp = np.pad(xn, [(0, 0), (1, 1), (1, 1), (0, 0)])
    gt = np.zeros((3, 3, 1, C))
    for dy in range(3):
        for dx in range(3):
            gt[dy, dx, 0] = (xp[:, dy:dy + H, dx:dx + W] * gn).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(gw), gt, atol=1e-5)
    # input grad vs default autodiff of the reference conv
    gx_ref = jax.grad(lambda x: (_dw_ref(x, w, [(1, 1), (1, 1)]) * g).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)


@pytest.mark.parametrize("kh,kw", [(1, 3), (3, 1), (3, 3)])
def test_dw_valid_grads_vs_float64(rng, kh, kw):
    N, H, W, C = 2, 6, 8, 4
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((kh, kw, 1, C)).astype(np.float32))
    Ho, Wo = H - kh + 1, W - kw + 1
    g = jnp.asarray(rng.standard_normal((N, Ho, Wo, C)).astype(np.float32))

    np.testing.assert_allclose(np.asarray(_dw_conv_valid(x, w)),
                               np.asarray(_dw_ref(x, w, "VALID")), atol=1e-5)
    gx, gw = jax.grad(lambda x, w: (_dw_conv_valid(x, w) * g).sum(),
                      argnums=(0, 1))(x, w)
    xn = np.asarray(x, np.float64)
    gn = np.asarray(g, np.float64)
    gt = np.zeros((kh, kw, 1, C))
    for dy in range(kh):
        for dx in range(kw):
            gt[dy, dx, 0] = (xn[:, dy:dy + Ho, dx:dx + Wo] * gn).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(gw), gt, atol=1e-5)
    gx_ref = jax.grad(lambda x: (_dw_ref(x, w, "VALID") * g).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)


def test_pw_conv_grads(rng):
    N, H, W, C, O = 2, 5, 6, 8, 12
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, C, O)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, H, W, O)).astype(np.float32))

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    np.testing.assert_allclose(np.asarray(_pw_conv(x, w)),
                               np.asarray(ref(x, w)), atol=1e-5)
    gx0, gw0 = jax.grad(lambda x, w: (ref(x, w) * g).sum(), argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(lambda x, w: (_pw_conv(x, w) * g).sum(), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1), atol=1e-4)


def test_gelu_grad_exact_fp32():
    x = jnp.linspace(-5.0, 5.0, 801, dtype=jnp.float32)
    g_ref = jax.grad(lambda x: jax.nn.gelu(x, approximate=False).sum())(x)
    g_new = jax.grad(lambda x: gelu(x).sum())(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-6)


def test_gelu_grad_bf16_within_resolution():
    x = jnp.linspace(-5.0, 5.0, 801, dtype=jnp.float32)
    g_ref = jax.grad(lambda x: jax.nn.gelu(x, approximate=False).sum())(x)
    xb = x.astype(jnp.bfloat16)
    g_b = jax.grad(lambda x: gelu(x).astype(jnp.float32).sum())(xb)
    assert float(jnp.abs(g_b.astype(jnp.float32) - g_ref).max()) < 0.01
