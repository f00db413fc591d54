"""The two reflect-conv lowerings agree (values and gradients).

layers.Conv2d lowers 3x3/stride-1 reflect convs as a zero-SAME conv plus
border-strip corrections by default; UNCR_REFLECT=pad forces the generic
materialized-pad branch (an on-chip A/B escape hatch, tools/r4_reflect_ab.py).
Both must compute the identical mathematical conv (torch nn.Conv2d
padding_mode='reflect' parity, /root/reference/model/src/backbones/uncrtaints.py:60-66)
up to fp reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncrtaints_tpu.models.layers import Conv2d


@pytest.mark.parametrize("groups,cin,cout", [(1, 8, 16), (8, 8, 8)])
def test_pad_mode_matches_strip_mode(monkeypatch, groups, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, cin)), jnp.float32)
    conv = Conv2d(features=cout, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=groups)
    variables = conv.init(jax.random.PRNGKey(1), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)))

    y_fast = conv.apply(variables, x)
    g_fast = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT", "pad")
    y_pad = conv.apply(variables, x)
    g_pad = jax.grad(loss, argnums=(0, 1))(variables, x)

    np.testing.assert_allclose(y_fast, y_pad, atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_pad)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_batched_border_strips_bit_identical(monkeypatch):
    """The channel-stacked single-dispatch border correction
    (Conv2d._reflect3x3_border_batched, depthwise square inputs) computes
    the SAME FMAs in the SAME order as the four per-edge strip convs:
    outputs and gradients must match bit for bit."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    conv = Conv2d(features=8, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=8)
    variables = conv.init(jax.random.PRNGKey(1), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)))

    monkeypatch.setenv("UNCR_REFLECT_BATCH", "1")
    y_b = conv.apply(variables, x)
    g_b = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT_BATCH", "0")
    y_u = conv.apply(variables, x)
    g_u = jax.grad(loss, argnums=(0, 1))(variables, x)

    np.testing.assert_array_equal(np.asarray(y_b), np.asarray(y_u))
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("shape", [(2, 12, 12, 8), (1, 9, 14, 8)])
def test_eltwise_border_strips_match(monkeypatch, shape):
    """The shifted-FMA border form (UNCR_REFLECT_STRIPS=eltwise) matches
    both the strip-conv default and the materialized-pad ground truth —
    values and gradients."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    conv = Conv2d(features=8, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=8)
    variables = conv.init(jax.random.PRNGKey(6), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)))

    monkeypatch.setenv("UNCR_REFLECT_STRIPS", "eltwise")
    y_e = conv.apply(variables, x)
    g_e = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT_STRIPS", "conv")
    y_c = conv.apply(variables, x)
    g_c = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT", "pad")
    y_p = conv.apply(variables, x)

    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_c),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_p),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_e), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 12, 12, 8), (1, 9, 14, 8), (1, 2, 2, 4)])
@pytest.mark.parametrize("fwd_form,gw_form", [
    ("conv", "ring"), ("shift", "pad"), ("shift", "ring")])
def test_fused_vjp_matches(monkeypatch, shape, fwd_form, gw_form):
    """The one-op reflect VJP (UNCR_REFLECT_STRIPS=fused) matches the
    strip-conv default and the materialized-pad ground truth — values and
    both gradients — for every (forward form, kernel-grad form) knob
    combination, including the degenerate 2x2 spatial case."""
    monkeypatch.setenv("UNCR_REFLECT_FUSED_FWD", fwd_form)
    monkeypatch.setenv("UNCR_REFLECT_FUSED_GW", gw_form)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    conv = Conv2d(features=shape[-1], kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=shape[-1])
    variables = conv.init(jax.random.PRNGKey(8), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)) * jnp.cos(x))

    monkeypatch.setenv("UNCR_REFLECT_STRIPS", "fused")
    y_f = conv.apply(variables, x)
    g_f = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT_STRIPS", "conv")
    y_c = conv.apply(variables, x)
    g_c = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT", "pad")
    y_p = conv.apply(variables, x)
    g_p = jax.grad(loss, argnums=(0, 1))(variables, x)

    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("form", ["conv", "auto"])
def test_dw_form_conv_matches_shift(monkeypatch, form):
    """UNCR_DW_FORM=conv/auto lowers the differentiated dw stencil through
    lax.conv (round-5 encoder-site win) — values and both gradients must
    match the shift-add default (fp32 inputs force HIGHEST precision, so
    only fp reassociation noise remains)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    conv = Conv2d(features=8, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=8)
    variables = conv.init(jax.random.PRNGKey(12), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)) * jnp.cos(x))

    monkeypatch.setenv("UNCR_DW_FORM", "shift")
    y0 = conv.apply(variables, x)
    g0 = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_DW_FORM", form)
    if form == "auto":  # let the tiny test site pass the row gate
        monkeypatch.setenv("UNCR_DW_CONV_MIN_ROWS", "1")
    y1 = conv.apply(variables, x)
    g1 = jax.grad(loss, argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_fused_vjp_pallas_gw_on_reflect_pad():
    """The Pallas kernel-grad consumes the reflect-PADDED input with VALID
    pads exactly (interpret mode): same gw as jax.grad through the
    materialized-pad conv."""
    from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad

    rng = np.random.default_rng(9)
    N, H, W, C = 2, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.2, jnp.float32)
    g = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)

    def ref(w):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return jnp.sum(y * g)

    gw_ref = jax.grad(ref)(w)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    gw = dw_kernel_grad(xp, g, ((0, 0), (0, 0)), 3, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=1e-4, rtol=1e-4)


def test_batched_border_matches_pad_mode(monkeypatch):
    """Batched border path vs the materialized-pad ground truth."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 8)), jnp.float32)
    conv = Conv2d(features=8, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=8)
    variables = conv.init(jax.random.PRNGKey(4), x)
    monkeypatch.setenv("UNCR_REFLECT_BATCH", "1")
    y_b = conv.apply(variables, x)
    monkeypatch.setenv("UNCR_REFLECT", "pad")
    y_p = conv.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_p),
                               atol=1e-5, rtol=1e-5)
