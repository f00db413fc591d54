"""Numerics tests for the fused Pallas MBConv kernels (interpret mode on
CPU; the same code compiles via Mosaic on TPU -- see ops/pallas_mbconv.py
STATUS for measured performance)."""

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.ops.pallas_mbconv import (
    norm_gelu_matmul, norm_gelu_dwconv3x3, _erf,
)


def _stats(x, G):
    N = x.shape[0]
    xg = x.astype(jnp.float32).reshape(N, -1, G, x.shape[-1] // G)
    m = xg.mean(axis=(1, 3))
    v = xg.var(axis=(1, 3))
    return m, jax.lax.rsqrt(v + 1e-5)


def test_erf_approximation_accuracy():
    x = jnp.linspace(-5, 5, 4001)
    import scipy.special as sp
    ref = sp.erf(np.asarray(x, np.float64))
    got = np.asarray(_erf(x))
    # 1.5e-7 analytic bound + fp32 evaluation noise
    assert np.abs(got - ref).max() < 1e-6


def test_norm_gelu_matmul_parity(rng):
    N, P, C, C2, G = 2, 1024, 128, 256, 4
    x = jnp.asarray(rng.standard_normal((N, P, C)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, C2)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    m, coef = _stats(x, G)

    out, s1, s2 = norm_gelu_matmul(x, m, coef, scale, bias, w,
                                   groups_in=G, groups_out=G,
                                   do_gelu=True, tile=512)

    mb = jnp.repeat(m, C // G, -1)[:, None]
    cb = jnp.repeat(coef, C // G, -1)[:, None]
    h = (x.astype(jnp.float32) - mb) * cb * scale + bias
    h = jax.nn.gelu(h, approximate=False)
    ref = jnp.einsum("npc,cd->npd", h.astype(jnp.bfloat16), w,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # within ~1 bf16 ulp
    d = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
    assert float(d.max()) <= 0.05 * float(jnp.abs(ref).max())

    og = ref.astype(jnp.float32).reshape(N, P, G, C2 // G)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(og.sum(axis=(1, 3))),
                               rtol=2e-3, atol=2.0)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.square(og).sum(axis=(1, 3))),
                               rtol=2e-3)


def test_norm_gelu_dwconv_parity(rng):
    N, H, W, C, G = 1, 32, 256, 256, 4
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C)).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    m, coef = _stats(x, G)

    out, s1, s2 = norm_gelu_dwconv3x3(x, m, coef, scale, bias, w,
                                      groups_in=G, groups_out=G, tile_h=16)

    mb = jnp.repeat(m, C // G, -1)[:, None, None]
    cb = jnp.repeat(coef, C // G, -1)[:, None, None]
    h = jax.nn.gelu((x.astype(jnp.float32) - mb) * cb * scale + bias,
                    approximate=False)
    hp = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    ref = jax.lax.conv_general_dilated(
        hp.astype(jnp.float32), w[:, :, None, :].astype(jnp.float32),
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C).astype(jnp.bfloat16)
    d = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
    assert float(d.max()) <= 0.05 * float(jnp.abs(ref).max())
