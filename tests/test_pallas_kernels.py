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

def test_norm_gelu_matmul_epilogue(rng):
    """Epilogue affine + GELU and do_stats=False (round-2 extensions)."""
    N, P, C, C2 = 2, 512, 128, 128
    x = jnp.asarray(rng.standard_normal((N, P, C)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, C2)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    c_in = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    o_in = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    c_out = jnp.asarray(rng.standard_normal(C2).astype(np.float32))
    o_out = jnp.asarray(rng.standard_normal(C2).astype(np.float32))
    se = jnp.asarray(rng.random((N, C)).astype(np.float32))
    zero = jnp.zeros((N, 1), jnp.float32)
    one = jnp.ones((N, 1), jnp.float32)

    out, s1, s2 = norm_gelu_matmul(
        x, zero, one, c_in, o_in, w, se=se, groups_in=1,
        do_gelu=True, tile=512, out_affine=(c_out, o_out), out_gelu=True,
        do_stats=False)

    h = jax.nn.gelu(x.astype(jnp.float32) * c_in + o_in, approximate=False)
    h = h * se[:, None, :]
    g = jnp.einsum("npc,cd->npd", h.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32)
    ref = jax.nn.gelu(g * c_out + o_out, approximate=False).astype(jnp.bfloat16)
    d = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
    assert float(d.max()) <= 0.05 * float(jnp.abs(ref).max())
    assert float(jnp.abs(s1).max()) == 0.0  # stats skipped
    assert float(jnp.abs(s2).max()) == 0.0


def test_fused_mbconv_eval_parity(rng):
    """MBConv fused_eval path: identical parameter tree, output within
    bf16 accumulation tolerance of the standard eval path."""
    from uncrtaints_tpu.models.blocks import MBConv
    import flax

    C, H = 128, 16
    x = jnp.asarray(rng.standard_normal((2, 3, H, H, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    m_std = MBConv(C, C, expansion=2, norm="batch", fused_eval=False)
    m_fus = MBConv(C, C, expansion=2, norm="batch", fused_eval=True)

    v = m_std.init(jax.random.PRNGKey(0), x, False)
    v2 = m_fus.init(jax.random.PRNGKey(0), x, False)
    p0 = flax.traverse_util.flatten_dict(v["params"])
    p1 = flax.traverse_util.flatten_dict(v2["params"])
    assert sorted(p0) == sorted(p1)
    assert all(p0[k].shape == p1[k].shape for k in p0)

    # non-trivial running stats so the eval affines matter
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32)) * 0.3,
        v["batch_stats"])
    bs = jax.tree.map(lambda a: jnp.abs(a) + 0.5, bs)
    params_bf = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        v["params"])
    vb = {"params": params_bf, "batch_stats": bs}

    y0 = np.asarray(m_std.apply(vb, x, False), np.float32)
    y1 = np.asarray(m_fus.apply(vb, x, False), np.float32)
    d = np.abs(y0 - y1)
    assert d.max() <= 0.02 * np.abs(y0).max()
    assert np.sqrt((d ** 2).mean()) <= 5e-3 * np.abs(y0).max()
