"""Op-level TPU timing inside one MBConv block (scratch tool).

Times each op of the decoder MBConv (batch-norm eval, [8,256,256,128] bf16)
and the encoder variant in isolation, plus the round-1 Pallas kernels at the
same size, to decide where fused kernels pay.
Run from /root/repo: python tools/probe_block.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(name, fn, *args, iters=30):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return dt


def main():
    N, H, W, C, C2 = 8, 256, 256, 128, 256
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.random((N, H, W, C), dtype=np.float32)).astype(bf)
    h = jnp.asarray(rng.random((N, H, W, C2), dtype=np.float32)).astype(bf)
    w1 = jnp.asarray(rng.standard_normal((C, C2)).astype(np.float32) * .05).astype(bf)
    w2 = jnp.asarray(rng.standard_normal((C2, C)).astype(np.float32) * .05).astype(bf)
    wdw = jnp.asarray(rng.standard_normal((3, 3, C2)).astype(np.float32) * .1).astype(bf)
    scale = jnp.ones((C2,), jnp.float32)
    bias = jnp.zeros((C2,), jnp.float32)

    # 1. pointwise matmul alone (128->256)
    @jax.jit
    def pw1(a, w):
        return jnp.einsum("nhwc,cd->nhwd", a, w)
    bench("pw 1x1 128->256 (einsum)", pw1, x, w1)

    # 2. pointwise back (256->128)
    @jax.jit
    def pw2(a, w):
        return jnp.einsum("nhwc,cd->nhwd", a, w)
    bench("pw 1x1 256->128 (einsum)", pw2, h, w2)

    # 3. dw 3x3 reflect alone (XLA conv, 256ch)
    @jax.jit
    def dw(a, w):
        ap = jnp.pad(a, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        k = w[:, :, None, :]  # HWIO with I=1
        return lax.conv_general_dilated(
            ap, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C2)
    bench("dw 3x3 reflect (XLA conv)", dw, h, wdw)

    # 3b. dw 3x3 as 9 shifted adds (XLA elementwise)
    @jax.jit
    def dw_shift(a, w):
        ap = jnp.pad(a, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        acc = jnp.zeros_like(a, dtype=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + ap[:, dy:dy + H, dx:dx + W, :].astype(jnp.float32) \
                    * w[dy, dx].astype(jnp.float32)
        return acc.astype(a.dtype)
    bench("dw 3x3 as 9 shifted adds", dw_shift, h, wdw)

    # 4. batchnorm-eval affine + gelu alone
    @jax.jit
    def bn_gelu(a, s, b):
        return jax.nn.gelu(a * s.astype(a.dtype) + b.astype(a.dtype),
                           approximate=False)
    bench("bn(eval)+gelu elementwise", bn_gelu, h, scale, bias)

    # 5. group-norm alone (4 groups) at encoder size
    xg24 = jnp.asarray(rng.random((24, H, W, C), dtype=np.float32)).astype(bf)

    @jax.jit
    def gn(a):
        B = a.shape[0]
        g = 4
        ag = a.reshape(B, -1, g, C // g)
        m = jnp.mean(ag, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(jnp.square(ag.astype(jnp.float32)), axis=(1, 3),
                      keepdims=True, dtype=jnp.float32)
        v = jnp.maximum(m2 - jnp.square(m), 0.0)
        coef = lax.rsqrt(v + 1e-5)
        return ((ag - m.astype(a.dtype)) * coef.astype(a.dtype)).reshape(a.shape)
    bench("group-norm [24,256,256,128]", gn, xg24)

    # 6. SE alone (global mean -> 2 dense -> scale)
    wse1 = jnp.asarray(rng.standard_normal((C2, 32)).astype(np.float32) * .1).astype(bf)
    wse2 = jnp.asarray(rng.standard_normal((32, C2)).astype(np.float32) * .1).astype(bf)

    @jax.jit
    def se(a, u, v):
        m = a.mean(axis=(1, 2), dtype=jnp.float32).astype(a.dtype)
        s = jax.nn.sigmoid(jax.nn.gelu(m @ u, approximate=False) @ v)
        return a * s[:, None, None, :]
    bench("SE (reduce+mlp+scale)", se, h, wse1, wse2)

    # 7. round-1 Pallas kernel A at decoder pw1 size
    from uncrtaints_tpu.ops.pallas_mbconv import norm_gelu_matmul, norm_gelu_dwconv3x3
    xa = x.reshape(N, H * W, C)
    mean = jnp.zeros((N, 4), jnp.float32)
    coef = jnp.ones((N, 4), jnp.float32)
    sc = jnp.ones((C,), jnp.float32)
    bi = jnp.zeros((C,), jnp.float32)

    @jax.jit
    def ka(a, m, c, s, b, w):
        return norm_gelu_matmul(a, m, c, s, b, w, do_gelu=False)
    bench("kernel A pw1 (norm->matmul)", ka, xa, mean, coef, sc, bi, w1)

    @jax.jit
    def ka2(a, m, c, s, b, w):
        return norm_gelu_matmul(a, m, c, s, b, w, do_gelu=True)
    ha = h.reshape(N, H * W, C2)
    sc2 = jnp.ones((C2,), jnp.float32)
    bi2 = jnp.zeros((C2,), jnp.float32)
    bench("kernel A pw2 (norm->gelu->matmul)", ka2, ha, mean, coef, sc2, bi2, w2)

    # 8. round-1 Pallas kernel B at decoder dw size
    @jax.jit
    def kb(a, m, c, s, b, w):
        return norm_gelu_dwconv3x3(a, m, c, s, b, w)
    bench("kernel B dw (norm->gelu->dw3x3)", kb, h, mean, coef, sc2, bi2, wdw)

    # 9. reference composite: whole decoder-eval MBConv body in plain XLA
    @jax.jit
    def block(a):
        hh = pw1_body(a)
        return hh

    def pw1_body(a):
        # prenorm(affine) -> pw1 -> bn+gelu -> dw -> bn+gelu -> SE -> pw2 -> bn -> +res
        t = a * 1.01 + 0.01
        t = jnp.einsum("nhwc,cd->nhwd", t, w1)
        t = jax.nn.gelu(t * 1.01 + 0.01, approximate=False)
        tp = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        t = lax.conv_general_dilated(
            tp, wdw[:, :, None, :], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C2)
        t = jax.nn.gelu(t * 1.01 + 0.01, approximate=False)
        m = t.mean(axis=(1, 2), dtype=jnp.float32).astype(t.dtype)
        s = jax.nn.sigmoid(jax.nn.gelu(m @ wse1, approximate=False) @ wse2)
        t = t * s[:, None, None, :]
        t = jnp.einsum("nhwc,cd->nhwd", t, w2)
        return a + t * 1.01
    bench("composite decoder block (XLA)", block, x)


if __name__ == "__main__":
    main()
