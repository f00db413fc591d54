"""Isolate the encoder regression: 1x1 conv vs einsum at 24 frames, alone
and composed with group-norm. Run: python tools/probe_enc.py"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return dt


def gn(a, g=4):
    B, C = a.shape[0], a.shape[-1]
    ag = a.reshape(B, -1, g, C // g)
    m = jnp.mean(ag, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(ag.astype(jnp.float32)), axis=(1, 3),
                  keepdims=True, dtype=jnp.float32)
    v = jnp.maximum(m2 - jnp.square(m), 0.0)
    coef = lax.rsqrt(v + 1e-5)
    return ((ag - m.astype(a.dtype)) * coef.astype(a.dtype)).reshape(a.shape)


def main():
    N, H, W, C, C2 = 24, 256, 256, 128, 256
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.random((N, H, W, C), dtype=np.float32)).astype(bf)
    w1 = jnp.asarray(rng.standard_normal((1, 1, C, C2)).astype(np.float32) * .05).astype(bf)

    conv1 = lambda a, w: lax.conv_general_dilated(
        a, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ein1 = lambda a, w: jnp.einsum("...c,co->...o", a, w[0, 0])

    bench("conv1x1 [24,...]", jax.jit(lambda a: conv1(a, w1)), x)
    bench("einsum1x1 [24,...]", jax.jit(lambda a: ein1(a, w1)), x)
    bench("gn -> conv1x1", jax.jit(lambda a: conv1(gn(a), w1)), x)
    bench("gn -> einsum1x1", jax.jit(lambda a: ein1(gn(a), w1)), x)
    # gn of a big [24,...,256] einsum OUTPUT (the next block's prenorm)
    bench("conv1x1 -> gn", jax.jit(lambda a: gn(conv1(a, w1))), x)
    bench("einsum1x1 -> gn", jax.jit(lambda a: gn(ein1(a, w1))), x)
    # reshape variant for einsum: flatten pixels first
    def ein_flat(a, w):
        P = a.shape[0] * a.shape[1] * a.shape[2]
        return (a.reshape(P, a.shape[-1]) @ w[0, 0]).reshape(
            a.shape[0], a.shape[1], a.shape[2], -1)
    bench("flat-dot 1x1 [24,...]", jax.jit(lambda a: ein_flat(a, w1)), x)
    bench("gn -> flat-dot", jax.jit(lambda a: ein_flat(gn(a), w1)), x)


if __name__ == "__main__":
    main()


def main2():
    N, H, W, C, C2 = 24, 256, 256, 128, 256
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.random((N, H, W, C), dtype=np.float32)).astype(bf)
    w1 = jnp.asarray(rng.standard_normal((1, 1, C, C2)).astype(np.float32) * .05).astype(bf)
    ein1 = lambda a, w: jnp.einsum("...c,co->...o", a, w[0, 0])

    def ein_bar_gn(a):
        h = ein1(a, w1)
        h = jax.lax.optimization_barrier(h)
        return gn(h)
    bench("einsum -> barrier -> gn", jax.jit(ein_bar_gn), x)

    def ein_flat(a, w):
        P = a.shape[0] * a.shape[1] * a.shape[2]
        return (a.reshape(P, a.shape[-1]) @ w[0, 0]).reshape(
            a.shape[0], a.shape[1], a.shape[2], -1)
    bench("flat-dot -> gn", jax.jit(lambda a: gn(ein_flat(a, w1))), x)

    def flat_bar_gn(a):
        h = ein_flat(a, w1)
        h = jax.lax.optimization_barrier(h)
        return gn(h)
    bench("flat-dot -> barrier -> gn", jax.jit(flat_bar_gn), x)


main2()
