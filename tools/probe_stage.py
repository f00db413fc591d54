"""Cumulative-stage timing of the decoder-eval MBConv to localize XLA fusion
gaps. Each bench adds one more stage of the block; the delta is that stage's
marginal cost inside the fused graph. Run: python tools/probe_stage.py"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from uncrtaints_tpu.models.layers import gelu


def bench(name, fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return dt


def main():
    N, H, W, C, C2 = 8, 256, 256, 128, 256
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.random((N, H, W, C), dtype=np.float32)).astype(bf)
    w1 = jnp.asarray(rng.standard_normal((C, C2)).astype(np.float32) * .05).astype(bf)
    w2 = jnp.asarray(rng.standard_normal((C2, C)).astype(np.float32) * .05).astype(bf)
    wdw = jnp.asarray(rng.standard_normal((3, 3, C2)).astype(np.float32) * .1).astype(bf)
    wse1 = jnp.asarray(rng.standard_normal((C2, 32)).astype(np.float32) * .1).astype(bf)
    wse2 = jnp.asarray(rng.standard_normal((32, C2)).astype(np.float32) * .1).astype(bf)

    def dw(a):
        return lax.conv_general_dilated(
            a, wdw[:, :, None, :], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C2)

    s1 = lambda a: jnp.einsum("nhwc,cd->nhwd", a * 1.01 + 0.01, w1)
    s2 = lambda a: gelu(s1(a) * 1.01 + 0.01)
    s3 = lambda a: dw(s2(a))
    s4 = lambda a: gelu(s3(a) * 1.01 + 0.01)

    def s5(a):
        t = s4(a)
        m = t.mean(axis=(1, 2), dtype=jnp.float32).astype(t.dtype)
        s = jax.nn.sigmoid(gelu(m @ wse1) @ wse2)
        return t * s[:, None, None, :]

    s6 = lambda a: jnp.einsum("nhwc,cd->nhwd", s5(a), w2)
    s7 = lambda a: a + s6(a) * 1.01

    # SE-free variant: how much does SE cost inside the fused graph?
    s6_nose = lambda a: jnp.einsum("nhwc,cd->nhwd", s4(a), w2)
    s7_nose = lambda a: a + s6_nose(a) * 1.01

    prev = 0.0
    for name, fn in [("prenorm+pw1", s1), ("+bn+gelu", s2), ("+dw3x3", s3),
                     ("+bn+gelu2", s4), ("+SE", s5), ("+pw2", s6),
                     ("+norm+residual (full block)", s7),
                     ("full block WITHOUT SE", s7_nose)]:
        dt = bench(name, jax.jit(fn), x)
        print(f"    marginal: {(dt-prev)*1e3:7.3f} ms")
        prev = dt


if __name__ == "__main__":
    main()
