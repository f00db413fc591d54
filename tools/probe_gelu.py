"""Microbench GELU variants at the encoder-pass shape [48,256,256,256] bf16.

The eval-step xplane trace shows the GN-apply+GELU elementwise passes are
VPU-bound (fusion.39 / convert_reduce_fusion.2: 6.2-6.3 ms vs a ~3.9 ms HBM
roofline). Each variant below runs as y = variant(x * a + b) to mimic the
real fused pass (affine prologue + gelu).

Run: python tools/probe_gelu.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.models.layers import gelu as gelu_current

SHAPE = (48, 256, 256, 256)

# deg-16 power-basis Phi fit on [-5, 3.25] (Chebyshev interpolation)
PHI16 = np.array([
    4.9998385036923826e-01, 3.9881751627038509e-01, 1.5918373029566099e-04,
    -6.6119604241084984e-02, -2.4343590653393534e-04, 9.6326345328155184e-03,
    1.3683398170250487e-04, -1.0377683453717157e-03, -3.6585971580561924e-05,
    7.8285664546424481e-05, 5.1063481548881891e-06, -3.7514069808272519e-06,
    -3.7076326557369812e-07, 9.4593333344467583e-08, 1.2392754534435731e-08,
    -7.5637204865789892e-10, -1.2003197938917135e-10], np.float32)


def gelu_poly16(x):
    x32 = x.astype(jnp.float32)
    u = jnp.clip(x32, -5.0, 3.25)
    p = jnp.full_like(u, PHI16[-1])
    for c in PHI16[-2::-1]:
        p = p * u + c
    g = x32 * p
    g = jnp.where(x32 > 3.25, x32, g)
    g = jnp.where(x32 < -5.0, 0.0, g)
    return g.astype(x.dtype)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_exact_xla(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def gelu_sigmoid_cheap(x):
    # x * sigmoid(1.702 x): NOT parity-accurate; speed floor for 1-transcendental
    x32 = x.astype(jnp.float32)
    return (x32 * jax.nn.sigmoid(1.702 * x32)).astype(x.dtype)


def passthrough(x):
    return (x.astype(jnp.float32) * 0.5).astype(x.dtype)  # HBM roofline probe


def bench(name, fn):
    a = jnp.asarray(np.random.default_rng(0).random((SHAPE[-1],), np.float32))
    b = jnp.asarray(np.random.default_rng(1).random((SHAPE[-1],), np.float32))
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(SHAPE, np.float32) * 2.0
    ).astype(jnp.bfloat16)

    @jax.jit
    def f(x):
        return fn(x * a.astype(x.dtype) + b.astype(x.dtype))

    y = f(x); y.block_until_ready(); _ = float(y.reshape(-1)[0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    _ = float(y.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:7.2f} ms")
    return dt


if __name__ == "__main__":
    bench("passthrough(roofline)", passthrough)
    bench("current rational-erf", gelu_current)
    bench("xla exact erf fp32", gelu_exact_xla)
    bench("tanh approx", gelu_tanh)
    bench("sigmoid1.702", gelu_sigmoid_cheap)
    bench("poly16 phi", gelu_poly16)
