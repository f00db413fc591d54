"""Probe: depthwise 3x3 as lax.conv vs shift-and-add (fusible elementwise).

The MBConv hot chain in eval mode is  gelu(affine1(x)) -> dw3x3 ->
gelu(affine2(.)). With dw as lax.conv, XLA cannot fuse the elementwise
stages into it (convs take no fused operands), costing 3 full HBM
round-trips. Expressed as pad + 9 static slices + FMA, the whole chain is
one fusible DAG. Measures both at production shape. Run: python
tools/probe_dwfuse.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(name, fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return out, dt


def gelu(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + lax.erf(xf * (2 ** -0.5)))).astype(x.dtype)


def dw_conv(x, w):  # lax.conv path, reflect pad via explicit pad
    C = x.shape[-1]
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    return lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def dw_shiftadd(x, w):  # fusible: pad + 9 slices + fp32 FMA
    N, H, W, C = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    acc = jnp.zeros(x.shape, jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = lax.slice(xp, (0, dy, dx, 0), (N, dy + H, dx + W, C))
            acc = acc + tap.astype(jnp.float32) * w[dy, dx, 0].astype(jnp.float32)
    return acc.astype(x.dtype)


def chain(dw, x, w, c1, o1, c2, o2):
    h = gelu(x * c1 + o1)
    h = dw(h, w)
    return gelu(h * c2 + o2)


def main():
    rng = np.random.default_rng(0)
    for NF in (8, 24):
        C = 256
        x = jnp.asarray(rng.random((NF, 256, 256, C), dtype=np.float32) - .5).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32) * .2).astype(jnp.bfloat16)
        c1 = jnp.asarray(rng.random(C, dtype=np.float32) + .5).astype(jnp.bfloat16)
        o1 = jnp.asarray(rng.random(C, dtype=np.float32) - .5).astype(jnp.bfloat16)
        c2 = jnp.asarray(rng.random(C, dtype=np.float32) + .5).astype(jnp.bfloat16)
        o2 = jnp.asarray(rng.random(C, dtype=np.float32) - .5).astype(jnp.bfloat16)

        print(f"--- frames={NF} C={C} 256x256 bf16 ---")
        a, _ = bench("dw alone: lax.conv", jax.jit(dw_conv), x, w)
        b, _ = bench("dw alone: shift-add", jax.jit(dw_shiftadd), x, w)
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
        print(f"   dw max |diff| = {d:.3e}")
        a, _ = bench("chain: gelu-aff -> conv dw -> gelu-aff",
                     jax.jit(lambda *t: chain(dw_conv, *t)), x, w, c1, o1, c2, o2)
        b, _ = bench("chain: gelu-aff -> shiftadd dw -> gelu-aff",
                     jax.jit(lambda *t: chain(dw_shiftadd, *t)), x, w, c1, o1, c2, o2)
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
        print(f"   chain max |diff| = {d:.3e}")


if __name__ == "__main__":
    main()
