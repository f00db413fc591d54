"""Micro-benchmark Mosaic data movement options for the dw3x3 kernel:
bf16 vs fp32 sublane rolls, and a full dw kernel variant in bf16.
Run: python tools/probe_roll.py"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, fn, *args, iters=20):
    try:
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return dt


def mk_roll_kernel(dtype, do_roll):
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        if do_roll:
            x = pltpu.roll(x, 1, 1)   # rotate along W (sublane dim)
        o_ref[0] = x
    return kernel


def roll_op(x, do_roll, tile_h=32):
    N, H, W, C = x.shape
    kernel = mk_roll_kernel(x.dtype, do_roll)
    return pl.pallas_call(
        kernel,
        grid=(N * H // tile_h,),
        in_specs=[pl.BlockSpec((1, tile_h, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * H // tile_h, tile_h, W, C), x.dtype),
    )(x.reshape(N * H // tile_h, tile_h, W, C))


def dw_kernel_v2(x, w9, tile_h=32):
    """dw3x3 with zero-garbage borders: dy via leading-dim slices (free),
    dx via pltpu.roll, all in the input dtype."""
    N, H, W, C = x.shape
    nt = H // tile_h
    # rows pre-arranged with 1-row halo (reflect) on the XLA side
    base = np.arange(-1, tile_h + 1)[None, :] + (np.arange(nt) * tile_h)[:, None]
    base = np.where(base < 0, -base, base)
    base = np.where(base >= H, 2 * H - 2 - base, base)
    xh = jnp.take(x, jnp.asarray(base.reshape(-1)), axis=1)
    xh = xh.reshape(N, nt, tile_h + 2, W, C)

    def kernel(x_ref, w_ref, o_ref):
        xb = x_ref[0, 0]                      # [th+2, W, C] in input dtype
        th = xb.shape[0] - 2
        w = w_ref[:].astype(jnp.float32)
        acc = jnp.zeros((th, W, C), jnp.float32)
        for dx in range(3):
            hs = pltpu.roll(xb, (1 - dx) % xb.shape[1], 1) if dx != 1 else xb
            for dy in range(3):
                acc = acc + hs[dy:dy + th].astype(jnp.float32) * w[dy * 3 + dx][None, None, :]
        o_ref[0] = acc.astype(o_ref.dtype)

    w9p = jnp.pad(w9.reshape(9, C).astype(jnp.float32), [(0, 7), (0, 0)])
    return pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile_h + 2, W, C), lambda n, t: (n, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, C), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
    )(xh, w9p)


def main():
    rng = np.random.default_rng(0)
    N, H, W, C = 8, 256, 256, 256
    xf = jnp.asarray(rng.random((N, H, W, C), dtype=np.float32))
    xb = xf.astype(jnp.bfloat16)
    w9 = jnp.asarray(rng.standard_normal((3, 3, C)).astype(np.float32) * .1)

    bench("copy kernel fp32 (no roll)", jax.jit(lambda a: roll_op(a, False)), xf)
    bench("roll kernel fp32", jax.jit(lambda a: roll_op(a, True)), xf)
    bench("copy kernel bf16 (no roll)", jax.jit(lambda a: roll_op(a, False)), xb)
    bench("roll kernel bf16", jax.jit(lambda a: roll_op(a, True)), xb)
    bench("dw kernel v2 bf16", jax.jit(lambda a: dw_kernel_v2(a, w9)), xb)
    # numerics of the interior (borders wrapped, ignore 1-px frame)
    from jax import lax
    ref = lax.conv_general_dilated(
        xb, w9.astype(jnp.bfloat16)[:, :, None, :], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    got = dw_kernel_v2(xb, w9)
    d = np.abs(np.asarray(ref[:, 1:-1, 1:-1], np.float32)
               - np.asarray(got[:, 1:-1, 1:-1], np.float32)).max()
    print(f"   interior max |diff| = {d:.3e}")


if __name__ == "__main__":
    main()
