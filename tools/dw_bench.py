"""Microbenchmark: depthwise-3x3 stage formulations on TPU (scratch tool).

Stage under test (the MBConv hot middle): given h [N,H,W,C] bf16 and
precomputed per-(frame,group) norm stats, compute
    h2 = dwconv3x3_reflect(gelu(norm_apply(h)))
Variants:
  copy      -- HBM roofline reference (read+write of the tensor)
  conv      -- norm apply + gelu -> lax conv_general_dilated (current path)
  shifts    -- norm apply + gelu -> reflect pad -> 9 static slices x w + add
               (fusible elementwise graph, no opaque conv op)
Run: python tools/dw_bench.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt


def main():
    N, H, W, C, G = 24, 256, 256, 256, 4
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    mean = jnp.asarray(rng.standard_normal((N, G)).astype(np.float32))
    coef = jnp.asarray(rng.random((N, G)).astype(np.float32) + 0.5)
    scale = jnp.asarray(rng.random((C,)).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C)).astype(np.float32)).astype(jnp.bfloat16)

    def norm_gelu(x):
        m = jnp.repeat(mean, C // G, axis=-1)[:, None, None, :].astype(x.dtype)
        cf = jnp.repeat(coef, C // G, axis=-1)[:, None, None, :].astype(x.dtype)
        y = (x - m) * cf * scale.astype(x.dtype) + bias.astype(x.dtype)
        return jax.nn.gelu(y, approximate=False)

    @jax.jit
    def copy(x):
        return x + jnp.bfloat16(1.0)

    @jax.jit
    def conv(x):
        y = norm_gelu(x)
        y = jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        return jax.lax.conv_general_dilated(
            y, w.reshape(3, 3, 1, C), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    @jax.jit
    def shifts(x):
        y = norm_gelu(x)
        y = jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        acc = jnp.zeros((N, H, W, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + (y[:, dy:dy + H, dx:dx + W, :]
                             * w[dy, dx][None, None, None, :]).astype(jnp.float32)
        return acc.astype(x.dtype)

    t_copy = bench("copy (roofline)", copy, h)
    t_conv = bench("norm+gelu -> dw conv op", conv, h)
    t_shift = bench("norm+gelu -> 9-shift-add", shifts, h)
    # parity check
    a = np.asarray(conv(h), dtype=np.float32)
    b = np.asarray(shifts(h), dtype=np.float32)
    print("max |conv - shifts|:", np.abs(a - b).max())
    print(f"bytes moved (bf16 in+out): {2*N*H*W*C*2/1e9:.2f} GB; "
          f"copy bw {2*N*H*W*C*2/t_copy/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
