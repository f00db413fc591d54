"""Calibrate per-dispatch overhead and peak HBM copy bandwidth (scratch).

Run from /root/repo: python tools/probe_overhead.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, iters=50, bytes_moved=None):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    bw = f"  {bytes_moved/dt/1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"{name:42s} {dt*1e3:8.3f} ms{bw}")
    return dt


def main():
    rng = np.random.default_rng(0)

    tiny = jnp.asarray(rng.random((8, 128), dtype=np.float32))

    @jax.jit
    def tiny_op(a):
        return a + 1.0
    bench("tiny add [8,128] (dispatch overhead)", tiny_op, tiny)

    for mb, shape in [(268, (8, 256, 256, 256)), (1072, (32, 256, 256, 256))]:
        x = jnp.asarray(
            rng.random(shape, dtype=np.float32)).astype(jnp.bfloat16)

        @jax.jit
        def copy_op(a):
            return a + jnp.bfloat16(1.0)
        n = int(np.prod(shape)) * 2
        bench(f"add1 bf16 {mb}MB (r+w)", copy_op, x, bytes_moved=2 * n)

        @jax.jit
        def gelu_op(a):
            return jax.nn.gelu(a, approximate=False)
        bench(f"gelu exact bf16 {mb}MB", gelu_op, x, bytes_moved=2 * n)

        @jax.jit
        def gelu_tanh(a):
            return jax.nn.gelu(a, approximate=True)
        bench(f"gelu tanh bf16 {mb}MB", gelu_tanh, x, bytes_moved=2 * n)

    # chained ops in ONE jit: does fusion reach peak?
    x = jnp.asarray(rng.random((8, 256, 256, 256), dtype=np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def chain(a):
        return jax.nn.gelu(a * 1.01 + 0.01, approximate=False) * 0.99
    bench("fused chain bf16 268MB", chain, x, bytes_moved=2 * 268 * 2 ** 20)

    # big matmul (MXU efficiency): [16384, 1024] @ [1024, 1024]
    a = jnp.asarray(rng.standard_normal((16384, 1024)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b
    dt = bench("matmul 16k x 1k x 1k bf16", mm, a, b)
    print(f"   -> {2*16384*1024*1024/dt/1e12:.1f} TFLOP/s")

    # pw conv shape matmul: [524288,128]@[128,256]
    a2 = jnp.asarray(rng.standard_normal((524288, 128)).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32)).astype(jnp.bfloat16)
    dt = bench("matmul 512k x 128 x 256 bf16", mm, a2, b2,
               bytes_moved=(524288 * 128 + 524288 * 256) * 2)
    print(f"   -> {2*524288*128*256/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
