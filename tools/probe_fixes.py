"""Probe cheap XLA-level fixes: fast-erf GELU, SAME-pad dw conv, B sweep.

Run from /root/repo: python tools/probe_fixes.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


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


def gelu_fast(x):
    """Exact-GELU via A&S 7.1.26 rational erf (|err|<=1.5e-7 in fp32,
    invisible at bf16 resolution)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    x32 = x.astype(jnp.float32)
    z = x32 * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_az
    return (x32 * 0.5 * (1.0 + erf)).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    for mb, shape in [(268, (8, 256, 256, 256)), (804, (24, 256, 256, 256))]:
        h = jnp.asarray(rng.random(shape, dtype=np.float32) * 4 - 2).astype(bf)

        @jax.jit
        def g_native(a):
            return jax.nn.gelu(a, approximate=False)

        @jax.jit
        def g_fast(a):
            return gelu_fast(a)

        bench(f"gelu native erf {mb}MB", g_native, h)
        bench(f"gelu fast-erf   {mb}MB", g_fast, h)
        # numerics
        d = np.abs(np.asarray(g_native(h), np.float32)
                   - np.asarray(g_fast(h), np.float32)).max()
        print(f"   max |diff| = {d:.3e}")

    # dw conv: reflect-pad materialized vs zero-SAME conv
    N, H, W, C2 = 8, 256, 256, 256
    h = jnp.asarray(rng.random((N, H, W, C2), dtype=np.float32)).astype(bf)
    wdw = jnp.asarray(rng.standard_normal((3, 3, C2)).astype(np.float32) * .1).astype(bf)

    @jax.jit
    def dw_reflect(a, w):
        ap = jnp.pad(a, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        return lax.conv_general_dilated(
            ap, w[:, :, None, :], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C2)

    @jax.jit
    def dw_same(a, w):
        return lax.conv_general_dilated(
            a, w[:, :, None, :], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C2)

    bench("dw3x3 reflect-pad materialized", dw_reflect, h, wdw)
    bench("dw3x3 zero-SAME (no pad op)", dw_same, h, wdw)

    # dw conv in fp32 input (is bf16 grouped conv slow?)
    h32 = h.astype(jnp.float32)
    w32 = wdw.astype(jnp.float32)
    bench("dw3x3 zero-SAME fp32", dw_same, h32, w32)

    # B sweep on the full eval step
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step

    for B in (8, 16, 32):
        cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B, lr=1e-3))
        model = get_generator(cfg)
        batch = {
            "x": jnp.asarray(rng.random((B, 3, 256, 256, input_dim(cfg)),
                                        dtype=np.float32)),
            "y": jnp.asarray(rng.random((B, 1, 256, 256, 13), dtype=np.float32)),
            "dates": jnp.asarray(rng.integers(0, 1500, (B, 3)).astype(np.float32)),
        }
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        eval_step = make_eval_step(cfg)
        dt = bench(f"full eval step B={B}", eval_step, state, batch, iters=10)
        print(f"   -> {B/dt:.1f} seq/s")


if __name__ == "__main__":
    main()
