"""Isolate the round-3 eval fusion changes: aggregator repeat vs einsum,
MBConv barrier-SE vs materialized gelu. Times each variant standalone at the
production decoder shape so regressions are attributable before paying the
full-model compile.

Run: python tools/probe_fuse.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.models.blocks import MBConv
from uncrtaints_tpu.models.aggregator import TemporalAggregator
from uncrtaints_tpu.ops.resize import upsample_bilinear


def bench(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    print(f"{name:34s} compile+1 {time.perf_counter()-t0:6.1f} s", end="")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"   {dt*1e3:7.2f} ms")
    return dt


def main():
    B, T, H, W, C, heads = 16, 3, 256, 256, 128, 16
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x5 = jnp.asarray(rng.random((B, T, H, W, C), np.float32)).astype(bf)
    att = jnp.asarray(rng.random((B, T, 32, 32, heads), np.float32)).astype(bf)

    # --- aggregator: einsum (old) vs repeat (new) ---
    @jax.jit
    def agg_old(x, a):
        au = upsample_bilinear(a, (H, W), hw_axes=(2, 3))
        xg = x.reshape(B, T, H, W, heads, C // heads)
        out = jnp.einsum("bthwn,bthwnc->bhwnc", au, xg)
        return out.reshape(B, H, W, C)

    @jax.jit
    def agg_new(x, a):
        au = upsample_bilinear(a, (H, W), hw_axes=(2, 3))
        ac = jnp.repeat(au, C // heads, axis=-1)
        return (ac * x).sum(axis=1)

    @jax.jit
    def agg_pre_expand(x, a):
        # expand heads BEFORE upsampling (linear ops commute); upsample the
        # 128-wide attention with the matmul resize, multiply elementwise
        ac = jnp.repeat(a, C // heads, axis=-1)
        au = upsample_bilinear(ac, (H, W), hw_axes=(2, 3))
        return (au * x).sum(axis=1)

    r_old = bench("aggregator einsum (old)", agg_old, x5, att)
    r_new = bench("aggregator repeat (new)", agg_new, x5, att)
    r_pre = bench("aggregator pre-expand", agg_pre_expand, x5, att)
    a, b = agg_old(x5, att), agg_new(x5, att)
    print("   max|old-new|:", float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)))))

    # --- MBConv decoder block (batch norm, eval) old vs new path ---
    xd = jnp.asarray(rng.random((B, H, W, C), np.float32)).astype(bf)
    key = jax.random.PRNGKey(0)
    mb = MBConv(C, C, expansion=2, norm="batch")
    v = mb.init(key, xd, False)

    @jax.jit
    def mb_eval(v, a):
        return mb.apply(v, a, False)

    bench("MBConv batch eval (new path)", mb_eval, v, xd)

    # group-norm encoder block at the folded 48-frame shape
    xe = jnp.asarray(rng.random((B * T, H, W, C), np.float32)).astype(bf)
    mbg = MBConv(C, C, expansion=2, norm="group")
    vg = mbg.init(key, xe, False)

    @jax.jit
    def mbg_eval(v, a):
        return mbg.apply(v, a, False)

    bench("MBConv group eval 48f (new)", mbg_eval, vg, xe)


if __name__ == "__main__":
    main()
