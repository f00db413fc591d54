"""Per-site decomposition of the reflect-conv BACKWARD forms (round 5).

The whole-step A/B (env_ab/r5_combo_ab) showed every one-op fused reflect
VJP losing to the piecewise strip decomposition (B=4 29.79 vs 35.72), but
the step measurement can't say WHICH fused piece loses: the eltwise gx
halo folds, or the eltwise gw ring corrections. This tool times a single
reflect conv's value+grad at the flagship site shapes in each mode, plus
the suspect pieces in isolation.

Run (real TPU): python tools/r5_dwsite_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ["UNCR_DW_GW"] = "1"  # strip sites use the Pallas kernel, as in
                                # the engaged B=4 step

import jax
import jax.numpy as jnp

from uncrtaints_tpu.models.layers import (
    Conv2d, _reflect_borders_eltwise, _gw_ring_corrections)


def bench(name, fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def site(N, H, W, C):
    print(f"-- site [{N},{H},{W},{C}] bf16 --", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, W, C), jnp.bfloat16)
    g = jax.random.normal(jax.random.fold_in(key, 1), (N, H, W, C),
                          jnp.bfloat16)
    conv = Conv2d(features=C, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=C)
    variables = conv.init(jax.random.PRNGKey(1), x)
    w = variables["params"]["kernel"].astype(jnp.bfloat16)

    def vjp_in(mode):
        def run(v, x, g):
            os.environ["UNCR_REFLECT_STRIPS"] = mode
            y, pull = jax.vjp(lambda v, x: conv.apply(v, x), v, x)
            gv, gx = pull(g)
            return gv["params"]["kernel"], gx
        return jax.jit(run)

    for mode in ("conv", "fused"):
        os.environ["UNCR_REFLECT_STRIPS"] = mode
        bench(f"value+grad mode={mode}", vjp_in(mode), variables, x, g)

    # pieces in isolation
    g32 = g.astype(jnp.float32)
    bench("gw ring corrections (eltwise, fused form)",
          jax.jit(lambda x, g32: _gw_ring_corrections(x, g32)), x, g32)
    bench("fwd border strips eltwise (halo-fold twin)",
          jax.jit(lambda x, y, w: _reflect_borders_eltwise(x, y, w)),
          x, jnp.zeros_like(x), w)

    # the stencil itself: lax.conv's dedicated lowering vs the fusible
    # 9-tap shift-add (what the differentiated fwd and gx currently use)
    from uncrtaints_tpu.models.layers import _dw_shift_add
    dn = ("NHWC", "HWIO", "NHWC")
    bench("dw SAME via lax.conv",
          jax.jit(lambda x, w: jax.lax.conv_general_dilated(
              x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
              feature_group_count=C)), x, w)
    bench("dw SAME via shift-add stencil",
          jax.jit(lambda x, w: _dw_shift_add(x, w, ((1, 1), (1, 1)))), x, w)


if __name__ == "__main__":
    site(12, 256, 256, 256)   # encoder dw site at B=4 (B*T=12)
    site(4, 256, 256, 256)    # decoder dw site at B=4
