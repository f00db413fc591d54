"""First-thing-on-TPU probe: Mosaic-compile and run the two new Pallas
kernels (ops/pallas_aggregate.py fwd+bwd, ops/pallas_dwgrad.py) on real
hardware at small and bench shapes. Both were validated in interpret mode
only; this tells us within ~2 min whether the default-on eval dispatch and
the UNCR_DW_GW gate are safe, before any bench time is spent.

    python tools/r3_kernel_probe.py        # prints one JSON line per probe
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"probe": name, "ok": True,
                          "compile_plus_run_s": round(dt, 2)}))
        return True
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:400]}"}))
        return False


def main():
    from uncrtaints_tpu.ops.pallas_aggregate import att_group_aggregate
    from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad

    small_only = "--small" in sys.argv  # CPU smoke: interpret mode is slow
    rng = np.random.default_rng(0)
    ok = True

    agg_shapes = [((2, 3, 64, 64, 128, 16), "small")]
    dw_shapes = [((2, 64, 64, 64), "small")]
    if not small_only:
        agg_shapes.append(((8, 3, 256, 256, 128, 16), "bench"))
        dw_shapes.append(((4, 256, 256, 128), "bench"))

    agg_ok, dw_ok = True, True
    for (B, T, H, W, C, heads), tag in agg_shapes:
        x = jnp.asarray(rng.random((B, T, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
        a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32)).astype(jnp.bfloat16)
        agg_ok &= probe(f"agg_fwd_{tag}",
                        lambda x=x, a=a: jax.jit(att_group_aggregate)(x, a))
        agg_ok &= probe(f"agg_bwd_{tag}",
                        lambda x=x, a=a: jax.jit(jax.grad(
                            lambda x_, a_: att_group_aggregate(x_, a_)
                            .astype(jnp.float32).sum(), argnums=(0, 1)))(x, a))

    for (N, H, W, C), tag in dw_shapes:
        xg = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
        dw_ok &= probe(f"dwgrad_{tag}",
                       lambda xg=xg, g=g: jax.jit(
                           lambda a, b: dw_kernel_grad(a, b, ((1, 1), (1, 1)),
                                                       3, 3))(xg, g))

    # numerics on hardware (small shape): kernel vs XLA reference
    B, T, H, W, C, heads = 2, 3, 32, 32, 128, 16
    if small_only:
        B, T, H, W = 1, 2, 16, 16
    x = jnp.asarray(rng.random((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    got = np.asarray(jax.jit(att_group_aggregate)(x, a))
    refc = np.asarray((jnp.repeat(a, C // heads, -1) * x).sum(axis=1))
    err = float(np.abs(got - refc).max())
    print(json.dumps({"probe": "agg_numerics_tpu", "ok": err < 1e-4,
                      "max_abs_err": err}))
    agg_ok &= err < 1e-4

    # per-kernel verdicts so the campaign can gate ONLY what failed (the
    # dw-grad kernel is off-by-default; its failure must not disable the
    # default-on aggregation kernel for the headline bench)
    print(json.dumps({"summary": True, "agg_ok": bool(agg_ok),
                      "dwgrad_ok": bool(dw_ok)}))
    sys.exit(0 if (agg_ok and dw_ok) else 1)


if __name__ == "__main__":
    main()
