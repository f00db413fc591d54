"""Probe: matrix-resize vs gather-resize, pool variants, B=16 eval.
Run: python tools/probe_misc.py"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(name, fn, *args, iters=20):
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
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # resize: aggregator shape [8,3,32,32,16] -> 256x256 on axes (2,3)
    att = jnp.asarray(rng.random((8, 3, 32, 32, 16), dtype=np.float32)).astype(bf)
    from uncrtaints_tpu.ops.resize import upsample_bilinear

    @jax.jit
    def up_new(a):
        return upsample_bilinear(a, (256, 256), hw_axes=(2, 3))

    @jax.jit
    def up_old(a):
        return jax.image.resize(a, (8, 3, 256, 256, 16), method="linear")

    bench("upsample matrix (new)", up_new, att)
    bench("upsample jax.image.resize (old)", up_old, att)
    d = np.abs(np.asarray(up_new(att), np.float32)
               - np.asarray(up_old(att), np.float32)).max()
    print(f"   max |diff| = {d:.2e}")

    # pool: [24,256,256,128] -> 32x32
    x = jnp.asarray(rng.random((24, 256, 256, 128), dtype=np.float32)).astype(bf)

    @jax.jit
    def pool_rw(a):
        return lax.reduce_window(a, -jnp.inf, lax.max, (1, 8, 8, 1),
                                 (1, 8, 8, 1), "VALID")

    @jax.jit
    def pool_rs(a):
        N, H, W, C = a.shape
        return a.reshape(N, H // 8, 8, W // 8, 8, C).max(axis=(2, 4))

    bench("maxpool reduce_window", pool_rw, x)
    bench("maxpool reshape", pool_rs, x)

    # full eval at B=16 / B=32 with small-shape init (params are H/W-independent)
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step

    for B in (16, 32):
        cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B, lr=1e-3))
        model = get_generator(cfg)
        small = {
            "x": jnp.asarray(rng.random((2, 3, 64, 64, input_dim(cfg)),
                                        dtype=np.float32)),
            "y": jnp.asarray(rng.random((2, 1, 64, 64, 13), dtype=np.float32)),
            "dates": jnp.asarray(rng.integers(0, 1500, (2, 3)).astype(np.float32)),
        }
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), small)
        batch = {
            "x": jnp.asarray(rng.random((B, 3, 256, 256, input_dim(cfg)),
                                        dtype=np.float32)),
            "y": jnp.asarray(rng.random((B, 1, 256, 256, 13), dtype=np.float32)),
            "dates": jnp.asarray(rng.integers(0, 1500, (B, 3)).astype(np.float32)),
        }
        eval_step = make_eval_step(cfg)
        try:
            dt = bench(f"full eval B={B} (small init)", eval_step, state, batch,
                       iters=10)
            print(f"   -> {B/dt:.1f} seq/s")
        except Exception as e:
            print(f"B={B} failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
