"""Probe 2: true in-model cost of the depthwise 3x3, and faster variants.

1. real eval step vs eval step with dw convs ablated to identity
   (marginal in-program cost of all 64 dw applications)
2. dw via MXU matmul W-shifts + sliced H-combine
3. dw via Pallas with static sublane slices on a W-halo'd bf16 block

Run: python tools/probe_dw2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(name, fn, *args, iters=20):
    try:
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:150]}")
        return None, None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return out, dt


def eval_step_ms(ablate_dw):
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step
    import uncrtaints_tpu.models.layers as L

    orig = L.Conv2d.__call__
    if ablate_dw:
        def patched(self, x, input_affine=None):
            y = orig(self, x, input_affine=input_affine)
            # params created by orig; XLA DCEs the unused conv computation
            return x if self.groups > 1 else y
        L.Conv2d.__call__ = patched
    try:
        cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=8, lr=1e-3))
        model = get_generator(cfg)
        rng = np.random.default_rng(0)
        B, T, H = 8, 3, 256
        batch = {
            "x": jnp.asarray(rng.random((B, T, H, H, input_dim(cfg)), dtype=np.float32)),
            "y": jnp.asarray(rng.random((B, 1, H, H, 13), dtype=np.float32)),
            "dates": jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32)),
        }
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        step = make_eval_step(cfg)
        _, dt = bench(f"eval step (ablate_dw={ablate_dw})",
                      step, state, batch, iters=20)
        return dt
    finally:
        L.Conv2d.__call__ = orig


def dw_conv_ref(x, w):  # zero-SAME conv (interior-exact vs all variants)
    C = x.shape[-1]
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def dw_matmul_shift(x, w):
    """W-shifts via MXU matmuls with banded shift matrices; H-shifts via
    slices of an H-padded buffer; combine is one fusible FMA chain."""
    N, H, W, C = x.shape
    eye = np.eye(W, dtype=np.float32)
    Sm = jnp.asarray(np.roll(eye, -1, 1) * (np.arange(W) < W - 1)[None, :]).astype(x.dtype)  # tap w+1
    Sp = jnp.asarray(np.roll(eye, 1, 1) * (np.arange(W) > 0)[None, :]).astype(x.dtype)       # tap w-1
    xl = jnp.einsum("nhvc,vw->nhwc", x, Sm)   # x[w+1]
    xr = jnp.einsum("nhvc,vw->nhwc", x, Sp)   # x[w-1]
    cols = [xr, x, xl]  # dx = 0,1,2 (tap w-1, w, w+1)
    wf = w[:, :, 0].astype(jnp.float32)  # [3,3,C]
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            u = cols[dx]
            if dy == 0:   # tap h-1: shift down, zero row 0
                u = jnp.pad(u[:, :-1], [(0, 0), (1, 0), (0, 0), (0, 0)])
            elif dy == 2:  # tap h+1
                u = jnp.pad(u[:, 1:], [(0, 0), (0, 1), (0, 0), (0, 0)])
            acc = acc + u.astype(jnp.float32) * wf[dy, dx]
    return acc.astype(x.dtype)


def dw_pallas_slice(x, w, tile_h=32):
    """Pallas dw3x3 (zero pad): W-halo'd bf16 block, static sublane slices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, H, W, C = x.shape
    nt = H // tile_h
    # prep: H-halo via row gather (zero rows out of range), W zero-pad by 1
    rows = np.arange(-1, tile_h + 1)[None, :] + (np.arange(nt) * tile_h)[:, None]
    valid = (rows >= 0) & (rows < H)
    rows = np.clip(rows, 0, H - 1)
    xh = jnp.take(x, jnp.asarray(rows.reshape(-1)), axis=1)
    xh = xh * jnp.asarray(valid.reshape(-1), x.dtype)[None, :, None, None]
    xh = xh.reshape(N, nt, tile_h + 2, W, C)
    xh = jnp.pad(xh, [(0, 0), (0, 0), (0, 0), (1, 1), (0, 0)])

    def kernel(x_ref, w_ref, o_ref):
        xb = x_ref[0, 0]                       # [th+2, W+2, C]
        th = xb.shape[0] - 2
        wf = w_ref[:].astype(jnp.float32)      # [16, C] (9 used)
        acc = jnp.zeros((th, W, C), jnp.float32)
        for dx in range(3):
            xs = xb[:, dx:dx + W, :]           # static sublane slice
            for dy in range(3):
                acc = acc + xs[dy:dy + th].astype(jnp.float32) * wf[dy * 3 + dx][None, None, :]
        o_ref[0] = acc.astype(o_ref.dtype)

    w9 = jnp.pad(jnp.transpose(w[:, :, 0], (0, 1, 2)).reshape(9, C).astype(jnp.float32),
                 [(0, 7), (0, 0)])
    out = pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile_h + 2, W + 2, C), lambda n, t: (n, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, C), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
    )(xh, w9)
    return out


def main():
    import sys
    if "--ablate" in sys.argv:
        print("=== in-model ablation (B=8 eval step) ===")
        d_full = eval_step_ms(False)
        d_abl = eval_step_ms(True)
        if d_full and d_abl:
            print(f"   marginal cost of all dw convs: {(d_full-d_abl)*1e3:.2f} ms")

    print("=== dw variants, frames=8 C=256 (zero-pad semantics) ===")
    rng = np.random.default_rng(0)
    C = 256
    x = jnp.asarray(rng.random((8, 256, 256, C), dtype=np.float32) - .5).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32) * .2).astype(jnp.bfloat16)
    a, _ = bench("dw: lax.conv zero-SAME", jax.jit(dw_conv_ref), x, w)
    if "--matmul" in sys.argv:
        b, _ = bench("dw: matmul W-shift", jax.jit(dw_matmul_shift), x, w)
        if b is not None:
            d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
            print(f"   matmul-shift max |diff| = {d:.3e}")
    c, _ = bench("dw: pallas sublane-slice", jax.jit(dw_pallas_slice), x, w)
    if c is not None:
        d = np.abs(np.asarray(a, np.float32) - np.asarray(c, np.float32)).max()
        print(f"   pallas-slice max |diff| = {d:.3e}")


if __name__ == "__main__":
    main()
