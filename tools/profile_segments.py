"""Segment-level TPU timing of the UNCRTAINTS eval path (scratch tool).

Times each architectural segment in isolation at production shape
(B=8, T=3, 256x256, C=128, bf16) to locate the HBM/time hotspots.
Run from /root/repo: python tools/profile_segments.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.models.blocks import MBConv
from uncrtaints_tpu.models.layers import ConvBlock
from uncrtaints_tpu.models.ltae import LTAE2dtiny
from uncrtaints_tpu.models.aggregator import TemporalAggregator
from uncrtaints_tpu.ops.pooling import adaptive_max_pool2d
from uncrtaints_tpu.train import create_train_state, make_eval_step


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a scalar round-trip for reliable sync on axon
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:8.2f} ms")
    return dt


def main():
    B, T, H, W, C = 8, 3, 256, 256, 128
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B, lr=1e-3))
    model = get_generator(cfg)
    x = jnp.asarray(rng.random((B, T, H, W, input_dim(cfg)), dtype=np.float32))
    y = jnp.asarray(rng.random((B, 1, H, W, 13), dtype=np.float32))
    dates = jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32))
    batch = {"x": x, "y": y, "dates": dates}
    state = create_train_state(cfg, model, key, batch)
    eval_step = make_eval_step(cfg)
    t_full = bench("FULL eval step", eval_step, state, batch)

    # forward only
    params_bf = jax.tree.map(
        lambda p: p.astype(bf) if p.dtype == jnp.float32 else p, state.params)
    variables = {"params": params_bf, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(v, x, d):
        return model.apply(v, x, batch_positions=d, train=False)
    t_fwd = bench("forward only (bf16 params)", fwd, variables,
                  (10.0 * x).astype(bf), dates)

    # --- encoder block: MBConv group-norm on [B*T, H, W, C] ---
    xe = jnp.asarray(rng.random((B * T, H, W, C), dtype=np.float32)).astype(bf)
    mb_g = MBConv(C, C, expansion=2, norm="group")
    vg = mb_g.init(key, xe, False)

    @jax.jit
    def enc_block(v, a):
        return mb_g.apply(v, a, False)
    t_enc = bench("MBConv group [24,256,256,128]", enc_block, vg, xe)

    # --- decoder block: MBConv batch-norm eval on [B, H, W, C] ---
    xd = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32)).astype(bf)
    mb_b = MBConv(C, C, expansion=2, norm="batch")
    vb = mb_b.init(key, xd, False)

    @jax.jit
    def dec_block(v, a):
        return mb_b.apply(v, a, False)
    t_dec = bench("MBConv batch [8,256,256,128]", dec_block, vb, xd)

    # --- in_conv 1x1 [B*T,256,256,15->128] + groupnorm + relu ---
    xi = jnp.asarray(rng.random((B * T, H, W, 15), dtype=np.float32)).astype(bf)
    inc = ConvBlock([15, C], k=1, s=1, p=0, norm="group")
    vi = inc.init(key, xi)

    @jax.jit
    def in_conv(v, a):
        return inc.apply(v, a)
    t_in = bench("in_conv [24,256,256,15->128]", in_conv, vi, xi)

    # --- pool to 32 ---
    xs = jnp.asarray(rng.random((B, T, H, W, C), dtype=np.float32)).astype(bf)

    @jax.jit
    def pool(a):
        return adaptive_max_pool2d(a.reshape(B * T, H, W, C), (32, 32))
    t_pool = bench("adaptive_max_pool 256->32", pool, xs)

    # --- ltae tiny on 32x32 ---
    xl = jnp.asarray(rng.random((B, T, 32, 32, C), dtype=np.float32)).astype(bf)
    lt = LTAE2dtiny(in_channels=C, d_model=256, n_head=16, d_k=4)
    vl = lt.init(key, xl, batch_positions=dates)

    @jax.jit
    def ltae(v, a, d):
        return lt.apply(v, a, batch_positions=d)
    t_ltae = bench("LTAE2dtiny 32x32", ltae, vl, xl, dates)

    # --- aggregator: upsample attn + weighted T-sum ---
    att = jnp.asarray(rng.random((B, T, 32, 32, 16), dtype=np.float32)).astype(bf)
    agg = TemporalAggregator(mode="att_group")
    va = agg.init(key, xs, pad_mask=None, attn_mask=att)

    @jax.jit
    def aggregate(v, a, m):
        return agg.apply(v, a, pad_mask=None, attn_mask=m)
    t_agg = bench("TemporalAggregator att_group", aggregate, va, xs, att)

    total = (t_in + t_enc + t_pool + t_ltae + t_agg + 5 * t_dec)
    print(f"{'sum of segments':42s} {total*1e3:8.2f} ms "
          f"(fwd={t_fwd*1e3:.2f}, full={t_full*1e3:.2f})")
    print(f"decoder 5 blocks: {5*t_dec*1e3:.2f} ms "
          f"({5*t_dec/total*100:.0f}% of segment sum)")


if __name__ == "__main__":
    main()
