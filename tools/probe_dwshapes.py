"""Enumerate the dw-conv backward shapes a train step traces, per batch.

The dwgrad auto-dispatch (models/layers.py:_dw_gw_auto) is a per-call-site
shape policy; this probe prints every (N, H, W, C) the VJP sees at the
bench batches so the rows window can be set from whole-step A/Bs.
Runs on any backend (tracing only). Usage: python tools/probe_dwshapes.py
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.models import layers as L
from uncrtaints_tpu.train import create_train_state, make_train_step


def main():
    shapes = []
    L._use_pallas_dw_gw = (
        lambda s: (shapes.append(tuple(int(d) for d in s)), False)[1])

    for B in (4, 8):
        shapes.clear()
        cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B,
                            lr=1e-3))
        model = get_generator(cfg)
        T, H, W = cfg.input_t, 256, 256

        def batch(hw):
            return {
                "x": jnp.zeros((B, T, hw, hw, input_dim(cfg)), jnp.float32),
                "y": jnp.zeros((B, 1, hw, hw, 13), jnp.float32),
                "dates": jnp.zeros((B, T), jnp.float32),
            }

        # init at 32px (conv params are spatial-size independent), trace
        # the step at bench size without compiling
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   batch(32))
        shapes.clear()
        jax.eval_shape(make_train_step(cfg), state, batch(H),
                       jax.random.PRNGKey(1))
        print(f"B={B}:")
        for s, n in sorted(Counter(shapes).items()):
            print(f"  {s} x{n}  rows={s[0] * s[1] * s[2]}")


if __name__ == "__main__":
    main()
