"""Dump the TPU-compiled HLO of the eval (or train) step at bench shape.

Usage: python tools/dump_hlo.py [--train] [--batch N] [--out PATH]
The compiled text includes per-op metadata (op_name= jax source paths), so
xplane fusion IDs can be mapped back to model code.
"""

import argparse
import os
import sys

# runnable without an editable install (PYTHONPATH breaks axon discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(train: bool, batch_size: int, out_path: str):
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import (
        create_train_state, make_eval_step, make_train_step)

    cfg = derive(Config(use_sar=True, scale_by=10.0,
                        batch_size=batch_size, lr=1e-3))
    model = get_generator(cfg)
    B, T, H, W = batch_size, cfg.input_t, 256, 256
    # abstract batch: .lower() only needs shapes/dtypes, and shipping a
    # real ~150 MB batch through a degraded axon tunnel (2.5 MB/s fresh
    # H2D observed round 5) stalls the dump for minutes. The state init
    # still runs (on device, no H2D) so the compiled layouts are real.
    sds = jax.ShapeDtypeStruct
    batch_abs = {
        "x": sds((B, T, H, W, input_dim(cfg)), jnp.float32),
        "y": sds((B, 1, H, W, 13), jnp.float32),
        "dates": sds((B, T), jnp.float32),
    }
    batch_init = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), batch_abs)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch_init)
    if train:
        fn = make_train_step(cfg)
        lowered = fn.lower(state, batch_abs, jax.random.PRNGKey(1))
    else:
        fn = make_eval_step(cfg)
        lowered = fn.lower(state, batch_abs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} chars to {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--out", default="/tmp/eval_hlo.txt")
    args = ap.parse_args()
    main(args.train, args.batch or (4 if args.train else 16), args.out)
