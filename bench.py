"""Benchmark: end-to-end eval throughput of the flagship UNCRTAINTS model.

Metric: 256x256, t=3 sequences/sec/chip through the full jitted eval step
(forward + MGNLL loss + rescale), matching BASELINE.md's north-star metric.
vs_baseline compares against the driver-set reference point of a V100-class
GPU running the PyTorch reference (BASELINE.json: >=10x target per v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

# Estimated PyTorch-reference V100 eval throughput for 256x256 t=3 batches
# (BASELINE.json gives no published number; this anchor makes vs_baseline a
# stable ratio across rounds -- revisit if the driver records a real one).
V100_REFERENCE_SEQ_PER_SEC = 20.0


def main():
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step

    # B=8 is the HBM sweet spot with the fused-norm bf16 path
    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=8, lr=1e-3))
    model = get_generator(cfg)

    B, T, H, W = cfg.batch_size, cfg.input_t, 256, 256
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.random((B, T, H, W, input_dim(cfg)), dtype=np.float32)),
        "y": jnp.asarray(rng.random((B, 1, H, W, 13), dtype=np.float32)),
        "dates": jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    eval_step = make_eval_step(cfg)

    # warmup / compile (axon's first post-compile dispatch is slow)
    for _ in range(3):
        aux = eval_step(state, batch)
        _ = float(aux["loss"])  # scalar round-trip = reliable sync on axon

    # sustained serving throughput: steps dispatch back-to-back (device
    # executes them in stream order), one sync at the end. Verified to scale
    # linearly in iteration count, i.e. every step really executes.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        aux = eval_step(state, batch)
    _ = float(aux["loss"])
    dt = time.perf_counter() - t0

    seq_per_sec = iters * B / dt
    print(json.dumps({
        "metric": "uncrtaints_256px_t3_eval_throughput",
        "value": round(seq_per_sec, 2),
        "unit": "sequences/sec/chip",
        "vs_baseline": round(seq_per_sec / V100_REFERENCE_SEQ_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
