"""A/B the reflect-conv lowering: strip decomposition vs materialized pad.

The round-4 B=4 train profile (tools/xprof_eval.py --train --batch 4) is
dominated by dozens of tiny border-strip slice DMAs from the strip-
decomposed reflect conv (layers.Conv2d._reflect3x3_fast); this measures
whether the plain materialized-pad branch (jnp.pad + VALID conv, forced by
UNCR_REFLECT=pad) wins at the small train step, and re-checks eval B=16.
Each config runs in a fresh child process (env is read at trace time).

Usage (real TPU):  python tools/r4_reflect_ab.py

RESULT (round 4, v5e): strip mode train B=4 = 35.68 seq/s (112 ms/step,
arm finished in ~6 min incl. compile); pad mode train B=4 TIMED OUT at
900 s before completing compile + 20 iters — the materialized 258x258
shapes wreck the backward's conv/reduce tiling and compile time. The pad
arms were aborted; the strip decomposition stays the default everywhere
(layers.Conv2d policy comment).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
mode, B, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train import (create_train_state, make_train_step,
                                  make_eval_step, dropout_rng)
cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B, lr=1e-3))
model = get_generator(cfg)
T, H, W = cfg.input_t, 256, 256
rng = np.random.default_rng(0)
batch = {
    "x": jnp.asarray(rng.random((B, T, H, W, input_dim(cfg)), dtype=np.float32)),
    "y": jnp.asarray(rng.random((B, 1, H, W, 13), dtype=np.float32)),
    "dates": jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32)),
}
state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
if mode == "train":
    step = make_train_step(cfg)
    key = jax.random.fold_in(dropout_rng(cfg, 1), 0)
    run = lambda st: step(st, batch, key)
else:
    ev = make_eval_step(cfg)
    run = lambda st: (st, ev(st, batch))
for _ in range(3):
    state, aux = run(state)
    _ = float(aux["loss"])
t0 = time.perf_counter()
for _ in range(iters):
    state, aux = run(state)
_ = float(aux["loss"])
dt = time.perf_counter() - t0
import os as _os
print(json.dumps({"mode": mode, "B": B,
                  "reflect": _os.environ.get("UNCR_REFLECT", "fast"),
                  "seq_per_sec": round(iters * B / dt, 2),
                  "ms_per_step": round(1000 * dt / iters, 2)}))
"""


def run_cfg(mode, B, reflect, iters=20, timeout=900):
    env = dict(os.environ)
    if reflect is None:
        env.pop("UNCR_REFLECT", None)
    else:
        env["UNCR_REFLECT"] = reflect
    cmd = [sys.executable, "-c", CHILD, mode, str(B), str(iters)]
    try:
        p = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                           text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"mode": mode, "B": B, "reflect": reflect, "error": "timeout"}
    line = (p.stdout.strip().splitlines() or [""])[-1]
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"mode": mode, "B": B, "reflect": reflect,
                "error": p.stderr[-500:]}


def main():
    configs = [
        ("train", 4, None),
        ("train", 4, "pad"),
        ("train", 8, None),
        ("train", 8, "pad"),
        ("eval", 16, None),
        ("eval", 16, "pad"),
    ]
    out_path = "/tmp/r4_reflect_ab.jsonl"
    with open(out_path, "a") as f:
        for mode, B, reflect in configs:
            r = run_cfg(mode, B, reflect)
            print(json.dumps(r), flush=True)
            f.write(json.dumps(r) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
