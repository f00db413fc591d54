"""On-chip A/B sweep (run on the real TPU; evolved from the round-3 sweep).

Measures, in one process sequence (each config in a FRESH child process so
device-buffer state can't leak between configs through the axon tunnel):

  eval  B in {8, 12, 16}              -- default XLA path
  eval  B in {8, 16} + UNCR_AGG_KERNEL=1 (fused Pallas aggregation)
  train B in {4, 8, 12, 16} x {remat, no}  -- batch/remat matrix (B=8
        no-remat measured best in round 4: 39.75 seq/s)
  train + UNCR_DW_GW in {auto, 0, 1}  -- single-pass Pallas dw kernel-grad
        (auto = the shape-aware default: ON at B=4, OFF at B=8; the round-4
        A/B measured B=4 26.28 -> 35.72 with it, B=8 39.75 -> 36.39)
  train + --prng_impl rbg             -- dropout-noise generator A/B
  train + UNCR_AGG_TRAIN=1            -- train-path pallas aggregator

(The round-4 aux-less "light" train-step arm measured a no-op -- 26.26 vs
26.28 seq/s at B=4, 30.73 vs 30.76 at B=8+remat -- and was removed along
with the engine variant it tested; see train/engine.py.)

Usage:  python tools/sweep.py [--quick]
Writes one JSON line per config to stdout and /tmp/r4_sweep.jsonl.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
mode, B, remat, prng, agg_train, iters = sys.argv[1:7]
B, iters = int(B), int(iters)
# agg_train is communicated via UNCR_AGG_TRAIN in the env (set by the
# parent), read by models/aggregator.py at trace time
from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train import create_train_state, make_train_step, make_eval_step, dropout_rng

cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B, lr=1e-3,
                    remat=(remat == "1"), prng_impl=prng))
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
print(json.dumps({"mode": mode, "B": B, "remat": remat == "1",
                  "prng": prng, "agg_train": agg_train == "1",
                  "dw_gw": _os.environ.get("UNCR_DW_GW", "auto"),
                  "agg_kernel": _os.environ.get("UNCR_AGG_KERNEL") == "1",
                  "seq_per_sec": round(iters * B / dt, 2),
                  "ms_per_step": round(1000 * dt / iters, 2)}))
"""


def run_cfg(mode, B, remat=False, prng="threefry2x32", agg_train=False,
            dw_gw=None, agg_kernel=False, iters=20, timeout=900):
    env = dict(os.environ)
    if agg_train:
        env["UNCR_AGG_TRAIN"] = "1"
    if dw_gw is None:                  # auto: the shape-aware default
        env.pop("UNCR_DW_GW", None)
    else:
        env["UNCR_DW_GW"] = "1" if dw_gw else "0"
    if agg_kernel:
        env["UNCR_AGG_KERNEL"] = "1"
    cmd = [sys.executable, "-c", CHILD, mode, str(B),
           "1" if remat else "0", prng, "1" if agg_train else "0",
           str(iters)]
    try:
        p = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                           text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"mode": mode, "B": B, "remat": remat, "prng": prng,
                "agg_train": agg_train, "dw_gw": dw_gw,
                "agg_kernel": agg_kernel, "error": "timeout"}
    line = (p.stdout.strip().splitlines() or [""])[-1]
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"mode": mode, "B": B, "remat": remat, "prng": prng,
                "agg_train": agg_train, "dw_gw": dw_gw,
                "agg_kernel": agg_kernel, "error": p.stderr[-500:]}


def main():
    quick = "--quick" in sys.argv
    configs = [
        ("eval", dict(B=8)),
        ("eval", dict(B=16)),
        ("train", dict(B=8)),
        ("train", dict(B=4)),
    ] + ([] if quick else [
        ("eval", dict(B=12)),
        ("eval", dict(B=8, agg_kernel=True)),
        ("eval", dict(B=16, agg_kernel=True)),
        ("train", dict(B=12)),
        ("train", dict(B=16)),
        ("train", dict(B=8, remat=True)),
        ("train", dict(B=4, remat=True)),
        ("train", dict(B=8, dw_gw=True)),
        ("train", dict(B=4, dw_gw=False)),   # tap form vs the auto default
        ("train", dict(B=8, prng="rbg")),
        ("train", dict(B=8, agg_train=True)),
    ])
    out_path = "/tmp/r4_sweep.jsonl"
    with open(out_path, "a") as f:
        for mode, kw in configs:
            res = run_cfg(mode, **kw)
            line = json.dumps(res)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()
    print(f"# appended to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
