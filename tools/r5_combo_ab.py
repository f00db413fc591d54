"""One-process multi-arm on-chip A/B (round-5 degraded-tunnel variant).

tools/env_ab.py isolates every config in a fresh child process — the right
default, but through a degraded axon tunnel each child pays the full
session-dial + state-init + compile round trip, and arms started timing
out at 900 s before a single step ran. This variant trades the isolation
for tunnel economy:

  - ONE process, one device session; the batch is generated on device;
  - env knobs are set between arms and re-read at TRACE time (every
    make_*_step call returns a fresh jitted closure, so each arm gets its
    own program — same mechanism env_ab relies on, minus the process);
  - the JAX persistent compilation cache is enabled so a re-measured arm
    (same program) skips the tunnel's compile path entirely;
  - train state is re-created per arm from the same PRNG key (the train
    step donates its input state, and arms must start from identical
    parameters); init compiles hit the compilation cache after arm 1.

Usage: python tools/r5_combo_ab.py train:4 train:4:UNCR_REFLECT_STRIPS=fused
Spec grammar is env_ab's: mode:batch[:ENV=V[,ENV=V...]].
Results append to /tmp/env_ab.jsonl (tagged "harness": "combo").
"""

import json
import os
import sys
import time

# runnable without an editable install: the package root is the repo dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp


def parse(spec):
    parts = spec.split(":")
    kv = {}
    if len(parts) > 2 and parts[2]:
        for pair in parts[2].split(","):
            k, v = pair.split("=")
            kv[k] = v
    return parts[0], int(parts[1]), kv


def main():
    specs = [parse(s) for s in sys.argv[1:]]
    assert specs, __doc__

    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import (create_train_state, make_train_step,
                                      make_eval_step, dropout_rng)

    batches = {}

    def get_batch(cfg, B):
        if B not in batches:
            T, H, W = cfg.input_t, 256, 256
            ks = jax.random.split(jax.random.PRNGKey(0), 3)
            batches[B] = {
                "x": jax.random.uniform(ks[0], (B, T, H, W, input_dim(cfg)),
                                        jnp.float32),
                "y": jax.random.uniform(ks[1], (B, 1, H, W, 13), jnp.float32),
                "dates": jnp.floor(jax.random.uniform(ks[2], (B, T),
                                                      jnp.float32, 0., 1500.)),
            }
        return batches[B]

    out = open("/tmp/env_ab.jsonl", "a")
    for mode, B, kv in specs:
        saved = {k: os.environ.get(k) for k in kv}
        os.environ.update(kv)
        try:
            t_arm = time.perf_counter()
            cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B,
                                lr=1e-3))
            model = get_generator(cfg)
            batch = get_batch(cfg, B)
            state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                       batch)
            if mode == "train":
                step = make_train_step(cfg)
                key = jax.random.fold_in(dropout_rng(cfg, 1), 0)
                run = lambda st: step(st, batch, key)
            elif mode == "evalm":
                state = state.replace(opt_state=None)
                lean = os.environ.get("UNCR_AB_LEAN", "0") == "1"
                ev = make_eval_step(cfg, with_metrics=True,
                                    return_outputs=not lean)
                run = lambda st: (st, ev(st, batch))
            else:
                state = state.replace(opt_state=None)
                ev = make_eval_step(cfg)
                run = lambda st: (st, ev(st, batch))
            for _ in range(3):
                state, aux = run(state)
                _ = float(aux["loss"])
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                state, aux = run(state)
            _ = float(aux["loss"])
            dt = time.perf_counter() - t0
            rec = {"mode": mode, "B": B, "env": kv,
                   "seq_per_sec": round(iters * B / dt, 2),
                   "ms_per_step": round(1000 * dt / iters, 2),
                   "harness": "combo",
                   "arm_total_s": round(time.perf_counter() - t_arm, 1)}
        except Exception as e:  # keep later arms alive
            rec = {"mode": mode, "B": B, "env": kv, "harness": "combo",
                   "error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        state = None  # release this arm's device buffers before the next
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
