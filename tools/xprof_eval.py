"""Capture + parse a device trace of the eval (or train) step at bench shape.

Usage (from /root/repo, real TPU):
    python tools/xprof_eval.py [--train] [--batch N] [--iters N]

Captures a jax.profiler trace of several steps, parses the .xplane.pb with
tensorflow's xplane proto, and prints per-op device time aggregated over the
steady-state steps -- the round-2/3 perf work is driven by this attribution.
"""

import argparse
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

# runnable as `python tools/xprof_eval.py` without an editable install or
# PYTHONPATH (which breaks axon PJRT plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def capture(train: bool, batch_size: int, iters: int) -> str:
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import (
        create_train_state, make_eval_step, make_train_step)

    cfg = derive(Config(use_sar=True, scale_by=10.0,
                        batch_size=batch_size, lr=1e-3))
    model = get_generator(cfg)
    B, T, H, W = batch_size, cfg.input_t, 256, 256
    rng = np.random.default_rng(0)
    batch = {
        # device-side batch: the tunnel's fresh H2D can crawl (round 5)
        "x": jax.random.uniform(jax.random.PRNGKey(10),
                                (B, T, H, W, input_dim(cfg)), jnp.float32),
        "y": jax.random.uniform(jax.random.PRNGKey(11), (B, 1, H, W, 13),
                                jnp.float32),
        "dates": jnp.floor(jax.random.uniform(jax.random.PRNGKey(12), (B, T),
                                              jnp.float32, 0.0, 1500.0)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    if train:
        step_fn = make_train_step(cfg)
        drng = jax.random.PRNGKey(1)
        run = lambda st: step_fn(st, batch, drng)
    else:
        eval_step = make_eval_step(cfg)
        run = lambda st: (st, eval_step(st, batch))

    for _ in range(3):
        state, aux = run(state)
        _ = float(aux["loss"])

    trace_dir = tempfile.mkdtemp(prefix="xprof_eval_")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            state, aux = run(state)
        _ = float(aux["loss"])
    return trace_dir


def parse(trace_dir: str, iters: int, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    def is_async_copy(name: str) -> bool:
        # copy-start/copy-done events span their whole in-flight window and
        # overlap compute; summing them mis-ranks prefetches as top costs
        # (burned us in the round-3 train profile: weight prefetches looked
        # like 8.6 ms ops on a 30 ms step)
        n = name.lstrip("%")
        return n.startswith(("copy-start", "copy-done", "send", "recv",
                             "collective-permute-start",
                             "all-gather-start", "all-reduce-start"))

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        per_op = defaultdict(float)
        per_op_n = defaultdict(int)
        copy_total = 0.0
        total = 0.0
        module_ms = None
        for line in plane.lines:
            lname = line.name.lower()
            if "xla modules" in lname and line.events:
                module_ms = sum(ev.duration_ps for ev in line.events) * 1e-9
            # XLA op lines carry the per-fusion breakdown; step lines duplicate
            if "xla op" in lname or "xla ops" in lname:
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    dur = ev.duration_ps * 1e-9  # ms
                    if is_async_copy(name):
                        copy_total += dur
                        continue
                    per_op[name] += dur
                    per_op_n[name] += 1
                    total += dur
        if not per_op:
            continue
        hdr = (f"\n== plane: {plane.name} | compute-op time "
               f"{total:.1f} ms / {iters} steps = {total/iters:.2f} ms/step"
               f" | async-copy span {copy_total/iters:.2f} ms/step"
               " (overlapped, excluded)")
        if module_ms is not None:
            hdr += f" | module wall {module_ms/iters:.2f} ms/step"
        print(hdr + " ==")
        ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
        for name, ms in ranked[:top]:
            print(f"{ms/iters:9.3f} ms/step  x{per_op_n[name]//iters:<3d} "
                  f"{ms/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    bs = args.batch or (4 if args.train else 16)
    t0 = time.time()
    d = capture(args.train, bs, args.iters)
    print(f"trace captured to {d} in {time.time()-t0:.0f}s")
    parse(d, args.iters, args.top)
