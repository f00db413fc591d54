"""Ground the bench.py baseline: measure the ACTUAL PyTorch reference eval
step on this host and our JAX eval step on the same host/backend (CPU),
producing a same-hardware software ratio plus the raw numbers that
BASELINE.md's V100 anchor derivation cites.

Measures, at the paper eval shape (B=4, T=3, 256x256, SAR, MGNLL diag):
  1. reference torch forward only          (model/src/backbones/uncrtaints.py)
  2. reference torch forward + MGNLL loss  (model/src/losses.py, chunked vmap)
  3. our jax CPU eval step (forward + closed-form MGNLL + rescale)

Run from /root/repo:  JAX_PLATFORMS=cpu python tools/bench_reference.py
(the reference tree is imported read-only for measurement, never copied).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def bench_torch(B=1, T=3, H=256, iters=2):
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    sys.path.insert(0, "/root/reference/model")
    from src.backbones.uncrtaints import UNCRTAINTS
    from src import losses

    model = UNCRTAINTS(
        input_dim=15, out_conv=[26], covmode="diag", scale_by=10.0,
        out_nonlin_mean=False, out_nonlin_var="softplus",
    ).eval()

    x = torch.rand(B, T, 15, H, H)
    y = torch.rand(B, 1, 13, H, H)
    dates = torch.randint(0, 1500, (B, T)).float()

    class Cfg:
        loss = "MGNLL"
        covmode = "diag"
        chunk_size = None  # parse_args.py default

    crit = losses.get_loss(Cfg())

    def fwd():
        with torch.no_grad():
            return model(x, batch_positions=dates)

    def fwd_loss():
        with torch.no_grad():
            out = model(x, batch_positions=dates)
            mean, var = out[:, :, :13], out[:, :, 13:]
            loss, _ = losses.calc_loss(crit, Cfg(), mean, y, var=var)
            return loss

    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def train_step():
        model.train()
        out = model(x, batch_positions=dates)
        mean, var = out[:, :, :13], out[:, :, 13:]
        loss, _ = losses.calc_loss(crit, Cfg(), mean, y, var=var)
        opt.zero_grad()
        loss.backward()
        opt.step()
        model.eval()
        return loss

    results = {}
    for name, fn in [("torch_forward", fwd), ("torch_forward_loss", fwd_loss),
                     ("torch_train_step", train_step)]:
        fn()  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        results[name + "_s_per_batch"] = dt
        results[name + "_seq_per_sec"] = B / dt
        print(f"{name:28s} {dt:8.2f} s/batch  {B/dt:8.3f} seq/s")
    return results


def bench_jax(B=4, T=3, H=256, iters=10):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B, lr=1e-3))
    model = get_generator(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.random((B, T, H, H, input_dim(cfg)), dtype=np.float32)),
        "y": jnp.asarray(rng.random((B, 1, H, H, 13), dtype=np.float32)),
        "dates": jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    eval_step = make_eval_step(cfg)
    _ = float(eval_step(state, batch)["loss"])  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        aux = eval_step(state, batch)
    _ = float(aux["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{'jax_cpu_eval_step':28s} {dt:8.2f} s/batch  {B/dt:8.3f} seq/s")
    return {"jax_eval_s_per_batch": dt, "jax_eval_seq_per_sec": B / dt}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["torch", "jax", "both"], default="both")
    ap.add_argument("--iters", type=int, default=3)
    a = ap.parse_args()
    out = {}
    if a.what in ("torch", "both"):
        out.update(bench_torch(iters=a.iters))
    if a.what in ("jax", "both"):
        out.update(bench_jax())
    if "torch_forward_loss_seq_per_sec" in out and "jax_eval_seq_per_sec" in out:
        out["same_host_software_ratio"] = (
            out["jax_eval_seq_per_sec"] / out["torch_forward_loss_seq_per_sec"])
    print(json.dumps(out))
