"""Child process for the REAL 2-process multi-host test (test_multihost.py).

Run with env: COORDINATOR_ADDRESS=localhost:<port>, NUM_PROCESSES=2,
PROCESS_ID=<i>, JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4.

Exercises, across two actual jax processes (the paths tests can only fake
in-process): maybe_init_distributed's explicit-args branch, the global
8-device mesh spanning both processes, BatchLoader per-host sharding,
make_array_from_process_local_data global-batch assembly (_device_batch),
a cross-process train-step gradient psum, _to_host's process_allgather, and
_host_row_offset metric attribution. Prints one JSON line with everything
the parent asserts on.
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uncrtaints_tpu.parallel import maybe_init_distributed, make_mesh
from uncrtaints_tpu.data.pipeline import BatchLoader, collate_multi
from uncrtaints_tpu.train import loop as loop_mod


class _IdDS:
    """8 samples; every pixel of sample i equals i (attribution tracer)."""

    def __init__(self, n=8, t=2, hw=16):
        self.n, self.t, self.hw = n, t, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        t, hw = self.t, self.hw
        mk = lambda c: [np.full((c, hw, hw), i, np.float32) for _ in range(t)]
        return {
            "input": {"S1": mk(2), "S2": mk(13),
                      "masks": [np.zeros((hw, hw), np.float32)] * t,
                      "S1 TD": list(range(t)), "S2 TD": list(range(t))},
            "target": {"S2": [np.full((13, hw, hw), i, np.float32)]},
        }


def main():
    pid, nproc = maybe_init_distributed()
    out = {"pid": pid, "nproc": nproc,
           "global_devices": jax.device_count(),
           "local_devices": len(jax.local_devices())}

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P("data"))

    # per-host strided dataset shard -> local half of the global batch
    ds = _IdDS()
    loader = BatchLoader(ds, batch_size=4, shuffle=False,
                         collate=collate_multi, shard=(pid, nproc))
    local = next(iter(loader))
    out["local_ids"] = [int(v) for v in local["x"][:, 0, 0, 0, 0]]

    # global [8,...] arrays assembled from the two process-local halves
    dev = loop_mod._device_batch(local, sharding)
    assert not dev["x"].is_fully_addressable
    off = loop_mod._host_row_offset(dev["x"], local_B=4)
    out["offset"] = int(off)

    # per-sample metric (mean of x) allgathered to every host; attribution:
    # global row off+j must hold this host's local sample j
    per_sample = jax.jit(lambda x: x.mean(axis=(1, 2, 3, 4)),
                         out_shardings=NamedSharding(mesh, P("data")))(dev["x"])
    gathered = loop_mod._to_host(per_sample)
    out["gathered"] = [float(v) for v in gathered]
    out["attribution_ok"] = all(
        abs(gathered[off + j] - out["local_ids"][j]) < 1e-6 for j in range(4))

    # engine across processes: eval + one train step (gradient psum over the
    # 2-process mesh) on a tiny model
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.parallel import replicated_sharding
    from uncrtaints_tpu.train import (create_train_state, make_eval_step,
                                      make_train_step)
    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=8, lr=1e-3,
                        input_t=2, encoder_widths=[8], decoder_widths=[8, 8],
                        n_head=4, d_model=16))
    model = get_generator(cfg)
    # mirror cli/train.py: init from the global sharded sample batch, then
    # replicate the state over the whole (cross-process) mesh
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), dev)
    state = jax.device_put(state, replicated_sharding(mesh))
    ev = make_eval_step(cfg)(state, dev)
    out["eval_loss"] = float(loop_mod._to_host(ev["loss"]))
    st2, aux = make_train_step(cfg)(state, dev, jax.random.PRNGKey(1))
    out["train_loss"] = float(loop_mod._to_host(aux["loss"]))
    out["train_finite"] = bool(np.isfinite(out["train_loss"]))

    # non-divisible dataset, drop_last=False (round 5): the loader agrees on
    # a GLOBAL tail and yields it identically on both hosts, marked; the
    # prefetcher runs it replicated over the mesh. 10 samples / batch 4 / 2
    # hosts -> body 8 (sharded) + tail 2 (replicated). Every sample must be
    # seen exactly once, and the replicated tail must run through the
    # engine's eval step.
    ds10 = _IdDS(n=10)
    loader10 = BatchLoader(ds10, batch_size=4, shuffle=False,
                           collate=collate_multi, shard=(pid, nproc),
                           drop_last=False)
    out["len10"] = len(loader10)
    rows, tail_B, tail_loss = [], None, None
    ev_step = make_eval_step(cfg)
    for _, dev10 in loop_mod._device_prefetch(loader10, sharding):
        per = jax.jit(lambda x: x.mean(axis=(1, 2, 3, 4)))(dev10["x"])
        rows.extend(float(v) for v in loop_mod._to_host(per))
        if dev10["x"].sharding.is_fully_replicated:
            tail_B = int(dev10["x"].shape[0])
            # st2: the train step donated `state`'s buffers
            tail_loss = float(loop_mod._to_host(
                ev_step(st2, dev10)["loss"]))
    out["tail_rows_sorted"] = sorted(rows)
    out["tail_B"] = tail_B
    out["tail_loss"] = tail_loss

    # cross-host async orbax checkpoint: save the (replicated, mesh-spanning)
    # trained state from BOTH processes, barrier, restore into a fresh state
    # skeleton, and verify bit-equality with the live params
    ck_dir = os.environ.get("CKPT_DIR")
    if ck_dir:
        from uncrtaints_tpu.train.checkpoint import (load_checkpoint,
                                                     save_checkpoint,
                                                     wait_for_checkpoints)
        ccfg = cfg.replace(ckpt_backend="orbax", res_dir=ck_dir,
                           experiment_name="mh")
        save_checkpoint(ccfg, epoch=1, state=st2, name="model", lr=1e-3)
        wait_for_checkpoints()
        fresh = create_train_state(ccfg, model, jax.random.PRNGKey(9), dev)
        fresh = jax.device_put(fresh, replicated_sharding(mesh))
        restored, meta = load_checkpoint(ccfg, ck_dir, fresh, "model")
        diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(jax.tree.leaves(jax.device_get(restored.params)),
                                 jax.tree.leaves(jax.device_get(st2.params)))]
        out["ckpt_epoch"] = int(meta["epoch"])
        out["ckpt_restore_max_abs"] = max(diffs)

    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
