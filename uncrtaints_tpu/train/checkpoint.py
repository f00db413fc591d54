"""Checkpointing: save/restore (params, opt state, lr, epoch) with the
reference's best/per-epoch/resume semantics.

Mirrors /root/reference/model/src/model_utils.py:117-219 +
train_reconstruct.py:718-726: per-epoch ``model_epoch_{k}.ckpt`` plus a
best-on-val ``model.ckpt``; loading restores optimizer/schedule state for
``--resume_from`` and supports partial transfer from a pretrained net with
layer freezing (load_model semantics).

Format: single-file msgpack via flax.serialization (the .pth.tar analogue),
with a small JSON sidecar for the epoch / lr scalars.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from uncrtaints_tpu.train.engine import TrainState, set_learning_rate


def _ckpt_paths(res_dir: str, experiment: str, name: str):
    d = os.path.join(res_dir, experiment)
    return os.path.join(d, f"{name}.ckpt"), os.path.join(d, f"{name}.meta.json")


def _orbax_dir(res_dir: str, experiment: str, name: str) -> str:
    return os.path.abspath(os.path.join(res_dir, experiment, f"{name}.orbax"))


_ORBAX_CKPTR = None


def _orbax():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp
        _ORBAX_CKPTR = ocp.StandardCheckpointer()
    return _ORBAX_CKPTR


def wait_for_checkpoints():
    """Block until pending async (orbax) saves are durably committed.
    Call before process exit / before reading a just-written checkpoint."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def save_checkpoint(cfg, epoch: int, state: TrainState, name: str,
                    lr: float) -> str:
    """Write {name} checkpoint. Backend per ``cfg.ckpt_backend``:

    - 'msgpack' (default): single-file flax.serialization blob — the
      reference's .pth.tar analogue, host-gathered, synchronous.
    - 'orbax': async multi-host StandardCheckpointer — the save returns
      while the commit proceeds in the background (training continues),
      arrays are written from their live (possibly sharded) devices, and
      the directory rename is atomic. wait_for_checkpoints() barriers.
    """
    path, meta_path = _ckpt_paths(cfg.res_dir, cfg.experiment_name, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": int(state.step),
    }
    if getattr(cfg, "ckpt_backend", "msgpack") == "orbax":
        path = _orbax_dir(cfg.res_dir, cfg.experiment_name, name)
        if jax.process_index() == 0 and os.path.isdir(path):
            # Re-saving (best-on-val): keep the committed old copy durable
            # until the replacement's background commit lands. A bare
            # force=True would delete it synchronously, leaving NO best
            # checkpoint at all if the process is preempted mid-commit;
            # load_checkpoint falls back to `.prev` in that case.
            import shutil
            prev = path + ".prev"
            if os.path.isdir(prev):
                shutil.rmtree(prev)  # superseded: `path` itself committed
            if os.path.exists(meta_path):
                shutil.copyfile(meta_path, prev + ".meta.json")
            os.rename(path, prev)
        _orbax().save(path, payload, force=True)
    else:
        payload = jax.device_get(payload)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
    if jax.process_index() == 0:
        # primary host only (orbax also writes from the primary): concurrent
        # writers on shared storage could interleave; tmp+rename keeps the
        # sidecar atomic. NOTE the sidecar lands before an async orbax data
        # commit -- readers must key off the data dir, never the sidecar.
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "lr": lr, "step": int(state.step)}, f)
        os.replace(tmp, meta_path)
    return path


def _migrate_legacy_conv_paths(tree):
    """Lift legacy ``.../Conv2d_i/Conv_0/{kernel,bias}`` nodes one level up.

    Early checkpoints were written when Conv2d wrapped ``nn.Conv`` (param
    path ``Conv2d_i/Conv_0/kernel``); Conv2d now owns its kernel/bias
    directly. Applied recursively, so optimizer-state copies of the param
    tree migrate too."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        v = _migrate_legacy_conv_paths(v)
        # Restrict the lift to the known legacy wrapper shape: parent key
        # from the Conv2d wrapper family AND the Conv_0 node holding exactly
        # conv leaves {kernel[, bias]}. A module that legitimately contains
        # a single nn.Conv child named Conv_0 must NOT be restructured.
        if (isinstance(v, dict) and set(v) == {"Conv_0"}
                and isinstance(v["Conv_0"], dict)
                and k.split("_")[0] == "Conv2d"
                and set(v["Conv_0"]) in ({"kernel"}, {"kernel", "bias"})):
            v = v["Conv_0"]
        out[k] = v
    return out


def load_torch_checkpoint(cfg, state: TrainState, path: str
                          ) -> Tuple[TrainState, Dict]:
    """Restore a reference PyTorch ``.pth.tar`` directly into a TrainState.

    Lets a reference user point the test/resume CLIs at their existing
    trained checkpoints (model_utils.py:117-125 format: ``state_dict_G``
    params + ``epoch``) with no conversion step. Params and running
    batch-norm stats transfer; ``optimizer_G``/``scheduler_G`` state is
    torch-Adam-specific and does NOT transfer — the optimizer restarts
    fresh (the epoch-resume lr rescale in config.apply_resume still applies
    the schedule)."""
    import torch
    from uncrtaints_tpu.models import torch_import as ti

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd_src = blob.get("state_dict_G", blob)
    sd = {k: v.detach().cpu().numpy() for k, v in sd_src.items()
          if hasattr(v, "detach")}
    variables = {"params": jax.device_get(state.params)}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    new_vars, matched, missing = ti.import_for_model(variables, sd, cfg)
    print(f"[checkpoint] imported {len(matched)} tensors from torch "
          f"checkpoint {os.path.basename(path)}"
          + (f"; {len(missing)} reference keys absent: {missing[:4]}…"
             if missing else ""))
    state = state.replace(params=new_vars["params"])
    if "batch_stats" in new_vars:
        state = state.replace(batch_stats=new_vars["batch_stats"])
    meta = {"epoch": int(blob.get("epoch", 1))}
    return state, meta


def load_checkpoint(cfg, checkp_dir: str, state: TrainState, name: str,
                    restore_opt: bool = True) -> Tuple[TrainState, Dict]:
    """Strict restore of a checkpoint into an existing state skeleton.
    The backend is auto-detected from what exists on disk (an .orbax
    directory wins over a .ckpt file, which wins over a reference-format
    .pth.tar), so runs saved with any backend — including the PyTorch
    reference itself — resume interchangeably."""
    path, meta_path = _ckpt_paths(checkp_dir, cfg.experiment_name, name)
    odir = _orbax_dir(checkp_dir, cfg.experiment_name, name)
    target = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
    }
    # barrier BEFORE backend detection: a just-issued async orbax save only
    # materializes the .orbax directory at commit time (atomic rename), so
    # probing isdir first would mis-detect the backend as msgpack (or read a
    # stale .ckpt of the same name) while the commit is still in flight
    wait_for_checkpoints()
    prev = odir + ".prev"
    if os.path.isdir(odir):
        payload = _orbax().restore(odir, target)
    elif os.path.isdir(prev):
        # a re-save rotated the old committed copy out but was preempted
        # before the replacement committed: the .prev generation is the
        # newest durable checkpoint under this name
        payload = _orbax().restore(prev, target)
        if os.path.exists(prev + ".meta.json"):
            meta_path = prev + ".meta.json"
    else:
        tpath = os.path.join(checkp_dir, cfg.experiment_name,
                             f"{name}.pth.tar")
        if not os.path.exists(path) and os.path.exists(tpath):
            # reference-format PyTorch checkpoint under the expected name:
            # import it directly (params + batch stats; no optimizer state)
            return load_torch_checkpoint(cfg, state, tpath)
        with open(path, "rb") as f:
            data = f.read()
        try:
            payload = serialization.from_bytes(target, data)
        except (ValueError, KeyError):
            raw = _migrate_legacy_conv_paths(
                serialization.msgpack_restore(data))
            payload = serialization.from_state_dict(target, raw)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    state = state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"],
        step=jax.numpy.asarray(payload["step"], jax.numpy.int32))
    if restore_opt:
        state = state.replace(opt_state=payload["opt_state"])
        if "lr" in meta:
            state = set_learning_rate(state, meta["lr"])
    return state, meta


def load_pretrained_partial(cfg, state: TrainState,
                            ckpt_path: str) -> Tuple[TrainState, object]:
    """Transfer from a pretrained checkpoint: copy every parameter whose
    path+shape matches, freeze the copied ones except the output head
    (model_utils.py:128-196 semantics). Returns (state, freeze_mask)."""
    import jax.numpy as jnp

    target = {"params": jax.device_get(state.params),
              "batch_stats": jax.device_get(state.batch_stats),
              "opt_state": jax.device_get(state.opt_state),
              "step": 0}
    if ckpt_path.endswith(".pth.tar"):
        # reference-format torch checkpoint: map onto a copy of the target
        # tree, skipping shape mismatches; flat_pre keeps ONLY the leaves
        # actually transferred so untransferred init values are never frozen
        from uncrtaints_tpu.models import torch_import as ti
        sd = ti.load_torch_state_dict(ckpt_path)
        pre, transferred = ti.import_params_partial(cfg, target["params"], sd)
        flat_pre = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_flatten_with_path(pre)[0]
                    if jax.tree_util.keystr(k) in transferred}
    else:
        if os.path.isdir(ckpt_path):  # orbax checkpoint directory
            # no target: the raw saved tree, so a source net with a DIFFERENT
            # architecture still loads (the per-leaf path+shape filter below
            # decides what transfers, same as the msgpack branch's semantics)
            payload = _orbax().restore(os.path.abspath(ckpt_path))
        else:
            with open(ckpt_path, "rb") as f:
                payload = serialization.from_bytes(target, f.read())
        pre = payload["params"]
        flat_pre = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_flatten_with_path(pre)[0]}

    flat_new = {jax.tree_util.keystr(k): (k, v) for k, v in
                jax.tree_util.tree_flatten_with_path(state.params)[0]}

    loaded, frozen_keys = {}, set()
    for ks, (k, v) in flat_new.items():
        if ks in flat_pre and flat_pre[ks].shape == v.shape:
            loaded[ks] = flat_pre[ks]
            if "out_conv" not in ks:  # train the output layer
                frozen_keys.add(ks)
        else:
            loaded[ks] = v

    treedef = jax.tree_util.tree_structure(state.params)
    new_params = jax.tree_util.tree_unflatten(
        treedef, [loaded[jax.tree_util.keystr(k)]
                  for k, _ in jax.tree_util.tree_flatten_with_path(state.params)[0]])
    freeze_mask = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(0.0 if jax.tree_util.keystr(k) in frozen_keys else 1.0)
                  for k, _ in jax.tree_util.tree_flatten_with_path(state.params)[0]])
    return state.replace(params=new_params, freeze_mask=freeze_mask), freeze_mask


def unfreeze_all(state: TrainState) -> TrainState:
    """--unfreeze_after epoch gate (train_reconstruct.py:657-661)."""
    return state.replace(freeze_mask=None)
