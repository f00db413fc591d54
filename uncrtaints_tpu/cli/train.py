"""Training entry point.

CLI parity with /root/reference/model/train_reconstruct.py (flags, derived
rules, dataset wiring, epoch/val/test schedule, checkpointing, trainlog.json,
conf.json), running on the jitted pjit engine. Usage:

    python -m uncrtaints_tpu.cli.train --experiment_name my_run \
        --root1 ~/data/SEN12MSCRTS --epochs 20 --lr 1e-3 --batch_size 4 \
        --scale_by 10 --loss MGNLL --covmode diag --use_sar

Smoke run without the dataset: add --synthetic_data --max_samples_count 8.
"""

from __future__ import annotations

import json
import os
import pprint
import random
import sys
from typing import Optional

import numpy as np
import jax

from uncrtaints_tpu.config import (
    Config, parse_config, derive, apply_resume, input_dim,
)
from uncrtaints_tpu.data.pipeline import (
    BatchLoader, Subset, collate_multi, collate_mono,
)
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.parallel import make_mesh, shard_batch
from uncrtaints_tpu.train.engine import (
    create_train_state, make_train_step, make_eval_step,
    set_learning_rate, epoch_lr, dropout_rng,
)
from uncrtaints_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, load_pretrained_partial, unfreeze_all,
)
from uncrtaints_tpu.train.loop import iterate
from uncrtaints_tpu.train.observe import Writer


def seed_everything(seed: int):
    """Reference seed fixing (train_reconstruct.py:89-97); JAX randomness is
    explicit via keys, so host-side numpy/python seeding suffices here."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def import_from_path(split: str, cfg: Config) -> Optional[str]:
    """Locate precomputed cloud statistics (train_reconstruct.py:559-565)."""
    p = os.path.join(
        cfg.precomputed,
        f"generic_{cfg.input_t}_{split}_{cfg.region}_{cfg.cloud_masks}.npy")
    return p if os.path.isfile(p) else None


def build_datasets(cfg: Config):
    if cfg.synthetic_data:
        from uncrtaints_tpu.data.synthetic import (
            SyntheticSEN12MSCRTS, SyntheticSEN12MSCR)
        n = min(cfg.max_samples_count, 64)
        ps = cfg.synthetic_patch
        if cfg.pretrain:
            mk = lambda seed: SyntheticSEN12MSCR(n_samples=n, patch_size=ps,
                                                 seed=seed)
        else:
            mk = lambda seed: SyntheticSEN12MSCRTS(
                n_samples=n, n_input_t=cfg.input_t, patch_size=ps, seed=seed)
        return mk(1), mk(2), mk(3)

    if cfg.pretrain:
        from uncrtaints_tpu.data.sen12mscr import SEN12MSCR
        root = os.path.expanduser(cfg.root3)
        mk = lambda split: SEN12MSCR(root, split=split, region=cfg.region,
                                     sample_type=cfg.sample_type,
                                     cloud_masks=cfg.cloud_masks)
        return mk("train"), mk("val"), mk("test")

    from uncrtaints_tpu.data.sen12mscrts import SEN12MSCRTS
    dt_train = SEN12MSCRTS(
        os.path.expanduser(cfg.root1), split="train", region=cfg.region,
        sample_type=cfg.sample_type, cloud_masks=cfg.cloud_masks,
        sampler="random" if cfg.vary_samples else "fixed",
        n_input_samples=cfg.input_t,
        import_data_path=import_from_path("train", cfg),
        min_cov=cfg.min_cov, max_cov=cfg.max_cov, seed=cfg.rdm_seed)
    dt_val = SEN12MSCRTS(
        os.path.expanduser(cfg.root2), split="val", region="all",
        sample_type=cfg.sample_type, cloud_masks=cfg.cloud_masks,
        n_input_samples=cfg.input_t,
        import_data_path=import_from_path("val", cfg))
    dt_test = SEN12MSCRTS(
        os.path.expanduser(cfg.root2), split="test", region="all",
        sample_type=cfg.sample_type, cloud_masks=cfg.cloud_masks,
        n_input_samples=cfg.input_t,
        import_data_path=import_from_path("test", cfg))
    return dt_train, dt_val, dt_test


def main(cfg: Config) -> dict:
    # multi-host: initialize jax.distributed FIRST -- initialize() errors
    # once the backend has been touched, and both jax.profiler.start_trace
    # and jax.config side effects below can initialize it
    from uncrtaints_tpu.parallel import (
        make_mesh, batch_sharding as mk_bs, replicated_sharding,
        maybe_init_distributed)
    host, n_hosts = maybe_init_distributed()

    exp_dir = os.path.join(cfg.res_dir, cfg.experiment_name)
    os.makedirs(exp_dir, exist_ok=True)
    seed_everything(cfg.rdm_seed)
    if cfg.debug_nans:
        # functional fault isolation: aborts the step that produced a NaN
        jax.config.update("jax_debug_nans", True)
    if cfg.trace_dir:
        jax.profiler.start_trace(cfg.trace_dir)
    pprint.pprint(cfg.to_dict())

    writer = Writer(os.path.join(os.path.dirname(cfg.res_dir) or ".",
                                 "logs", cfg.experiment_name))

    dt_train, dt_val, dt_test = build_datasets(cfg)
    cap = lambda ds: Subset(ds, range(0, min(
        cfg.max_samples_count, len(ds), int(len(ds) * cfg.max_samples_frac))))
    dt_train, dt_val, dt_test = cap(dt_train), cap(dt_val), cap(dt_test)
    print(f"Train {len(dt_train)}, Val {len(dt_val)}, Test {len(dt_test)}")

    # each host feeds a disjoint strided shard of the dataset and its slice
    # of the global batch (SURVEY.md section 2 DCN plan)
    if cfg.batch_size % n_hosts != 0:
        raise ValueError(f"batch_size {cfg.batch_size} must be divisible by "
                         f"the {n_hosts} participating hosts")
    per_host_bs = cfg.batch_size // n_hosts
    host_shard = (host, n_hosts) if n_hosts > 1 else None

    from uncrtaints_tpu.data.pipeline import select_collate
    collate = select_collate(cfg)
    # reference parity: DataLoader default drop_last=False for ALL splits
    # (train_reconstruct.py:589-609) -- the tail batch trains/evaluates too
    # (iterate runs a non-mesh-divisible tail replicated). Multi-host runs
    # must drop it: strided host shards can leave UNEQUAL per-host tails,
    # which would diverge the SPMD programs across hosts.
    mk_loader = lambda ds, shuffle, seed: BatchLoader(
        ds, batch_size=per_host_bs, shuffle=shuffle, seed=seed,
        collate=collate, use_sar=cfg.use_sar, drop_last=(n_hosts > 1),
        num_workers=max(1, cfg.num_workers), shard=host_shard)
    train_loader = mk_loader(dt_train, True, cfg.rdm_seed)
    val_loader = mk_loader(dt_val, False, cfg.rdm_seed)
    test_loader = mk_loader(dt_test, False, cfg.rdm_seed)

    # device mesh: params replicated, batch sharded over the data axis
    # (single-device meshes degenerate to plain jit)
    n_dev = cfg.mesh_shape or len(jax.devices())
    mesh = make_mesh(n_dev)
    bsh = mk_bs(mesh) if n_dev > 1 else None
    if cfg.batch_size % n_dev != 0 and n_dev > 1:
        raise ValueError(f"batch_size {cfg.batch_size} must be divisible by "
                         f"the {n_dev}-device mesh")
    if cfg.accum_steps > 1 and n_dev > 1 \
            and (cfg.batch_size // cfg.accum_steps) % n_dev != 0:
        # each scanned MICROBATCH is what gets batch-sharded; an uneven
        # split would silently reshard/pad every microbatch
        raise ValueError(
            f"microbatch {cfg.batch_size}//{cfg.accum_steps}="
            f"{cfg.batch_size // cfg.accum_steps} must be divisible by "
            f"the {n_dev}-device mesh")
    print(f"Device mesh: {n_dev} x data-parallel")

    # model + engine
    model = get_generator(cfg)
    sample = next(iter(mk_loader(dt_train, False, cfg.rdm_seed)))
    from uncrtaints_tpu.train.loop import _device_batch
    sample_dev = _device_batch(sample, bsh)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.rdm_seed),
                               sample_dev)
    if bsh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    cfg = cfg.replace(N_params=n_params)
    print(f"TOTAL TRAINABLE PARAMETERS: {n_params}")

    if cfg.profile:
        from uncrtaints_tpu.train.engine import profile_flops
        profile_flops(cfg, state, sample_dev)

    frozen = False
    if cfg.trained_checkp:
        print(f"Loading weights from (pre-)trained checkpoint {cfg.trained_checkp}")
        state, _ = load_pretrained_partial(cfg, state, cfg.trained_checkp)
        frozen = True

    cfg.save_json(os.path.join(exp_dir, "conf.json"))

    train_step = make_train_step(cfg)
    # predictions leave the device only for plot/export items and the TB
    # aleatoric histograms; with all three off the lean metrics-only step
    # drops the full-res fp32 output buffers (engine.make_eval_step)
    need_outputs = (cfg.plot_every > 0 or cfg.export_every > 0
                    or cfg.loss in ("GNLL", "MGNLL"))
    eval_step = make_eval_step(cfg, with_metrics=True, donate_batch=True,
                               return_outputs=need_outputs)
    base_rng = dropout_rng(cfg, cfg.rdm_seed)

    trainlog, best_loss = {}, float("inf")
    begin_at = cfg.resume_at if cfg.resume_at >= 0 else 0
    if cfg.resume_from and cfg.trained_checkp:
        # restore params/opt from the indicated checkpoint (any backend:
        # a `model_epoch_k.ckpt` msgpack file, a `model_epoch_k.orbax` dir,
        # or a reference-format `model_epoch_k.pth.tar`)
        name = os.path.basename(cfg.trained_checkp.rstrip("/"))
        for suffix in (".ckpt", ".orbax", ".pth.tar"):
            name = name.removesuffix(suffix)
        state, meta = load_checkpoint(cfg, cfg.res_dir, state, name)
        begin_at = meta.get("epoch", begin_at)

    for epoch in range(begin_at + 1, cfg.epochs + 1):
        print(f"\nEPOCH {epoch}/{cfg.epochs}")
        # unfreeze all layers after the gate epoch (train_reconstruct.py:657-661)
        if epoch > cfg.unfreeze_after and frozen:
            print("Unfreezing all network layers")
            state, frozen = unfreeze_all(state), False

        lr = epoch_lr(cfg, epoch - 1)  # constant within the epoch
        state = set_learning_rate(state, lr)
        writer.add_scalar("Etc/train/lr", lr, epoch)

        if cfg.vary_samples:
            train_loader.set_epoch(epoch)  # epoch-seeded reshuffle
            # epoch_count drives the 'random' sampler rng; set (not
            # increment) so resumed runs land on the same per-epoch state
            base = dt_train.dataset if hasattr(dt_train, "dataset") else dt_train
            if hasattr(base, "set_epoch_count"):
                base.set_epoch_count(epoch - 1)
            elif hasattr(base, "incr_epoch_count") and epoch > 1:
                base.incr_epoch_count()

        state, train_metrics, _ = iterate(
            state, train_loader, cfg, writer, "train", epoch,
            train_step=train_step, base_rng=base_rng, batch_sharding=bsh)

        if epoch % cfg.val_every == 0 and epoch > cfg.val_after:
            print("Validation . . . ")
            state, val_metrics, val_img_metrics = iterate(
                state, val_loader, cfg, writer, "val", epoch,
                eval_step=eval_step, batch_sharding=bsh)
            val_loss = val_metrics["val_loss"]
            print(f"Validation Loss {val_loss}")
            print(f"validation image metrics: {val_img_metrics}")
            save_results(val_img_metrics, exp_dir, split=f"val_epoch_{epoch}")
            trainlog[epoch] = {**train_metrics, **val_metrics}
            checkpoint_log(trainlog, cfg)
            if val_loss <= best_loss:
                best_loss = val_loss
                save_checkpoint(cfg, epoch, state, "model", lr)
        else:
            trainlog[epoch] = {**train_metrics}
            checkpoint_log(trainlog, cfg)

        save_checkpoint(cfg, epoch, state, f"model_epoch_{epoch}", lr)
        print(f"Completed current epoch of experiment {cfg.experiment_name}.")

    if cfg.trace_dir:
        jax.profiler.stop_trace()
        print(f"Wrote profiler trace to {cfg.trace_dir}")

    # test the best checkpoint (fall back to the last epoch if validation
    # never ran and no best-on-val checkpoint exists)
    print("Testing best epoch . . .")
    from uncrtaints_tpu.train.checkpoint import wait_for_checkpoints
    # async orbax saves only materialize model.orbax at background-commit
    # time -- barrier first, or a just-saved best silently falls through to
    # the last-epoch checkpoint
    wait_for_checkpoints()
    best_name = "model" if (
        os.path.exists(os.path.join(exp_dir, "model.ckpt"))
        or os.path.isdir(os.path.join(exp_dir, "model.orbax"))
    ) else f"model_epoch_{cfg.epochs}"
    state, _ = load_checkpoint(cfg, cfg.res_dir, state, best_name)
    state, test_metrics, test_img_metrics = iterate(
        state, test_loader, cfg, writer, "test", cfg.epochs,
        eval_step=eval_step, batch_sharding=bsh)
    print(f"Test Loss {test_metrics['test_loss']}")
    print(f"Test image metrics: {test_img_metrics}")
    save_results(test_img_metrics, exp_dir, split="test")
    writer.close()
    wait_for_checkpoints()  # async (orbax) saves must be durable at exit
    print(f"Finished training experiment {cfg.experiment_name}.")
    return {"trainlog": trainlog, "test": test_img_metrics}


def checkpoint_log(log: dict, cfg: Config):
    with open(os.path.join(cfg.res_dir, cfg.experiment_name,
                           "trainlog.json"), "w") as f:
        json.dump(log, f, indent=4)


def save_results(metrics: dict, path: str, split: str = "test"):
    clean = {k: (float(v) if np.ndim(v) == 0 else None)
             for k, v in metrics.items()}
    with open(os.path.join(path, f"{split}_metrics.json"), "w") as f:
        json.dump({k: v for k, v in clean.items() if v is not None}, f, indent=4)


def cli_main():
    """Console entry point (pyproject: uncrtaints-train)."""
    cfg = derive(parse_config(mode="train"))
    cfg = apply_resume(cfg)
    main(cfg)


if __name__ == "__main__":
    cli_main()
