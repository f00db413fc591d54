"""Inference / evaluation entry point.

Parity with /root/reference/model/test_reconstruct.py: re-load the train-time
conf.json (respecting the no-overwrite list, :41-54), rebuild the model, load
``model`` (best) or ``model_epoch_{k}`` per --resume_at, run the test split,
save {split}_metrics.json. ``--use_custom`` evaluates user-specified mosaiced
patches via get_pairedS1 (:36, 72-77).

    python -m uncrtaints_tpu.cli.test --experiment_name my_run \
        --weight_folder ./results --root1 ~/data/SEN12MSCRTS --export_every 1
"""

from __future__ import annotations

import os

import numpy as np
import jax

from uncrtaints_tpu.config import (
    Config, parse_config, derive, NO_OVERWRITE_TEST,
)
from uncrtaints_tpu.data.pipeline import BatchLoader, Subset, collate_multi, collate_mono
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train.engine import create_train_state, make_eval_step
from uncrtaints_tpu.train.checkpoint import load_checkpoint
from uncrtaints_tpu.train.loop import iterate
from uncrtaints_tpu.train.observe import Writer
from uncrtaints_tpu.cli.train import build_datasets, save_results, import_from_path


def load_test_config(argv=None) -> Config:
    cfg = parse_config(argv, mode="test")
    conf_path = (cfg.load_config or
                 os.path.join(cfg.weight_folder, cfg.experiment_name, "conf.json"))
    if os.path.isfile(conf_path):
        # the stored conf.json is already fully derived (out_conv expanded,
        # covmode resolved) -- do NOT re-run derive() on it, the out_conv
        # expansion is not idempotent
        cfg = cfg.merge_json(conf_path, NO_OVERWRITE_TEST)
    else:
        cfg = derive(cfg)
    return cfg


def custom_dataset(cfg: Config):
    """--use_custom: mosaiced 3x3-patch sample (test_reconstruct.py:27-36)."""
    from uncrtaints_tpu.data.sen12mscrts import SEN12MSCRTS, get_pairedS1
    root = os.path.expanduser(cfg.root1)
    s2 = [[f"ROIs1868/73/S2/{i}/s2_ROIs1868_73_ImgNo_{i}_2017-07-16_patch_{j}.tif"
           for j in [171, 172, 173, 187, 188, 189, 203, 204, 205]]
          for i in [1, 2, 3]]
    s1 = [get_pairedS1(pair, root, mod="s1") for pair in s2]
    s2_t = [f"ROIs1868/73/S2/30/s2_ROIs1868_73_ImgNo_30_2018-06-21_patch_{j}.tif"
            for j in [171, 172, 173, 187, 188, 189, 203, 204, 205]]
    s1_t = get_pairedS1(s2_t, root, mod="s1")
    custom = [{"input": {"S1": s1, "S2": s2},
               "target": {"S1": [s1_t], "S2": [s2_t]}}]
    return SEN12MSCRTS(root, split="test", region=cfg.region,
                       sample_type=cfg.sample_type,
                       cloud_masks=cfg.cloud_masks,
                       n_input_samples=cfg.input_t,
                       custom_samples=custom)


def main(cfg: Config) -> dict:
    exp_dir = os.path.join(cfg.res_dir, cfg.experiment_name)
    os.makedirs(exp_dir, exist_ok=True)
    writer = Writer(os.path.join(os.path.dirname(cfg.res_dir) or ".",
                                 "logs", cfg.experiment_name + "_test"))

    if cfg.use_custom:
        dt_test = custom_dataset(cfg)
    else:
        _, _, dt_test = build_datasets(cfg)
        dt_test = Subset(dt_test, range(0, min(cfg.max_samples_count,
                                               len(dt_test))))
    from uncrtaints_tpu.data.pipeline import select_collate
    collate = select_collate(cfg)
    test_loader = BatchLoader(dt_test, batch_size=cfg.batch_size,
                              shuffle=False, collate=collate,
                              use_sar=cfg.use_sar,
                              num_workers=max(1, cfg.num_workers),
                              drop_last=False)

    # data-parallel eval mesh, like the train CLI's final test pass: batch
    # sharded, params replicated (tail batches run replicated in iterate)
    from uncrtaints_tpu.parallel import (
        make_mesh, batch_sharding as mk_bs, replicated_sharding)
    n_dev = cfg.mesh_shape or len(jax.devices())
    bsh = mk_bs(make_mesh(n_dev)) if n_dev > 1 else None

    model = get_generator(cfg)
    from uncrtaints_tpu.train.loop import _device_batch
    sample = next(iter(test_loader))
    sample_dev = _device_batch(sample, bsh if len(sample["y"]) % n_dev == 0
                               else None)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.rdm_seed),
                               sample_dev)

    ckpt_name = "model" if cfg.resume_at < 0 else f"model_epoch_{cfg.resume_at}"
    state, meta = load_checkpoint(cfg, cfg.weight_folder, state, ckpt_name,
                                  restore_opt=False)
    epoch = meta.get("epoch", 1)
    if bsh is not None:
        # replicate AFTER the restore (the loader returns host arrays)
        state = jax.device_put(state, replicated_sharding(bsh.mesh))

    # lean metrics-only step when nothing downstream reads predictions
    # (see cli/train.py; plot/export default ON in test mode, parse_args
    # parity, so this engages only when the user disables both)
    need_outputs = (cfg.plot_every > 0 or cfg.export_every > 0
                    or cfg.loss in ("GNLL", "MGNLL"))
    eval_step = make_eval_step(cfg, with_metrics=True, donate_batch=True,
                               return_outputs=need_outputs)
    state, metrics, img_metrics_val = iterate(
        state, test_loader, cfg, writer, "test", epoch, eval_step=eval_step,
        batch_sharding=bsh)
    print(f"Test loss {metrics['test_loss']}")
    print(f"Test image metrics: {img_metrics_val}")
    save_results(img_metrics_val, exp_dir, split="test")
    writer.close()
    return img_metrics_val


def cli_main():
    """Console entry point (pyproject: uncrtaints-test)."""
    main(load_test_config())


if __name__ == "__main__":
    cli_main()
