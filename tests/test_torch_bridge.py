"""CLI-level PyTorch checkpoint bridge: a reference user's trained
``.pth.tar`` files (model_utils.py:117-125 format) must load through the
SAME entry points as native checkpoints — ``load_checkpoint`` name fallback
(used by cli.test / resume) and ``load_pretrained_partial``
(``--trained_checkp`` transfer with freeze masks) — with no conversion step.

Builds the actual reference UNCRTAINTS from /root/reference at tiny widths
and saves a real ``torch.save`` blob; skipped when the checkout is absent."""

import os
import sys

import numpy as np
import pytest
import jax

REF = "/root/reference/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout unavailable")


def _tiny_cfg(tmp_path):
    from uncrtaints_tpu.config import Config, derive
    return derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                         mean_nonLinearity=True,
                         res_dir=str(tmp_path), experiment_name="bridge",
                         encoder_widths=[16], decoder_widths=[16, 16],
                         n_head=4, d_model=32))


def _save_reference_ckpt(tmp_path, cfg, epoch=7):
    """torch.save a reference-format blob for the tiny architecture."""
    sys.path.insert(0, REF)
    import torch
    from src.backbones.uncrtaints import UNCRTAINTS

    torch.manual_seed(3)
    ref = UNCRTAINTS(
        input_dim=15, encoder_widths=[16], decoder_widths=[16, 16],
        out_conv=[26], out_nonlin_mean=True, out_nonlin_var="softplus",
        agg_mode="att_group", encoder_norm="group", decoder_norm="batch",
        n_head=4, d_model=32, d_k=4, pad_value=0, padding_mode="reflect",
        positional_encoding=True, covmode="diag", scale_by=10.0,
        separate_out=False, use_v=False, block_type="mbconv", is_mono=False)
    exp_dir = os.path.join(str(tmp_path), "bridge")
    os.makedirs(exp_dir, exist_ok=True)
    path = os.path.join(exp_dir, "model.pth.tar")
    torch.save({"epoch": epoch, "state_dict_G": ref.state_dict()}, path)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return path, sd


def _state(cfg):
    import jax.numpy as jnp
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state
    model = get_generator(cfg)
    key = jax.random.PRNGKey(0)
    batch = {"x": jax.random.normal(key, (2, 3, 16, 16, 15)),
             "y": jnp.zeros((2, 1, 16, 16, 13)),
             "dates": jnp.tile(jnp.arange(3.0)[None], (2, 1))}
    return create_train_state(cfg, model, key, batch)


def test_load_checkpoint_falls_back_to_pth_tar(tmp_path):
    """load_checkpoint('model') with only model.pth.tar on disk imports the
    torch weights (the cli.test path for reference-trained checkpoints)."""
    from uncrtaints_tpu.models.torch_import import import_for_model
    from uncrtaints_tpu.train.checkpoint import load_checkpoint

    cfg = _tiny_cfg(tmp_path)
    _, sd = _save_reference_ckpt(tmp_path, cfg, epoch=7)
    state = _state(cfg)

    loaded, meta = load_checkpoint(cfg, cfg.res_dir, state, "model",
                                   restore_opt=False)
    assert meta["epoch"] == 7

    # must equal the direct library import (parity of the import itself is
    # covered by test_torch_parity)
    variables = {"params": jax.device_get(state.params)}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    expect, matched, missing = import_for_model(variables, sd, cfg)
    assert matched and not missing
    for a, b in zip(jax.tree.leaves(loaded.params),
                    jax.tree.leaves(expect["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(loaded.batch_stats),
                    jax.tree.leaves(expect.get("batch_stats", {}))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_pretrained_partial_from_pth_tar(tmp_path):
    """--trained_checkp model.pth.tar: matching params transfer and freeze
    (out_conv head stays trainable); a reference key missing from the blob
    leaves that leaf at init AND unfrozen — init values must never freeze."""
    import torch
    from uncrtaints_tpu.models import torch_import as ti
    from uncrtaints_tpu.train.checkpoint import load_pretrained_partial

    cfg = _tiny_cfg(tmp_path)
    path, sd = _save_reference_ckpt(tmp_path, cfg)

    # drop one non-head tensor from the blob to simulate a partial source
    mapping, _ = ti._mapping_for(cfg)
    drop_flax, (drop_torch, _) = next(
        (fp, ent) for fp, ent in mapping.items()
        if "out_conv" not in fp and not fp.startswith("B:")
        and ent[0] in sd and fp.endswith("kernel"))
    blob = torch.load(path, map_location="cpu", weights_only=False)
    del blob["state_dict_G"][drop_torch]
    torch.save(blob, path)

    state = _state(cfg)
    init_leaf = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                 jax.tree_util.tree_flatten_with_path(state.params)[0]}
    new_state, freeze_mask = load_pretrained_partial(cfg, state, path)

    flat_new = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                jax.tree_util.tree_flatten_with_path(new_state.params)[0]}
    flat_mask = {jax.tree_util.keystr(k): float(v) for k, v in
                 jax.tree_util.tree_flatten_with_path(freeze_mask)[0]}

    # the dropped tensor: still at init, still trainable
    dropped_ks = next(ks for ks in flat_new
                      if ks.replace("']['", "/").strip("[']") == drop_flax)
    np.testing.assert_array_equal(flat_new[dropped_ks], init_leaf[dropped_ks])
    assert flat_mask[dropped_ks] == 1.0

    # transferred non-head params: changed from init and frozen
    changed_frozen = [ks for ks in flat_new
                      if ks != dropped_ks and "out_conv" not in ks
                      and flat_new[ks].shape == init_leaf[ks].shape
                      and not np.array_equal(flat_new[ks], init_leaf[ks])]
    assert changed_frozen, "nothing transferred"
    assert all(flat_mask[ks] == 0.0 for ks in changed_frozen)

    # the output head transfers but stays trainable
    head = [ks for ks in flat_new if "out_conv" in ks]
    assert head and all(flat_mask[ks] == 1.0 for ks in head)
