"""Numerical-parity harness: ported reference weights must reproduce the
PyTorch forward (BASELINE.md north star: <=1e-3 RMSE; we target fp32 noise).

Builds the actual reference model from /root/reference (skipped when the
reference checkout is absent), exports its randomly-initialized state_dict,
imports it through models/torch_import.py, and compares full forward passes
on identical inputs."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout unavailable")


def _build_reference_model(**kw):
    sys.path.insert(0, REF)
    import torch
    from src.backbones.uncrtaints import UNCRTAINTS

    defaults = dict(input_dim=15, encoder_widths=[128],
                    decoder_widths=[128] * 5, out_conv=[26],
                    out_nonlin_mean=True, out_nonlin_var="softplus",
                    agg_mode="att_group", encoder_norm="group",
                    decoder_norm="batch", n_head=16, d_model=256, d_k=4,
                    pad_value=0, padding_mode="reflect",
                    positional_encoding=True, covmode="diag", scale_by=10.0,
                    separate_out=False, use_v=False, block_type="mbconv",
                    is_mono=False)
    defaults.update(kw)
    torch.manual_seed(0)
    model = UNCRTAINTS(**defaults)
    model.eval()
    return model, defaults


@pytest.mark.parametrize("block_type,use_v", [
    ("mbconv", False),     # the paper-recipe default
    ("residual", False),   # ResidualConvBlock path (uncrtaints.py:24-69)
    ("mbconv", True),      # full L-TAE value path (ltae.py:10-141)
])
def test_forward_parity_with_ported_weights(block_type, use_v):
    import torch
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.models.torch_import import import_uncrtaints

    ref_model, d = _build_reference_model(block_type=block_type, use_v=use_v)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = derive(Config(use_sar=True, scale_by=10.0, mean_nonLinearity=True,
                        block_type=block_type, use_v=use_v))
    model = get_generator(cfg)

    rng = np.random.default_rng(0)
    B, T, H, W, C = 1, 3, 64, 64, 15
    x = rng.random((B, T, C, H, W), dtype=np.float32)  # NCHW for torch
    dates = rng.integers(0, 1400, (B, T)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x),
                            batch_positions=torch.from_numpy(dates)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc,
                           batch_positions=jnp.asarray(dates))
    variables, matched, missing = import_uncrtaints(variables, sd, cfg)
    assert not missing, f"unmatched torch keys: {missing}"
    # every torch parameter tensor must be consumed (num_batches_tracked is
    # torch bookkeeping with no flax analogue)
    unconsumed = [k for k in sd if k not in matched
                  and "num_batches_tracked" not in k]
    assert not unconsumed, f"unconsumed reference weights: {unconsumed}"

    out = model.apply(variables, x_nhwc, batch_positions=jnp.asarray(dates))
    out_nchw = np.asarray(out).transpose(0, 1, 4, 2, 3)

    rmse = float(np.sqrt(np.mean((out_nchw - ref_out) ** 2)))
    max_abs = float(np.abs(out_nchw - ref_out).max())
    print(f"parity rmse={rmse:.2e} max_abs={max_abs:.2e}")
    assert rmse < 1e-3, f"RMSE {rmse} exceeds parity budget"
    assert max_abs < 1e-2, f"max abs diff {max_abs}"


def test_forward_parity_mono():
    import torch
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.models.torch_import import import_uncrtaints

    ref_model, d = _build_reference_model(is_mono=True, input_dim=15,
                                          positional_encoding=False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = derive(Config(use_sar=True, scale_by=10.0, mean_nonLinearity=True,
                        pretrain=True))
    model = get_generator(cfg)

    rng = np.random.default_rng(1)
    x = rng.random((1, 1, 15, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x), batch_positions=None).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, batch_positions=None)
    variables, matched, missing = import_uncrtaints(variables, sd, cfg)
    assert not missing
    out = model.apply(variables, x_nhwc, batch_positions=None)
    out_nchw = np.asarray(out).transpose(0, 1, 4, 2, 3)
    rmse = float(np.sqrt(np.mean((out_nchw - ref_out) ** 2)))
    assert rmse < 1e-3, rmse


def test_unet_forward_parity_with_ported_weights():
    import torch
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.models.torch_import import import_unet

    sys.path.insert(0, REF)
    from src.backbones.utae import UNet as RefUNet

    torch.manual_seed(0)
    widths = [16, 16, 32]
    # unet derives loss='l2' -> out_conv stays [13] (train_reconstruct.py:39-45)
    ref_model = RefUNet(input_dim=15, encoder_widths=widths,
                        decoder_widths=widths, out_conv=[13],
                        out_nonlin_mean=True, out_nonlin_var="softplus",
                        encoder_norm="group", norm_skip="batch",
                        norm_up="batch", decoder_norm="batch")
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = derive(Config(model="unet", use_sar=True, scale_by=10.0,
                        mean_nonLinearity=True, loss="MGNLL",
                        encoder_widths=widths, decoder_widths=widths))
    model = get_generator(cfg)

    rng = np.random.default_rng(0)
    x = rng.random((1, 1, 32, 32, 15), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables, matched, missing = import_unet(variables, sd, cfg)
    assert not missing, missing
    unconsumed = [k for k in sd if k not in matched
                  and "num_batches_tracked" not in k]
    assert not unconsumed, unconsumed

    with torch.no_grad():  # the reference UNet expects 5-D [B,T=1,C,H,W]
        ref_out = ref_model(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).numpy()

    out = model.apply(variables, jnp.asarray(x))
    out_nchw = np.asarray(out).transpose(0, 1, 4, 2, 3)
    rmse = float(np.sqrt(np.mean((out_nchw - ref_out) ** 2)))
    print(f"unet parity rmse={rmse:.2e}")
    assert rmse < 1e-3, rmse


def test_utae_forward_parity_with_ported_weights():
    import torch
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.models.torch_import import import_utae

    sys.path.insert(0, REF)
    from src.backbones.utae import UTAE as RefUTAE

    torch.manual_seed(0)
    widths = [16, 16, 32]
    ref_model = RefUTAE(input_dim=15, encoder_widths=widths,
                        decoder_widths=widths, out_conv=[13],
                        out_nonlin_mean=True, out_nonlin_var="softplus",
                        agg_mode="att_group", encoder_norm="group",
                        norm_skip="batch", norm_up="batch",
                        decoder_norm="batch", n_head=4, d_model=32, d_k=4,
                        positional_encoding=True, scale_by=10.0)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = derive(Config(model="utae", use_sar=True, scale_by=10.0,
                        mean_nonLinearity=True,
                        encoder_widths=widths, decoder_widths=widths,
                        n_head=4, d_model=32, d_k=4))
    model = get_generator(cfg)

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 32, 32, 15), dtype=np.float32)
    dates = rng.integers(0, 1400, (1, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           batch_positions=jnp.asarray(dates))
    variables, matched, missing = import_utae(variables, sd, cfg)
    assert not missing, missing
    unconsumed = [k for k in sd if k not in matched
                  and "num_batches_tracked" not in k]
    assert not unconsumed, unconsumed

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)),
                            batch_positions=torch.from_numpy(dates)).numpy()

    out = model.apply(variables, jnp.asarray(x),
                      batch_positions=jnp.asarray(dates))
    out_nchw = np.asarray(out).transpose(0, 1, 4, 2, 3)
    rmse = float(np.sqrt(np.mean((out_nchw - ref_out) ** 2)))
    print(f"utae parity rmse={rmse:.2e}")
    assert rmse < 1e-3, rmse


def test_pth_tar_file_round_trip(tmp_path):
    """load_torch_state_dict must read an actual reference-format .pth.tar
    (the dict layout save_model writes, model_utils.py:117-125)."""
    import torch
    from uncrtaints_tpu.models.torch_import import (
        load_torch_state_dict, normalize_legacy_keys)

    ref_model, _ = _build_reference_model(encoder_widths=[16],
                                          decoder_widths=[16] * 2,
                                          n_head=4, d_model=32, out_conv=[26])
    path = tmp_path / "model.pth.tar"
    torch.save({"epoch": 3,
                "state_dict": {"netG." + k: v for k, v in
                               ref_model.state_dict().items()},
                "state_dict_G": ref_model.state_dict(),
                "optimizer_G": {}, "scheduler_G": {}}, str(path))

    sd = load_torch_state_dict(str(path))
    assert "in_conv.conv.conv.0.weight" in sd
    assert all(isinstance(v, np.ndarray) for v in sd.values())

    # legacy 1-indexed block checkpoints get renamed on load
    legacy = {k.replace("in_block.0.", "in_block.1.")
               .replace("out_block.0.", "out_block.1.")
               .replace("out_block.1.conv", "out_block.1.conv"): v
              for k, v in sd.items()}
    legacy = {k: v for k, v in legacy.items()}
    fixed = normalize_legacy_keys(
        {k.replace("in_block.0.", "in_block.1."): v for k, v in sd.items()
         if "out_block" not in k})
    assert any(k.startswith("in_block.0.") for k in fixed)
