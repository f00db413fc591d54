"""Numerical golden tests for the secondary baselines (VERDICT r1 item 7):
UNet3D, RecUNet (lstm), FPNConvLSTM as FULL models with weights imported
from randomly-initialized reference modules, plus a ConvGRU cell step.

Each test builds the actual reference torch module from /root/reference,
exports its state_dict through models/torch_import.py, and compares eval
forwards on identical inputs (fp32; target = fp32 accumulation noise)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout unavailable")
sys.path.insert(0, REF)


def _check_import(matched, missing, sd, skip_substr=("num_batches_tracked",)):
    assert not missing, f"unmatched torch keys: {missing}"
    unconsumed = [k for k in sd if k not in matched
                  and not any(s in k for s in skip_substr)]
    assert not unconsumed, f"unconsumed reference weights: {unconsumed}"


def test_unet3d_matches_torch():
    import torch
    from src.backbones.unet3d import UNet3D as RefUNet3D
    from uncrtaints_tpu.models.unet3d import UNet3D
    from uncrtaints_tpu.models.torch_import import import_unet3d

    torch.manual_seed(0)
    ref = RefUNet3D(in_channel=5, n_classes=13, feats=2, pad_value=0,
                    zero_pad=True).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    B, T, C, H, W = 2, 4, 5, 16, 16
    rng = np.random.default_rng(0)
    x = rng.random((B, T, C, H, W), dtype=np.float32) + 0.05  # no pad frames
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()            # [B, 13, H, W]

    model = UNet3D(in_channel=C, out_channel=13, feats=2, pad_value=0.0,
                   out_nonlin_mean=False, out_nonlin_var="none")
    x_j = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), x_j)
    variables, matched, missing = import_unet3d(variables, sd)
    _check_import(matched, missing, sd)

    out = model.apply(variables, x_j)                          # [B,1,H,W,13]
    out_nchw = np.asarray(out)[:, 0].transpose(0, 3, 1, 2)
    rmse = float(np.sqrt(np.mean((out_nchw - out_ref) ** 2)))
    assert rmse < 1e-5, f"UNet3D forward RMSE {rmse}"


def test_recunet_lstm_matches_torch():
    import torch
    from src.backbones.utae import RecUNet as RefRecUNet
    from uncrtaints_tpu.models.recurrent import RecUNet
    from uncrtaints_tpu.models.torch_import import import_recunet

    torch.manual_seed(0)
    ref = RefRecUNet(input_dim=5, encoder_widths=[8, 16],
                     decoder_widths=[8, 16], out_conv=[13], temporal="lstm",
                     input_size=16, encoder_norm="group", hidden_dim=12,
                     pad_value=0).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    B, T, C, H, W = 2, 3, 5, 16, 16
    rng = np.random.default_rng(1)
    x = rng.random((B, T, C, H, W), dtype=np.float32) + 0.05
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()            # [B, 13, H, W]

    model = RecUNet(input_dim=C, encoder_widths=(8, 16),
                    decoder_widths=(8, 16), out_conv=(13,), temporal="lstm",
                    encoder_norm="group", hidden_dim=12, pad_value=0.0)
    x_j = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), x_j)
    variables, matched, missing = import_recunet(variables, sd, n_stages=2,
                                                 temporal="lstm")
    _check_import(matched, missing, sd)

    out = model.apply(variables, x_j)                          # [B,1,H,W,13]
    out_nchw = np.asarray(out)[:, 0].transpose(0, 3, 1, 2)
    rmse = float(np.sqrt(np.mean((out_nchw - out_ref) ** 2)))
    assert rmse < 1e-5, f"RecUNet forward RMSE {rmse}"


def test_fpnconvlstm_matches_torch():
    import torch
    from src.backbones.fpn import FPNConvLSTM as RefFPN
    from uncrtaints_tpu.models.recurrent import FPNConvLSTM
    from uncrtaints_tpu.models.torch_import import import_fpn

    torch.manual_seed(0)
    ref = RefFPN(input_dim=5, num_classes=13, inconv=[8, 16], n_levels=3,
                 n_channels=8, hidden_size=12, input_shape=(16, 16),
                 mid_conv=True, pad_value=0).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    B, T, C, H, W = 2, 3, 5, 16, 16
    rng = np.random.default_rng(2)
    x = rng.random((B, T, C, H, W), dtype=np.float32) + 0.05
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()            # [B, 13, H, W]

    model = FPNConvLSTM(input_dim=C, num_classes=13, inconv=(8, 16),
                        n_levels=3, n_channels=8, hidden_size=12,
                        mid_conv=True, pad_value=0.0)
    x_j = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), x_j)
    variables, matched, missing = import_fpn(variables, sd, n_levels=3)
    _check_import(matched, missing, sd)

    out = model.apply(variables, x_j)
    out_nchw = np.asarray(out)[:, 0].transpose(0, 3, 1, 2)
    rmse = float(np.sqrt(np.mean((out_nchw - out_ref) ** 2)))
    assert rmse < 1e-5, f"FPNConvLSTM forward RMSE {rmse}"


def test_convgru_cell_matches_torch():
    """One ConvGRU step vs the reference cell (convgru.py:10-59)."""
    import torch
    from src.backbones.convgru import ConvGRUCell as RefCell
    from uncrtaints_tpu.models.recurrent import ConvGRUCell

    torch.manual_seed(0)
    B, H, W, Cin, Ch = 2, 8, 8, 4, 6
    ref = RefCell(input_size=(H, W), input_dim=Cin, hidden_dim=Ch,
                  kernel_size=(3, 3), bias=True).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
    h = rng.standard_normal((B, Ch, H, W)).astype(np.float32)
    with torch.no_grad():
        h_ref = ref(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    cell = ConvGRUCell(hidden_dim=Ch, kernel=3)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    h_j = jnp.asarray(h.transpose(0, 2, 3, 1))
    variables = cell.init(jax.random.PRNGKey(0), h_j, x_j)

    def cw(w):  # [O,I,kh,kw] -> [kh,kw,I,O]
        return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))

    variables = {"params": {
        "in_conv": {"kernel": cw(ref.in_conv.weight),
                    "bias": jnp.asarray(ref.in_conv.bias.detach().numpy())},
        "out_conv": {"kernel": cw(ref.out_conv.weight),
                     "bias": jnp.asarray(ref.out_conv.bias.detach().numpy())},
    }}
    h1, _ = cell.apply(variables, h_j, x_j)
    np.testing.assert_allclose(np.asarray(h1).transpose(0, 3, 1, 2), h_ref,
                               rtol=1e-4, atol=1e-5)
