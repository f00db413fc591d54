"""Shape tests for the baseline backbones (UNet, UTAE, UNet3D, recurrent
models, FPN) -- the reference's secondary model zoo (SURVEY.md section 2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator


def _run(cfg, B=1, T=3, H=32, W=32, dates=True):
    model = get_generator(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, T, H, W, input_dim(cfg)), dtype=np.float32))
    d = jnp.asarray(rng.integers(0, 900, (B, T)).astype(np.float32)) if dates else None
    variables = model.init(jax.random.PRNGKey(0), x, batch_positions=d)
    return model.apply(variables, x, batch_positions=d)


def test_unet_pretrain_shape():
    cfg = derive(Config(model="unet", encoder_widths=[16, 16, 32],
                        decoder_widths=[16, 16, 32], use_sar=True))
    # unet derives pretrain=True -> loss l2 -> out stays 13 channels
    y = _run(cfg, T=1, dates=False)
    assert y.shape == (1, 1, 32, 32, 13)


def test_utae_shape():
    cfg = derive(Config(model="utae", encoder_widths=[16, 16, 32],
                        decoder_widths=[16, 16, 32], n_head=4, d_model=32))
    y = _run(cfg)
    assert y.shape == (1, 1, 32, 32, 13)


def test_unet3d_shape():
    cfg = derive(Config(model="unet3d", loss="l2", input_t=4))
    y = _run(cfg, T=4)
    assert y.shape == (1, 1, 32, 32, 13)


@pytest.mark.parametrize("name", ["convlstm", "convgru"])
def test_seg_models_shape(name):
    cfg = derive(Config(model=name, loss="l2"))
    y = _run(cfg)
    assert y.shape == (1, 1, 32, 32, 13)


def test_uconvlstm_shape():
    cfg = derive(Config(model="uconvlstm", loss="l2",
                        encoder_widths=[8, 8, 16], decoder_widths=[8, 8, 16]))
    from uncrtaints_tpu.models.recurrent import RecUNet
    model = RecUNet(input_dim=input_dim(cfg), encoder_widths=(8, 8, 16),
                    decoder_widths=(8, 8, 16), temporal="lstm", hidden_dim=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 3, 32, 32, 13), dtype=np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == (1, 1, 32, 32, 13)


def test_buconvlstm_shape():
    from uncrtaints_tpu.models.recurrent import RecUNet
    model = RecUNet(input_dim=13, encoder_widths=(8, 8, 16),
                    decoder_widths=(8, 8, 16), temporal="blstm", hidden_dim=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 3, 32, 32, 13), dtype=np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(v, x).shape == (1, 1, 32, 32, 13)


def test_fpn_shape():
    cfg = derive(Config(model="fpn", loss="l2"))
    y = _run(cfg)
    assert y.shape == (1, 1, 32, 32, 13)


def test_convlstm_cell_matches_torch():
    """Golden parity of one ConvLSTM step vs torch (gate math + layout)."""
    import torch
    from uncrtaints_tpu.models.recurrent import ConvLSTMCell

    rng = np.random.default_rng(0)
    B, H, W, Cin, Ch = 2, 8, 8, 4, 6
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    h = rng.standard_normal((B, H, W, Ch)).astype(np.float32)
    c = rng.standard_normal((B, H, W, Ch)).astype(np.float32)

    cell = ConvLSTMCell(hidden_dim=Ch, kernel=3)
    variables = cell.init(jax.random.PRNGKey(0),
                          (jnp.asarray(h), jnp.asarray(c)), jnp.asarray(x))
    (h1, c1), _ = cell.apply(variables, (jnp.asarray(h), jnp.asarray(c)),
                             jnp.asarray(x))

    # torch equivalent with the same weights
    k = np.asarray(variables["params"]["gates"]["kernel"])  # [3,3,in,4ch]
    b = np.asarray(variables["params"]["gates"]["bias"])
    conv = torch.nn.Conv2d(Cin + Ch, 4 * Ch, 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(b))
    combined = torch.from_numpy(
        np.concatenate([x, h], axis=-1).transpose(0, 3, 1, 2))
    z = conv(combined)
    i, f, o, g = torch.split(z, Ch, dim=1)
    c_ref = torch.sigmoid(f) * torch.from_numpy(c.transpose(0, 3, 1, 2)) + \
        torch.sigmoid(i) * torch.tanh(g)
    h_ref = torch.sigmoid(o) * torch.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(h1).transpose(0, 3, 1, 2),
                               h_ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1).transpose(0, 3, 1, 2),
                               c_ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_convlstm_pad_mask_selects_last_valid_state():
    from uncrtaints_tpu.models.recurrent import ConvLSTM
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 8, 8, 3)).astype(np.float32)
    pad = jnp.asarray([[False, False, True, True],
                       [False, False, False, False]])
    m = ConvLSTM(hidden_dim=5)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), pad_mask=pad)
    hs, (h, c) = m.apply(v, jnp.asarray(x), pad_mask=pad)
    assert hs.shape == (2, 4, 8, 8, 5)
    # sample 0's last valid position is t=1; sample 1's is t=3
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(hs[0, 1]))
    np.testing.assert_allclose(np.asarray(h[1]), np.asarray(hs[1, 3]))
