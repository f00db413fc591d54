"""Shape & behavior tests for the UNCRTAINTS flagship model.

Shape trace parity with /root/reference (SURVEY.md section 3.3):
input [B,T,H,W,15] -> output [B,1,H,W,26] for covmode=diag + SAR.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, derive
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.models.ltae import positional_encoding_table


SMALL = dict(encoder_widths=[32], decoder_widths=[32, 32], n_head=4,
             d_model=64, d_k=4)


def make_model_and_params(cfg, B=2, T=3, H=32, W=32):
    from uncrtaints_tpu.config import input_dim
    model = get_generator(cfg)
    x = jnp.asarray(np.random.default_rng(0).random(
        (B, T, H, W, input_dim(cfg)), dtype=np.float32))
    dates = jnp.arange(B * T, dtype=jnp.float32).reshape(B, T) * 30
    variables = model.init(jax.random.PRNGKey(0), x, batch_positions=dates)
    return model, variables, x, dates


def test_forward_shape_diag_sar():
    cfg = derive(Config(use_sar=True, scale_by=10.0, mean_nonLinearity=True, **SMALL))
    model, variables, x, dates = make_model_and_params(cfg)
    y = model.apply(variables, x, batch_positions=dates,
                    mutable=False)
    assert y.shape == (2, 1, 32, 32, 26)
    # variance channels strictly positive (softplus + eps)
    assert float(jnp.min(y[..., 13:])) > 0
    # mean channels in [0, scale_by] (sigmoid * scale_by)
    assert float(jnp.max(y[..., :13])) <= 10.0
    assert float(jnp.min(y[..., :13])) >= 0.0


def test_forward_shape_iso():
    cfg = derive(Config(covmode="iso", **SMALL))
    model, variables, x, dates = make_model_and_params(cfg)
    y = model.apply(variables, x, batch_positions=dates)
    assert y.shape == (2, 1, 32, 32, 14)


def test_forward_mono_pretrain():
    cfg = derive(Config(pretrain=True, **SMALL))
    model, variables, x, dates = make_model_and_params(cfg, T=1)
    y = model.apply(variables, x, batch_positions=None)
    assert y.shape == (2, 1, 32, 32, 26)


def test_forward_residual_blocks():
    cfg = derive(Config(block_type="residual", encoder_norm="group",
                        decoder_norm="group", **SMALL))
    model, variables, x, dates = make_model_and_params(cfg)
    y = model.apply(variables, x, batch_positions=dates)
    assert y.shape == (2, 1, 32, 32, 26)


def test_forward_use_v():
    cfg = derive(Config(use_v=True, **SMALL))
    model, variables, x, dates = make_model_and_params(cfg)
    y = model.apply(variables, x, batch_positions=dates)
    assert y.shape == (2, 1, 32, 32, 26)


def test_pad_frames_get_zero_attention_and_aggregation_weight():
    """Pad frames must receive (a) -1e3-masked attention logits (softmax
    weight underflows to 0) and (b) an exact zero multiplier in the
    aggregator -- pad semantics of ltae.py:434-435 + uncrtaints.py:172.
    Note the reference, like us, still lets pad frames into the L-TAE
    GroupNorm statistics; only their aggregation weight is suppressed."""
    from uncrtaints_tpu.models.ltae import LTAE2dtiny
    from uncrtaints_tpu.models.aggregator import TemporalAggregator
    rng = np.random.default_rng(1)
    B, T, H, W, C = 2, 4, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    dates = jnp.asarray(rng.integers(0, 1000, (B, T)).astype(np.float32))
    pad_mask = jnp.asarray([[False, False, False, True],
                            [False, False, True, True]])

    ltae = LTAE2dtiny(in_channels=C, n_head=4, d_k=4, d_model=64)
    variables = ltae.init(jax.random.PRNGKey(0), x, batch_positions=dates,
                          pad_mask=pad_mask)
    attn = ltae.apply(variables, x, batch_positions=dates, pad_mask=pad_mask)
    attn_np = np.asarray(attn)  # [B, T, H, W, heads]
    # padded positions: softmax(-1e3 vs ~O(1)) underflows to 0 in fp32
    assert attn_np[0, 3].max() < 1e-30
    assert attn_np[1, 2:].max() < 1e-30
    # valid positions renormalize to 1
    np.testing.assert_allclose(attn_np.sum(axis=1), 1.0, rtol=1e-5)

    agg = TemporalAggregator(mode="att_group")
    av = agg.init(jax.random.PRNGKey(0), x, pad_mask=pad_mask, attn_mask=attn)
    out = agg.apply(av, x, pad_mask=pad_mask, attn_mask=attn)
    # reconstruct by hand from the masked weights
    keep = (~pad_mask)[:, :, None, None, None].astype(np.float32)
    w = attn_np * keep
    xg = np.asarray(x).reshape(B, T, H, W, 4, C // 4)
    ref = np.einsum("bthwn,bthwnc->bhwnc", w, xg).reshape(B, H, W, C)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_positional_encoding_matches_torch_reference():
    """Golden parity with positional_encoding.py:5-31 (re-derived in torch)."""
    import torch
    d, T, repeat = 16, 1000, 4
    denom = torch.pow(torch.tensor(float(T)),
                      2 * (torch.arange(0, d).float() // 2) / d)
    bp = torch.tensor([[0.0, 35.0, 421.0], [7.0, 1000.0, 2104.0]])
    table = bp[:, :, None] / denom[None, None, :]
    table[:, :, 0::2] = torch.sin(table[:, :, 0::2])
    table[:, :, 1::2] = torch.cos(table[:, :, 1::2])
    ref = torch.cat([table for _ in range(repeat)], dim=-1).numpy()

    got = positional_encoding_table(jnp.asarray(bp.numpy()), d, T=T, repeat=repeat)
    # atol 5e-4: fp32 sin/cos of large day offsets differs slightly between
    # torch's libm and XLA's vectorized implementation
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=5e-4)


def test_param_count_close_to_reference_scale():
    """Reference UnCRtainTS @ width 128 is ~1-2M params (SURVEY.md section 2)."""
    cfg = derive(Config(use_sar=True))
    model, variables, *_ = make_model_and_params(cfg)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 5e5 < n < 3e6
