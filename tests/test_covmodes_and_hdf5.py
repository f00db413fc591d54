"""End-to-end coverage for the GNLL/uni and MGNLL/iso uncertainty modes and
the HDF5 data source."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train import create_train_state, make_train_step, make_eval_step

SMALL = dict(encoder_widths=[16], decoder_widths=[16, 16], n_head=4,
             d_model=32, d_k=4, batch_size=2, lr=1e-3)


def _mk(cfg, B=2, T=2, H=32, W=32):
    model = get_generator(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.random((B, T, H, W, input_dim(cfg)), dtype=np.float32)),
        "y": jnp.asarray(rng.random((B, 1, H, W, 13), dtype=np.float32)),
        "dates": jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    return state, batch


@pytest.mark.slow  # heavy integration (tens of seconds on 1 core); full run covers it
def test_gnll_uni_trains():
    cfg = derive(Config(loss="GNLL", **SMALL))
    assert cfg.covmode == "uni" and cfg.out_conv == [26]
    state, batch = _mk(cfg)
    step = make_train_step(cfg)
    ev = make_eval_step(cfg)
    state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    out = ev(state, batch)
    assert out["var"].shape == (2, 1, 32, 32, 13)


@pytest.mark.slow  # heavy integration (tens of seconds on 1 core); full run covers it
def test_mgnll_iso_trains():
    cfg = derive(Config(loss="MGNLL", covmode="iso", **SMALL))
    assert cfg.out_conv == [14]
    state, batch = _mk(cfg)
    step = make_train_step(cfg)
    ev = make_eval_step(cfg)
    state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    out = ev(state, batch)
    # iso: scalar variance broadcast to all 13 bands by the loss
    assert out["var"].shape == (2, 1, 32, 32, 13)


def test_hdf5_round_trip(tmp_path):
    h5py = pytest.importorskip("h5py")
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS
    from uncrtaints_tpu.data.hdf5 import convert_to_hdf5, HDF5SEN12MSCRTS
    from uncrtaints_tpu.data.pipeline import BatchLoader, collate_multi

    class _Generic(SyntheticSEN12MSCRTS):
        def __getitem__(self, pdx):
            s = super().__getitem__(pdx)
            return {"S1": s["input"]["S1"], "S2": s["input"]["S2"],
                    "masks": s["input"]["masks"],
                    "coverage": s["input"]["coverage"],
                    "S1 TD": s["input"]["S1 TD"],
                    "S2 TD": s["input"]["S2 TD"]}

    src = _Generic(n_samples=4, n_input_t=5, patch_size=32)
    path = convert_to_hdf5(src, str(tmp_path / "d.h5"))
    ds = HDF5SEN12MSCRTS(path, n_input_samples=3)
    assert len(ds) == 4
    s = ds[0]
    assert len(s["input"]["S2"]) == 3
    # uint16 round trip preserves rescaled values to ~1e-4
    orig = np.asarray(src[0]["S2"][s["input"]["idx"][0]])
    got = np.asarray(s["input"]["S2"][0])
    np.testing.assert_allclose(got, orig, atol=2e-4)

    # loads straight through the standard loader
    b = next(iter(BatchLoader(ds, batch_size=2, collate=collate_multi,
                              use_sar=True)))
    assert b["x"].shape == (2, 3, 32, 32, 15)


def test_pad_collate_variable_t():
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS
    from uncrtaints_tpu.data.pipeline import pad_collate_multi
    a = SyntheticSEN12MSCRTS(n_samples=1, n_input_t=2, patch_size=16)[0]
    b = SyntheticSEN12MSCRTS(n_samples=1, n_input_t=4, patch_size=16)[0]
    batch = pad_collate_multi([a, b], use_sar=True)
    assert batch["x"].shape == (2, 4, 16, 16, 15)
    # sample a's padded frames are pad_value=0 everywhere
    assert (batch["x"][0, 2:] == 0).all()
    assert (batch["dates"][0, 2:] == 0).all()


def test_collate_multi_bf16_transfer_feeds_eval():
    """x collated as bf16 (half host->device traffic) runs the eval step
    close to the fp32-collated result. NOT bit-identical: collation rounds
    the raw input once before the step's fp32 scale_by multiply (see
    data/pipeline.py collate_multi); the engine upcasts to fp32 for the
    scale so only that one extra rounding remains."""
    import functools
    from ml_dtypes import bfloat16 as np_bf16
    import jax
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.data.pipeline import collate_multi
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step

    ds = SyntheticSEN12MSCRTS(n_samples=2, n_input_t=3, patch_size=16)
    samples = [ds[0], ds[1]]
    b32 = collate_multi(samples, use_sar=True)
    b16 = collate_multi(samples, use_sar=True, x_dtype=np_bf16)
    assert b16["x"].dtype == np_bf16
    assert b16["y"].dtype == np.float32

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                        encoder_widths=[16], decoder_widths=[16, 16],
                        n_head=4, d_model=32))
    model = get_generator(cfg)
    dev32 = {"x": jnp.asarray(b32["x"]), "y": jnp.asarray(b32["y"]),
             "dates": jnp.asarray(b32["dates"])}
    dev16 = {"x": jnp.asarray(b16["x"]), "y": jnp.asarray(b16["y"]),
             "dates": jnp.asarray(b16["dates"])}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), dev32)
    ev = make_eval_step(cfg)
    l32 = float(ev(state, dev32)["loss"])
    l16 = float(ev(state, dev16)["loss"])
    assert np.isfinite(l16)
    # quantize-before-transfer vs cast-on-device: same precision class
    assert abs(l16 - l32) < max(0.02 * abs(l32), 0.5), (l16, l32)
