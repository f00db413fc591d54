"""Serving-export round trip: jax.export StableHLO artifact with frozen
weights and a symbolic batch dim must reproduce the live eval forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train import create_train_state, make_eval_step


@pytest.fixture(scope="module")
def tiny():
    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                        encoder_widths=[16], decoder_widths=[16, 16],
                        n_head=4, d_model=32))
    model = get_generator(cfg)
    T, H, W, C = cfg.input_t, 32, 32, input_dim(cfg)
    key = jax.random.PRNGKey(0)
    batch = {"x": jax.random.normal(key, (2, T, H, W, C)),
             "y": jnp.zeros((2, 1, H, W, 13)),
             "dates": jnp.tile(jnp.arange(float(T))[None], (2, 1))}
    state = create_train_state(cfg, model, key, batch)
    return cfg, state, batch


def test_export_round_trip_matches_eval_step(tiny, tmp_path):
    """bf16 (default) policy: the exported program is compiled separately
    from the jitted eval step, so XLA fusion differences shift bf16
    rounding — parity is bf16-noise-level, not bitwise."""
    from uncrtaints_tpu.export import save_serving, load_serving

    cfg, state, batch = tiny
    path = str(tmp_path / "model.uxp")
    # CPU-only lowering in the test env; the default adds tpu
    save_serving(state, cfg, path, height=32, width=32, platforms=("cpu",))

    serve = load_serving(path)
    got = serve(batch["x"], batch["dates"])

    aux = make_eval_step(cfg)(state, batch)
    for k in ("pred", "var"):
        a, b = np.asarray(got[k]), np.asarray(aux[k])
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))
        assert rmse < 5e-3, (k, rmse)
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=2e-2)


def test_export_fp32_policy_tight_parity(tmp_path):
    """fp32 compute policy: separately-compiled programs agree to fp32
    noise (the 1e-3 RMSE BASELINE parity bar with margin)."""
    from uncrtaints_tpu.export import save_serving, load_serving

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                        compute_dtype="float32",
                        encoder_widths=[16], decoder_widths=[16, 16],
                        n_head=4, d_model=32))
    model = get_generator(cfg)
    T, H, W, C = cfg.input_t, 32, 32, input_dim(cfg)
    key = jax.random.PRNGKey(0)
    batch = {"x": jax.random.normal(key, (2, T, H, W, C)),
             "y": jnp.zeros((2, 1, H, W, 13)),
             "dates": jnp.tile(jnp.arange(float(T))[None], (2, 1))}
    state = create_train_state(cfg, model, key, batch)

    path = str(tmp_path / "model32.uxp")
    save_serving(state, cfg, path, height=32, width=32, platforms=("cpu",))
    got = load_serving(path)(batch["x"], batch["dates"])
    aux = make_eval_step(cfg)(state, batch)
    np.testing.assert_allclose(np.asarray(got["pred"]),
                               np.asarray(aux["pred"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["var"]),
                               np.asarray(aux["var"]), rtol=1e-5, atol=1e-5)


def test_export_symbolic_batch(tiny, tmp_path):
    from uncrtaints_tpu.export import save_serving, load_serving

    cfg, state, batch = tiny
    path = str(tmp_path / "model.uxp")
    save_serving(state, cfg, path, height=32, width=32, platforms=("cpu",))
    serve = load_serving(path)

    T, C = cfg.input_t, input_dim(cfg)
    key = jax.random.PRNGKey(1)
    for B in (1, 5):
        x = jax.random.normal(key, (B, T, 32, 32, C))
        d = jnp.tile(jnp.arange(float(T))[None], (B, 1))
        out = serve(x, d)
        assert out["pred"].shape == (B, 1, 32, 32, 13)
        assert bool(jnp.isfinite(out["pred"]).all())


def test_export_pinned_batch_rejects_other_sizes(tiny, tmp_path):
    from uncrtaints_tpu.export import export_serving

    cfg, state, batch = tiny
    exp = export_serving(state, cfg, height=32, width=32, batch=2,
                         platforms=("cpu",))
    out = exp.call(batch["x"], batch["dates"])
    assert out["pred"].shape == (2, 1, 32, 32, 13)
    T, C = cfg.input_t, input_dim(cfg)
    with pytest.raises(ValueError, match="Shape mismatch"):
        exp.call(jnp.zeros((3, T, 32, 32, C)), jnp.zeros((3, T)))


def test_export_forces_portable_aggregation_path(tiny, tmp_path, monkeypatch):
    """On a TPU host the aggregator would dispatch its Pallas kernel at
    trace time, baking a Mosaic custom call into the artifact (breaks cpu
    lowering and the symbolic batch dim). export_serving must force the
    portable XLA path regardless of backend — simulated here by making the
    aggregator's backend check claim 'tpu' during the export trace."""
    import uncrtaints_tpu.models.aggregator as agg
    from uncrtaints_tpu.export import export_serving

    cfg, state, batch = tiny
    monkeypatch.setattr(agg.jax, "default_backend", lambda: "tpu")
    # without the UNCR_AGG_KERNEL=0 trace guard this would fail (the
    # non-interpret pallas_call cannot lower for cpu)
    exp = export_serving(state, cfg, height=32, width=32, platforms=("cpu",))
    out = exp.call(batch["x"], batch["dates"])
    assert out["pred"].shape == (2, 1, 32, 32, 13)
    # and the guard must not leak into the process env
    import os
    assert os.environ.get("UNCR_AGG_KERNEL") is None
