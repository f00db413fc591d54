"""Whole-scene tiled inference (infer.predict_scene)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.infer import predict_scene, _axis_ramp, _window_origins
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train import create_train_state


def _tiny_state(T=3, H=32, W=32):
    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                        encoder_widths=[16], decoder_widths=[16, 16],
                        n_head=4, d_model=32))
    model = get_generator(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.random((2, T, H, W, input_dim(cfg)),
                                    dtype=np.float32)),
        "y": jnp.asarray(rng.random((2, 1, H, W, 13), dtype=np.float32)),
        "dates": jnp.asarray(rng.integers(0, 1500, (2, T))
                             .astype(np.float32)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    return cfg, state


def test_axis_ramp_crossfade_sums_to_one():
    tile, overlap = 32, 8
    w = _axis_ramp(tile, overlap, n_windows=3)
    stride = tile - overlap
    # two adjacent windows: A's tail + B's head over the shared zone
    total = w[stride:] + w[:overlap]
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)
    assert (w > 0).all()
    np.testing.assert_array_equal(_axis_ramp(32, 8, n_windows=1), 1.0)


def test_window_origins_cover_and_clamp():
    assert _window_origins(96, 32, 24) == [0, 24, 48, 64]  # last clamped
    assert _window_origins(32, 32, 24) == [0]
    starts = _window_origins(100, 32, 24)
    assert starts[-1] == 68 and max(s + 32 for s in starts) == 100


def test_single_window_equals_direct_forward():
    """Scene exactly one tile: predict_scene must equal the raw jitted
    forward with the scale_by protocol applied."""
    cfg, state = _tiny_state()
    rng = np.random.default_rng(1)
    T, H, W = cfg.input_t, 32, 32
    scene = jnp.asarray(rng.random((T, H, W, input_dim(cfg)),
                                   dtype=np.float32))
    dates = jnp.asarray(rng.integers(0, 1500, (T,)).astype(np.float32))

    out = predict_scene(state, cfg, scene, dates, tile=32, overlap=8,
                        batch_size=2)
    s = cfg.scale_by
    # same mixed-precision cast as the benchmarked eval step (predict_scene
    # routes through engine._cast_for_forward)
    from uncrtaints_tpu.train.engine import _cast_for_forward

    @jax.jit
    def direct_fwd(params, bs, x, d):
        fwd_params, xc = _cast_for_forward(cfg, params, s * x)
        return state.apply_fn({"params": fwd_params, "batch_stats": bs},
                              xc, batch_positions=d, train=False)

    direct = np.asarray(direct_fwd(state.params, state.batch_stats,
                                   scene[None], dates[None]), np.float32)
    # both paths are the bf16 eval forward; jit fusion layouts may still
    # differ by a few bf16 ulps
    np.testing.assert_allclose(out["pred"][0], direct[0, 0, ..., :13] / s,
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(out["var"][0], direct[0, 0, ..., 13:26] / s**2,
                               rtol=2e-2, atol=2e-2)


def test_large_scene_tiled_blend():
    """Multi-window scene incl. clamped last windows and a padded final
    batch: output finite, right shape, values in the plausible range."""
    cfg, state = _tiny_state()
    rng = np.random.default_rng(2)
    T, H, W = cfg.input_t, 80, 96
    scene = jnp.asarray(rng.random((T, H, W, input_dim(cfg)),
                                   dtype=np.float32))
    dates = jnp.asarray(rng.integers(0, 1500, (T,)).astype(np.float32))
    out = predict_scene(state, cfg, scene, dates, tile=32, overlap=8,
                        batch_size=3)
    assert out["pred"].shape == (1, H, W, 13)
    assert out["var"].shape == (1, H, W, 13)
    assert np.isfinite(out["pred"]).all() and np.isfinite(out["var"]).all()
    assert (out["var"] > 0).all()


def test_scene_narrower_than_tile_pads_and_crops():
    cfg, state = _tiny_state()
    rng = np.random.default_rng(3)
    T = cfg.input_t
    scene = jnp.asarray(rng.random((T, 20, 48, input_dim(cfg)),
                                   dtype=np.float32))
    out = predict_scene(state, cfg, scene, None, tile=32, overlap=8,
                        batch_size=2)
    assert out["pred"].shape == (1, 20, 48, 13)
    assert np.isfinite(out["pred"]).all()


def test_odd_tile_rejected():
    cfg, state = _tiny_state()
    scene = jnp.zeros((3, 40, 40, input_dim(cfg)))
    with pytest.raises(ValueError, match="even"):
        predict_scene(state, cfg, scene, None, tile=31)


def test_predict_scene_with_data_mesh():
    """Distributed serving: windows batch-sharded over the 8-device mesh via
    device_put_fn; result must match the unsharded run exactly (same math)."""
    from uncrtaints_tpu.parallel import make_mesh, batch_sharding, replicated_sharding

    cfg, state = _tiny_state()
    rng = np.random.default_rng(4)
    T = cfg.input_t
    scene = jnp.asarray(rng.random((T, 64, 64, input_dim(cfg)),
                                   dtype=np.float32))
    ref = predict_scene(state, cfg, scene, None, tile=32, overlap=8,
                        batch_size=8)

    mesh = make_mesh(8)
    state_s = jax.device_put(state, replicated_sharding(mesh))
    sh = batch_sharding(mesh)
    out = predict_scene(state_s, cfg, scene, None, tile=32, overlap=8,
                        batch_size=8, device_put_fn=lambda x: jax.device_put(x, sh))
    np.testing.assert_allclose(out["pred"], ref["pred"], rtol=2e-4, atol=2e-4)


def test_predict_scene_from_exported_artifact(tmp_path):
    """predict_scene(forward_fn=load_serving(path)): whole-scene inference
    from a frozen artifact, no state/cfg — must match the live-model scene
    prediction (same weights) to export-parity tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.export import load_serving, save_serving
    from uncrtaints_tpu.infer import predict_scene
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                        encoder_widths=[16], decoder_widths=[16, 16],
                        n_head=4, d_model=32))
    model = get_generator(cfg)
    T, C, tile = cfg.input_t, input_dim(cfg), 16
    key = jax.random.PRNGKey(0)
    init = {"x": jnp.zeros((2, T, tile, tile, C)),
            "y": jnp.zeros((2, 1, tile, tile, 13)),
            "dates": jnp.zeros((2, T))}
    state = create_train_state(cfg, model, key, init)

    path = str(tmp_path / "scene.uxp")
    save_serving(state, cfg, path, height=tile, width=tile, batch=2,
                 platforms=("cpu",))
    serve = load_serving(path)

    scene = jax.random.normal(key, (T, 24, 40, C))
    dates = jnp.arange(float(T)) * 10.0
    live = predict_scene(state, cfg, scene, dates, tile=tile, overlap=4,
                         batch_size=2)
    art = predict_scene(None, None, scene, dates, tile=tile, overlap=4,
                        batch_size=2, forward_fn=serve)
    assert art["pred"].shape == live["pred"].shape == (1, 24, 40, 13)
    # bf16 policy: separately-compiled programs, bf16-noise tolerance
    rmse = float(np.sqrt(np.mean((art["pred"] - live["pred"]) ** 2)))
    assert rmse < 5e-3, rmse
    assert "var" in art and art["var"].shape == (1, 24, 40, 13)


def test_predict_scene_artifact_requires_dates(tmp_path):
    """The exported graph bakes PE(dates) in as a traced input, so the
    artifact path must reject dates=None instead of silently substituting
    zeros (which applies the position-0 encoding while the live path skips
    the PE add entirely)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from uncrtaints_tpu.infer import predict_scene

    scene = np.zeros((3, 16, 16, 15), np.float32)
    with pytest.raises(ValueError, match="dates"):
        predict_scene(None, None, scene, None, tile=16, batch_size=2,
                      forward_fn=lambda x, d: {"pred": jnp.zeros(
                          (x.shape[0], 1, 16, 16, 13))})


def test_predict_scene_artifact_small_scene_pads_to_exported_size(tmp_path):
    """A scene smaller than the artifact's exported spatial dims must be
    edge-padded UP to the fixed tile (the frozen program cannot re-jit at a
    shrunken window size) and cropped back after blending."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.export import load_serving, save_serving
    from uncrtaints_tpu.infer import predict_scene
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3,
                        encoder_widths=[16], decoder_widths=[16, 16],
                        n_head=4, d_model=32))
    model = get_generator(cfg)
    T, C, tile = cfg.input_t, input_dim(cfg), 16
    key = jax.random.PRNGKey(0)
    init = {"x": jnp.zeros((2, T, tile, tile, C)),
            "y": jnp.zeros((2, 1, tile, tile, 13)),
            "dates": jnp.zeros((2, T))}
    state = create_train_state(cfg, model, key, init)
    path = str(tmp_path / "small.uxp")
    save_serving(state, cfg, path, height=tile, width=tile, batch=2,
                 platforms=("cpu",))
    serve = load_serving(path)

    scene = jax.random.normal(key, (T, 10, 12, C))   # smaller than the tile
    dates = jnp.arange(float(T)) * 10.0
    art = predict_scene(None, None, scene, dates, tile=tile, overlap=4,
                        batch_size=2, forward_fn=serve)
    assert art["pred"].shape == (1, 10, 12, 13)
    # equivalent live computation: the artifact path edge-pads the scene up
    # to its fixed 16x16 window; hand the live path the SAME padded scene
    # (the live path's small-scene clamp would otherwise shrink the window
    # to 12x12, legitimately changing border context) and crop back
    padded = np.pad(np.asarray(scene), ((0, 0), (0, 6), (0, 4), (0, 0)),
                    mode="edge")
    live = predict_scene(state, cfg, padded, dates, tile=tile, overlap=4,
                         batch_size=2)
    rmse = float(np.sqrt(np.mean(
        (art["pred"] - live["pred"][:, :10, :12]) ** 2)))
    assert rmse < 5e-3, rmse
