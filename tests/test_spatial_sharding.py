"""2-D (data x spatial) mesh: GSPMD spatial partitioning of the flagship
model on the virtual 8-device CPU mesh.

Shards the image H axis across devices; XLA inserts the conv halo
exchanges and the norm/attention collectives. Correctness bar: the sharded
forward/loss must equal the single-device result (same math, different
partitioning) -- this is the whole-scene-inference path for inputs too
large for one chip's HBM (see parallel/mesh.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config, derive, input_dim
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.parallel import (
    make_mesh_2d, spatial_sharding, replicated_sharding,
)
from uncrtaints_tpu.train import create_train_state, make_eval_step, make_train_step


def _tiny_cfg(batch):
    return derive(Config(use_sar=True, scale_by=10.0, batch_size=batch,
                         lr=1e-3, encoder_widths=[32], decoder_widths=[32, 32],
                         n_head=4, d_model=64))


def _batch(cfg, B, H=32, W=32):
    rng = np.random.default_rng(0)
    return {
        "x": jnp.asarray(rng.random((B, cfg.input_t, H, W, input_dim(cfg)),
                                    dtype=np.float32)),
        "y": jnp.asarray(rng.random((B, 1, H, W, 13), dtype=np.float32)),
        "dates": jnp.asarray(rng.integers(0, 1500, (B, cfg.input_t))
                             .astype(np.float32)),
    }


def test_spatial_sharded_eval_matches_single_device():
    cfg = _tiny_cfg(batch=2)
    model = get_generator(cfg)
    batch = _batch(cfg, B=2)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    eval_step = make_eval_step(cfg)

    ref = eval_step(state, batch)          # single-device execution
    ref_loss = float(ref["loss"])
    ref_pred = np.asarray(ref["pred"])

    mesh = make_mesh_2d(2, 4)
    rep = replicated_sharding(mesh)
    sh_x = spatial_sharding(mesh, 5)
    state_s = jax.device_put(state, rep)
    batch_s = {
        "x": jax.device_put(batch["x"], sh_x),
        "y": jax.device_put(batch["y"], sh_x),
        "dates": jax.device_put(batch["dates"], replicated_sharding(mesh)),
    }
    out = eval_step(state_s, batch_s)
    assert np.isfinite(float(out["loss"]))
    # same math, different partitioning: loss to fp tolerance, pred close
    np.testing.assert_allclose(float(out["loss"]), ref_loss,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred"]), ref_pred,
                               rtol=2e-3, atol=2e-3)


def test_spatial_sharded_train_step_runs():
    cfg = _tiny_cfg(batch=2)
    model = get_generator(cfg)
    batch = _batch(cfg, B=2)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)

    mesh = make_mesh_2d(2, 4)
    state = jax.device_put(state, replicated_sharding(mesh))
    sh_x = spatial_sharding(mesh, 5)
    batch = {
        "x": jax.device_put(batch["x"], sh_x),
        "y": jax.device_put(batch["y"], sh_x),
        "dates": jax.device_put(batch["dates"], replicated_sharding(mesh)),
    }
    step = make_train_step(cfg)
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert int(new_state.step) == 1


def test_make_mesh_2d_raises_on_shortfall():
    import pytest
    with pytest.raises(RuntimeError, match="requested 4x4"):
        make_mesh_2d(4, 4)
