"""Ahead-of-time serving export: frozen-weight StableHLO artifacts.

The reference has no serving story beyond a torch checkpoint + the Python
stack (test_reconstruct.py re-builds the whole model to run inference).
TPU-native serving wants a self-contained compiled artifact instead:
``jax.export`` lowers the jitted forward (weights baked in as constants)
to StableHLO once, with a SYMBOLIC batch dimension, and serializes it to
bytes. A server deserializes and calls it — no model code, no config
parsing, no Python model tree at serving time, and the same artifact can
be lowered for several platforms (TPU + CPU fallback).

    from uncrtaints_tpu.export import save_serving, load_serving
    save_serving(state, cfg, "model.uxp")          # train-time
    serve = load_serving("model.uxp")              # serving-time
    out = serve(x, dates)                          # {'pred', 'var'}

Outputs match train/engine.py's eval step exactly (scale_by protocol:
inputs scaled on the way in, mean/variance rescaled to data units on the
way out); parity asserted in tests/test_export.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from uncrtaints_tpu.config import Config, input_dim
from uncrtaints_tpu.train.engine import _cast_for_forward, _split_out


def make_serve_fn(state, cfg: Config):
    """The eval forward as a pure function of (x, dates): params/batch_stats
    are closed over (frozen into the export as constants). Mirrors
    train/engine.py:make_eval_step minus the loss, including the
    mixed-precision policy (bf16 forward compute by default), so exported
    outputs equal the live eval step's."""
    s = cfg.scale_by
    params, batch_stats = state.params, state.batch_stats
    apply_fn = state.apply_fn

    def serve(x, dates):
        xs = s * x.astype(jnp.float32)
        fwd_params, xc = _cast_for_forward(cfg, params, xs)
        out = apply_fn({"params": fwd_params, "batch_stats": batch_stats},
                       xc, batch_positions=dates, train=False)
        mean, var = _split_out(out.astype(jnp.float32), cfg)
        res = {"pred": mean / s}
        if var is not None:
            res["var"] = var / (s * s)  # nonlinearity applied in-model
        return res

    return serve


def export_serving(state, cfg: Config, height: int = 256, width: int = 256,
                   batch: Optional[int] = None,
                   platforms: Sequence[str] = ("tpu", "cpu")):
    """Lower the serving forward to a multi-platform ``Exported``.

    ``batch=None`` exports a symbolic batch dimension (any B at call time);
    an int pins it (marginally better compile-time specialization).

    The trace always takes the PORTABLE XLA aggregation path: on a TPU
    host the aggregator would otherwise dispatch its Pallas kernel at
    trace time (models/aggregator.py), baking a Mosaic custom call into
    the artifact — un-lowerable for the cpu platform and incompatible
    with the symbolic batch dim through the kernel grid. Serving the XLA
    path costs a few percent on TPU vs the kernel (BASELINE.md A/B) and
    makes the artifact portable.
    """
    serve = make_serve_fn(state, cfg)
    T, C = cfg.input_t, input_dim(cfg)
    b = batch if batch is not None else 2  # placeholder dim for the spec
    args = (jax.ShapeDtypeStruct((b, T, height, width, C), jnp.float32),
            jax.ShapeDtypeStruct((b, T), jnp.float32))
    if batch is None:
        args = jexport.symbolic_args_specs(args, "b, ...")
    prev = os.environ.get("UNCR_AGG_KERNEL")
    os.environ["UNCR_AGG_KERNEL"] = "0"  # trace-time dispatch gate
    try:
        return jexport.export(jax.jit(serve),
                              platforms=tuple(platforms))(*args)
    finally:
        if prev is None:
            os.environ.pop("UNCR_AGG_KERNEL", None)
        else:
            os.environ["UNCR_AGG_KERNEL"] = prev


def save_serving(state, cfg: Config, path: str, **kwargs) -> str:
    """Export and serialize the serving artifact to ``path``."""
    exp = export_serving(state, cfg, **kwargs)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_serving(path: str):
    """Deserialize a serving artifact; returns ``call(x, dates) -> dict``."""
    with open(path, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    return exp.call
