"""Whole-scene inference: cloud removal over scenes far larger than the
256x256 training crops.

The reference operates strictly on pre-cut 256^2 patches (dataLoader.py
serves fixed crops; there is no scene-level path). Production Sentinel-2
scenes are 10980^2 -- this module adds the serving-side capability:

- :func:`predict_scene` tiles a [T, H, W, C] scene into overlapping
  ``tile x tile`` windows, runs the jitted flagship forward over window
  batches (static shapes -> ONE compile), and blends overlaps with a
  separable linear crossfade whose weights sum to 1 everywhere in the valid
  region -- no visible seams, each pixel's prediction dominated by the
  window that sees it most centrally.
- For scenes whose activation footprint exceeds one chip, combine with
  ``parallel.make_mesh_2d`` + ``spatial_sharding`` (GSPMD halo exchange) by
  passing ``batch_sharding``/state shardings -- the loop is sharding-
  agnostic: it only does device_put with whatever sharding is given.

Variance handling: predicted aleatoric variances are blended with the same
weights as the means. Note this is the convex combination of per-window
variances WITHOUT the inter-window mean-spread term of the exact mixture
variance, i.e. a mild UNDER-estimate wherever overlapping windows disagree
about the mean; treat blended uncertainty near window joins accordingly.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config
from uncrtaints_tpu.models.registry import mean_vars_idx
from uncrtaints_tpu.train.engine import _cast_for_forward

S2_BANDS = 13


@functools.lru_cache(maxsize=8)
def _scene_fwd(apply_fn, scale_by: float, compute_dtype: str,
               mean_idx: int, vars_idx: int):
    """One jitted forward per (model, scaling, dtype, head-split) -- cached
    at module level so repeated predict_scene calls (scene-serving loops)
    reuse the compiled program instead of re-tracing per call. Runs the same
    mixed-precision cast as the benchmarked eval step (engine
    _cast_for_forward: bf16 compute, fp32 master params)."""
    cast_cfg = SimpleNamespace(compute_dtype=compute_dtype)
    has_var = vars_idx > mean_idx

    @jax.jit
    def fwd(variables, xb, d_batch):
        fwd_params, xc = _cast_for_forward(cast_cfg, variables["params"],
                                           scale_by * xb)
        out = apply_fn({"params": fwd_params,
                        "batch_stats": variables["batch_stats"]},
                       xc, batch_positions=d_batch,
                       train=False).astype(jnp.float32)
        mean = out[..., :mean_idx] / scale_by
        var = (out[..., mean_idx:vars_idx] / (scale_by * scale_by)
               if has_var else None)
        return mean, var

    return fwd


def _axis_ramp(tile: int, overlap: int, n_windows: int) -> np.ndarray:
    """1-D crossfade weight: linear 0->1 over the first ``overlap`` pixels,
    plateau 1, linear 1->0 over the last ``overlap``. Adjacent windows at
    stride ``tile - overlap`` then sum to exactly 1 in the crossfade zone.
    A single window (or overlap=0) gets a flat weight of 1."""
    if n_windows == 1 or overlap == 0:
        return np.ones(tile, np.float32)
    w = np.ones(tile, np.float32)
    ramp = (np.arange(overlap, dtype=np.float32) + 1.0) / (overlap + 1.0)
    w[:overlap] = ramp
    w[-overlap:] = ramp[::-1]
    return w


def _window_origins(size: int, tile: int, stride: int) -> list:
    """Window start offsets covering [0, size) with the final window clamped
    flush to the right edge (standard remote-sensing tiling)."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def predict_scene(state, cfg: Optional[Config], scene_x: jax.Array,
                  dates: Optional[jax.Array] = None, *,
                  tile: int = 256, overlap: int = 64,
                  batch_size: int = 8,
                  device_put_fn=None,
                  forward_fn=None) -> Dict[str, np.ndarray]:
    """Run the flagship model over an arbitrarily large scene.

    scene_x: [T, H, W, C] preprocessed inputs (same band layout the model
    was trained with -- value-scaled like the dataset pipeline, NOT yet
    multiplied by scale_by; the scale_by protocol is applied internally as
    in train/engine.py). dates: [T] day offsets or None.

    ``forward_fn`` serves scenes from an exported artifact instead of a
    live model: pass ``export.load_serving(path)`` (signature
    ``fn(x[B,T,t,t,C], dates[B,T]) -> {'pred', 'var'?}``) and ``state``/
    ``cfg`` may be None -- scene inference then needs no model code at all.

    Returns {"pred": [1, H, W, 13], "var": [1, H, W, 13]} numpy arrays in
    data units (var omitted for deterministic heads).
    """
    T, H0, W0, C = scene_x.shape
    if tile % 2:
        raise ValueError(f"tile must be even, got {tile}")
    if forward_fn is None:
        # small-scene compile-size optimization: shrink the window to the
        # scene. Only valid for the live (re-jittable) path -- an exported
        # artifact has FIXED spatial dims, so small scenes must instead go
        # through the pad-up-to-tile branch below at the artifact's size.
        # round DOWN to even so an even user tile stays valid for odd scenes
        tile = min(tile, max(2, max(H0, W0) // 2 * 2))
    overlap = min(overlap, tile // 2)
    stride = tile - overlap

    # scenes narrower than the tile in one axis: edge-pad up to the tile
    # (windows are square; the pad is cropped from the output)
    scene_np = np.asarray(scene_x)
    H, W = max(H0, tile), max(W0, tile)
    if (H, W) != (H0, W0):
        scene_np = np.pad(scene_np,
                          ((0, 0), (0, H - H0), (0, W - W0), (0, 0)),
                          mode="edge")

    ys = _window_origins(H, tile, stride)
    xs = _window_origins(W, tile, stride)
    origins = [(y, x) for y in ys for x in xs]

    wy = _axis_ramp(tile, overlap, len(ys))
    wx = _axis_ramp(tile, overlap, len(xs))
    w2d = np.outer(wy, wx).astype(np.float32)        # [tile, tile]

    if forward_fn is not None:
        # exported-artifact path: dates are a traced input of the frozen
        # graph -- when the model uses positional encoding, PE(dates) is
        # baked in, so there is no "no dates" mode (zeros would silently
        # apply the position-0 encoding, diverging from the live path,
        # which SKIPS the PE add entirely when batch_positions is None)
        if dates is None:
            raise ValueError(
                "predict_scene(forward_fn=...) requires `dates`: the "
                "exported artifact takes day offsets as a real input and "
                "bakes the positional encoding into the frozen graph. Pass "
                "the [T] day offsets (or serve from the live model via "
                "state/cfg, which supports dates=None).")
        d_batch = jnp.broadcast_to(dates[None],
                                   (batch_size, T)).astype(jnp.float32)

        def run(xb):
            out = forward_fn(xb, d_batch)
            return out["pred"], out.get("var")
    else:
        mean_idx, vars_idx = mean_vars_idx(cfg)
        d_batch = jnp.broadcast_to(dates[None], (batch_size, T)) \
            if dates is not None else None
        fwd = _scene_fwd(state.apply_fn, float(cfg.scale_by),
                         str(cfg.compute_dtype), mean_idx, vars_idx)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        run = lambda xb: fwd(variables, xb, d_batch)

    # output/weight accumulators sized lazily off the first batch's output
    # (the artifact path doesn't know the head split up front)
    num = vnum = den = None
    has_var = None

    def dispatch(b0):
        chunk = origins[b0:b0 + batch_size]
        xb = np.stack([scene_np[:, y:y + tile, x:x + tile] for y, x in chunk])
        if len(chunk) < batch_size:   # pad to the jitted batch shape
            pad = batch_size - len(chunk)
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, axis=0)])
        xb = jnp.asarray(xb)
        if device_put_fn is not None:
            xb = device_put_fn(xb)
        return chunk, run(xb)                         # async dispatch

    # one-deep pipeline: the device computes batch i+1 while the host
    # converts + blend-accumulates batch i (jax dispatch is async; a
    # same-loop np.asarray would serialize host and device per batch)
    starts = list(range(0, len(origins), batch_size))
    pending = dispatch(starts[0])
    for b0 in starts[1:] + [None]:
        nxt = dispatch(b0) if b0 is not None else None
        chunk, (mean, var) = pending
        if has_var is None:
            has_var = var is not None
            mean_idx = mean.shape[-1]
            num = np.zeros((H, W, mean_idx), np.float32)
            vnum = np.zeros((H, W, mean_idx), np.float32) if has_var else None
            den = np.zeros((H, W, 1), np.float32)
        mean = np.asarray(mean)                       # [B, 1, tile, tile, 13]
        var = np.asarray(var) if has_var else None
        for i, (y, x) in enumerate(chunk):
            num[y:y + tile, x:x + tile] += w2d[..., None] * mean[i, 0]
            if has_var:
                vnum[y:y + tile, x:x + tile] += w2d[..., None] * var[i, 0]
            den[y:y + tile, x:x + tile] += w2d[..., None]
        pending = nxt

    out = {"pred": (num / den)[None, :H0, :W0]}
    if has_var:
        out["var"] = (vnum / den)[None, :H0, :W0]
    return out
