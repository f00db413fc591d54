"""Numerics tests for the one-read depthwise stencil (interpret mode on
CPU; same code compiles via Mosaic on TPU). The kernel must match the XLA
shift-add form from models/layers.py (identical fp32 tap order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uncrtaints_tpu.models.layers import _dw_shift_add
from uncrtaints_tpu.ops.pallas_dwconv import dw_stencil


@pytest.mark.parametrize("pads", [((1, 1), (1, 1)),   # SAME 3x3
                                  ((2, 2), (2, 2)),   # FULL 3x3 (gx form)
                                  ((0, 0), (0, 0))])  # VALID
def test_dw_stencil_matches_shift_add(rng, pads):
    N, H, W, C = 2, 16, 24, 128
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32))
    got = dw_stencil(x, w, pads, tile_h=8, interpret=True)
    ref = _dw_shift_add(x, w, pads)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dw_stencil_bf16(rng):
    N, H, W, C = 1, 16, 16, 128
    x = jnp.asarray(rng.standard_normal((N, H, W, C))).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C))).astype(jnp.bfloat16)
    pads = ((1, 1), (1, 1))
    got = dw_stencil(x, w, pads, interpret=True)
    ref = _dw_shift_add(x, w, pads)
    # both accumulate fp32 in the same tap order -> bit-identical
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dw_stencil_unaligned_channels(rng):
    """C % 128 != 0 pays a pad (dispatch avoids it) but must stay correct."""
    N, H, W, C = 1, 8, 8, 96
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32))
    got = dw_stencil(x, w, ((1, 1), (1, 1)), tile_h=4, interpret=True)
    ref = _dw_shift_add(x, w, ((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dw_stencil_odd_height_tiles(rng):
    """Ho not divisible by tile_h: the tile shrinks until it divides."""
    N, H, W, C = 1, 10, 16, 128
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32))
    got = dw_stencil(x, w, ((1, 1), (1, 1)), tile_h=4, interpret=True)
    ref = _dw_shift_add(x, w, ((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dw_stencil_sharded_batch(rng):
    """Batch-sharded inputs over the 8-device mesh: the custom_partitioning
    rule runs the kernel per shard; the result matches unsharded exactly
    and the output stays batch-sharded (no collectives needed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uncrtaints_tpu.ops.pallas_dwconv import dw_stencil_sharded
    from uncrtaints_tpu.parallel import make_mesh

    N, H, W, C = 8, 8, 16, 128
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32))
    pads = ((1, 1), (1, 1))
    ref = _dw_shift_add(x, w, pads)

    mesh = make_mesh(8)
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    wb = jax.device_put(w, NamedSharding(mesh, P()))
    got = jax.jit(lambda a, b: dw_stencil_sharded(a, b, pads))(xb, wb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dw_stencil_dispatch_policy(monkeypatch):
    from uncrtaints_tpu.models import layers as L

    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("UNCR_DW_STENCIL", raising=False)
    big = (12, 256, 256, 256)
    same = ((1, 1), (1, 1))
    # auto default is OFF until the on-chip A/B promotes it
    assert not L._use_pallas_dw_stencil(big, 3, 3, same)
    monkeypatch.setenv("UNCR_DW_STENCIL", "1")
    assert L._use_pallas_dw_stencil(big, 3, 3, same)
    # strips, unaligned C, and small sites stay on the shift-add form
    assert not L._use_pallas_dw_stencil((12, 1, 258, 256), 1, 3,
                                        ((0, 0), (0, 0)))
    assert not L._use_pallas_dw_stencil((12, 256, 256, 96), 3, 3, same)
    assert not L._use_pallas_dw_stencil((1, 16, 16, 128), 3, 3, same)
    monkeypatch.setenv("UNCR_DW_STENCIL", "0")
    assert not L._use_pallas_dw_stencil(big, 3, 3, same)
