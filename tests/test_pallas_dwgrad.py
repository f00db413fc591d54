"""Numerics tests for the single-pass depthwise kernel gradient (interpret
mode on CPU; same code compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad


def _taps_reference(x, g, pads, kh, kw):
    """The XLA tap form from models/layers.py:_dw_conv_same_bwd."""
    N, H, W, C = x.shape
    (pt, pb), (pl_, pr) = pads
    Ho, Wo = H + pt + pb - kh + 1, W + pl_ + pr - kw + 1
    xp = jnp.pad(x, [(0, 0), (pt, pb), (pl_, pr), (0, 0)])
    g32 = g.astype(jnp.float32)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(xp, (0, dy, dx, 0), (N, dy + Ho, dx + Wo, C))
            taps.append(jnp.sum(tap.astype(jnp.float32) * g32,
                                axis=(0, 1, 2)))
    return jnp.stack(taps).reshape(kh, kw, 1, C)


def test_dw_kernel_grad_3x3_same(rng):
    N, H, W, C = 2, 16, 16, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    pads = ((1, 1), (1, 1))
    got = dw_kernel_grad(x, g, pads, 3, 3, tile_h=8, interpret=True)
    ref = _taps_reference(x, g, pads, 3, 3)
    assert got.shape == (3, 3, 1, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dw_kernel_grad_bf16_inputs(rng):
    N, H, W, C = 1, 8, 8, 64
    x = jnp.asarray(rng.standard_normal((N, H, W, C))).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((N, H, W, C))).astype(jnp.bfloat16)
    pads = ((1, 1), (1, 1))
    got = dw_kernel_grad(x, g, pads, 3, 3, interpret=True)
    ref = _taps_reference(x, g, pads, 3, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


def test_dw_kernel_grad_valid_1x3(rng):
    """The border-fix convs: VALID padding, 1x3 / 3x1 kernels."""
    N, H, W, C = 1, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    pads = ((0, 0), (0, 0))
    g = jnp.asarray(rng.standard_normal((N, H, W - 2, C)).astype(np.float32))
    got = dw_kernel_grad(x, g, pads, 1, 3, tile_h=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_taps_reference(x, g, pads, 1, 3)),
        rtol=1e-5, atol=1e-5)

    g2 = jnp.asarray(rng.standard_normal((N, H - 2, W, C)).astype(np.float32))
    got2 = dw_kernel_grad(x, g2, pads, 3, 1, tile_h=3, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(_taps_reference(x, g2, pads, 3, 1)),
        rtol=1e-5, atol=1e-5)


def test_dw_kernel_grad_uneven_tile(rng):
    """Ho not divisible by the default tile: falls back to a divisor."""
    N, H, W, C = 1, 20, 8, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    pads = ((1, 1), (1, 1))
    got = dw_kernel_grad(x, g, pads, 3, 3, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_taps_reference(x, g, pads, 3, 3)),
        rtol=1e-5, atol=1e-5)


def test_dw_vjp_gate_dispatches(rng, monkeypatch):
    """UNCR_DW_GW=1 on a TPU backend routes the dw-conv kernel grad through
    the single-pass kernel; gradients must match the tap form."""
    from uncrtaints_tpu.models import layers as L
    from uncrtaints_tpu.ops import pallas_dwgrad as PD

    N, H, W, C = 1, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32) * 0.1)

    def loss(x_, w_):
        return L._dw_conv_same(x_, w_).sum()

    gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, w)

    calls = []
    real = PD.dw_kernel_grad

    def spy(*a, **kw):
        calls.append(1)
        kw["interpret"] = True
        return real(*a, **kw)

    monkeypatch.setenv("UNCR_DW_GW", "1")
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(L.jax, "device_count", lambda: 1)
    monkeypatch.setattr(PD, "dw_kernel_grad", spy)
    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert calls, "gate did not dispatch to the kernel"
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-5)


def test_dw_gw_auto_policy():
    """The default (no env var) TPU dispatch gates on the STEP's total
    activation rows (round-4 on-chip attribution: the kernel's win/loss is
    a whole-step property, not a per-conv one — layers.py policy comment):
    inside a small step (B=4 paper recipe: 786k rows) every aligned conv
    engages, inside a large step (B=8: 1.57M rows) none does, and with no
    step hint (direct grads outside the engine) none does."""
    from uncrtaints_tpu.models.layers import _dw_gw_auto, dw_gw_step_rows

    enc_b4, dec_b4, strip = (12, 256, 256, 256), (4, 256, 256, 256), (4, 1, 258, 256)
    assert not _dw_gw_auto(enc_b4)                  # no step hint -> taps
    with dw_gw_step_rows(4 * 3 * 256 * 256):        # train B=4 step
        assert _dw_gw_auto(enc_b4)
        assert _dw_gw_auto(dec_b4)
        assert _dw_gw_auto(strip)
        assert not _dw_gw_auto((12, 256, 256, 96))  # C % 128 != 0
    with dw_gw_step_rows(8 * 3 * 256 * 256):        # train B=8 step
        assert not _dw_gw_auto((24, 256, 256, 256))
        assert not _dw_gw_auto((8, 256, 256, 256))
        assert not _dw_gw_auto((8, 1, 258, 256))
    with dw_gw_step_rows(4 * 3 * 256 * 256, spatial=True):
        # spatially-sharded step: auto declines (the kernel's sp path
        # force-gathers H/W shards; only UNCR_DW_GW=1 opts into that)
        assert not _dw_gw_auto(enc_b4)
    assert not _dw_gw_auto(enc_b4)                  # hint restored


def test_dw_vjp_auto_dispatch(rng, monkeypatch):
    """With NO env var, a TPU backend auto-dispatches aligned shapes to the
    kernel only under a small-step hint; UNCR_DW_GW=0 forces the tap form
    for every shape and UNCR_DW_GW=1 forces the kernel regardless of the
    hint."""
    from uncrtaints_tpu.models import layers as L

    monkeypatch.delenv("UNCR_DW_GW", raising=False)
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    small, large = (4, 32, 32, 128), (4, 1024, 1024, 128)
    assert not L._use_pallas_dw_gw(small)           # no hint
    with L.dw_gw_step_rows(4 * 32 * 32):
        assert L._use_pallas_dw_gw(small)
        monkeypatch.setenv("UNCR_DW_GW", "0")
        assert not L._use_pallas_dw_gw(small)
    monkeypatch.setenv("UNCR_DW_GW", "1")
    assert L._use_pallas_dw_gw(large)


def test_dw_gw_hint_set_by_train_step(monkeypatch):
    """engine.make_train_step wraps every dispatch in the step-rows hint
    (B*T*H*W of the step input, per microbatch under accumulation)."""
    import jax
    from uncrtaints_tpu.models import layers as L
    from uncrtaints_tpu.train.engine import _with_dw_gw_hint

    seen = {}

    def fake_step(state, batch, rng):
        seen["rows"] = L._DW_GW_STEP_ROWS.get()
        return state, {}

    fake_step.lower = fake_step
    batch = {"x": jax.ShapeDtypeStruct((4, 3, 16, 16, 15), jnp.float32)}
    _with_dw_gw_hint(fake_step)(None, batch, None)
    assert seen["rows"] == 4 * 3 * 16 * 16
    _with_dw_gw_hint(fake_step, microbatches=2)(None, batch, None)
    assert seen["rows"] == 4 * 3 * 16 * 16 // 2
    assert L._DW_GW_STEP_ROWS.get() is None         # restored after dispatch


def test_dw_kernel_grad_sharded_batch_psum(rng):
    """Batch-sharded inputs over the 8-device mesh: the custom_partitioning
    rule runs the kernel per batch shard and psums the kernel-grad partials;
    numerics must match the unsharded kernel exactly (fp32 partials)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad_sharded
    from uncrtaints_tpu.parallel import make_mesh

    N, H, W, C, kh, kw = 8, 16, 16, 32, 3, 3
    pads = ((1, 1), (1, 1))
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    ref = dw_kernel_grad(x, g, pads, kh, kw)

    mesh = make_mesh(8)
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    gb = jax.device_put(g, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda a, b: dw_kernel_grad_sharded(a, b, pads, kh, kw))
    np.testing.assert_allclose(np.asarray(fn(xb, gb)), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # unsharded caller goes through the same wrapper unchanged
    np.testing.assert_allclose(np.asarray(fn(x, g)), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
