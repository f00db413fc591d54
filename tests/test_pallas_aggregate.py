"""Numerics tests for the fused att_group aggregation kernel (interpret
mode on CPU; the same code compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.ops.pallas_aggregate import att_group_aggregate, _pick_tile


def _reference(x, attn):
    """The lane-layout XLA form the kernel replaces (aggregator.py)."""
    C, heads = x.shape[-1], attn.shape[-1]
    attn_c = jnp.repeat(attn, C // heads, axis=-1)
    return (attn_c.astype(jnp.float32) * x.astype(jnp.float32)).sum(axis=1)


def test_att_group_aggregate_fp32_exact(rng):
    B, T, H, W, C, heads = 2, 3, 8, 8, 128, 16
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    got = att_group_aggregate(x, a, interpret=True)
    ref = _reference(x, a)
    assert got.shape == (B, H, W, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_att_group_aggregate_bf16(rng):
    B, T, H, W, C, heads = 1, 4, 8, 16, 64, 16
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C))).astype(jnp.bfloat16)
    a = jnp.asarray(rng.random((B, T, H, W, heads))).astype(jnp.bfloat16)
    got = att_group_aggregate(x, a, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _reference(x, a)  # fp32 accumulation, like the kernel
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_att_group_aggregate_multi_tile(rng):
    # rows > tile so the grid actually iterates, T accumulation across tiles
    B, T, H, W, C, heads = 1, 3, 16, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    got = att_group_aggregate(x, a, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_reference(x, a)),
                               rtol=1e-6, atol=1e-6)


def test_pick_tile():
    assert _pick_tile(256 * 256) == 2048
    assert _pick_tile(64) == 64          # tiny input: single block
    assert _pick_tile(40 * 40) == 1600   # divisor, multiple of 8, <= 2048


def test_aggregator_eval_dispatches_to_kernel(rng, monkeypatch):
    """On a TPU backend the att_group eval path must route through the
    fused kernel and produce the same values as the XLA repeat form."""
    import jax as _jax
    from uncrtaints_tpu.models import aggregator as agg_mod

    B, T, H, W, C, heads = 1, 3, 8, 8, 64, 16
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    a = a / a.sum(axis=1, keepdims=True)

    agg = agg_mod.TemporalAggregator(mode="att_group")
    av = agg.init(jax.random.PRNGKey(0), x, attn_mask=a)
    baseline = agg.apply(av, x, attn_mask=a)   # CPU backend: repeat form

    calls = []

    def spy(x_, attn_, **kw):
        calls.append(1)
        return att_group_aggregate(x_, attn_, interpret=True)

    monkeypatch.setattr(agg_mod, "att_group_aggregate", spy)
    monkeypatch.setattr(agg_mod.jax, "default_backend", lambda: "tpu")

    # the kernel is opt-in (it lost the round-3 on-chip A/B): without
    # UNCR_AGG_KERNEL=1 even a TPU backend stays on the XLA repeat form
    agg.apply(av, x, attn_mask=a)
    assert not calls, "kernel dispatched without UNCR_AGG_KERNEL=1"

    monkeypatch.setenv("UNCR_AGG_KERNEL", "1")
    fused = agg.apply(av, x, attn_mask=a)
    assert calls, "eval path did not dispatch to the fused kernel"
    np.testing.assert_allclose(np.asarray(fused), np.asarray(baseline),
                               rtol=1e-5, atol=1e-6)

    # train path must NOT use the kernel by default (A/B pending)
    calls.clear()
    agg.apply(av, x, attn_mask=a, train=True,
              rngs={"dropout": jax.random.PRNGKey(1)})
    assert not calls
    monkeypatch.setenv("UNCR_AGG_TRAIN", "1")
    agg.apply(av, x, attn_mask=a, train=True,
              rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls

    # explicit off switch wins even with the opt-in previously set
    calls.clear()
    monkeypatch.setenv("UNCR_AGG_KERNEL", "0")
    agg.apply(av, x, attn_mask=a)
    assert not calls


def test_att_group_aggregate_grad_parity(rng):
    """Custom VJP (fused backward kernel) vs jax.grad of the reference
    lane-layout form -- both fp32, must agree to float tolerance."""
    B, T, H, W, C, heads = 2, 3, 8, 8, 64, 8
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    def loss_kernel(x_, a_):
        return (att_group_aggregate(x_, a_, None, True) * g).sum()

    def loss_ref(x_, a_):
        return (_reference(x_, a_) * g).sum()

    dx_k, da_k = jax.grad(loss_kernel, argnums=(0, 1))(x, a)
    dx_r, da_r = jax.grad(loss_ref, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da_k), np.asarray(da_r),
                               rtol=1e-5, atol=1e-5)


def test_att_group_aggregate_grad_multi_tile(rng):
    B, T, H, W, C, heads = 1, 2, 16, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))

    def loss_kernel(x_, a_):
        return att_group_aggregate(x_, a_, 64, True).sum()

    def loss_ref(x_, a_):
        return _reference(x_, a_).sum()

    dx_k, da_k = jax.grad(loss_kernel, argnums=(0, 1))(x, a)
    dx_r, da_r = jax.grad(loss_ref, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da_k), np.asarray(da_r),
                               rtol=1e-5, atol=1e-5)


def test_default_path_single_device(rng):
    """Default call (no tile/interpret) routes through the partitioned
    wrapper; on one device it must equal the reference form."""
    B, T, H, W, C, heads = 1, 3, 8, 8, 64, 16
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    got = jax.jit(att_group_aggregate)(x, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_reference(x, a)),
                               rtol=1e-6, atol=1e-6)


def test_sharded_execution_per_shard(rng):
    """Batch- and H-sharded inputs over the 8-device mesh: the
    custom_partitioning rule runs the kernel per shard; numerics must match
    the unsharded reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uncrtaints_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    B, T, H, W, C, heads = 8, 3, 16, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    ref = np.asarray(_reference(x, a))

    # batch sharding
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    ab = jax.device_put(a, NamedSharding(mesh, P("data")))
    got = jax.jit(att_group_aggregate)(xb, ab)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)

    # spatial sharding on H (axis 2)
    xh = jax.device_put(x, NamedSharding(mesh, P(None, None, "data")))
    ah = jax.device_put(a, NamedSharding(mesh, P(None, None, "data")))
    got = jax.jit(att_group_aggregate)(xh, ah)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)


def test_sharded_grad_through_custom_vjp(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uncrtaints_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    B, T, H, W, C, heads = 8, 2, 8, 8, 32, 4
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    a = jnp.asarray(rng.random((B, T, H, W, heads)).astype(np.float32))
    dx_r, da_r = jax.grad(lambda x_, a_: _reference(x_, a_).sum(),
                          argnums=(0, 1))(x, a)

    sh = NamedSharding(mesh, P("data"))
    xb, ab = jax.device_put(x, sh), jax.device_put(a, sh)
    dx, da = jax.jit(jax.grad(lambda x_, a_: att_group_aggregate(x_, a_).sum(),
                              argnums=(0, 1)))(xb, ab)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_r),
                               rtol=1e-5, atol=1e-5)
