"""Fused Pallas TPU kernel for att_group temporal aggregation.

The flagship aggregation (Compact_Temporal_Aggregator 'att_group',
/root/reference/model/src/backbones/uncrtaints.py:188-205) computes

    out[b,h,w,c] = sum_t attn[b,t,h,w, c // (C/heads)] * x[b,t,h,w,c]

i.e. a head-grouped attention-weighted temporal sum. Round-3 xplane profiles
of the XLA eval step showed this op costing ~2.0 ms of a 32.8 ms step at
B=8 256px: every XLA formulation tried either

  (a) splits the 128-lane channel dim ([...,heads,C/heads] head-split einsum
      -- two full-tensor relayout copies, 1.18 ms copy + 0.77 ms reduce), or
  (b) materializes the head-expanded attention to HBM (jnp.repeat fed to a
      0/1 block-indicator matmul: +200 MB write+read, 221 vs 232 seq/s).

This kernel does the expansion ON-CHIP: per [tile, heads] attention block it
builds the expanded [tile, C] weights with a 0/1 head-indicator matmul on
the MXU (a lane-dim *reshape* is an expensive Mosaic relayout; a matmul is
free -- same trick as ops/pallas_mbconv.py's group-stats), multiplies by the
feature tile and accumulates over T in an fp32 VMEM scratch. HBM traffic is
the roofline minimum: x and attn read once, out written once.

Numerics: products and the T-accumulation are fp32 (the XLA bf16 path
rounds per step); verified against the lane-layout reference form in
tests/test_pallas_aggregate.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    # pallas TPU kernels run in interpreter mode on non-TPU backends (tests)
    return jax.default_backend() != "tpu"


def _mk_kernel(T: int, heads: int, C: int):
    cg = C // heads

    def kernel(a_ref, x_ref, o_ref, acc_ref):
        t = pl.program_id(2)
        a32 = a_ref[0].astype(jnp.float32)               # [tile, heads]
        # head->channel expansion as a 0/1 indicator matmul (MXU): channel c
        # belongs to head c // (C/heads); a lane-dim reshape/repeat would be
        # a Mosaic relayout, the matmul is effectively free
        col_h = jax.lax.broadcasted_iota(jnp.int32, (heads, C), 1) // cg
        row_h = jax.lax.broadcasted_iota(jnp.int32, (heads, C), 0)
        sel = (col_h == row_h).astype(jnp.float32)       # [heads, C]
        # HIGHEST precision: the default MXU matmul rounds the f32 attention
        # to bf16 even though sel is an exact 0/1 matrix, which was the whole
        # source of the 4.8e-3 fwd error measured in round 3. Multi-pass f32
        # is ~free here (K=heads=16, the kernel is HBM-bound).
        ex = jnp.dot(a32, sel, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        term = ex * x_ref[0].astype(jnp.float32)         # [tile, C]

        @pl.when(t == 0)
        def _init():
            acc_ref[...] = term

        @pl.when(t > 0)
        def _acc():
            acc_ref[...] += term

        @pl.when(t == T - 1)
        def _emit():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    return kernel


def _pick_tile(rows: int, cap: int = 2048) -> int:
    """Largest divisor of ``rows`` that is <= cap and a multiple of 8
    (fp32 sublane); falls back to ``rows`` for tiny inputs."""
    if rows <= cap:
        return rows
    for tile in range(cap, 7, -8):
        if rows % tile == 0:
            return tile
    return rows


def _fwd_call(x: jax.Array, attn: jax.Array, tile: Optional[int],
              interpret: Optional[bool]) -> jax.Array:
    B, T, H, W, C = x.shape
    heads = attn.shape[-1]
    assert C % heads == 0, (C, heads)
    assert attn.shape[:4] == (B, T, H, W), (attn.shape, x.shape)

    rows = H * W
    xr = x.reshape(B * T, rows, C)
    ar = attn.reshape(B * T, rows, heads)
    if tile is None:
        tile = _pick_tile(rows)
    nt = rows // tile
    assert rows % tile == 0, (rows, tile)
    if interpret is None:
        interpret = _interpret_default()

    out = pl.pallas_call(
        _mk_kernel(T, heads, C),
        # t innermost: the output block (b, r) stays VMEM-resident across
        # the T accumulation steps
        grid=(B, nt, T),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, tile, heads), lambda b, r, t: (b * T + t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, r, t: (b * T + t, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, r, t: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, C), jnp.float32)],
    )(ar, xr)
    return out.reshape(B, H, W, C)


# --------------------------------------------------------------------- #
# Backward kernel: one pass over (b, r, t) producing BOTH gradients.
#   dx[b,t,r,c]    = expand(attn[b,t,r])[c] * g[b,r,c]
#   dattn[b,t,r,h] = sum_{c in head h} x[b,t,r,c] * g[b,r,c]
# The head contraction is sel^T on the MXU -- the transpose of the
# forward's expansion, so neither direction ever splits the lane dim.
# --------------------------------------------------------------------- #

def _mk_bwd_kernel(T: int, heads: int, C: int):
    cg = C // heads

    def kernel(a_ref, x_ref, g_ref, dx_ref, da_ref):
        a32 = a_ref[0].astype(jnp.float32)               # [tile, heads]
        g32 = g_ref[0].astype(jnp.float32)               # [tile, C]
        col_h = jax.lax.broadcasted_iota(jnp.int32, (heads, C), 1) // cg
        row_h = jax.lax.broadcasted_iota(jnp.int32, (heads, C), 0)
        sel = (col_h == row_h).astype(jnp.float32)       # [heads, C]
        # HIGHEST precision on both directions (see the forward kernel): the
        # 0/1 expansion is then exact, and the head contraction accumulates
        # xg in true f32 instead of bf16-rounded MXU passes
        ex = jnp.dot(a32, sel, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        dx_ref[0] = (ex * g32).astype(dx_ref.dtype)
        xg = x_ref[0].astype(jnp.float32) * g32          # [tile, C]
        da_ref[0] = jnp.dot(xg, sel.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(da_ref.dtype)       # [tile, heads]

    return kernel


def _bwd_call(x, attn, g, tile: Optional[int], interpret: Optional[bool]):
    B, T, H, W, C = x.shape
    heads = attn.shape[-1]
    rows = H * W
    xr = x.reshape(B * T, rows, C)
    ar = attn.reshape(B * T, rows, heads)
    gr = g.reshape(B, rows, C)
    if tile is None:
        tile = _pick_tile(rows)
    nt = rows // tile
    if interpret is None:
        interpret = _interpret_default()

    dx, da = pl.pallas_call(
        _mk_bwd_kernel(T, heads, C),
        grid=(B, nt, T),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, tile, heads), lambda b, r, t: (b * T + t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, r, t: (b * T + t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, r, t: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, r, t: (b * T + t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, heads), lambda b, r, t: (b * T + t, r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * T, rows, C), x.dtype),
            jax.ShapeDtypeStruct((B * T, rows, heads), attn.dtype),
        ),
    )(ar, xr, gr)
    return (dx.reshape(B, T, H, W, C), da.reshape(B, T, H, W, heads))


# --------------------------------------------------------------------- #
# GSPMD partitioning: pallas_call has no built-in partitioning rule, so a
# sharded caller (data mesh, or the data x spatial whole-scene mesh) would
# otherwise all-gather the operands. The op is row-pointwise over (b, h, w)
# -- each output row needs only its own rows of x/attn -- so those axes
# partition freely; t / c / heads must stay whole per shard (the kernel
# accumulates over the full T and expands the full head->channel map), so
# the partition callback forces them replicated and GSPMD reshards if
# needed.
# --------------------------------------------------------------------- #

def _norm_spec(sharding, rank):
    spec = list(sharding.spec)
    return spec + [None] * (rank - len(spec))


def _fwd_partition(mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P
    # custom_partitioning args are (attn, x) in _fwd_call's wrapped order;
    # x (arg_shapes[1]) is the 5-D [b, t, h, w, c] tensor we key shardings on
    xs = _norm_spec(arg_shapes[1].sharding, 5)
    b, h, w = xs[0], xs[2], xs[3]
    x_forced = NamedSharding(mesh, P(b, None, h, w, None))
    a_forced = NamedSharding(mesh, P(b, None, h, w, None))
    out_sh = NamedSharding(mesh, P(b, h, w, None))

    def impl(attn, x):
        return _fwd_call(x, attn, None, None)

    return mesh, impl, out_sh, (a_forced, x_forced)


_fwd_partitioned = custom_partitioning(
    lambda attn, x: _fwd_call(x, attn, None, None))
_fwd_partitioned.def_partition(
    partition=_fwd_partition,
    # t contracts on-chip; b/h/w shard; c/k stay whole (head-group map)
    sharding_rule="b t h w k, b t h w c -> b h w c")


def _bwd_partition(mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = _norm_spec(arg_shapes[1].sharding, 5)
    b, h, w = xs[0], xs[2], xs[3]
    sh5 = NamedSharding(mesh, P(b, None, h, w, None))
    g_sh = NamedSharding(mesh, P(b, h, w, None))

    def impl(attn, x, g):
        dx, da = _bwd_call(x, attn, g, None, None)
        return dx, da

    return mesh, impl, (sh5, sh5), (sh5, sh5, g_sh)


_bwd_partitioned = custom_partitioning(
    lambda attn, x, g: _bwd_call(x, attn, g, None, None))
_bwd_partitioned.def_partition(
    partition=_bwd_partition,
    sharding_rule="b t h w k, b t h w c, b h w c -> b t h w c, b t h w k")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def att_group_aggregate(x: jax.Array, attn: jax.Array,
                        tile: Optional[int] = None,
                        interpret: Optional[bool] = None) -> jax.Array:
    """Fused head-grouped attention aggregation over time.

    x: [B, T, H, W, C] features; attn: [B, T, H, W, heads] attention at
    feature resolution, already pad-masked / dropout-scaled. C % heads == 0.
    Returns [B, H, W, C] = sum_t expand_heads(attn[:, t]) * x[:, t].

    Differentiable: custom VJP runs a single fused backward kernel emitting
    both dx and dattn (the head contraction is the transpose indicator
    matmul, so the backward also never relayouts the lane dim).

    The default path (tile/interpret unset) goes through the
    custom_partitioning wrappers so sharded callers run the kernel
    per-shard; explicit tile/interpret take the raw single-shard path
    (tests, tuning).
    """
    if tile is None and interpret is None:
        return _fwd_partitioned(attn, x)
    return _fwd_call(x, attn, tile, interpret)


def _vjp_fwd(x, attn, tile, interpret):
    # (fwd receives args in the original order; bwd gets nondiff args first)
    if tile is None and interpret is None:
        return _fwd_partitioned(attn, x), (x, attn)
    return _fwd_call(x, attn, tile, interpret), (x, attn)


def _vjp_bwd(tile, interpret, res, g):
    x, attn = res
    if tile is None and interpret is None:
        return _bwd_partitioned(attn, x, g)
    return _bwd_call(x, attn, g, tile, interpret)


att_group_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
