"""Single-pass depthwise-conv kernel gradient (Pallas TPU).

The hand-written dw-conv VJP in models/layers.py computes the kernel grad
as kh*kw shifted multiply-reduce taps over the full activation tensors.
XLA fuses a few taps per pass but still re-reads x and g several times: the
round-3 train xplane shows ~40 ms/step of per-channel reduction fusions at
B=4 256px (bf16[256]-output fusions at 2.4-8.6 ms each). Roofline for the
whole gradient is ONE read of x and g (~0.8 GB at B=4, ~1 ms).

This kernel computes all kh*kw taps in (close to) one pass:

    gw[dy,dx,c] = sum_{n,h,w} xp[n, h+dy, w+dx, c] * g[n, h, w, c]

Row shifts (dy) are free (major-dim slices of a VMEM window). Column
shifts (dx) happen as in-VMEM value slices of one full-width window per
block: ONE read of x + 1 read of g from HBM. (The earlier design issued a
column-offset HBM->VMEM DMA per dx, but Mosaic requires DMA slices to be
aligned to the (8,128) tiling on the two minor dims -- dx=1/2 offsets and
C<128 slices are rejected on real v5e -- so the shift cost moved to the
sublane relayout of the VMEM slice, bounded by VMEM bandwidth.)

Roofline caveat: when C is not a multiple of 128 the jnp.pad below
materializes channel-padded copies of x (and g) in HBM, so actual traffic
is ~2*(C128/C) reads of x + g plus the pad writes, not the one-read ideal
-- e.g. C=64 pays ~2x. The model's dw convs run at C=128/256 where the
pad is a no-op; skip this kernel (or tile channels) for small-C callers.

Status: ON BY DEFAULT for small-batch TPU callers via the shape-aware
dispatch in models/layers.py (_use_pallas_dw_gw; UNCR_DW_GW=1/0 forces).
Round-4 on-chip whole-step A/B (tools/sweep.py, v5e, 256px t=3): train
B=4 26.28 -> 35.72 seq/s (+36%, the paper-recipe batch); train B=8
39.75 -> 36.39 (loses — XLA's tap fusions win once batch amortizes the
re-reads), hence the N*H*W <= 2^20 auto threshold. Numerics verified in
interpret mode (tests/test_pallas_dwgrad.py) and the train-loss A/B on
chip (tools/r3_kernel_probe.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning


def _interpret_default():
    return jax.default_backend() != "tpu"


def _mk_kernel(kh: int, kw: int, th: int, W: int, C: int, nt: int):
    def kernel(xp_hbm, g_ref, out_ref, xwin, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * th
        # ONE full-width window DMA per block. Column-offset DMAs (a
        # pl.ds(dx, W) slice of the W dim, and any C slice when C < 128)
        # are rejected by Mosaic -- HBM->VMEM copies must be aligned to
        # the (8,128) tiling on the two minor dims (measured on v5e:
        # "Slice shape along dimension 3 must be aligned to tiling").
        # The dx shifts happen below as in-VMEM value slices instead,
        # which Mosaic lowers with a sublane relayout.
        dma = pltpu.make_async_copy(
            xp_hbm.at[n, pl.ds(row0, th + kh - 1)], xwin, sem)
        dma.start()
        g32 = g_ref[0].astype(jnp.float32)                 # [th, W, C]
        dma.wait()
        for dy in range(kh):
            for dx in range(kw):
                tap = xwin[dy:dy + th, dx:dx + W].astype(jnp.float32)
                part = (tap * g32).sum(axis=(0, 1))         # [C]
                out_ref[0, 0, dy * kw + dx] = part

    return kernel


def dw_kernel_grad(x: jax.Array, g: jax.Array,
                   pads: Tuple[Tuple[int, int], Tuple[int, int]],
                   kh: int, kw: int, tile_h: int = 32,
                   interpret: Optional[bool] = None) -> jax.Array:
    """All-taps depthwise kernel gradient.

    x [N,H,W,C] (unpadded input of the primal conv), g [N,Ho,Wo,C] (output
    cotangent), pads the primal conv's ((top,bottom),(left,right)) padding.
    Returns gw [kh, kw, 1, C] in fp32 (cast at the call site).
    Requires stride 1 (the only stride the model uses).
    """
    N, H, W, C = x.shape
    # the output BlockSpec holds the kh*kw taps in a fixed 16-row block
    assert kh * kw <= 16, f"kernel {kh}x{kw} exceeds the 16-tap output block"
    (pt, pb), (pl_, pr) = pads
    Ho, Wo = H + pt + pb - kh + 1, W + pl_ + pr - kw + 1
    assert g.shape == (N, Ho, Wo, C), (g.shape, (N, Ho, Wo, C))

    # Mosaic DMA windows must be aligned to the (8,128) tiling on the two
    # minor dims: pad the x width to a multiple of 8 and the channel dim
    # to a multiple of 128 so the per-block window DMA slices only the
    # (untiled) row dim. The zero columns beyond Wp are never read by any
    # tap (dx + Wo <= Wp); zero channels fall off the final slice.
    Wp = W + pl_ + pr
    W8 = -(-Wp // 8) * 8
    C128 = -(-C // 128) * 128
    xp = jnp.pad(x, [(0, 0), (pt, pb), (pl_, pr + (W8 - Wp)),
                     (0, C128 - C)])
    gp = jnp.pad(g, [(0, 0), (0, 0), (0, 0), (0, C128 - C)]) \
        if C128 != C else g

    th = min(tile_h, Ho)
    while Ho % th:
        th -= 1
    nt = Ho // th
    if interpret is None:
        interpret = _interpret_default()

    parts = pl.pallas_call(
        _mk_kernel(kh, kw, th, Wo, C128, nt),
        grid=(N, nt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            # full padded x stays in HBM; the kernel DMAs one aligned
            # full-width window per block (dx shifts are VMEM slices)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, th, Wo, C128), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 16, C128), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nt, 16, C128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + kh - 1, W8, C128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, gp)
    gw = parts.sum(axis=(0, 1))[:kh * kw, :C]              # [kh*kw, C]
    return gw.reshape(kh, kw, 1, C)


# --------------------------------------------------------------------- #
# GSPMD partitioning: the kernel gradient is a full reduction over batch
# and space, so under a sharded caller (data-parallel train step) each
# device can run the kernel on its own batch shard and psum the [kh,kw,1,C]
# partials over the batch mesh axes — the same pattern a plain XLA reduce
# would produce, but keeping the single-pass kernel per shard. Spatial
# shards would need kh-1 halo rows of x across shard boundaries, which the
# kernel does not fetch, so H/W are forced gathered (gradients never run on
# the spatially-sharded whole-scene inference path anyway).
# --------------------------------------------------------------------- #

def _norm_spec(sharding, rank):
    spec = list(sharding.spec)
    return spec + [None] * (rank - len(spec))


@functools.lru_cache(maxsize=None)
def _partitioned(pads: Tuple[Tuple[int, int], Tuple[int, int]],
                 kh: int, kw: int):
    def raw(x, g):
        return dw_kernel_grad(x, g, pads, kh, kw)

    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P
        b = _norm_spec(arg_shapes[0].sharding, 4)[0]
        in_sh = NamedSharding(mesh, P(b, None, None, None))
        out_sh = NamedSharding(mesh, P())  # gw replicated after the psum

        def impl(x, g):
            gw = dw_kernel_grad(x, g, pads, kh, kw)
            if b is not None:
                axes = b if isinstance(b, tuple) else (b,)
                gw = jax.lax.psum(gw, axes)
            return gw

        return mesh, impl, out_sh, (in_sh, in_sh)

    p = custom_partitioning(raw)
    p.def_partition(
        partition=partition,
        # n (batch) contracts across shards via the psum in impl; the
        # padded-x spatial dims (h, w) and the cotangent's (i, j) are
        # distinct sizes; output dims (kh, kw, 1) are fresh factors
        sharding_rule="n h w c, n i j c -> y z u c")
    return p


def dw_kernel_grad_sharded(x: jax.Array, g: jax.Array,
                           pads: Tuple[Tuple[int, int], Tuple[int, int]],
                           kh: int, kw: int) -> jax.Array:
    """dw_kernel_grad with a GSPMD partitioning rule: batch-sharded callers
    run the kernel per shard and psum the kernel-gradient partials instead
    of all-gathering the full activations. Single-device callers hit the
    raw kernel unchanged."""
    return _partitioned(pads, kh, kw)(x, g)
