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
shifts (dx) are NOT free on TPU (Mosaic sublane rolls measured 26 GB/s in
ops/pallas_mbconv.py kernel B), so each dx gets its own HBM->VMEM DMA of a
column-offset window: kw reads of x + 1 read of g instead of the XLA
form's ~kh*kw reads of each.

Status: numerics verified in interpret mode (tests/test_pallas_dwgrad.py);
wired behind UNCR_DW_GW=1 in models/layers.py until measured on hardware
(tools/r3_sweep.py).
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
    def kernel(xp_hbm, g_ref, out_ref, xwin, sems):
        n = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * th
        # start ALL column-offset window DMAs up front; waits interleave
        # with the tap compute so later windows stream in behind dx=0
        dmas = []
        for dx in range(kw):
            dma = pltpu.make_async_copy(
                xp_hbm.at[n, pl.ds(row0, th + kh - 1), pl.ds(dx, W)],
                xwin.at[dx], sems.at[dx])
            dma.start()
            dmas.append(dma)
        g32 = g_ref[0].astype(jnp.float32)                 # [th, W, C]
        for dx in range(kw):
            dmas[dx].wait()
            for dy in range(kh):
                tap = xwin[dx, dy:dy + th].astype(jnp.float32)
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

    xp = jnp.pad(x, [(0, 0), (pt, pb), (pl_, pr), (0, 0)])

    th = min(tile_h, Ho)
    while Ho % th:
        th -= 1
    nt = Ho // th
    if interpret is None:
        interpret = _interpret_default()

    parts = pl.pallas_call(
        _mk_kernel(kh, kw, th, Wo, C, nt),
        grid=(N, nt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            # full padded x stays in HBM; the kernel DMAs column-offset
            # windows (kw strided reads instead of kh*kw full passes)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, th, Wo, C), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 16, C), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nt, 16, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kw, th + kh - 1, Wo, C), x.dtype),
            pltpu.SemaphoreType.DMA((kw,)),
        ],
    )(xp, g)
    gw = parts.sum(axis=(0, 1))[:kh * kw]                  # [kh*kw, C]
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
