"""Single-pass depthwise 3x3 stride-1 stencil (Pallas TPU).

The hand-written dw-conv VJP in models/layers.py expresses both the
differentiated forward and the input gradient as a 9-tap shift-add
(_dw_shift_add: pad + 9 shifted FMAs) so that no convolution op constrains
XLA's layout assignment. That was a huge win over XLA's conv-grad lowering
(+313 ms/step pathology, layers.py), but the round-4 B=4 train xplane
shows XLA's kLoop for the stencil itself re-reads the input once PER TAP
instead of reusing the halo through on-chip memory:

    add_convert_fusion.1 (in_block0 fwd stencil, bf16[12,256,256,256]):
    5.5 ms/step, which matches 9 HBM reads + 1 write (~4 GB) almost
    exactly; the one-read roofline is ~1 ms. The five decoder forward
    stencils (1.84 ms each at [4,256,256,256]) and the gx stencils fused
    into the norm-backward reduce kLoops (fusion.1606: 7.1 ms vs its
    stencil-free twin at 1.9 ms) show the same multiplier.

This kernel computes all kh*kw taps from ONE HBM read of x per block,
exactly like ops/pallas_dwgrad.py does for the kernel gradient: one
full-width row-tile window (+halo rows) is DMA'd to VMEM, row shifts are
major-dim slices, column shifts are in-VMEM value slices (Mosaic rejects
column-offset HBM DMAs; the relayout cost is bounded by VMEM bandwidth),
accumulation is fp32 in the same tap order as _dw_shift_add (bit-identical
results).

STATUS — measured on v5e, round 4: OPT-IN, OFF BY DEFAULT
(UNCR_DW_STENCIL=1 forces, with UNCR_DW_STENCIL_SITES=fwd|gx windows;
models/layers.py _use_pallas_dw_stencil). The one-read premise turned out
to be the wrong diagnosis: in ISOLATION at the encoder shape
(bf16[12,256,256,256]) the kernel measures 6.8 ms vs XLA's shift-add at
6.4 ms — i.e. XLA's fusion does NOT pay 9 HBM reads; both forms are
bounded by the in-VMEM sublane relayouts of the dx (width) shifts, which
this kernel pays identically (Mosaic rejects column-offset HBM DMAs, so
the shifts must happen as VMEM value slices either way). In the train
step the kernel then LOSES outright — B=4 35.68 -> 32.13 seq/s, B=8
39.78 -> 33.17 (tools/env_ab.py) — because the custom-call boundary also
evicts the elementwise neighbours (bias, GELU, norm recompute) that ride
the XLA stencil loop for free. Numerics are bit-identical to
_dw_shift_add on hardware (fp32 acc, same tap order; verified at the
production shape). Kept as a documented experiment: the isolation
measurement is the evidence that the XLA stencil is already at the
hardware's relayout bound, so future work should attack the W-shift
relayout itself (e.g. lane-major windows), not HBM traffic.

The EVAL primal keeps lax.conv (XLA's dw-conv emitter is fastest when no
grad graph constrains layouts).

Reference being replaced: the torch depthwise convs inside the MBConv
blocks, /root/reference/model/src/backbones/uncrtaints.py:60-146 (their
CUDA lowering is cuDNN's; this is the TPU-native equivalent).
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


def _mk_kernel(kh: int, kw: int, th: int, Wo: int, C: int):
    def kernel(xp_hbm, w_ref, out_ref, xwin, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * th
        # ONE aligned full-width window DMA per block (see pallas_dwgrad:
        # Mosaic requires HBM->VMEM slices aligned to the (8,128) tiling
        # on the two minor dims, so dx shifts happen as VMEM slices below).
        dma = pltpu.make_async_copy(
            xp_hbm.at[n, pl.ds(row0, th + kh - 1)], xwin, sem)
        dma.start()
        w32 = w_ref[:].astype(jnp.float32)              # [kh*kw, C]
        dma.wait()
        acc = jnp.zeros((th, Wo, C), jnp.float32)
        for dy in range(kh):
            for dx in range(kw):
                tap = xwin[dy:dy + th, dx:dx + Wo].astype(jnp.float32)
                acc = acc + tap * w32[dy * kw + dx]
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


def dw_stencil(x: jax.Array, w: jax.Array,
               pads: Tuple[Tuple[int, int], Tuple[int, int]],
               tile_h: int = 32,
               interpret: Optional[bool] = None) -> jax.Array:
    """Depthwise stride-1 conv as a one-read Pallas stencil.

    x [N,H,W,C]; w [kh,kw,1,C]; pads ((top,bottom),(left,right)) zero
    padding of the correlation. Returns [N,Ho,Wo,C] in x.dtype with fp32
    accumulation (bit-identical tap order to layers._dw_shift_add).
    """
    N, H, W, C = x.shape
    kh, kw = w.shape[0], w.shape[1]
    (pt, pb), (pl_, pr) = pads
    Ho, Wo = H + pt + pb - kh + 1, W + pl_ + pr - kw + 1

    # Alignment: pad x's width so every dx tap stays in-bounds and the DMA
    # window's minor dims are (8,128)-tiled; pad C to the lane width. The
    # channel pad costs extra HBM traffic when C % 128 != 0 (the dispatch
    # policy in models/layers.py requires aligned C).
    Wp = W + pl_ + pr
    W8 = max(-(-Wp // 8) * 8, Wo + kw - 1)
    C128 = -(-C // 128) * 128
    xp = jnp.pad(x, [(0, 0), (pt, pb), (pl_, pr + (W8 - Wp)),
                     (0, C128 - C)])
    wf = w.reshape(kh * kw, C)
    if C128 != C:
        wf = jnp.pad(wf, [(0, 0), (0, C128 - C)])

    th = min(tile_h, Ho)
    while Ho % th:
        th -= 1
    nt = Ho // th
    if interpret is None:
        interpret = _interpret_default()

    out = pl.pallas_call(
        _mk_kernel(kh, kw, th, Wo, C128),
        grid=(N, nt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded x stays in HBM
            pl.BlockSpec((kh * kw, C128), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, Wo, C128), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, C128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + kh - 1, W8, C128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wf)
    return out[..., :C] if C128 != C else out


# --------------------------------------------------------------------- #
# GSPMD partitioning: the stencil is independent per batch element, so a
# batch-sharded caller (data-parallel train step) runs the kernel on its
# own shard; the output inherits the batch sharding — no collective at
# all. Spatial shards would need kh-1 halo rows across shard boundaries,
# which the kernel does not fetch, so H/W are forced gathered (same rule
# as pallas_dwgrad; gradients never run on the spatially-sharded
# whole-scene inference path anyway).
# --------------------------------------------------------------------- #

def _norm_spec(sharding, rank):
    spec = list(sharding.spec)
    return spec + [None] * (rank - len(spec))


@functools.lru_cache(maxsize=None)
def _partitioned(pads: Tuple[Tuple[int, int], Tuple[int, int]]):
    def raw(x, w):
        return dw_stencil(x, w, pads)

    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P
        b = _norm_spec(arg_shapes[0].sharding, 4)[0]
        x_sh = NamedSharding(mesh, P(b, None, None, None))
        w_sh = NamedSharding(mesh, P())                 # weights replicated
        out_sh = NamedSharding(mesh, P(b, None, None, None))

        def impl(x, w):
            return dw_stencil(x, w, pads)

        return mesh, impl, out_sh, (x_sh, w_sh)

    p = custom_partitioning(raw)
    p.def_partition(
        partition=partition,
        # batch n propagates input->output; spatial dims are distinct
        # factors (sizes differ under VALID/FULL pads); w dims are fresh
        sharding_rule="n h w c, p q u c -> n i j c")
    return p


def dw_stencil_sharded(x: jax.Array, w: jax.Array,
                       pads: Tuple[Tuple[int, int], Tuple[int, int]]
                       ) -> jax.Array:
    """dw_stencil with a GSPMD partitioning rule: batch-sharded callers run
    the kernel per shard with the output staying batch-sharded (no
    collectives). Single-device callers hit the raw kernel unchanged."""
    return _partitioned(pads)(x, w)
