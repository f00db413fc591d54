"""Fused Pallas TPU kernels for the MBConv hot path.

Measured on v5e, XLA materializes every intermediate around the convolutions
and reductions of an MBConv block (~5 GB HBM traffic per 8-frame block --
within 5% of the zero-fusion roofline model). These kernels fuse the
normalize/GELU/SE elementwise stages into the matmuls and the depthwise conv
so each activation tensor is read once and written once:

- :func:`norm_gelu_matmul`: per-(frame,group) normalization -> (optional)
  exact GELU -> (optional) per-frame SE channel scaling -> pointwise-conv
  GEMM on the MXU, emitting per-tile partial sums/sumsq of the OUTPUT so the
  next stage's group statistics come for free.
- :func:`norm_gelu_dwconv3x3`: normalization + GELU fused into a 3x3
  depthwise convolution with reflect-padding halo handling, also emitting
  output statistics partials.

Exact GELU needs erf, which the Pallas TPU lowering does not provide; we use
the Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7,
below bf16 resolution and well inside the 1e-3 parity budget).

STATUS (round 1, measured on v5e through the axon tunnel): kernel A
(norm->GEMM) beats the equivalent XLA segment 1.46x at production size
(3.6ms vs 5.3ms for the 24-frame pw1 stage). Kernel B (norm->gelu->dw3x3)
is NOT yet competitive -- Mosaic's sublane rotates on large fp32 buffers
dominate (26 GB/s effective vs XLA's 15.7ms segment); the fused serving
path (serve.py) is therefore experimental and OFF by default. Numerics of
both kernels are verified to 1 bf16 ulp in tests/test_pallas_kernels.py.

STATUS (round 2): a bf16 dw-kernel rewrite is blocked by the toolchain --
Mosaic rejects `tpu.dynamic_rotate` on bf16 vectors ("Rotate with non-32-bit
data: not implemented", measured 2026-08). The production eval path instead
reached its speed via XLA-level rewrites (eval-mode norm folding, pad-free
reflect convs, matmul bilinear resize in models/); this module remains a
quarantined experiment.

STATUS (round 3): the quarantined serving integration (serve.py, a hand-
fused inference forward chaining these kernels) was DELETED: it carried
~1.7e-2 RMSE numeric drift vs the flax forward, had no test coverage, and
the XLA-fused eval path it was meant to beat stayed faster. What remains
worth keeping from that experiment: (a) kernel A (norm->pw GEMM) is the
only fusion that beat XLA (1.46x on its segment) -- if Mosaic gains bf16
dynamic_rotate support, revisit kernel B and rebuild the serving chain
directly against models/blocks.py's eval-folded parameters; (b) the drift
came from the erf approximation + fp32 group-stat accumulation order, so
any revival must reuse jax.lax.erf and match flax's reduction order before
chasing speed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """A&S 7.1.26 rational erf approximation (fp32, |err|<=1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _norm_apply(x32, m, cf, scale, bias):
    """(x - m[c]) * coef[c] * scale[c] + bias[c]; all params [C]-expanded
    (group stats are broadcast to channels on the XLA side -- tiny tensors,
    and Mosaic lacks a sub-lane-vector repeat)."""
    return (x32 - m[None, :]) * cf[None, :] * scale[None, :] + bias[None, :]


# --------------------------------------------------------------------- #
# Kernel A: norm -> gelu? -> se? -> matmul (+ output stats partials)
# --------------------------------------------------------------------- #

def _mk_kernel_a(groups_in: int, groups_out: int, do_gelu: bool, do_se: bool,
                 do_out_affine: bool = False, do_out_gelu: bool = False,
                 do_stats: bool = True):
    def kernel(x_ref, mean_ref, coef_ref, scale_ref, bias_ref, w_ref, se_ref,
               oscale_ref, obias_ref, out_ref, psum_ref, psq_ref):
        n = pl.program_id(0)
        x32 = x_ref[0].astype(jnp.float32)          # [TP, C]
        h = _norm_apply(x32, mean_ref[n], coef_ref[n],
                        scale_ref[0], bias_ref[0])
        if do_gelu:
            h = _gelu_exact(h)
        if do_se:
            h = h * se_ref[n][None, :].astype(jnp.float32)
        out = jnp.dot(h.astype(jnp.bfloat16), w_ref[:],
                      preferred_element_type=jnp.float32)  # [TP, C2]
        if do_out_affine:
            out = out * oscale_ref[0][None, :] + obias_ref[0][None, :]
        if do_out_gelu:
            out = _gelu_exact(out)
        out_ref[0] = out.astype(out_ref.dtype)
        TP, C2 = out.shape
        if not do_stats:
            psum_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)
            psq_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)
            return
        # group sums via a 0/1 selection matmul: reshaping the lane dim
        # (C2 -> G x C2/G) is an expensive relayout in Mosaic, a matmul with
        # a [C2, 128] group-indicator is free on the MXU
        cg = C2 // groups_out
        col = jax.lax.broadcasted_iota(jnp.int32, (C2, 128), 1)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (C2, 128), 0) // cg
        sel = (col == row_g).astype(jnp.float32)       # [C2, 128]
        outq = out.astype(out_ref.dtype).astype(jnp.float32)
        csum = outq.sum(axis=0, keepdims=True)           # [1, C2]
        csq = jnp.square(outq).sum(axis=0, keepdims=True)
        ones8 = jnp.ones((8, 1), jnp.float32) / 8.0
        psum_ref[0, 0] = ones8 * jnp.dot(csum, sel,
                                         preferred_element_type=jnp.float32)
        psq_ref[0, 0] = ones8 * jnp.dot(csq, sel,
                                        preferred_element_type=jnp.float32)
    return kernel


def _interpret_default():
    # pallas TPU kernels run in interpreter mode on non-TPU backends (tests)
    return jax.default_backend() != "tpu"


def norm_gelu_matmul(x, mean, coef, scale, bias, w,
                     se: Optional[jax.Array] = None,
                     groups_in: int = 4, groups_out: int = 4,
                     do_gelu: bool = True, tile: int = 1024,
                     out_affine: Optional[Tuple[jax.Array, jax.Array]] = None,
                     out_gelu: bool = False, do_stats: bool = True,
                     interpret: Optional[bool] = None):
    """x [N,P,C] bf16; mean/coef [N,G_in] f32; scale/bias [C] f32;
    w [C,C2] bf16; se [N,C] or None.

    ``out_affine=(oscale, obias)`` ([C2] fp32 each) applies an epilogue
    per-channel affine to the fp32 GEMM output before the (optional)
    epilogue ``out_gelu`` and the cast -- this is how an eval-mode BatchNorm
    AFTER the pointwise conv fuses into the same kernel. ``do_stats=False``
    skips the group-stats side outputs (they return zeros).

    Returns (out [N,P,C2] bf16, sum [N,G_out] f32, sumsq [N,G_out] f32)."""
    N, P, C = x.shape
    C2 = w.shape[1]
    tile = min(tile, P)
    nt = P // tile
    assert P % tile == 0

    se_arr = se if se is not None else jnp.ones((N, C), jnp.float32)
    mean = jnp.repeat(mean, C // groups_in, axis=-1)   # [N, C]
    coef = jnp.repeat(coef, C // groups_in, axis=-1)
    if out_affine is not None:
        oscale, obias = out_affine
        oscale = oscale.astype(jnp.float32)[None]
        obias = obias.astype(jnp.float32)[None]
    else:
        oscale = jnp.ones((1, C2), jnp.float32)
        obias = jnp.zeros((1, C2), jnp.float32)
    kernel = _mk_kernel_a(groups_in, groups_out, do_gelu, se is not None,
                          do_out_affine=out_affine is not None,
                          do_out_gelu=out_gelu, do_stats=do_stats)

    if interpret is None:
        interpret = _interpret_default()
    out, psum, psq = pl.pallas_call(
        kernel,
        grid=(N, nt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mean [N, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # coef [N, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w [C, C2]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # se [N, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # oscale [1, C2]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # obias [1, C2]
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C2), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, P, C2), x.dtype),
            jax.ShapeDtypeStruct((N, nt, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, nt, 8, 128), jnp.float32),
        ),
    )(x, mean, coef, scale[None], bias[None], w, se_arr, oscale, obias)
    return (out, psum.sum(axis=(1, 2))[:, :groups_out],
            psq.sum(axis=(1, 2))[:, :groups_out])


# --------------------------------------------------------------------- #
# Kernel B: norm -> gelu -> depthwise 3x3 (reflect) (+ output stats)
# --------------------------------------------------------------------- #

def _mk_kernel_b(groups_in: int, groups_out: int):
    def kernel(x_ref, mean_ref, coef_ref, scale_ref, bias_ref, w_ref,
               out_ref, psum_ref, psq_ref):
        n = pl.program_id(0)
        xb = x_ref[0, 0].astype(jnp.float32)         # [tile_h+2, W+8, C]
        TH2, W2, C = xb.shape
        W = W2 - 8
        mb = mean_ref[n][None, None, :]
        cb = coef_ref[n][None, None, :]
        scl = scale_ref[0][None, None, :]
        bs = bias_ref[0][None, None, :]

        w9 = w_ref[:].astype(jnp.float32)            # [9, C] (row-padded 16)
        th = TH2 - 2
        hg = _gelu_exact((xb - mb) * cb * scl + bs)  # fp32 [TH2, W+8, C]
        acc = jnp.zeros((th, W, C), jnp.float32)
        for dx in range(3):
            # Mosaic can only rotate 32-bit data and only slice sublanes at
            # tile-aligned offsets: roll once per dx, slice at offset 0
            hs = pltpu.roll(hg, W2 - dx, 1)[:, :W, :] if dx else hg[:, :W, :]
            for dy in range(3):
                acc = acc + hs[dy:dy + th] * w9[dy * 3 + dx][None, None, :]
        out_ref[0] = acc.astype(out_ref.dtype)

        accq = out_ref[0].astype(jnp.float32)
        cgo = C // groups_out
        col = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0) // cgo
        sel = (col == row_g).astype(jnp.float32)
        csum = accq.sum(axis=(0, 1))[None, :]
        csq = jnp.square(accq).sum(axis=(0, 1))[None, :]
        ones8 = jnp.ones((8, 1), jnp.float32) / 8.0
        psum_ref[0, 0] = ones8 * jnp.dot(csum, sel,
                                         preferred_element_type=jnp.float32)
        psq_ref[0, 0] = ones8 * jnp.dot(csq, sel,
                                        preferred_element_type=jnp.float32)
    return kernel


def norm_gelu_dwconv3x3(x, mean, coef, scale, bias, w,
                        groups_in: int = 4, groups_out: int = 4,
                        tile_h: int = 32, interpret: Optional[bool] = None):
    """dw3x3(gelu(norm(x))) with reflect padding, fused.

    x [N,H,W,C] bf16; w [3,3,C]; mean/coef [N,G] fp32; scale/bias [C].
    Returns (out [N,H,W,C] bf16, sum [N,G_out], sumsq [N,G_out]).

    Halo handling: rows are pre-arranged into non-overlapping
    [nt, tile_h+2, W, C] slabs on the XLA side (one cheap gather fused into
    the copy), with the global reflect at the image borders baked into the
    row indices; columns reflect inside the kernel."""
    N, H, W, C = x.shape
    assert H % tile_h == 0
    nt = H // tile_h
    mean = jnp.repeat(mean, C // groups_in, axis=-1)   # [N, C]
    coef = jnp.repeat(coef, C // groups_in, axis=-1)
    w9 = jnp.pad(w.reshape(9, C).astype(jnp.float32), [(0, 7), (0, 0)])

    # row layout: for tile t, rows (t*tile_h - 1 .. t*tile_h + tile_h) with
    # reflect at the borders (row -1 -> 1, row H -> H-2)
    base = np.arange(-1, tile_h + 1)[None, :] + \
        (np.arange(nt) * tile_h)[:, None]           # [nt, tile_h+2]
    base = np.where(base < 0, -base, base)
    base = np.where(base >= H, 2 * H - 2 - base, base)
    xh = jnp.take(x, jnp.asarray(base.reshape(-1)), axis=1)
    xh = xh.reshape(N, nt, tile_h + 2, W, C)
    # reflect columns on the host graph too; pad to W+8 so the kernel's
    # sublane dimension stays a multiple of 8 (Mosaic tiling requirement)
    col = np.clip(np.arange(-1, W + 7), None, W - 1)
    col[0] = 1
    col[W + 1] = W - 2  # true reflect position; cols W+2.. are dead padding
    xh = jnp.take(xh, jnp.asarray(col), axis=3)      # [N, nt, th+2, W+8, C]

    if interpret is None:
        interpret = _interpret_default()
    kernel = _mk_kernel_b(groups_in, groups_out)
    out, psum, psq = pl.pallas_call(
        kernel,
        grid=(N, nt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, 1, tile_h + 2, W + 8, C),
                         lambda n, t: (n, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mean [N, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # coef [N, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w9 [16, C]
        ],
        out_specs=(
            pl.BlockSpec((1, tile_h, W, C), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((N, nt, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, nt, 8, 128), jnp.float32),
        ),
    )(xh, mean, coef, scale[None], bias[None], w9)
    return (out, psum.sum(axis=(1, 2))[:, :groups_out],
            psq.sum(axis=(1, 2))[:, :groups_out])
