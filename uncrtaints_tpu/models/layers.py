"""Shared layers: convolutions, norms, temporal folding, init parity.

Re-designs of /root/reference/model/src/backbones/utae.py:409-565 (ConvLayer/
ConvBlock/TemporallySharedBlock/get_norm_layer) for NHWC TPU layouts.

Parameter-init parity with the reference's post-construction
``model.netG.apply(weight_init)`` pass
(/root/reference/model/src/learning/weight_init.py):
conv/linear kernels xavier-normal, conv/linear biases N(0,1), BatchNorm scale
N(0,1) / bias 0, GroupNorm default (scale 1, bias 0), InstanceNorm unaffine.

Temporal-padding semantics: the reference's ``smart_forward`` dynamically
filters all-pad frames out of the conv batch (utae.py:422-450) -- a
dynamic-shape pattern XLA cannot compile. We instead run dense compute on
every frame and overwrite pad frames with ``pad_value`` afterwards, which is
mathematically identical for the per-sample norms used on the temporal path
(group/instance) and keeps shapes static.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# --- init parity (weight_init.py) ---
conv_kernel_init = nn.initializers.xavier_normal()
dense_kernel_init = nn.initializers.xavier_normal()
bias_normal_init = nn.initializers.normal(stddev=1.0)
bn_scale_init = nn.initializers.normal(stddev=1.0)
# Conv1d in the reference gets plain N(0,1) weights (weight_init.py:13-16);
# used for the LTAE in-projection.
conv1d_kernel_init = nn.initializers.normal(stddev=1.0)


def _dw_shift_add(x, w, pads):
    """Depthwise stride-1 conv as pad + shifted FMAs (fp32 accumulation).

    Bit-identical to lax.conv's fp32-accumulated result (verified), but
    expressed as pure elementwise/data ops: no convolution op means no
    channel-major layout preference for XLA's layout assignment to
    propagate, and the whole stencil fuses with neighbouring elementwise
    stages. In grad graphs XLA lowers depthwise convolutions through a
    channel-major space-to-depth form that materializes multi-GB relayout
    copies (profiled: ~14 ms per decoder block at B=4 256px)."""
    N, H, W, C = x.shape
    kh, kw = w.shape[0], w.shape[1]
    (pt, pb), (pl_, pr) = pads
    xp = jnp.pad(x, [(0, 0), (pt, pb), (pl_, pr), (0, 0)])
    Ho, Wo = H + pt + pb - kh + 1, W + pl_ + pr - kw + 1
    w32 = w.astype(jnp.float32)
    acc = jnp.zeros((N, Ho, Wo, C), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(xp, (0, dy, dx, 0), (N, dy + Ho, dx + Wo, C))
            acc = acc + tap.astype(jnp.float32) * w32[dy, dx, 0]
    return acc.astype(x.dtype)


@jax.custom_vjp
def _dw_conv_same(x, w):
    """Depthwise kxk stride-1 zero-SAME conv with a hand-written VJP.

    XLA's default depthwise kernel-gradient (a batch_group_count
    convolution) is pathological on TPU: measured +313 ms of a 405 ms train
    step at B=4 256px. The custom backward computes the input grad as the
    spatially-flipped depthwise conv and the kernel grad as k*k shifted
    multiply-reduces (fusible elementwise + reduction, fp32 accumulation).

    In the UNDIFFERENTIATED (eval) path the primal body keeps lax.conv --
    XLA's dw-conv emitter is fastest when no grad graph constrains layouts.
    Under differentiation the VJP forward rule computes the bit-identical
    shift-add form instead, so the grad graph contains no convolution ops
    at all (see _dw_shift_add).

    x [N,H,W,C]; w [kh,kw,1,C]."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _dw_conv_same_fwd(x, w):
    out = _dw_stencil_or_shift(
        x, w, ((w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2))
    return out, (x, w)


# Auto-dispatch policy for the Pallas dw kernel-grad. Set from the round-4
# on-chip whole-step A/Bs (tools/sweep.py + tools/r4_dwband{,2,3}.py, v5e,
# 256px t=3) over the call-site census (tools/probe_dwshapes.py: one
# temporally-merged encoder conv at rows=B*t*256^2, five decoder convs at
# rows=B*256^2, 24 tiny border-strip convs). The per-site attribution arms
# showed the win/loss is NOT a per-conv-shape property:
#   - at the small train step (B=4: step rows 786k) the kernel lifts the
#     step 26.28 -> 35.7 seq/s (+36%), and nearly ALL of that is the tiny
#     border-strip sites (strips-only 35.67 ~= strips+encoder 35.74 ~=
#     all-on 35.72): their XLA tap form emits ~40 ms of badly-overlapped
#     multiply+reduce fusions that an under-occupied step cannot hide,
#     while the big-conv kernels are ~neutral there (encoder-only 31.48,
#     encoder+decoder-no-strips 29.95);
#   - at the large step (B=8: 1.57M rows) EVERY engagement pattern loses
#     against all-off 39.78 (forced-on 36.39, decoder-only 32.05,
#     strips-only 36.78, strips+decoder 36.45): with enough batch
#     parallelism the tap reductions overlap fine, and the kernels'
#     fixed per-dispatch relayout overhead (24 strip sites) turns net
#     negative.
# A per-conv window cannot express that (the strip shapes barely change
# with B), so auto mode gates on the STEP's total activation rows
# (B*T*H*W of the step input), provided by the engine around each step
# dispatch via dw_gw_step_rows(); within an engaged step the per-site env
# window [MIN, MAX] (defaults: everything) exists for attribution probes
# and re-measurement on new toolchains.
_DW_GW_STEP_MAX_ROWS = int(os.environ.get("UNCR_DW_GW_STEP_MAX_ROWS", 1 << 20))
_DW_GW_AUTO_MIN_ROWS = int(os.environ.get("UNCR_DW_GW_MIN_ROWS", 0))
_DW_GW_AUTO_MAX_ROWS = int(os.environ.get("UNCR_DW_GW_MAX_ROWS", 1 << 62))

# step-rows hint; None outside an engine-dispatched train step (= auto off:
# callers that differentiate dw convs directly, e.g. unit tests or custom
# loops, get the always-correct XLA tap form unless they set the hint or
# force UNCR_DW_GW=1). ContextVars (not module globals) so concurrent
# dispatch — an async eval traced alongside train, or two threads jitting
# different steps — can't leak one step's hint into another's trace.
_DW_GW_STEP_ROWS = contextvars.ContextVar("uncr_dw_gw_step_rows",
                                          default=None)
_DW_GW_SPATIAL = contextvars.ContextVar("uncr_dw_gw_spatial", default=False)


@contextlib.contextmanager
def dw_gw_step_rows(rows: int, spatial: bool = False):
    """Provide the step-level activation-rows hint the auto policy gates
    on (engine.make_train_step wraps every step dispatch in this). The
    hint is a pure function of the (static) batch shape, so it is
    consistent with jit's trace cache: same shapes => same hint => same
    traced dispatch. ``spatial=True`` declares the step's batch is sharded
    over H/W (dp x sp mesh): auto mode then declines the Pallas kernel,
    because its spatial-shard path force-gathers H/W per device (see
    _use_pallas_dw_gw) — only an explicit UNCR_DW_GW=1 opts into that."""
    t1 = _DW_GW_STEP_ROWS.set(rows)
    t2 = _DW_GW_SPATIAL.set(spatial)
    try:
        yield
    finally:
        _DW_GW_SPATIAL.reset(t2)
        _DW_GW_STEP_ROWS.reset(t1)


def _dw_gw_auto(x_shape) -> bool:
    """Auto policy: the measured step-size gate plus the per-site probe
    window, and the kernel's channel padding (pallas_dwgrad.py roofline
    caveat) makes C % 128 != 0 callers pay ~2x HBM traffic, so require
    aligned C. Declines spatially-sharded steps (see dw_gw_step_rows)."""
    step_rows = _DW_GW_STEP_ROWS.get()
    if step_rows is None or step_rows > _DW_GW_STEP_MAX_ROWS:
        return False
    if _DW_GW_SPATIAL.get():
        return False
    N, H, W, C = x_shape
    rows = N * H * W
    return (_DW_GW_AUTO_MIN_ROWS <= rows <= _DW_GW_AUTO_MAX_ROWS
            and C % 128 == 0)


def _use_pallas_dw_gw(x_shape) -> bool:
    """Single-pass Pallas kernel-grad (ops/pallas_dwgrad.py) dispatch: the
    XLA tap form re-reads x/g several times (~40 ms/step of per-channel
    reduction fusions in the round-3 train profile); the kernel reads x
    and g once per block (dx shifts are in-VMEM slices). On TPU the
    default gates on the STEP's total activation rows (_dw_gw_auto,
    measured on v5e — see the policy comment above it); UNCR_DW_GW=1
    forces it on for every shape, UNCR_DW_GW=0 forces the XLA tap form. Batch-sharded (dp)
    meshes are efficient: the custom_partitioning rule in
    dw_kernel_grad_sharded runs the kernel on each batch shard and psums
    the [kh,kw,1,C] partials. SPATIALLY sharded callers (dp x sp
    whole-scene mesh) are numerically correct but costly: H/W shards are
    force-gathered per device, because per-shard padding at interior row
    boundaries would corrupt the cross-boundary taps — don't force this
    on for spatially-sharded TRAINING (inference never takes this
    backward path)."""
    env = os.environ.get("UNCR_DW_GW")
    if env == "0" or jax.default_backend() != "tpu":
        return False
    return True if env == "1" else _dw_gw_auto(x_shape)


def _use_pallas_dw_stencil(x_shape, kh, kw, pads) -> bool:
    """Dispatch for the one-read Pallas dw stencil (ops/pallas_dwconv.py),
    used for the DIFFERENTIATED forward and the input gradient of the
    depthwise convs (the eval primal keeps lax.conv). The XLA kLoop for
    the shift-add form re-reads the input once per tap (~9x HBM traffic,
    round-4 B=4 profile); the kernel reads it once per block.
    UNCR_DW_STENCIL=1 forces it for every eligible site, =0 forces the
    XLA shift-add. Eligibility: lane-aligned C (the kernel's channel pad
    doubles traffic otherwise) and a big enough site that the custom-call
    + window overheads amortize (the 24 border-strip sites are not)."""
    env = os.environ.get("UNCR_DW_STENCIL")
    if env == "0" or jax.default_backend() != "tpu":
        return False
    N, H, W, C = x_shape
    (pt, pb), (pl_, pr) = pads
    Ho, Wo = H + pt + pb - kh + 1, W + pl_ + pr - kw + 1
    eligible = C % 128 == 0 and N * Ho * Wo >= (1 << 18) and Ho >= 8
    if env == "1":
        return eligible
    # auto default: OFF — the round-4 on-chip A/B measured the kernel at
    # parity with XLA's stencil in isolation (both are bound by the same
    # in-VMEM width-shift relayouts, 6.8 vs 6.4 ms at the encoder shape)
    # and a clear net LOSS in-step (B=4 35.68 -> 32.13, B=8 39.78 ->
    # 33.17) from the evicted elementwise neighbours. See the STATUS
    # block in ops/pallas_dwconv.py.
    return False


def _use_conv_dw_form(x_shape) -> bool:
    """Dispatch for lowering a differentiated dw stencil through
    lax.conv's dedicated conv path instead of the fusible shift-add form.

    Round-5 measurements (v5e). Per-site (tools/r5_dwsite_ab.py, C=256
    bf16): the conv lowering is 1.6x faster at the encoder site
    ([12,256,256] rows: 4.04 vs 6.46 ms — the shift-add form is bound by
    in-VMEM width-shift relayouts that grow with rows) but slower in
    isolation at the decoder site ([4,256,256] rows: 3.90 vs 2.78 ms).
    Whole-step (tools/r5_combo_ab.py, 256px T=3): conv EVERYWHERE wins
    decisively — train B=4 35.72 -> 40.30 seq/s, B=8 39.77 -> 50.99
    (+28%; in-step, the conv unit frees the VPU for the neighbouring
    norm/GELU backward fusions, which the isolated decoder number can't
    see). Round 2-4 never A/B'd this: the shift-add form was adopted on
    the 'no conv op in the grad graph' layout hypothesis and only ever
    compared against the Pallas stencil, not against lax.conv itself.

    UNCR_DW_FORM: 'conv' (DEFAULT — every site), 'shift' (the old
    fusible shift-add everywhere), or 'auto' (conv only when N*H*W >=
    UNCR_DW_CONV_MIN_ROWS, default 2^19; measured B=4 36.38 — the
    mixed form loses to all-conv)."""
    mode = os.environ.get("UNCR_DW_FORM", "conv")
    if mode == "conv":
        return True
    if mode != "auto":
        return False
    N, H, W, _ = x_shape
    return N * H * W >= int(os.environ.get("UNCR_DW_CONV_MIN_ROWS",
                                           1 << 19))


def _use_custom_pw_vjp() -> bool:
    """Dispatch for the dot-based pointwise VJP (_pw_conv) vs XLA's native
    conv autodiff. Round-5 whole-step A/B (tools/r5_combo_ab.py, conv-form
    dw backward): the custom rule wins the small-step regime (train B=4
    40.52 vs 39.47 raw — the NHWC-row-major backward composes with the
    engaged Pallas kernel-grad) but LOSES at large steps (B=8 50.92 vs
    53.50 raw). Auto follows the same step-rows hint as the Pallas
    kernel-grad gate: custom iff the engine says step rows <= 2^20;
    non-engine callers (unit tests, direct grads — no hint) keep the
    float64-verified custom rule. UNCR_PW_VJP=custom/raw forces."""
    env = os.environ.get("UNCR_PW_VJP")
    if env == "custom":
        return True
    if env == "raw":
        return False
    step_rows = _DW_GW_STEP_ROWS.get()
    if step_rows is None:
        return True
    return step_rows <= _DW_GW_STEP_MAX_ROWS


def _dw_stencil_or_shift(x, w, pads, site="fwd"):
    """The differentiated dw-conv stencil: the Pallas one-read kernel where
    the dispatch says so, XLA's fusible shift-add form otherwise (both
    accumulate fp32 in identical tap order — bit-identical results), or
    lax.conv's dedicated lowering where _use_conv_dw_form opts in (same
    math, conv-unit tap order — reassociation-level differences only).
    ``site`` ('fwd' or 'gx') supports the per-site A/B window
    UNCR_DW_STENCIL_SITES (default: both) — the gx sites sit inside the
    norm-backward reduce fusions where splitting has its own cost (see
    _gx_fusion_fence's measurement)."""
    kh, kw = w.shape[0], w.shape[1]
    sites = {s.strip() for s in
             os.environ.get("UNCR_DW_STENCIL_SITES", "fwd,gx").split(",")}
    if site in sites and _use_pallas_dw_stencil(x.shape, kh, kw, pads):
        from uncrtaints_tpu.ops.pallas_dwconv import dw_stencil_sharded
        return dw_stencil_sharded(x, w, pads)
    if _use_conv_dw_form(x.shape):
        # fp32 inputs force HIGHEST precision: TPU fp32 convs otherwise
        # run reduced-precision passes (~1e-3 relative), while the
        # shift-add twin is true fp32 VPU math. bf16 inputs (the train
        # path) keep the default MXU fp32 accumulation.
        prec = (jax.lax.Precision.HIGHEST
                if x.dtype == jnp.float32 else None)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [tuple(pads[0]), tuple(pads[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1], precision=prec)
    return _dw_shift_add(x, w, pads)


def _gx_fusion_fence(gx):
    """Keep the 9-tap gx stencil OUT of the upstream norm-backward reduce
    fusions (UNCR_DW_GX_BARRIER=1, experimental). The round-4 B=4 train
    profile showed XLA fusing the shift-add stencil + GELU backward INTO
    the GroupNorm/BatchNorm backward's stats-reduce kLoops, which then tile
    by channel with tiny windows (~4.7x over HBM roofline: fusion.1606
    7.1 ms vs its stencil-free twin 1.9 ms at the same shape; the 5 decoder
    BN-bwd fusions show the same 16-18 stencil slices). The barrier
    materializes gx once (+1 read/write) so each side fuses into a clean,
    well-tiled loop.

    MEASURED (round 4, v5e, tools/env_ab.py): the barrier LOSES — train
    B=4 35.68 -> 35.24 seq/s, B=8 39.75 -> 38.5. The extra gx
    materialization costs slightly more than the bad tiling it removes;
    XLA's fuse-it-all call is net right, so the default stays off. Kept
    as a probe knob for future toolchains (and because the Pallas dw
    stencil attacks the same waste without the extra traffic)."""
    if os.environ.get("UNCR_DW_GX_BARRIER", "0") == "1":
        return jax.lax.optimization_barrier(gx)
    return gx


def _dw_conv_same_bwd(res, g):
    x, w = res
    N, H, W, C = x.shape
    kh, kw = w.shape[0], w.shape[1]
    gx = _gx_fusion_fence(
        _dw_stencil_or_shift(g, w[::-1, ::-1],
                             ((kh // 2,) * 2, (kw // 2,) * 2), site="gx"))
    if _use_pallas_dw_gw(x.shape):
        from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad_sharded
        gw = dw_kernel_grad_sharded(x, g, ((kh // 2,) * 2, (kw // 2,) * 2),
                                    kh, kw)
        return gx, gw.astype(w.dtype)
    xp = jnp.pad(x, [(0, 0), (kh // 2,) * 2, (kw // 2,) * 2, (0, 0)])
    g32 = g.astype(jnp.float32)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(xp, (0, dy, dx, 0), (N, dy + H, dx + W, C))
            taps.append(jnp.sum(tap.astype(jnp.float32) * g32, axis=(0, 1, 2)))
    gw = jnp.stack(taps).reshape(kh, kw, 1, C).astype(w.dtype)
    return gx, gw


_dw_conv_same.defvjp(_dw_conv_same_fwd, _dw_conv_same_bwd)


@jax.custom_vjp
def _dw_conv_valid(x, w):
    """Depthwise stride-1 VALID conv with the same hand-written VJP idea as
    :func:`_dw_conv_same` (covers the 1-row/1-column border-fix convs, whose
    default kernel-gradient lowering also imposes channel-major layouts).
    x [N,H,W,C]; w [kh,kw,1,C]."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _dw_conv_valid_fwd(x, w):
    return _dw_stencil_or_shift(x, w, ((0, 0), (0, 0))), (x, w)


def _dw_conv_valid_bwd(res, g):
    x, w = res
    N, H, W, C = x.shape
    kh, kw = w.shape[0], w.shape[1]
    Ho, Wo = H - kh + 1, W - kw + 1
    # input grad: FULL-pad correlation with the flipped kernel
    gx = _gx_fusion_fence(
        _dw_stencil_or_shift(g, w[::-1, ::-1],
                             ((kh - 1, kh - 1), (kw - 1, kw - 1)),
                             site="gx"))
    if _use_pallas_dw_gw(x.shape):
        from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad
        gw = dw_kernel_grad(x, g, ((0, 0), (0, 0)), kh, kw)
        return gx, gw.astype(w.dtype)
    g32 = g.astype(jnp.float32)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(x, (0, dy, dx, 0), (N, dy + Ho, dx + Wo, C))
            taps.append(jnp.sum(tap.astype(jnp.float32) * g32, axis=(0, 1, 2)))
    gw = jnp.stack(taps).reshape(kh, kw, 1, C).astype(w.dtype)
    return gx, gw


_dw_conv_valid.defvjp(_dw_conv_valid_fwd, _dw_conv_valid_bwd)


def _reflect_borders_eltwise(x, y, kernel):
    """Border corrections as shifted elementwise FMAs (depthwise only).

    A 3-tap 1-D depthwise conv over a strip [N,L,C] is
    ``k0*s[i-1] + k1*s[i] + k2*s[i+1]`` — written as three shifted
    broadcast multiplies it needs no conv dispatch, fuses with the
    ``.at[].add`` update-slice, and (the point, BASELINE.md:66-68) its
    BACKWARD is plain slice/pad/multiply/reduce math instead of the
    channel-major conv kernel-grad lowering that made the 24 strip
    sites ~the whole B=4 train gap. fp32 tap accumulation matches the
    conv form's TPU accumulation (test_reflect_modes parity)."""
    k = kernel[:, :, 0, :].astype(jnp.float32)  # [3, 3, C]

    def tap3(s, kr, reflect):  # s [N,L,C], kr [3,C]
        sp = jnp.pad(s, [(0, 0), (1, 1), (0, 0)],
                     mode="reflect" if reflect else "constant")
        s32 = sp.astype(jnp.float32)
        out = (s32[:, :-2] * kr[0] + s32[:, 1:-1] * kr[1]
               + s32[:, 2:] * kr[2])
        return out.astype(y.dtype)

    # row fixes tap the reflected row over W; column fixes tap down H
    # with zero boundary (corner taps are covered by the row fixes)
    y = y.at[:, 0].add(tap3(x[:, 1], k[0], True))
    y = y.at[:, -1].add(tap3(x[:, -2], k[2], True))
    y = y.at[:, :, 0].add(tap3(x[:, :, 1], k[:, 0], False))
    y = y.at[:, :, -1].add(tap3(x[:, :, -2], k[:, 2], False))
    return y


def _dw_reflect3x3_primal(x, w):
    """The measured-fastest reflect-conv value form: zero-SAME lax.conv +
    4 strip convs (identical to the default mode's eval primal)."""
    C = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")

    def dw(a, k, pad):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), pad, dimension_numbers=dn, feature_group_count=C)

    y = dw(x, w, [(1, 1), (1, 1)])

    def row_fix(strip, krow):
        sp = jnp.pad(strip, [(0, 0), (1, 1), (0, 0)], mode="reflect")
        return dw(sp[:, None], krow, "VALID")[:, 0]

    def col_fix(strip, kcol):
        return dw(strip[:, :, None], kcol, [(1, 1), (0, 0)])[:, :, 0]

    y = y.at[:, 0].add(row_fix(x[:, 1], w[0:1]))
    y = y.at[:, -1].add(row_fix(x[:, -2], w[2:3]))
    y = y.at[:, :, 0].add(col_fix(x[:, :, 1], w[:, 0:1]))
    y = y.at[:, :, -1].add(col_fix(x[:, :, -2], w[:, 2:3]))
    return y


def _gw_ring_corrections(x, g32):
    """The border-strip kernel-gradient taps as 12 elementwise
    multiply-reduce strips (fp32 [3,3,C]) — exactly the strip convs'
    kernel grads in the default decomposition (row fixes tap the
    reflect-padded rows x[1]/x[-2] against g rows 0/-1; column fixes tap
    the zero-padded columns x[:,1]/x[:,-2] against g columns 0/-1, the
    zero padding excluding the corner taps the row fixes already own).
    No conv lowering, no Pallas dispatch, no padded-x materialization."""
    N, H, W, C = x.shape
    corr = jnp.zeros((3, 3, C), jnp.float32)
    top = jnp.pad(x[:, 1], [(0, 0), (1, 1), (0, 0)],
                  mode="reflect").astype(jnp.float32)
    bot = jnp.pad(x[:, -2], [(0, 0), (1, 1), (0, 0)],
                  mode="reflect").astype(jnp.float32)
    lef = jnp.pad(x[:, :, 1], [(0, 0), (1, 1), (0, 0)]).astype(jnp.float32)
    rig = jnp.pad(x[:, :, -2], [(0, 0), (1, 1), (0, 0)]).astype(jnp.float32)
    for d in range(3):
        corr = corr.at[0, d].add(
            jnp.sum(top[:, d:d + W] * g32[:, 0], axis=(0, 1)))
        corr = corr.at[2, d].add(
            jnp.sum(bot[:, d:d + W] * g32[:, -1], axis=(0, 1)))
        corr = corr.at[d, 0].add(
            jnp.sum(lef[:, d:d + H] * g32[:, :, 0], axis=(0, 1)))
        corr = corr.at[d, 2].add(
            jnp.sum(rig[:, d:d + H] * g32[:, :, -1], axis=(0, 1)))
    return corr


@jax.custom_vjp
def _dw_reflect3x3(x, w):
    """Depthwise 3x3 stride-1 REFLECT conv with one fused VJP
    (UNCR_REFLECT_STRIPS=fused).

    The default lowering differentiates the strip decomposition piecewise:
    the main zero-SAME conv gets the single-pass Pallas kernel-grad, but
    each of the 4 border strips contributes its own tiny kernel-grad
    dispatch and input-grad conv — 24 extra dispatches per flagship step,
    which the round-4 attribution (BASELINE.md:66-68) measured as ~the
    whole B=4 train gap. This VJP treats the reflect conv as ONE op:

      gw = one kernel-grad pass over the UNPADDED input (zero-SAME pads)
           plus 12 elementwise ring-correction reduces for the reflected
           border taps (_gw_ring_corrections) — no strip kernel-grad
           dispatches and no padded-x copy. UNCR_REFLECT_FUSED_GW=pad
           switches to the one-pass-over-reflect-padded-input form
           (measured round 5: the 258² pad materializations lose);
      gx = the zero-SAME flipped-kernel stencil plus 4 elementwise
           "halo fold" tap rows/cols (the adjoint of reflect-pad folds the
           pad ring of the full correlation back onto rows/cols 1 and -2).

    The differentiated FORWARD defaults to the same strip-conv value form
    as the default mode (UNCR_REFLECT_FUSED_FWD=conv); =shift uses the
    conv-free shift-add + eltwise borders instead.

    Matches torch nn.Conv2d(padding_mode='reflect') semantics
    (/root/reference/model/src/backbones/uncrtaints.py:60-66); value and
    gradient parity vs the materialized-pad form in test_reflect_modes.
    x [N,H,W,C]; w [3,3,1,C]."""
    return _dw_reflect3x3_primal(x, w)


def _dw_reflect3x3_fwd(x, w):
    if os.environ.get("UNCR_REFLECT_FUSED_FWD", "conv") == "shift":
        # conv-free form (shift-add SAME + eltwise borders) — no conv op
        # in the grad graph means no channel-major layout preference to
        # propagate, but the conv form measured faster in-step
        y = _dw_shift_add(x, w, ((1, 1), (1, 1)))
        y = _reflect_borders_eltwise(x, y, w)
    else:
        y = _dw_reflect3x3_primal(x, w)
    return y, (x, w)


def _dw_reflect3x3_bwd(res, g):
    x, w = res
    N, H, W, C = x.shape
    # gx interior: adjoint of the zero-SAME stencil (flipped kernel)
    gx = _gx_fusion_fence(
        _dw_stencil_or_shift(g, w[::-1, ::-1], ((1, 1), (1, 1)), site="gx"))
    k = w[:, :, 0, :].astype(jnp.float32)                      # [3,3,C]
    g32 = g.astype(jnp.float32)

    def sh(s, d):  # out[i] = s[i-d] along axis 1 of [N,L,C], zero fill
        if d > 0:
            return jnp.pad(s, [(0, 0), (d, 0), (0, 0)])[:, :s.shape[1]]
        return jnp.pad(s, [(0, 0), (0, -d), (0, 0)])[:, -d:]

    # halo folds: the full-pad adjoint's ring gxp[0,v] = sum_b k[0,b]
    # g[0, v-b] (top; bottom symmetric with k[2]) folds onto x row 1/-2
    # with its own column fold (corners live in these row rings); the
    # left/right rings gxp[u,0] = sum_a k[a,0] g[u-a, 0] cover interior
    # rows only and fold onto x cols 1/-2.
    def row_ring(s, kr):  # s [N,W,C] -> folded [N,W,C]
        full = (kr[0] * jnp.pad(s, [(0, 0), (0, 2), (0, 0)])
                + kr[1] * jnp.pad(s, [(0, 0), (1, 1), (0, 0)])
                + kr[2] * jnp.pad(s, [(0, 0), (2, 0), (0, 0)]))
        core = full[:, 1:-1]
        return core.at[:, 1].add(full[:, 0]).at[:, -2].add(full[:, -1])

    def col_ring(s, kc):  # s [N,H,C] (a g column), taps down the rows
        return kc[0] * sh(s, -1) + kc[1] * s + kc[2] * sh(s, 1)

    gx = gx.at[:, 1].add(row_ring(g32[:, 0], k[0]).astype(gx.dtype))
    gx = gx.at[:, -2].add(row_ring(g32[:, -1], k[2]).astype(gx.dtype))
    gx = gx.at[:, :, 1].add(col_ring(g32[:, :, 0], k[:, 0]).astype(gx.dtype))
    gx = gx.at[:, :, -2].add(
        col_ring(g32[:, :, -1], k[:, 2]).astype(gx.dtype))

    if os.environ.get("UNCR_REFLECT_FUSED_GW", "ring") == "pad":
        # one pass over the reflect-PADDED input — VALID semantics covers
        # the border taps exactly, but materializes a padded copy of every
        # dw input (measured round 5: loses to the ring form)
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        if _use_pallas_dw_gw(x.shape):
            from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad_sharded
            gw = dw_kernel_grad_sharded(xp, g, ((0, 0), (0, 0)), 3, 3)
        else:
            taps = []
            for dy in range(3):
                for dx in range(3):
                    tap = jax.lax.slice(xp, (0, dy, dx, 0),
                                        (N, dy + H, dx + W, C))
                    taps.append(jnp.sum(tap.astype(jnp.float32) * g32,
                                        axis=(0, 1, 2)))
            gw = jnp.stack(taps).reshape(3, 3, 1, C)
        return gx, gw.astype(w.dtype)

    # default 'ring': kernel grad of the zero-SAME main conv on the
    # UNPADDED input (Pallas single pass where the step policy says so)
    # + the 12 eltwise border-tap corrections
    if _use_pallas_dw_gw(x.shape):
        from uncrtaints_tpu.ops.pallas_dwgrad import dw_kernel_grad_sharded
        gw_main = dw_kernel_grad_sharded(x, g, ((1, 1), (1, 1)), 3, 3
                                         ).astype(jnp.float32)
    else:
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        taps = []
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(xp, (0, dy, dx, 0), (N, dy + H, dx + W, C))
                taps.append(jnp.sum(tap.astype(jnp.float32) * g32,
                                    axis=(0, 1, 2)))
        gw_main = jnp.stack(taps).reshape(3, 3, 1, C).astype(jnp.float32)
    gw = gw_main + _gw_ring_corrections(x, g32)[:, :, None, :]
    return gx, gw.astype(w.dtype)


_dw_reflect3x3.defvjp(_dw_reflect3x3_fwd, _dw_reflect3x3_bwd)


@jax.custom_vjp
def _pw_conv(x, w):
    """1x1 stride-1 conv with a dot-based VJP.

    XLA computes a 1x1 conv's kernel gradient as another convolution whose
    preferred operand layout is channel-major; layout assignment propagates
    that into the surrounding FORWARD ops (profiled: the whole decoder ran
    in {3,0,2,1} with 5.9 ms relayout casts and 8.5 ms depthwise convs per
    block in the train step). Expressing the backward as dot_general keeps
    everything NHWC row-major. x [N,H,W,C]; w [1,1,C,O]."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _pw_conv_fwd(x, w):
    return _pw_conv(x, w), (x, w)


def _pw_conv_bwd(res, g):
    x, w = res
    gx = jnp.einsum("nhwo,co->nhwc", g, w[0, 0])
    gw = jax.lax.dot_general(x, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                             preferred_element_type=jnp.float32)
    return gx, gw[None, None].astype(w.dtype)


_pw_conv.defvjp(_pw_conv_fwd, _pw_conv_bwd)


# erf(z) = tanh(z * P(z^2)) coefficients, least-squares fit on [0, 4]
# (max |tanh(q)-erf| = 3.2e-6). tanh's saturation gives free RELATIVE
# accuracy in the tails, and tanh is a near-free VPU op on v5e: an xplane
# microbench (tools/probe_gelu.py) measured a tanh-based gelu pass over
# bf16[48,256,256,256] at 4.94 ms vs the 4.92 ms pure-copy roofline, while
# the previous rational-erf form (exp + divide) took 12.2 ms.
_ERF_TANH_C = (1.1283601727517558, 1.0292073947341389e-01,
               -4.8009301101550308e-04, -4.2245969806380281e-04,
               3.3183287259788524e-05)


def _erf_tanh32(z):
    """erf via tanh(odd polynomial), fp32. |err| <= 3.2e-6 on the fit range;
    the clamp keeps z^8 finite for huge inputs (tanh saturates anyway)."""
    zc = jnp.clip(z, -8.0, 8.0)
    z2 = zc * zc
    c = _ERF_TANH_C
    p = c[4]
    for ci in (c[3], c[2], c[1], c[0]):
        p = p * z2 + ci
    return jnp.tanh(zc * p)


def _gelu_fast_erf(x):
    """Exact-GELU via the tanh-form erf (same <=1-ulp bf16 accuracy class as
    the previous rational-erf fast path: 0.26% vs 0.18% single-ulp flips
    over all 65536 bf16 inputs, abs error <= 4.9e-4 only where the bf16 ulp
    is larger)."""
    x32 = x.astype(jnp.float32)
    erf = _erf_tanh32(x32 * 0.7071067811865476)
    return (x32 * 0.5 * (1.0 + erf)).astype(x.dtype)


def _raw_vjp():
    """UNCR_RAW_VJP: comma list of custom-VJP families to BYPASS in favor
    of plain XLA autodiff ('pw', 'dw', 'gelu') — a measurement knob born
    of the round-5 lesson that each hand-written VJP must be re-A/B'd
    whenever the surrounding lowering changes (the shift-add dw form's
    'keep convs out of the grad graph' rationale was never re-tested and
    cost 28% of the B=8 train step). Read at trace time."""
    return {s.strip()
            for s in os.environ.get("UNCR_RAW_VJP", "").split(",") if s}


@jax.custom_vjp
def _gelu_custom(x):
    if x.dtype == jnp.bfloat16:
        return _gelu_fast_erf(x)
    return jax.nn.gelu(x, approximate=False)


def gelu(x):
    """PyTorch nn.GELU() default = exact erf-based gelu.

    bf16 activations take the fast rational-erf path (identical at bf16
    resolution); fp32 (parity tests, CPU) keeps XLA's exact erf.

    Custom VJP: autodiff through the rational-erf chain saved SEVERAL fp32
    intermediates per application (profiled: 3x 268 MB residuals per decoder
    block in the train step). The custom rule saves only the input (in its
    own dtype) and recomputes cdf/pdf in the backward:
    d gelu/dx = Phi(x) + x * phi(x). UNCR_RAW_VJP=gelu bypasses the custom
    rule (plain autodiff through the exact erf form)."""
    if "gelu" in _raw_vjp():
        return jax.nn.gelu(x.astype(jnp.float32),
                           approximate=False).astype(x.dtype)
    return _gelu_custom(x)


def _gelu_vjp_fwd(x):
    return _gelu_custom(x), x


def _gelu_vjp_bwd(x, g):
    x32 = x.astype(jnp.float32)
    erf = (_erf_tanh32(x32 * 0.7071067811865476) if x.dtype == jnp.bfloat16
           else jax.lax.erf(x32 * 0.7071067811865476))
    cdf = 0.5 * (1.0 + erf)
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * x32 * x32)
    return ((cdf + x32 * pdf).astype(g.dtype) * g,)


_gelu_custom.defvjp(_gelu_vjp_fwd, _gelu_vjp_bwd)


def softplus_t20(x):
    """nn.Softplus(beta=1, threshold=20): identity above the threshold."""
    return jnp.where(x > 20.0, x, jax.nn.softplus(x))


def _moments_f32(x, axes, keepdims: bool = True):
    """Mean/variance with fp32 accumulation fused into the reductions.

    jnp.mean(..., dtype=f32) lets XLA upcast inside the reduce; no fp32
    tensor the size of x is materialized even when x is bf16."""
    m = jnp.mean(x, axis=axes, keepdims=keepdims, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes,
                  keepdims=keepdims, dtype=jnp.float32)
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


# NOTE: custom VJPs for train-mode BatchNorm/GroupNorm were implemented and
# measured (round 2): both REGRESSED the train step (25.4 -> 18-21 seq/s at
# B=4 256px) -- the custom_vjp boundary blocks the cross-op fusions XLA finds
# through the default moments+apply autodiff. Default autodiff retained.

class Norm2d(nn.Module):
    """Config-selected normalization over NHWC feature maps.

    batch    -> BatchNorm2d parity (eps 1e-5, momentum 0.1 torch convention)
    instance -> InstanceNorm2d parity (NO affine params, per torch default)
    group    -> GroupNorm(n_groups) parity
    none     -> identity
    """
    norm: str = "batch"
    n_groups: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, fold_only: bool = False):
        """Mixed-precision norms: statistics accumulate in fp32 (the cast is
        fused INTO the reduction -- no fp32 copy of the activation is ever
        materialized, critical for HBM-bound bf16 models), while the
        elementwise application runs in the activation dtype.

        ``fold_only=True`` (batch norm, eval only) returns the fp32
        ``(coef, offs)`` of the equivalent affine transform instead of
        applying it, so callers can fold the normalization into an adjacent
        convolution's weights (zero runtime cost)."""
        if self.norm == "batch":
            return self._batch_norm(x, train, fold_only)
        if self.norm == "instance":
            m, v = _moments_f32(x, axes=(-3, -2))
            coef = jax.lax.rsqrt(v + 1e-5)
            return ((x - m.astype(x.dtype)) * coef.astype(x.dtype))
        if self.norm == "group":
            B = x.shape[0]
            C = x.shape[-1]
            g = self.n_groups
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            xg = x.reshape(B, -1, g, C // g)
            m, v = _moments_f32(xg, axes=(1, 3), keepdims=False)  # [B, g]
            # apply in the NATURAL NHWC shape: normalizing through the
            # [B,P,g,C/g] reshape dragged the whole elementwise pass into a
            # group-tiled layout (~25x below roofline); broadcasting the
            # per-group stats to per-channel keeps the pass layout-native
            mc = jnp.repeat(m, C // g, axis=-1)                       # [B, C]
            rc = jnp.repeat(jax.lax.rsqrt(v + 1e-5), C // g, axis=-1)  # [B, C]
            cc = rc * scale.astype(jnp.float32)
            off32 = bias.astype(jnp.float32) - mc * cc
            if fold_only:
                # per-sample-per-channel fp32 affine (cc, off) [B, C]; unlike
                # the batch-norm fold this still COMPUTES the stats (GroupNorm
                # normalizes per instance) -- it only skips the apply so
                # callers can share one application between branches
                return cc, off32
            off = off32.astype(x.dtype)
            bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
            return (x * cc.astype(x.dtype).reshape(bshape)
                    + off.reshape(bshape))
        return x

    def _batch_norm(self, x, train: bool, fold_only: bool = False):
        """BatchNorm2d parity (eps 1e-5, torch momentum 0.1) with fp32
        running stats and bf16-safe application."""
        C = x.shape[-1]
        scale = self.param("scale", bn_scale_init, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if fold_only:
            assert not train, "fold_only is an eval-mode optimization"
            rs = jax.lax.rsqrt(ra_var.value + 1e-5) * scale
            return rs, bias - ra_mean.value * rs
        if train:
            axes = tuple(range(x.ndim - 1))
            m, v = _moments_f32(x, axes=axes, keepdims=False)
            if not self.is_initializing():
                n = x.size // C
                # torch tracks the UNBIASED variance in running stats
                unbiased = v * (n / max(n - 1, 1))
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * m
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
            coef = (jax.lax.rsqrt(v + 1e-5) * scale).astype(x.dtype)
            offs = (bias - m * jax.lax.rsqrt(v + 1e-5) * scale).astype(x.dtype)
            return x * coef + offs
        m, v = ra_mean.value, ra_var.value
        coef = (jax.lax.rsqrt(v + 1e-5) * scale).astype(x.dtype)
        offs = (bias - m * jax.lax.rsqrt(v + 1e-5) * scale).astype(x.dtype)
        return x * coef + offs


class Conv2d(nn.Module):
    """NHWC conv with reflect padding parity (nn.Conv2d padding_mode).

    Owns its kernel/bias directly (param paths ``Conv2d_i/{kernel,bias}``)
    so the 3x3/stride-1 reflect case can run WITHOUT materializing a padded
    copy of the activation: a zero-SAME conv (1.6x faster on v5e, the pad
    copy is pure HBM traffic) plus exact border fix-ups computed from the
    kernel's edge rows/columns on 1-pixel strips. Identical taps, identical
    results up to fp reassociation."""
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    padding_mode: str = "reflect"
    use_bias: bool = True
    groups: int = 1
    kernel_init: Callable = conv_kernel_init
    # Lower 1x1 convs to a dot instead of a convolution. Dots are faster in
    # isolation (3.6 vs 5.7 ms at [24,256,256,128->256] on v5e) but their
    # output layout forces relayout copies when the consumer is another
    # convolution, which eats the gain inside MBConv chains -- so this is
    # opt-in per call site, not the default.
    prefer_dot: bool = False

    @nn.compact
    def __call__(self, x, input_affine=None, weights_only=False):
        """``input_affine=(coef, offs)`` computes conv(x * coef + offs) by
        folding the per-input-channel affine into the kernel and bias --
        exact for 1x1 convs and for reflect/replicate/circular padding
        (constants are preserved under those pads), zero runtime cost.

        ``weights_only=True`` creates the parameters (same names/shapes as a
        normal call, so checkpoints are interchangeable) and returns
        ``(kernel, bias)`` raw instead of convolving -- used by the fused
        eval path which feeds the weights to a Pallas kernel."""
        k = self.kernel
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, x.shape[-1] // self.groups, self.features))
        bias = (self.param("bias", bias_normal_init, (self.features,))
                if self.use_bias else None)
        if weights_only:
            return kernel, bias
        if input_affine is not None:
            coef, offs = input_affine
            assert self.groups in (1, x.shape[-1]), "fold: plain or depthwise"
            assert k == 1 or self.pad == 0 or self.padding_mode != "zeros", \
                "affine fold is inexact at zero-padded borders"
            k32 = kernel.astype(jnp.float32)
            if self.groups == 1:
                kernel = k32 * coef[None, None, :, None]
                fold_bias = jnp.einsum("c,hwco->o", offs, k32)
            else:  # depthwise: I-dim is 1, channels live on O
                kernel = k32 * coef[None, None, None, :]
                fold_bias = jnp.einsum("c,hwic->c", offs, k32)
            bias = fold_bias if bias is None else bias + fold_bias
        kernel = kernel.astype(x.dtype)
        dn = ("NHWC", "HWIO", "NHWC")

        raw = _raw_vjp()  # UNCR_RAW_VJP bypass set, read at trace time

        def conv(a, w, padding):
            kh, kw = w.shape[0], w.shape[1]
            same = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
            if ("dw" not in raw and self.groups > 1 and self.stride == 1
                    and self.groups == a.shape[-1] == w.shape[-1]
                    and padding == same):
                # depthwise stride-1 SAME: custom VJP (see _dw_conv_same)
                return _dw_conv_same(a, w)
            if ("pw" not in raw and _use_custom_pw_vjp()
                    and kh == kw == 1 and self.stride == 1
                    and self.groups == 1
                    and padding in ("VALID", [(0, 0), (0, 0)])):
                # pointwise: custom dot-based VJP (see _pw_conv)
                return _pw_conv(a, w)
            if ("dw" not in raw and self.groups > 1 and self.stride == 1
                    and self.groups == a.shape[-1] == w.shape[-1]
                    and padding == "VALID"):
                return _dw_conv_valid(a, w)
            return jax.lax.conv_general_dilated(
                a, w, (self.stride, self.stride), padding,
                dimension_numbers=dn, feature_group_count=self.groups)

        if (k == 1 and self.stride == 1 and self.pad == 0
                and self.groups == 1 and self.prefer_dot):
            y = jnp.einsum("...c,co->...o", x, kernel[0, 0])
        elif (self.pad == 1 and k == 3 and self.stride == 1
                and self.padding_mode == "reflect" and x.shape[-3] >= 2
                and x.shape[-2] >= 2
                and os.environ.get("UNCR_REFLECT", "fast") != "pad"):
            # UNCR_REFLECT=pad forces the materialized-pad branch below —
            # an A/B escape hatch: the strip decomposition won its eval
            # measurement (1.6x, docstring), but its border machinery is
            # many tiny DMAs whose cost profile could shift with batch
            # size/toolchain. Round-4 on-chip A/B (tools/r4_reflect_ab.py):
            # the pad mode's B=4 TRAIN step did not even finish compiling+
            # 20 iters inside 900 s (strip mode: 112 ms/step, whole arm
            # ~6 min) — the padded 258x258 shapes wreck the backward's
            # conv/reduce tiling, so the strip form stays the default
            # everywhere.
            y = self._reflect3x3_fast(x, kernel, conv)
        elif self.pad > 0 and self.padding_mode in ("reflect", "replicate",
                                                    "circular"):
            mode = {"reflect": "reflect", "replicate": "edge",
                    "circular": "wrap"}[self.padding_mode]
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3)
                         + [(self.pad, self.pad), (self.pad, self.pad), (0, 0)],
                         mode=mode)
            y = conv(xp, kernel, "VALID")
        else:
            y = conv(x, kernel, [(self.pad, self.pad), (self.pad, self.pad)])
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def _reflect3x3_fast(self, x, kernel, conv):
        """reflect-pad 3x3 conv = zero-SAME conv + border corrections.

        The correction for output row 0 is the kernel's top row applied to
        the reflected input row (row 1) with reflected columns; columns
        symmetrically, with out-of-range row taps excluded by zero padding
        (they are already covered by the row corrections)."""
        dwise = self.groups == x.shape[-1] == kernel.shape[-1]
        strips_mode = os.environ.get("UNCR_REFLECT_STRIPS", "conv")
        if dwise and strips_mode == "fused":
            # round-5: ONE custom VJP for the whole reflect conv — gw is a
            # single kernel-grad pass over the reflect-padded input, gx the
            # SAME stencil + eltwise halo folds; no strip ops in the grad
            # graph at all (see _dw_reflect3x3).
            return _dw_reflect3x3(x, kernel)

        y = conv(x, kernel, [(1, 1), (1, 1)])
        if dwise and strips_mode == "eltwise":
            # round-5 probe: the 3-tap strip corrections as shifted
            # elementwise multiply-adds (no conv dispatch, no conv
            # kernel-grad lowering in the backward — autodiff yields pure
            # slice/pad/multiply/reduce ops that fuse into the neighbours)
            return _reflect_borders_eltwise(x, y, kernel)

        if (dwise and x.shape[-3] == x.shape[-2]
                and os.environ.get("UNCR_REFLECT_BATCH", "0") == "1"):
            # depthwise square case (all 6 reflect sites of the flagship):
            # one 4C-wide strip conv instead of 4 C-wide ones. MEASURED
            # (round 5, v5e, tools/env_ab.py, B=4 train): LOSES — 29.27
            # seq/s (dwgrad kernel auto) / 24.11 (kernel off) vs 35.62
            # for the 4-strip form. The pad+concat assembly of the
            # [N,L+2,4C] input and the wider scatter-adds cost more than
            # the 18 dispatches they save; default stays OFF (probe knob
            # for future toolchains).
            return self._reflect3x3_border_batched(x, y, kernel)

        def row_fix(strip, krow):  # strip [N,W,C], krow [1,3,ci,co]
            sp = jnp.pad(strip, [(0, 0), (1, 1), (0, 0)], mode="reflect")
            return conv(sp[:, None], krow, "VALID")[:, 0]  # [N,W,O]

        def col_fix(strip, kcol):  # strip [N,H,C], kcol [3,1,ci,co]
            return conv(strip[:, :, None], kcol, [(1, 1), (0, 0)])[:, :, 0]

        # NOTE: .at[].add (dynamic-update-slice) is the fastest combination
        # XLA accepts here. Measured alternatives at production size:
        # broadcast iota-masked adds and lax.pad expansions both blow up
        # compile time (>150 s for a single conv) and run slower.
        y = y.at[:, 0].add(row_fix(x[:, 1], kernel[0:1]))
        y = y.at[:, -1].add(row_fix(x[:, -2], kernel[2:3]))
        y = y.at[:, :, 0].add(col_fix(x[:, :, 1], kernel[:, 0:1]))
        y = y.at[:, :, -1].add(col_fix(x[:, :, -2], kernel[:, 2:3]))
        return y

    def _reflect3x3_border_batched(self, x, y, kernel):
        """The 4 border corrections of the depthwise reflect conv as ONE
        channel-stacked depthwise conv (round-5 answer to the 24-tiny-
        strip-dispatch tax the round-4 attribution blamed for the B=4
        train gap, BASELINE.md:66-68).

        All four corrections are 3-tap 1-D depthwise convs over a
        length-L strip (L = H = W): the row fixes tap the reflect-padded
        rows x[:,1] / x[:,-2] with kernel rows 0 / 2, the column fixes tap
        the zero-padded columns x[:,:,1] / x[:,:,-2] with kernel columns
        0 / 2. Stacking them on the CHANNEL axis ([N, L+2, 1, 4C]) turns
        them into a single `_dw_conv_valid` whose custom VJP emits one
        4C-wide kernel-grad reduce and one 4C-wide input-grad stencil
        instead of four C-wide ones — same FMAs in the same order, so the
        result is bit-identical to the unbatched strips; 4C stays
        lane-aligned, so the Pallas dwgrad dispatch policy is unchanged."""
        C = x.shape[-1]
        refl = lambda s: jnp.pad(s, [(0, 0), (1, 1), (0, 0)], mode="reflect")
        zero = lambda s: jnp.pad(s, [(0, 0), (1, 1), (0, 0)])
        s = jnp.concatenate([refl(x[:, 1]), refl(x[:, -2]),
                             zero(x[:, :, 1]), zero(x[:, :, -2])], axis=-1)
        k4 = jnp.concatenate([kernel[0, :, 0, :], kernel[2, :, 0, :],
                              kernel[:, 0, 0, :], kernel[:, 2, 0, :]],
                             axis=-1)
        out = _dw_conv_valid(s[:, :, None, :],
                             k4[:, None, None, :])[:, :, 0]  # [N,L,4C]
        y = y.at[:, 0].add(out[..., :C])
        y = y.at[:, -1].add(out[..., C:2 * C])
        y = y.at[:, :, 0].add(out[..., 2 * C:3 * C])
        y = y.at[:, :, -1].add(out[..., 3 * C:])
        return y


class ConvLayer(nn.Module):
    """Stack of Conv2d(+norm)(+ReLU) -- utae.py:453-497 parity."""
    nkernels: Sequence[int]
    norm: str = "batch"
    k: int = 3
    s: int = 1
    p: int = 1
    n_groups: int = 4
    last_relu: bool = True
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.nkernels)
        for i in range(n - 1):
            x = Conv2d(self.nkernels[i + 1], kernel=self.k, stride=self.s,
                       pad=self.p, padding_mode=self.padding_mode)(x)
            x = Norm2d(self.norm, self.n_groups)(x, train=train)
            if self.last_relu or i < n - 2:
                x = nn.relu(x)
        return x


def smart_apply(fn: Callable, x: jax.Array, pad_value: Optional[float] = None) -> jax.Array:
    """Apply a [N,H,W,C] function over [B,T,H,W,C] by folding time into batch.

    Static-shape replacement for TemporallySharedBlock.smart_forward
    (utae.py:422-450): dense compute everywhere, pad frames re-filled with
    ``pad_value`` afterwards.
    """
    if x.ndim == 4:
        return fn(x)
    b, t = x.shape[:2]
    pad_mask = None
    if pad_value is not None:
        pad_mask = jnp.all(x == pad_value, axis=(2, 3, 4))  # [B,T]
    y = fn(x.reshape(b * t, *x.shape[2:]))
    y = y.reshape(b, t, *y.shape[1:])
    if pad_mask is not None:
        y = jnp.where(pad_mask[:, :, None, None, None], pad_value, y)
    return y


class ConvBlock(nn.Module):
    """Temporally-shared ConvLayer (utae.py:500-520 parity)."""
    nkernels: Sequence[int]
    pad_value: Optional[float] = None
    norm: str = "batch"
    last_relu: bool = True
    k: int = 3
    s: int = 1
    p: int = 1
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False):
        layer = ConvLayer(self.nkernels, norm=self.norm, k=self.k, s=self.s,
                          p=self.p, last_relu=self.last_relu,
                          padding_mode=self.padding_mode)
        return smart_apply(lambda a: layer(a, train=train), x, self.pad_value)
