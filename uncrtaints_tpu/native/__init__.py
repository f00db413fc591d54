"""ctypes bindings for the native host-pipeline kernels.

Compiles uncrtaints_tpu/native/preprocess.cpp into a cached shared library
on first use (g++ -O3 -fopenmp) and exposes numpy-facing wrappers. Every
entry point has a pure-numpy fallback so environments without a compiler
keep working; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_SRC = os.path.join(os.path.dirname(__file__), "preprocess.cpp")


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.path.join(tempfile.gettempdir(), "uncrtaints_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"preprocess_{tag}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               _SRC, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(so_path)
    i64, f32p, u16p, ci = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_uint16), ctypes.c_int)
    lib.ms_u16_chw_to_hwc_rescale.argtypes = [u16p, f32p, i64, i64, i64, ci]
    lib.ms_f32_chw_to_hwc_rescale.argtypes = [f32p, f32p, i64, i64, i64, ci]
    lib.sar_f32_chw_to_hwc_rescale.argtypes = [f32p, f32p, i64, i64, i64]
    lib.f32_chw_to_hwc.argtypes = [f32p, f32p, i64, i64, i64]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def ms_chw_to_hwc_rescale(chw: np.ndarray, method: str = "default") -> np.ndarray:
    """Fused MS radiometry + CHW->HWC. chw: [C,H,W] uint16 or float32.
    Returns [H,W,C] float32 (process_MS parity)."""
    C, H, W = chw.shape
    out = np.empty((H, W, C), np.float32)
    lib = _lib()
    resnet = 1 if method == "resnet" else 0
    if lib is not None and chw.flags.c_contiguous:
        if chw.dtype == np.uint16:
            lib.ms_u16_chw_to_hwc_rescale(_ptr(chw, ctypes.c_uint16),
                                          _ptr(out, ctypes.c_float),
                                          C, H, W, resnet)
            return out
        if chw.dtype == np.float32:
            lib.ms_f32_chw_to_hwc_rescale(_ptr(chw, ctypes.c_float),
                                          _ptr(out, ctypes.c_float),
                                          C, H, W, resnet)
            return out
    # numpy fallback
    from uncrtaints_tpu.data.preprocess import process_MS
    return np.moveaxis(process_MS(chw.astype(np.float32), method), 0, -1)


def sar_chw_to_hwc_rescale(chw: np.ndarray) -> np.ndarray:
    """Fused SAR 'default' radiometry + CHW->HWC. chw: [C,H,W] float32."""
    C, H, W = chw.shape
    lib = _lib()
    if lib is not None and chw.dtype == np.float32 and chw.flags.c_contiguous:
        out = np.empty((H, W, C), np.float32)
        lib.sar_f32_chw_to_hwc_rescale(_ptr(chw, ctypes.c_float),
                                       _ptr(out, ctypes.c_float), C, H, W)
        return out
    from uncrtaints_tpu.data.preprocess import process_SAR
    return np.moveaxis(process_SAR(chw.astype(np.float32)), 0, -1)


def chw_to_hwc(chw: np.ndarray) -> np.ndarray:
    """Layout-only CHW->HWC transpose."""
    C, H, W = chw.shape
    lib = _lib()
    if lib is not None and chw.dtype == np.float32 and chw.flags.c_contiguous:
        out = np.empty((H, W, C), np.float32)
        lib.f32_chw_to_hwc(_ptr(chw, ctypes.c_float),
                           _ptr(out, ctypes.c_float), C, H, W)
        return out
    return np.ascontiguousarray(np.moveaxis(chw, 0, -1))


# ------------------------- slab writers ------------------------------ #
# One native pass from a CHW frame directly into a batch slab row
# [H, W, dstC] at a channel offset: batch assembly without any
# stack/concatenate/astype passes. uint16 DN radiometry is an exact
# 65536-entry lookup table (bf16 entries produced by ml_dtypes, so the
# rounding is identical to .astype(bfloat16)).

_LUTS: dict = {}
_I64 = ctypes.c_int64


def _bf16_dtype():
    from ml_dtypes import bfloat16
    return np.dtype(bfloat16)


def ms_lut(method: str, dtype) -> np.ndarray:
    """process_MS as a LUT over the uint16 DN range (exact parity: the
    same fp32 clip+divide the numpy path performs, then the same cast)."""
    key = (method, np.dtype(dtype).str)
    lut = _LUTS.get(key)
    if lut is None:
        v = np.clip(np.arange(65536, dtype=np.float32), 0.0, 10000.0)
        v = v / 2000.0 if method == "resnet" else v / 10000.0
        lut = np.ascontiguousarray(v.astype(dtype))
        _LUTS[key] = lut
    return lut


def frame_into_slab(slab_hwc: np.ndarray, c0: int, chw: np.ndarray,
                    method: str = "default") -> bool:
    """Write a [C,H,W] frame into slab_hwc[:, :, c0:c0+C] in one pass.

    chw uint16 -> slab uint16: raw-DN shipping, layout-only transpose copy
    (the radiometry runs on-device; engine._prepare_xy).
    chw uint16 -> slab f32/bf16 (raw S2 DN): radiometry applied via LUT
    (process_MS parity).
    chw float32 (already-processed frame): plain layout copy, cast to the
    slab dtype (bf16 round-to-nearest-even in C++).
    Returns False when the native library is unavailable or dtypes are
    unsupported (caller falls back to the numpy path)."""
    lib = _lib()
    if lib is None or not chw.flags.c_contiguous \
            or not slab_hwc.flags.c_contiguous:
        return False
    C, H, W = chw.shape
    dstC = slab_hwc.shape[-1]
    # real raises, not asserts: these guard a raw native write and must
    # survive python -O
    if slab_hwc.shape[0] != H or slab_hwc.shape[1] != W:
        raise ValueError(f"slab {slab_hwc.shape} vs frame {chw.shape}")
    if c0 + C > dstC:
        raise ValueError(f"channels [{c0}, {c0 + C}) exceed slab dstC={dstC}")
    base = slab_hwc.ctypes.data + c0 * slab_hwc.itemsize
    if chw.dtype == np.uint16 and slab_hwc.dtype == np.uint16:
        lib.u16_chw_to_hwc_slab_u16(
            _ptr(chw, ctypes.c_uint16),
            ctypes.cast(base, ctypes.POINTER(ctypes.c_uint16)),
            _I64(C), _I64(H), _I64(W), _I64(dstC))
        return True
    is_bf16 = slab_hwc.itemsize == 2 and slab_hwc.dtype == _bf16_dtype()
    is_f32 = slab_hwc.dtype == np.float32
    if not (is_bf16 or is_f32):
        return False
    if chw.dtype == np.uint16:
        if is_f32:
            lut = ms_lut(method, np.float32)
            lib.u16_lut_chw_to_hwc_slab_f32(
                _ptr(chw, ctypes.c_uint16), _ptr(lut, ctypes.c_float),
                ctypes.cast(base, ctypes.POINTER(ctypes.c_float)),
                _I64(C), _I64(H), _I64(W), _I64(dstC))
        else:
            lut = ms_lut(method, _bf16_dtype()).view(np.uint16)
            lib.u16_lut_chw_to_hwc_slab_u16(
                _ptr(chw, ctypes.c_uint16), _ptr(lut, ctypes.c_uint16),
                ctypes.cast(base, ctypes.POINTER(ctypes.c_uint16)),
                _I64(C), _I64(H), _I64(W), _I64(dstC))
        return True
    if chw.dtype == np.float32:
        if is_f32:
            lib.f32_chw_to_hwc_slab_f32(
                _ptr(chw, ctypes.c_float),
                ctypes.cast(base, ctypes.POINTER(ctypes.c_float)),
                _I64(C), _I64(H), _I64(W), _I64(dstC))
        else:
            lib.f32_chw_to_hwc_slab_bf16(
                _ptr(chw, ctypes.c_float),
                ctypes.cast(base, ctypes.POINTER(ctypes.c_uint16)),
                _I64(C), _I64(H), _I64(W), _I64(dstC))
        return True
    return False
