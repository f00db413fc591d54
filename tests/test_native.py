"""Native host-pipeline kernel tests: parity vs the numpy reference path and
a build sanity check (graceful fallback when no compiler)."""

import numpy as np
import pytest

from uncrtaints_tpu import native
from uncrtaints_tpu.data.preprocess import process_MS, process_SAR


def test_native_builds():
    # the image ships g++; if this fails the fallback still keeps the
    # pipeline working, but we want to know
    assert native.available(), "native kernels failed to build"


def test_ms_u16_fused_matches_numpy(rng):
    chw = (rng.random((13, 64, 64)) * 12000).astype(np.uint16)
    got = native.ms_chw_to_hwc_rescale(chw, "default")
    ref = np.moveaxis(process_MS(chw.astype(np.float32), "default"), 0, -1)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_ms_f32_fused_matches_numpy(rng):
    chw = (rng.random((13, 32, 32)) * 12000 - 500).astype(np.float32)
    chw[0, 0, 0] = np.nan
    got = native.ms_chw_to_hwc_rescale(chw, "default")
    ref = np.moveaxis(process_MS(chw, "default"), 0, -1)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    # NOTE: native clips negatives to 0 BEFORE rescale like np.clip does
    assert got[0, 0, 0] == 0.0


def test_ms_resnet_mode(rng):
    chw = (rng.random((13, 16, 16)) * 12000).astype(np.uint16)
    got = native.ms_chw_to_hwc_rescale(chw, "resnet")
    ref = np.moveaxis(process_MS(chw.astype(np.float32), "resnet"), 0, -1)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_sar_fused_matches_numpy(rng):
    chw = (rng.random((2, 32, 32)) * -40 + 5).astype(np.float32)
    got = native.sar_chw_to_hwc_rescale(chw)
    ref = np.moveaxis(process_SAR(chw, "default"), 0, -1)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_chw_to_hwc(rng):
    chw = rng.random((7, 9, 11)).astype(np.float32)
    got = native.chw_to_hwc(chw)
    np.testing.assert_array_equal(got, np.moveaxis(chw, 0, -1))
