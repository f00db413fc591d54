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


def test_frame_into_slab_u16_lut_exact(rng):
    """Single-pass LUT slab writer == moveaxis(process_MS) exactly (fp32)
    and == .astype(bfloat16) bit-exactly (bf16 LUT entries via ml_dtypes)."""
    from ml_dtypes import bfloat16
    from uncrtaints_tpu.data.preprocess import process_MS

    u16 = rng.integers(0, 14000, (13, 32, 32)).astype(np.uint16)
    ref = np.moveaxis(process_MS(u16.astype(np.float32)), 0, -1)

    slab = np.full((32, 32, 15), -1, np.float32)
    assert native.frame_into_slab(slab, 2, u16)
    np.testing.assert_array_equal(slab[..., 2:], ref)
    assert np.all(slab[..., :2] == -1)  # other channels untouched

    slab16 = np.zeros((32, 32, 15), bfloat16)
    assert native.frame_into_slab(slab16, 2, u16)
    np.testing.assert_array_equal(slab16[..., 2:].view(np.uint16),
                                  ref.astype(bfloat16).view(np.uint16))


def test_frame_into_slab_f32_copy_and_bf16_rne(rng):
    from ml_dtypes import bfloat16

    f32 = rng.standard_normal((2, 16, 16)).astype(np.float32)
    hwc = np.moveaxis(f32, 0, -1)
    slab = np.zeros((16, 16, 15), np.float32)
    assert native.frame_into_slab(slab, 0, f32)
    np.testing.assert_array_equal(slab[..., :2], hwc)

    slab16 = np.zeros((16, 16, 15), bfloat16)
    assert native.frame_into_slab(slab16, 0, f32)
    np.testing.assert_array_equal(slab16[..., :2].view(np.uint16),
                                  hwc.astype(bfloat16).view(np.uint16))


def test_fast_collate_matches_generic(rng):
    """make_fast_collate over raw-uint16 S2 samples == collate_multi over
    the processed twins, exactly (fp32) / RNE-exactly (bf16); it also
    consumes already-processed fp32 samples unchanged."""
    from ml_dtypes import bfloat16
    from uncrtaints_tpu.data.pipeline import collate_multi, make_fast_collate
    from uncrtaints_tpu.data.preprocess import process_MS

    raw_s, proc_s = [], []
    for i in range(3):
        s2u = [rng.integers(0, 14000, (13, 16, 16)).astype(np.uint16)
               for _ in range(2)]
        tgu = rng.integers(0, 14000, (13, 16, 16)).astype(np.uint16)
        s1 = [rng.standard_normal((2, 16, 16)).astype(np.float32)
              for _ in range(2)]
        base = {"input": {"S1": s1,
                          "masks": [np.zeros((16, 16), np.float32)] * 2,
                          "S1 TD": [1, 2], "S2 TD": [3, 4]}}
        raw_s.append({"input": {**base["input"], "S2": s2u},
                      "target": {"S2": [tgu]}})
        proc_s.append({
            "input": {**base["input"],
                      "S2": [process_MS(f.astype(np.float32)) for f in s2u]},
            "target": {"S2": [process_MS(tgu.astype(np.float32))]}})

    ref = collate_multi(proc_s, use_sar=True)
    fast = make_fast_collate(x_dtype=np.float32)(raw_s, use_sar=True)
    for k in ("x", "y", "dates", "masks"):
        np.testing.assert_array_equal(fast[k], ref[k])
    fast16 = make_fast_collate(x_dtype=bfloat16)(raw_s, use_sar=True)
    np.testing.assert_array_equal(fast16["x"].view(np.uint16),
                                  ref["x"].astype(bfloat16).view(np.uint16))
    fast_proc = make_fast_collate(x_dtype=np.float32)(proc_s, use_sar=True)
    np.testing.assert_array_equal(fast_proc["x"], ref["x"])


def test_hdf5_raw_s2_roundtrip(tmp_path, rng):
    """HDF5SEN12MSCRTS(raw_s2=True) + fast collate == processed dataset +
    generic collate, end to end through BatchLoader."""
    from uncrtaints_tpu.data.hdf5 import HDF5SEN12MSCRTS
    from uncrtaints_tpu.data.pipeline import (BatchLoader, collate_multi,
                                              make_fast_collate)
    import bench

    path = bench._e2e_store(4, frames=4, patch=16)
    ds_raw = HDF5SEN12MSCRTS(path, n_input_samples=2, raw_s2=True)
    ds_ref = HDF5SEN12MSCRTS(path, n_input_samples=2)
    assert np.asarray(ds_raw[0]["input"]["S2"][0]).dtype == np.uint16

    mk = lambda ds, col: next(iter(BatchLoader(
        ds, batch_size=4, shuffle=False, collate=col, use_sar=True,
        num_workers=2, drop_last=True)))
    fast = mk(ds_raw, make_fast_collate(x_dtype=np.float32))
    ref = mk(ds_ref, collate_multi)
    for k in ("x", "y", "dates", "masks"):
        np.testing.assert_array_equal(fast[k], ref[k])


def test_fast_collate_guard_rails(rng):
    """The raw-DN method marker mismatch raises (wrong radiometry would be
    silent otherwise); unsupported frame dtypes fall back to the generic
    numpy path instead of feeding uninitialized slab memory."""
    from uncrtaints_tpu.data.pipeline import make_fast_collate

    def sample(s2_dtype=np.uint16, marker=None):
        inp = {"S1": [np.zeros((2, 8, 8), np.float32)],
               "S2": [np.full((13, 8, 8), 5000, s2_dtype)],
               "masks": [np.zeros((8, 8), np.float32)],
               "S1 TD": [1], "S2 TD": [1]}
        if marker:
            inp["rescale_method"] = marker
        return {"input": inp,
                "target": {"S2": [np.full((13, 8, 8), 5000, s2_dtype)]}}

    import pytest
    with pytest.raises(ValueError, match="rescale_method"):
        make_fast_collate(method="default")([sample(marker="resnet")],
                                            use_sar=True)
    b = make_fast_collate(method="resnet")([sample(marker="resnet")],
                                           use_sar=True)
    assert abs(float(b["x"][0, 0, 0, 0, 2]) - 2.5) < 1e-6   # 5000/2000
    # float64 'processed' frames: generic fallback, values passed through
    b64 = make_fast_collate()([sample(s2_dtype=np.float64)], use_sar=True)
    assert b64["x"].dtype == np.float32
    assert float(b64["x"][0, 0, 0, 0, 2]) == 5000.0


def test_frame_into_slab_u16_raw_copy(rng):
    """Raw-DN shipping: uint16 frame -> uint16 slab is a pure transpose
    copy (no LUT, no float math), channel-offset aware."""
    u16 = rng.integers(0, 65536, (13, 32, 32)).astype(np.uint16)
    slab = np.zeros((32, 32, 13), np.uint16)
    assert native.frame_into_slab(slab, 0, u16)
    np.testing.assert_array_equal(slab, np.moveaxis(u16, 0, -1))
    slab2 = np.full((32, 32, 15), 7, np.uint16)
    assert native.frame_into_slab(slab2, 2, u16)
    np.testing.assert_array_equal(slab2[..., 2:], np.moveaxis(u16, 0, -1))
    assert np.all(slab2[..., :2] == 7)


def _raw_and_processed_samples(rng, n=2, t=3, hw=16):
    from uncrtaints_tpu.data.preprocess import process_MS
    raw_s, proc_s = [], []
    for i in range(n):
        s2u = [rng.integers(0, 14000, (13, hw, hw)).astype(np.uint16)
               for _ in range(t)]
        tgu = rng.integers(0, 14000, (13, hw, hw)).astype(np.uint16)
        s1 = [rng.standard_normal((2, hw, hw)).astype(np.float32)
              for _ in range(t)]
        inp = {"S1": s1, "masks": [np.zeros((hw, hw), np.float32)] * t,
               "S1 TD": list(range(1, t + 1)),
               "S2 TD": list(range(3, t + 3))}
        raw_s.append({"input": {**inp, "S2": s2u,
                                "rescale_method": "default"},
                      "target": {"S2": [tgu]}})
        proc_s.append({"input": {**inp,
                                 "S2": [process_MS(f.astype(np.float32))
                                        for f in s2u]},
                       "target": {"S2": [process_MS(tgu.astype(np.float32))]}})
    return raw_s, proc_s


def test_raw_collate_device_radiometry_parity(rng):
    """make_raw_collate ships untouched uint16 DN; engine._prepare_xy's
    on-device process_MS + scale_by produces BIT-IDENTICAL scaled x/y to
    the host-processed fp32 path (/root/reference/data/dataLoader.py:35-41
    semantics, relocated to the chip)."""
    import jax.numpy as jnp
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.data.pipeline import collate_multi, make_raw_collate
    from uncrtaints_tpu.train import engine

    raw_s, proc_s = _raw_and_processed_samples(rng)
    raw = make_raw_collate()(raw_s, use_sar=True)
    ref = collate_multi(proc_s, use_sar=True)
    assert raw["x_s2dn"].dtype == np.uint16
    assert raw["y_dn"].dtype == np.uint16
    np.testing.assert_array_equal(raw["dates"], ref["dates"])
    np.testing.assert_array_equal(raw["masks"], ref["masks"])

    cfg = derive(Config(use_sar=True, scale_by=10.0))
    dev = lambda b, keys: {k: jnp.asarray(b[k]) for k in keys}
    xr, yr, yur = engine._prepare_xy(
        cfg, dev(raw, ("x_s1", "x_s2dn", "y_dn")))
    xh, yh, yuh = engine._prepare_xy(cfg, dev(ref, ("x", "y")))
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xh))
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yh))
    np.testing.assert_array_equal(np.asarray(yur), np.asarray(yuh))


def test_raw_collate_bf16_s1_and_guards(rng):
    from ml_dtypes import bfloat16
    from uncrtaints_tpu.data.pipeline import make_raw_collate

    raw_s, proc_s = _raw_and_processed_samples(rng)
    b16 = make_raw_collate(s1_dtype=bfloat16)(raw_s, use_sar=True)
    assert b16["x_s1"].dtype == np.dtype(bfloat16)
    s1_ref = np.moveaxis(np.asarray(raw_s[0]["input"]["S1"][0]), 0, -1)
    np.testing.assert_array_equal(
        np.asarray(b16["x_s1"][0, 0]).view(np.uint16),
        s1_ref.astype(bfloat16).view(np.uint16))
    # no-SAR form omits x_s1
    nosar = make_raw_collate()(raw_s, use_sar=False)
    assert "x_s1" not in nosar
    # method-marker mismatch raises; processed fp32 samples are rejected
    with pytest.raises(ValueError, match="rescale_method"):
        make_raw_collate(method="resnet")(raw_s, use_sar=True)
    with pytest.raises(ValueError, match="uint16"):
        make_raw_collate()(proc_s, use_sar=True)


def test_raw_collate_hdf5_roundtrip(rng):
    """HDF5SEN12MSCRTS(raw_s2=True) -> make_raw_collate -> device
    radiometry == processed dataset -> collate_multi -> host radiometry,
    end to end through BatchLoader (the bench.py --e2e default path)."""
    import jax.numpy as jnp
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.data.hdf5 import HDF5SEN12MSCRTS
    from uncrtaints_tpu.data.pipeline import (BatchLoader, collate_multi,
                                              make_raw_collate)
    from uncrtaints_tpu.train import engine
    import bench

    path = bench._e2e_store(4, frames=4, patch=16)
    ds_raw = HDF5SEN12MSCRTS(path, n_input_samples=2, raw_s2=True)
    ds_ref = HDF5SEN12MSCRTS(path, n_input_samples=2)
    mk = lambda ds, col: next(iter(BatchLoader(
        ds, batch_size=4, shuffle=False, collate=col, use_sar=True,
        num_workers=2, drop_last=True)))
    raw = mk(ds_raw, make_raw_collate())
    ref = mk(ds_ref, collate_multi)
    np.testing.assert_array_equal(raw["dates"], ref["dates"])
    np.testing.assert_array_equal(raw["masks"], ref["masks"])

    cfg = derive(Config(use_sar=True, scale_by=10.0))
    dev = lambda b, keys: {k: jnp.asarray(b[k]) for k in keys}
    xr, yr, yur = engine._prepare_xy(
        cfg, dev(raw, ("x_s1", "x_s2dn", "y_dn")))
    xh, yh, yuh = engine._prepare_xy(cfg, dev(ref, ("x", "y")))
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xh))
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yh))
