"""Data-layer tests: preprocessing golden arrays, detector parity vs a
numpy/scipy re-derivation of the reference formulas, sampler properties,
collation shapes, and loader determinism."""

import numpy as np
import pytest
import scipy.signal as scisig
import scipy.ndimage as ndi
import jax.numpy as jnp

from uncrtaints_tpu.data.preprocess import (
    process_MS, process_SAR, process_MS_device, process_SAR_device,
)
from uncrtaints_tpu.data.masks import (
    get_cloud_mask, get_shadow_mask, get_cloud_cloudshadow_mask, get_cloud_map,
)
from uncrtaints_tpu.data.samplers import (
    fixed_sampler, fixedsubset_sampler, random_sampler, sliding_windows,
)
from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS, SyntheticSEN12MSCR
from uncrtaints_tpu.data.pipeline import BatchLoader, collate_multi, collate_mono


# ---------------- preprocessing ----------------

def test_process_ms_default(rng):
    img = (rng.random((13, 8, 8)) * 12000 - 500).astype(np.float32)
    got = process_MS(img, "default")
    ref = np.clip(img, 0, 10000) / 10000.0
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert got.min() >= 0 and got.max() <= 1


def test_process_ms_resnet(rng):
    img = (rng.random((13, 8, 8)) * 12000).astype(np.float32)
    got = process_MS(img, "resnet")
    np.testing.assert_allclose(got, np.clip(img, 0, 10000) / 2000.0, rtol=1e-6)


def test_process_sar_default(rng):
    img = (rng.random((2, 8, 8)) * -40 + 5).astype(np.float32)
    got = process_SAR(img, "default")
    ref = (np.clip(img, -25, 0) + 25) / 25.0
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_process_sar_resnet(rng):
    img = (rng.random((2, 8, 8)) * -40 + 5).astype(np.float32)
    got = process_SAR(img, "resnet", pol_axis=0)
    ref0 = 2 * (np.clip(img[0], -25, 0) + 25) / 25
    ref1 = 2 * (np.clip(img[1], -32.5, 0) + 32.5) / 32.5
    np.testing.assert_allclose(got[0], ref0, rtol=1e-6)
    np.testing.assert_allclose(got[1], ref1, rtol=1e-6)


def test_device_preprocess_matches_host(rng):
    img = (rng.random((4, 4, 13)) * 12000).astype(np.float32)
    np.testing.assert_allclose(np.asarray(process_MS_device(jnp.asarray(img))),
                               process_MS(img), rtol=1e-6)
    sar = (rng.random((4, 4, 2)) * -40).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(process_SAR_device(jnp.asarray(sar), pol_axis=-1)),
        process_SAR(sar, pol_axis=2), rtol=1e-6)


# ---------------- cloud/shadow detector ----------------

def _np_rescale(d, lo, hi):
    return (d - lo) / (hi - lo)


def _np_cloud_score(img_chw):
    """detect_cloudshadow.py:43-78 math re-derived in numpy/scipy."""
    d = img_chw / 10000.0
    score = np.ones(d.shape[1:], np.float32)
    score = np.minimum(score, _np_rescale(d[1], 0.1, 0.5))
    score = np.minimum(score, _np_rescale(d[0], 0.1, 0.3))
    score = np.minimum(score, _np_rescale(d[0] + d[10], 0.4, 0.9))
    score = np.minimum(score, _np_rescale(d[3] + d[2] + d[1], 0.2, 0.8))
    sub, add = d[2] - d[11], d[2] + d[11]
    add[add == 0] = 0.001
    ndsi = sub / add
    score = np.minimum(score, _np_rescale(ndsi, 0.8, 0.6))
    score = ndi.grey_closing(score, size=(5, 5))
    box = np.ones((7, 7)) / 49.0
    score = scisig.convolve2d(score, box, mode="same")
    return np.clip(score, 0.00001, 1.0)


def _np_shadow(img_chw):
    d = img_chw / 10000.0
    bb, bnir, bswir1 = d[1], d[7], d[11]
    csi = (bnir + bswir1) / 2.0
    t3 = csi.min() + 0.75 * (csi.mean() - csi.min())
    t4 = bb.min() + (5 / 6) * (bb.mean() - bb.min())
    mask = np.zeros_like(bb, np.float32)
    mask[np.logical_and(csi < t3, bb < t4)] = -1
    return scisig.medfilt2d(mask, 5)


@pytest.fixture
def s2_raw(rng):
    # plausible raw S2 with bright blobs (clouds) and dark areas (shadows)
    base = rng.random((13, 48, 48)).astype(np.float32) * 3000
    blob = np.zeros((48, 48), np.float32)
    blob[8:20, 8:20] = 1.0
    img = base + blob[None] * 6000
    return img


def test_cloud_score_parity(s2_raw):
    ref = _np_cloud_score(s2_raw)
    got = np.asarray(get_cloud_mask(jnp.asarray(np.moveaxis(s2_raw, 0, -1))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_shadow_mask_parity(s2_raw):
    ref = _np_shadow(s2_raw)
    got = np.asarray(get_shadow_mask(jnp.asarray(np.moveaxis(s2_raw, 0, -1))))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_merged_mask_binary(s2_raw):
    got = np.asarray(get_cloud_cloudshadow_mask(
        jnp.asarray(np.moveaxis(s2_raw, 0, -1)), 0.2))
    assert set(np.unique(got)).issubset({0.0, 1.0})
    assert got.mean() > 0  # the bright blob must be detected


def test_batched_masking_over_time(s2_raw):
    stack = np.stack([s2_raw, s2_raw * 0.5], axis=0)  # [T, C, H, W]
    got = np.asarray(get_cloud_cloudshadow_mask(
        jnp.asarray(np.moveaxis(stack, 1, -1))))
    assert got.shape == (2, 48, 48)


def test_blank_image_guard():
    blank = np.zeros((8, 8, 13), np.float32)
    m = get_cloud_map(blank, "cloud_cloudshadow_mask")
    assert (m == 1).all()  # defaults to all-cloudy


# ---------------- samplers ----------------

def test_fixed_sampler_basic():
    cov = [0.5, 0.0, 0.3, 0.9, 0.2]
    idx, target, match = fixed_sampler(cov, 3, min_cov=0.1, max_cov=0.6)
    assert target == 1           # least cloudy
    assert idx == [0, 2, 4]      # first 3 within [0.1, 0.6]
    assert match


def test_fixed_sampler_fallback():
    cov = [0.9, 0.0, 0.9, 0.9]
    idx, target, match = fixed_sampler(cov, 2, min_cov=0.1, max_cov=0.5)
    assert target == 1
    assert idx == [0, 2]         # first 2 excluding target
    assert not match


def test_fixed_sampler_cloudy_target_flags_mismatch():
    cov = [0.5, 0.4, 0.3]
    idx, target, match = fixed_sampler(cov, 2, min_cov=0.0, max_cov=1.0)
    assert target == 2 and not match  # target above clear_tresh


def test_fixedsubset_shifts_and_falls_back():
    cov = [0.9] * 10 + [0.0, 0.1, 0.2] + [0.9] * 17
    idx, target, match = fixedsubset_sampler(cov, 2, earliest_idx=10,
                                             latest_idx=13)
    assert target == 10
    assert all(10 <= i < 13 for i in idx)


def test_random_sampler_window_contains_neighbors():
    rng = np.random.default_rng(0)
    cov = [0.5] * 30
    cov[7] = 0.0
    idx, target, match = random_sampler(cov, 3, rng)
    assert target == 7
    assert len(idx) == 3 and 7 not in idx
    assert all(abs(i - 7) <= 3 for i in idx)  # window of width 4 around target


def test_random_sampler_no_clear_frame_uses_argmin():
    rng = np.random.default_rng(0)
    cov = np.linspace(0.2, 0.9, 30)
    idx, target, match = random_sampler(list(cov), 3, rng)
    assert target == 0


def test_sliding_windows():
    w = sliding_windows(30, 4)
    assert w.shape == (27, 4)
    assert (w[0] == [0, 1, 2, 3]).all()


# ---------------- synthetic data + pipeline ----------------

def test_synthetic_multi_structure_and_collation():
    ds = SyntheticSEN12MSCRTS(n_samples=6, n_input_t=3, patch_size=32)
    s = ds[0]
    assert len(s["input"]["S2"]) == 3 and s["input"]["S2"][0].shape == (13, 32, 32)
    batch = collate_multi([ds[0], ds[1]], use_sar=True)
    assert batch["x"].shape == (2, 3, 32, 32, 15)
    assert batch["y"].shape == (2, 1, 32, 32, 13)
    assert batch["dates"].shape == (2, 3)
    assert batch["masks"].shape == (2, 3, 32, 32)


def test_synthetic_mono_collation():
    ds = SyntheticSEN12MSCR(n_samples=4, patch_size=32)
    batch = collate_mono([ds[0], ds[1]], use_sar=True)
    assert batch["x"].shape == (2, 1, 32, 32, 15)
    assert batch["dates"] is None


def test_loader_determinism_and_epoch_reshuffle():
    ds = SyntheticSEN12MSCRTS(n_samples=8, n_input_t=2, patch_size=16)
    dl = BatchLoader(ds, batch_size=2, shuffle=True, seed=5, num_workers=2)
    dl.set_epoch(1)
    a = [b["x"].sum() for b in dl]
    dl.set_epoch(1)
    b = [b["x"].sum() for b in dl]
    assert a == b                      # same epoch -> same order
    dl.set_epoch(2)
    c = [b["x"].sum() for b in dl]
    assert a != c                      # reshuffled across epochs
    assert len(dl) == 4


def test_random_sampler_reproduces_across_resume():
    """The 'random' sampler rng is a pure function of (seed, epoch_count):
    a fresh dataset replayed to epoch k samples identically to one that
    trained through epochs 0..k (VERDICT r1 item 5; reference analogue
    train_reconstruct.py:99-109,663-676)."""
    from uncrtaints_tpu.data.sen12mscrts import SEN12MSCRTS

    def mk():
        # custom_samples=[] skips filesystem indexing; we only exercise the
        # sampler rng plumbing
        ds = SEN12MSCRTS("/nonexistent", split="all", sampler="random",
                         n_input_samples=3, custom_samples=[], seed=7)
        ds.custom_samples = None
        return ds

    # many clear frames (<1e-3) so the random target choice actually varies
    cov = [0.0 if i % 2 == 0 else 0.5 for i in range(30)]
    a, b = mk(), mk()
    # identical seeds -> identical per-item choices, epoch by epoch
    for _ in range(3):
        assert [a._sample_indices(cov, p) for p in range(5)] == \
               [b._sample_indices(cov, p) for p in range(5)]
        a.incr_epoch_count()
        b.incr_epoch_count()

    # resume: c jumps straight to a's epoch (3 increments above) and must
    # match its state
    c = mk()
    c.set_epoch_count(3)
    seq_a = [a._sample_indices(cov, p) for p in range(5)]
    seq_c = [c._sample_indices(cov, p) for p in range(5)]
    assert seq_a == seq_c

    # thread-order independence: accessing items in ANY order gives the
    # same per-item choices (the loader's worker pool calls __getitem__
    # concurrently -- draws must not depend on arrival order)
    seq_rev = [c._sample_indices(cov, p) for p in reversed(range(5))]
    assert seq_a == list(reversed(seq_rev))

    # items must not all sample identically within an epoch
    assert len({tuple(s[0]) + (s[1],) for s in seq_a}) > 1

    # different seed -> (eventually) different choices
    d = SEN12MSCRTS("/nonexistent", split="all", sampler="random",
                    n_input_samples=3, custom_samples=[], seed=8)
    d.set_epoch_count(3)
    seq_d = [d._sample_indices(cov, p) for p in range(5)]
    assert seq_a != seq_d
