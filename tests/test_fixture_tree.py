"""On-disk fixture-tree tests for the real-data code paths.

These are exactly the paths a user cannot exercise without the 600 GB
dataset (VERDICT r2 weak 4): SEN12MSCRTS.get_paths split filtering, the
online / imported-index / imported-coverage acquisition modes incl. the
epoch-wrapped ``adj_pdx``, get_pairedS1 globbing, and SEN12MSCR's
s1 -> s2 / s2_cloudy path substitution (dataLoader.py:156-190, 398-520,
554-700 semantics). GeoTIFF decode is monkeypatched to .npy payloads so no
GDAL is needed; everything else (indexing, masking, sampling, rescaling,
dict assembly) runs for real."""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

import uncrtaints_tpu.data.sen12mscrts as ts_mod
import uncrtaints_tpu.data.sen12mscr as cr_mod
from uncrtaints_tpu.data.preprocess import process_MS, process_SAR
from uncrtaints_tpu.data.masks import get_cloud_map
from uncrtaints_tpu.data.samplers import fixed_sampler

HW = 8
T = 30
N_PATCH = 2
TRAIN_ROI = ("ROIs1868", "114")   # in splits_ts('all')['train']
TEST_ROI = ("ROIs1158", "106")    # in splits_ts('all')['test']


def _date(t):
    return (datetime(2018, 1, 1) + timedelta(days=5 * t)).strftime("%Y-%m-%d")


def _frame(roi, mod, t, p):
    """Deterministic content per (roi, modality, time, patch). S2 brightness
    rises with t (so does detector coverage); small noise breaks ties."""
    import zlib
    c = 2 if mod == "S1" else 13
    # zlib.crc32, not hash(): str hashing is randomized per process and the
    # frame content must be reproducible inside one test run AND across runs
    rng = np.random.default_rng(zlib.crc32(f"{roi}/{mod}/{t}/{p}".encode()))
    if mod == "S1":
        return (-25.0 + 25.0 * rng.random((c, HW, HW))).astype(np.float32)
    base = 0.05 + 0.012 * t
    v = base + 0.01 * rng.random((c, HW, HW))
    return (v * 10000.0).astype(np.float32)


def _fname(mod, roi_dir, roi, t, p):
    return f"{mod.lower()}_{roi_dir}_{roi}_ImgNo_{t}_{_date(t)}_patch_{p}.tif"


@pytest.fixture(scope="module")
def ts_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sen12mscrts"))
    for roi_dir, roi in (TRAIN_ROI, TEST_ROI):
        for mod in ("S1", "S2"):
            for t in range(T):
                d = os.path.join(root, roi_dir, roi, mod, str(t))
                os.makedirs(d)
                for p in range(N_PATCH):
                    with open(os.path.join(
                            d, _fname(mod, roi_dir, roi, t, p)), "wb") as f:
                        np.save(f, _frame(roi, mod, t, p))
    return root


@pytest.fixture(autouse=True)
def npy_tifs(monkeypatch):
    def fake_read(path):
        with open(path, "rb") as f:
            return np.load(f)
    monkeypatch.setattr(ts_mod, "read_tif_img", fake_read)
    monkeypatch.setattr(cr_mod, "read_tif_img", fake_read)
    # the payloads are .npy, not tif: bounds are not parseable (the real-tif
    # decode paths are covered by test_fixture_tree_realtif.py)
    monkeypatch.setattr(ts_mod, "read_tif_bounds", lambda p: [0.0] * 4)
    monkeypatch.setattr(cr_mod, "read_tif_bounds", lambda p: [0.0] * 4)
    yield


def _make_ds(root, **kw):
    base = dict(split="train", region="all",
                cloud_masks="cloud_cloudshadow_mask",
                sample_type="cloudy_cloudfree", sampler="fixed",
                n_input_samples=3)
    base.update(kw)
    return ts_mod.SEN12MSCRTS(root, **base)


def _expected_coverage(roi, patch):
    cov = []
    for t in range(T):
        m = get_cloud_map(np.moveaxis(_frame(roi, "S2", t, patch), 0, -1),
                          "cloud_cloudshadow_mask")
        cov.append(float(np.mean(m)))
    return cov


# --------------------------------------------------------------------- #
# get_paths

def test_get_paths_split_filtering(ts_tree):
    """dataLoader.py:156-190: only ROIs of the requested split are indexed,
    one sample per spatial patch, 30 paths per modality."""
    train = _make_ds(ts_tree, split="train")
    test = _make_ds(ts_tree, split="test")
    both = _make_ds(ts_tree, split="all")
    assert len(train) == N_PATCH
    assert len(test) == N_PATCH
    assert len(both) == 2 * N_PATCH
    assert all(f"{TRAIN_ROI[0]}/{TRAIN_ROI[1]}/" in p
               for p in train.paths[0]["S1"])
    assert all(f"{TEST_ROI[0]}/{TEST_ROI[1]}/" in p
               for p in test.paths[0]["S2"])
    for pd in (train.paths[0], test.paths[0]):
        assert len(pd["S1"]) == T and len(pd["S2"]) == T
    # time ordering: path t lives under .../S1/<t>/
    for t, p in enumerate(train.paths[0]["S1"]):
        assert f"/S1/{t}/" in "/" + p.replace(os.sep, "/")


def test_get_paths_patch_alignment(ts_tree):
    """Patch pdx pairs the SAME spatial patch number across modalities and
    time (get_paths transposes [time][patch] -> [patch][time])."""
    ds = _make_ds(ts_tree, split="train")
    for pdx in range(N_PATCH):
        nums = {p.rsplit("patch_", 1)[1].split(".")[0]
                for p in ds.paths[pdx]["S1"] + ds.paths[pdx]["S2"]}
        assert len(nums) == 1


# --------------------------------------------------------------------- #
# online mode (dataLoader.py:458-463)

def test_online_mode_fixed_sampler(ts_tree):
    ds = _make_ds(ts_tree, split="train")
    s = ds[0]

    roi = TRAIN_ROI[1]
    cov = _expected_coverage(roi, 0)
    exp_in, exp_tg, exp_match = fixed_sampler(cov, 3, min_cov=0.0, max_cov=1.0)

    assert s["input"]["idx"] == list(exp_in) or list(s["input"]["idx"]) == list(exp_in)
    assert int(s["target"]["idx"]) == int(exp_tg)
    assert bool(s["coverage bin"]) == bool(exp_match)

    # content: inputs are process_MS/process_SAR of the sampled frames
    for k, t in enumerate(exp_in):
        np.testing.assert_allclose(
            s["input"]["S2"][k], process_MS(_frame(roi, "S2", t, 0)),
            rtol=1e-6)
        np.testing.assert_allclose(
            s["input"]["S1"][k], process_SAR(_frame(roi, "S1", t, 0)),
            rtol=1e-6)
        np.testing.assert_allclose(s["input"]["coverage"][k], cov[t],
                                   rtol=1e-6)
    np.testing.assert_allclose(
        s["target"]["S2"][0], process_MS(_frame(roi, "S2", exp_tg, 0)),
        rtol=1e-6)

    # brightness rises with t, so the least-cloudy target is an early frame
    assert exp_tg < 10

    # temporal deltas: days since S1 launch of the sampled acquisition dates
    launch = datetime(2014, 4, 3)
    exp_td = [(datetime.strptime(_date(t), "%Y-%m-%d") - launch).days
              for t in exp_in]
    assert list(s["input"]["S1 TD"]) == exp_td
    assert list(s["input"]["S2 TD"]) == exp_td


def test_online_mode_random_sampler_epoch_reseed(ts_tree):
    ds = _make_ds(ts_tree, split="train", sampler="random")
    a0 = ds[0]["input"]["idx"]
    ds.set_epoch_count(3)
    ds.set_epoch_count(0)
    a0_again = ds[0]["input"]["idx"]
    assert list(a0) == list(a0_again), "same (seed, epoch) must reproduce"
    # the sampled (inputs, target) must vary across epochs -- any single
    # pair of epochs can coincide (few clear frames limit the windows), so
    # look across several
    seen = set()
    for e in range(5):
        ds.set_epoch_count(e)
        s = ds[0]
        seen.add(tuple(list(s["input"]["idx"]) + [int(s["target"]["idx"])]))
    assert len(seen) > 1, "epochs must vary samples"


# --------------------------------------------------------------------- #
# imported-index and imported-coverage modes (dataLoader.py:423-457)

def _write_import(path, pairs):
    np.save(path, np.asarray(pairs, dtype=object), allow_pickle=True)
    return path


def test_imported_index_mode(ts_tree, tmp_path):
    """Precomputed date indices: frames come straight from the import dict;
    the epoch-wrapped adj_pdx walks through surplus pairings."""
    n = N_PATCH
    pairs = {i: {"input": [1 + i, 5, 9], "target": 2}
             for i in range(2 * n)}  # 2 epochs worth
    # distinct second-epoch pairings
    for i in range(n, 2 * n):
        pairs[i] = {"input": [3, 6, 12], "target": 4}
    imp = _write_import(str(tmp_path / "idx.npy"), pairs)

    ds = _make_ds(ts_tree, split="train", import_data_path=imp)
    assert len(ds) == n  # dataset length stays the on-disk patch count
    s = ds[0]
    assert list(s["input"]["idx"]) == [1, 5, 9]
    assert int(s["target"]["idx"]) == 2
    assert bool(s["coverage bin"]) is True
    roi = TRAIN_ROI[1]
    np.testing.assert_allclose(
        s["input"]["S2"][0], process_MS(_frame(roi, "S2", 1, 0)), rtol=1e-6)

    # adj_pdx = (epoch * len + pdx) % n_pairs (dataLoader.py:425)
    ds.incr_epoch_count()
    s2 = ds[0]
    assert list(s2["input"]["idx"]) == [3, 6, 12]
    assert int(s2["target"]["idx"]) == 4
    # wrap-around: epoch 2 revisits the first pairings
    ds.incr_epoch_count()
    assert list(ds[0]["input"]["idx"]) == [1, 5, 9]


def test_imported_coverage_mode_skips_full_read(ts_tree, tmp_path, monkeypatch):
    """Precomputed coverage stats: sampling uses the imported coverage and
    only the SELECTED frames are read ((3+1) x 2 modalities = 8 reads, vs 60+
    in online mode)."""
    roi = TRAIN_ROI[1]
    cov0 = _expected_coverage(roi, 0)
    pairs = {0: {"coverage": cov0, "paths": []},
             1: {"coverage": cov0, "paths": []}}
    imp = _write_import(str(tmp_path / "cov.npy"), pairs)

    reads = []
    real_read = ts_mod.read_tif_img

    def counting_read(path):
        reads.append(path)
        with open(path, "rb") as f:
            return np.load(f)

    monkeypatch.setattr(ts_mod, "read_tif_img", counting_read)
    ds = _make_ds(ts_tree, split="train", import_data_path=imp)
    s = ds[0]
    assert len(reads) == (3 + 1) * 2
    exp_in, exp_tg, _ = fixed_sampler(cov0, 3, min_cov=0.0, max_cov=1.0)
    assert list(s["input"]["idx"]) == list(exp_in)
    assert int(s["target"]["idx"]) == int(exp_tg)


def test_import_dir_resolves_conventional_name(ts_tree, tmp_path):
    """A directory import path resolves to the precompute CLI's file naming
    generic_{t}_{split}_{region}_{mask}.npy (train_reconstruct.py:559-565)."""
    pairs = {0: {"input": [0, 1, 2], "target": 3},
             1: {"input": [0, 1, 2], "target": 3}}
    name = "generic_3_train_all_cloud_cloudshadow_mask.npy"
    _write_import(str(tmp_path / name), pairs)
    ds = _make_ds(ts_tree, split="train", import_data_path=str(tmp_path))
    assert list(ds[0]["input"]["idx"]) == [0, 1, 2]


# --------------------------------------------------------------------- #
# get_pairedS1 (dataLoader.py:110-120)

def test_get_paired_s1(ts_tree):
    roi_dir, roi = TRAIN_ROI
    patch = "/".join([roi_dir, roi, "S2", "4",
                      _fname("S2", roi_dir, roi, 4, 1)])
    paired = ts_mod.get_pairedS1([patch], ts_tree, mod="s1")
    assert paired == ["/".join([roi_dir, roi, "S1", "4",
                                _fname("S1", roi_dir, roi, 4, 1)])]
    # time override fetches the S1 patch of another time point
    paired_t7 = ts_mod.get_pairedS1([patch], ts_tree, mod="s1", time=7)
    assert paired_t7 == ["/".join([roi_dir, roi, "S1", "7",
                                   _fname("S1", roi_dir, roi, 7, 1)])]


# --------------------------------------------------------------------- #
# SEN12MSCR path substitution (dataLoader.py:554-700)

@pytest.fixture(scope="module")
def cr_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sen12mscr"))
    seed = "ROIs1970_fall_s1"
    rois = ["s1_3", "s1_22"]        # both in splits_cr()['train']
    rng = np.random.default_rng(0)
    for roi in rois:
        for p in range(2):
            for mod_seed, mod_roi in (("_s1", "s1"), ("_s2", "s2"),
                                      ("_s2_cloudy", "s2_cloudy")):
                sd = seed.replace("_s1", mod_seed)
                rd = roi.replace("s1", mod_roi)
                d = os.path.join(root, sd, rd)
                os.makedirs(d, exist_ok=True)
                c = 2 if mod_roi == "s1" else 13
                arr = (rng.random((c, HW, HW)) * 2000).astype(np.float32)
                if mod_roi == "s1":
                    arr = -arr / 100.0
                fname = f"{sd}_{roi.split('_')[1]}_p{p}.tif"
                with open(os.path.join(d, fname), "wb") as f:
                    np.save(f, arr)
    # an UNPAIRED s1 patch (no s2/s2_cloudy siblings) that must be skipped
    with open(os.path.join(root, seed, "s1_3", f"{seed}_3_p99.tif"),
              "wb") as f:
        np.save(f, np.zeros((2, HW, HW), np.float32))
    return root


def test_sen12mscr_path_substitution(cr_tree):
    ds = cr_mod.SEN12MSCR(cr_tree, split="train",
                          cloud_masks="cloud_cloudshadow_mask")
    assert len(ds) == 4  # 2 rois x 2 patches; p99 skipped as unpaired
    for pd in ds.paths:
        assert "_s1" in pd["S1"] and "/s1_" in pd["S1"].replace(os.sep, "/")
        assert "_s2" in pd["S2"] and "_s2_cloudy" in pd["S2_cloudy"]
        assert os.path.isfile(pd["S2"]) and os.path.isfile(pd["S2_cloudy"])
    s = ds[0]
    assert s["input"]["S2"].shape == (13, HW, HW)
    assert s["input"]["S1"].shape == (2, HW, HW)
    assert s["target"]["S2"].shape == (13, HW, HW)
    assert 0.0 <= s["input"]["coverage"] <= 1.0
    # input S2 is the CLOUDY frame, target the cloud-free one
    assert "_s2_cloudy" in s["input"]["S2 path"]
    assert "_s2_cloudy" not in s["target"]["S2 path"]


def test_sen12mscr_split_filtering(cr_tree):
    """s1_3 / s1_22 sit in the train split; val/test see nothing here."""
    with pytest.warns(UserWarning, match="No data samples"):
        ds_val = cr_mod.SEN12MSCR(cr_tree, split="val",
                                  cloud_masks="cloud_cloudshadow_mask")
    assert len(ds_val) == 0


def test_precompute_cli_on_fixture_tree(ts_tree, tmp_path):
    """cli/precompute over the on-disk tree: per-patch coverage stats and
    fixed-sampler date indices exported in the reference's
    generic_{t}_{split}_{region}_{mask}.npy format
    (pre_compute_data_samples.py:46-128 parity)."""
    from uncrtaints_tpu.cli import precompute as pc

    out_dir = str(tmp_path / "pre")
    args = pc.create_parser().parse_args([
        "--root", ts_tree, "--split", "train", "--region", "all",
        "--input_t", "3", "--cloud_masks", "cloud_cloudshadow_mask",
        "--out_dir", out_dir, "--sample_dates",
    ])
    out = pc.main(args)
    assert os.path.basename(out) == \
        "generic_3_train_all_cloud_cloudshadow_mask.npy"
    data = np.load(out, allow_pickle=True).item()
    assert len(data) == N_PATCH  # one train ROI x N_PATCH patches
    for entry in data.values():
        assert entry["coverage"].shape == (T,)
        assert np.all((entry["coverage"] >= 0) & (entry["coverage"] <= 1))
        assert len(entry["paths"]["S1"]) == T
        # fixed-sampler indices: input_t inputs + the least-cloudy target
        # (which MAY coincide with an input, dataLoader.py fixed semantics)
        assert len(entry["input"]) == 3
        t = int(entry["target"])
        assert 0 <= t < T
        assert entry["coverage"][t] == entry["coverage"].min()


# --------------------------------------------------------------------- #
# custom-sample mosaic mode (--use_custom, dataLoader.py:383-421)

def test_custom_mosaic_mode(ts_tree, monkeypatch):
    """custom_samples __getitem__: patch lists are spatially mosaicked
    (rasterio.merge faked as a horizontal concat over the 1x2 patch grid),
    masks/coverage come from the RAW mosaic while model inputs are
    process_MS/SAR-rescaled, day offsets parse from the FIRST path's
    filename date, and the reference's target-mask-from-INPUT-rasters quirk
    (dataLoader.py:421) is preserved."""
    import types
    from datetime import date

    roi_dir, roi = TRAIN_ROI

    class FakeSrc:
        def __init__(self, path):
            with open(path, "rb") as f:
                self.arr = np.load(f)

        def close(self):
            pass

    monkeypatch.setattr(ts_mod, "rasterio",
                        types.SimpleNamespace(open=FakeSrc))
    monkeypatch.setattr(ts_mod, "rasterio_merge",
                        lambda srcs: (np.concatenate(
                            [s.arr for s in srcs], axis=-1), None))

    def rel(mod, t):
        return [os.path.join(roi_dir, roi, mod, str(t),
                             _fname(mod, roi_dir, roi, t, p))
                for p in range(N_PATCH)]

    custom = [{"input": {"S1": [rel("S1", t) for t in (0, 1, 2)],
                         "S2": [rel("S2", t) for t in (0, 1, 2)]},
               "target": {"S1": [rel("S1", 29)], "S2": [rel("S2", 29)]}}]
    ds = _make_ds(ts_tree, custom_samples=custom)
    assert len(ds) == 1
    s = ds[0]

    def raw(mod, t):
        return np.concatenate([_frame(roi, mod, t, p)
                               for p in range(N_PATCH)], axis=-1)

    # mosaicked shape: the 1x2 patch grid doubles W
    assert np.asarray(s["input"]["S2"][0]).shape == (13, HW, 2 * HW)
    for t in range(3):
        np.testing.assert_allclose(s["input"]["S2"][t],
                                   process_MS(raw("S2", t), "default"),
                                   rtol=1e-6)
        np.testing.assert_allclose(s["input"]["S1"][t],
                                   process_SAR(raw("S1", t), "default"),
                                   rtol=1e-6)
        exp_mask = get_cloud_map(np.moveaxis(raw("S2", t), 0, -1),
                                 "cloud_cloudshadow_mask")
        np.testing.assert_array_equal(s["input"]["masks"][t], exp_mask)
        assert s["input"]["coverage"][t] == pytest.approx(
            float(np.mean(exp_mask)))

    # day offsets since S1 launch (2014-04-03), parsed from filename dates
    exp_td = [(date(2018, 1, 1) + timedelta(days=5 * t)
               - date(2014, 4, 3)).days for t in (0, 1, 2)]
    assert list(s["input"]["S1 TD"]) == exp_td
    assert list(s["input"]["S2 TD"]) == exp_td

    np.testing.assert_allclose(s["target"]["S2"][0],
                               process_MS(raw("S2", 29), "default"),
                               rtol=1e-6)
    np.testing.assert_allclose(s["target"]["S1"][0],
                               process_SAR(raw("S1", 29), "default"),
                               rtol=1e-6)
    # reference quirk: target masks are computed from the INPUT rasters
    tgt_masks = np.asarray(s["target"]["masks"][0])
    assert tgt_masks.shape[0] == 3
    np.testing.assert_array_equal(
        tgt_masks[0], get_cloud_map(np.moveaxis(raw("S2", 0), 0, -1),
                                    "cloud_cloudshadow_mask"))
    assert s["coverage bin"] is True
