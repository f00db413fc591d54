"""The TB-less Writer fallback must PERSIST images/figures/histograms as
files (the reference always persists its figures,
/root/reference/model/train_reconstruct.py:466-471) instead of silently
dropping them, plus scalars to scalars.jsonl with an index line per media
artifact."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture
def fallback_writer(tmp_path, monkeypatch):
    # poison the tensorflow import so Writer takes the JSONL fallback path
    monkeypatch.setitem(sys.modules, "tensorflow", None)
    from uncrtaints_tpu.train.observe import Writer

    w = Writer(str(tmp_path / "logs"))
    assert w._writer is None, "fallback path not taken"
    yield w
    w.close()


def _jsonl_lines(logdir):
    with open(os.path.join(logdir, "scalars.jsonl")) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_scalars_land_in_jsonl(fallback_writer):
    fallback_writer.add_scalar("train/loss", 0.5, 3)
    rows = _jsonl_lines(fallback_writer.logdir)
    assert rows == [{"tag": "train/loss", "value": 0.5, "step": 3}]


def test_images_persist_as_png(fallback_writer):
    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    fallback_writer.add_image("Img/train/out", img, 7)
    rows = _jsonl_lines(fallback_writer.logdir)
    assert len(rows) == 1 and rows[0]["tag"] == "Img/train/out"
    path = os.path.join(fallback_writer.logdir, rows[0]["file"])
    assert os.path.exists(path) and path.endswith(".png")
    assert os.path.getsize(path) > 0


def test_single_channel_image(fallback_writer):
    img = np.zeros((8, 8, 1), np.float32)
    fallback_writer.add_image("Img/train/m", img, 0)
    rows = _jsonl_lines(fallback_writer.logdir)
    assert os.path.exists(os.path.join(fallback_writer.logdir,
                                       rows[0]["file"]))


def test_figures_persist_as_png(fallback_writer):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots()
    ax.plot([0, 1], [1, 0])
    fallback_writer.add_figure("Img/val/discard_uncertain", fig, 2)
    plt.close(fig)
    rows = _jsonl_lines(fallback_writer.logdir)
    path = os.path.join(fallback_writer.logdir, rows[0]["file"])
    assert os.path.exists(path) and os.path.getsize(path) > 0
    # tag sanitized into one flat path-safe filename
    assert "/" not in rows[0]["file"].split("media" + os.sep, 1)[1]


def test_histograms_persist_as_npy(fallback_writer):
    vals = np.arange(32, dtype=np.float32)
    fallback_writer.add_histogram("Hist/val/aleatoric", vals, 5)
    rows = _jsonl_lines(fallback_writer.logdir)
    path = os.path.join(fallback_writer.logdir, rows[0]["file"])
    np.testing.assert_array_equal(np.load(path), vals)
