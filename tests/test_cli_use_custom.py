"""End-to-end ``cli.test --use_custom``: the reference's README demo path
(test_reconstruct.py:27-36, 72-77) — a mosaiced 3x3-patch custom sample of
ROIs1868/73 with get_pairedS1-derived S1 paths, run through the REAL test
CLI. GeoTIFF decode is .npy-monkeypatched and rasterio.merge is faked as a
horizontal concat, so the whole chain (path construction, glob pairing,
mosaicing, masking, collation, eval, metrics JSON) runs without GDAL."""

import json
import os
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e CLI chains (see pyproject markers)

HW = 8          # per-patch size; mosaic = [C, 8, 72]
PATCHES = [171, 172, 173, 187, 188, 189, 203, 204, 205]


@pytest.fixture()
def custom_tree(tmp_path):
    root = str(tmp_path / "data")
    for i, date in [(1, "2017-07-16"), (2, "2017-07-16"), (3, "2017-07-16"),
                    (30, "2018-06-21")]:
        for mod, c in (("S2", 13), ("S1", 2)):
            d = os.path.join(root, "ROIs1868", "73", mod, str(i))
            os.makedirs(d)
            for j in PATCHES:
                name = (f"{mod.lower()}_ROIs1868_73_ImgNo_{i}_{date}"
                        f"_patch_{j}.tif")
                rng = np.random.default_rng(i * 1000 + j + (mod == "S1"))
                if mod == "S1":
                    arr = (-25.0 * rng.random((c, HW, HW))).astype(np.float32)
                else:
                    arr = (rng.random((c, HW, HW)) * 4000.0 + 500.0
                           ).astype(np.float32)
                with open(os.path.join(d, name), "wb") as f:
                    np.save(f, arr)
    return root


def test_cli_test_use_custom(custom_tree, tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import uncrtaints_tpu.data.sen12mscrts as ts_mod
    from uncrtaints_tpu.cli import test as cli_test
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state
    from uncrtaints_tpu.train.checkpoint import save_checkpoint

    class FakeSrc:
        def __init__(self, path):
            with open(path, "rb") as f:
                self.arr = np.load(f)

        def close(self):
            pass

    def fake_read(path):
        with open(path, "rb") as f:
            return np.load(f)

    monkeypatch.setattr(ts_mod, "rasterio",
                        types.SimpleNamespace(open=FakeSrc))
    monkeypatch.setattr(ts_mod, "rasterio_merge",
                        lambda srcs: (np.concatenate(
                            [s.arr for s in srcs], axis=-1), None))
    monkeypatch.setattr(ts_mod, "read_tif_img", fake_read)

    cfg = derive(Config(
        use_sar=True, scale_by=10.0, batch_size=1, lr=1e-3, input_t=3,
        use_custom=True, low_res_size=HW, num_workers=1, resume_at=-1,
        cloud_masks="cloud_cloudshadow_mask",
        root1=custom_tree, res_dir=str(tmp_path), weight_folder=str(tmp_path),
        experiment_name="uc", max_samples_count=1,
        plot_every=-1, export_every=-1,
        encoder_widths=[16], decoder_widths=[16, 16], n_head=4, d_model=32))

    # a checkpoint for the CLI to load
    model = get_generator(cfg)
    W = HW * len(PATCHES)
    init = {"x": jnp.zeros((1, 3, HW, W, input_dim(cfg))),
            "y": jnp.zeros((1, 1, HW, W, 13)),
            "dates": jnp.zeros((1, 3))}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), init)
    os.makedirs(os.path.join(str(tmp_path), "uc"), exist_ok=True)
    save_checkpoint(cfg, epoch=1, state=state, name="model", lr=1e-3)

    metrics = cli_test.main(cfg)

    for key in ("RMSE", "MAE", "PSNR", "SAM", "SSIM", "mean var"):
        assert key in metrics and np.isfinite(metrics[key]), key
    with open(os.path.join(str(tmp_path), "uc", "test_metrics.json")) as f:
        assert json.load(f)["RMSE"] == pytest.approx(metrics["RMSE"])
