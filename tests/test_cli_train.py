"""End-to-end CLI smoke: train -> val -> test through uncrtaints_tpu.cli.train
on tiny synthetic data (the suite's analogue of the reference's runnable
smoke scripts, SURVEY.md section 4). Exercises iterate() -- including the
whole-batch eval metrics path, plot/export hooks, checkpointing, trainlog --
none of which unit tests cover."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e CLI chains (see pyproject markers)


def _tiny_cfg(tmp_path, **overrides):
    from uncrtaints_tpu.config import Config, derive
    base = dict(
        use_sar=True, scale_by=10.0, batch_size=8, lr=1e-3,  # conftest mesh has 8 devices
        epochs=1, input_t=3, max_samples_count=8,
        synthetic_data=True, res_dir=str(tmp_path), experiment_name="smoke",
        encoder_widths=[16], decoder_widths=[16, 16], n_head=4, d_model=32,
        plot_every=4, export_every=4, display_step=1,
    )
    base.update(overrides)
    return derive(Config(**base))


def test_cli_train_end_to_end(tmp_path, monkeypatch):
    import uncrtaints_tpu.cli.train as cli_train
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS

    cfg = _tiny_cfg(tmp_path)

    # shrink the synthetic patches so the CPU-mesh compile stays fast
    mk = lambda seed: SyntheticSEN12MSCRTS(
        n_samples=8, n_input_t=cfg.input_t, patch_size=32, seed=seed)
    monkeypatch.setattr(cli_train, "build_datasets",
                        lambda c: (mk(1), mk(2), mk(3)))

    metrics = cli_train.main(cfg)

    exp = os.path.join(str(tmp_path), "smoke")
    assert os.path.isfile(os.path.join(exp, "conf.json"))
    assert os.path.isfile(os.path.join(exp, "trainlog.json"))
    assert os.path.isfile(os.path.join(exp, "model.ckpt"))
    assert os.path.isfile(os.path.join(exp, "test_metrics.json"))

    with open(os.path.join(exp, "test_metrics.json")) as f:
        tm = json.load(f)
    for key in ("RMSE", "MAE", "PSNR", "SAM", "SSIM",
                "mean var", "UCE SE", "AUCE SE"):
        assert key in tm and np.isfinite(tm[key]), key

    # plot/export hooks fired (plot_every/export_every = 4 over 8 samples)
    plots = []
    for root, _, files in os.walk(os.path.join(exp, "plots")):
        plots += [f for f in files if f.endswith(".png")]
    assert plots, "plot_every produced no images"
    # all six reference panels, incl. the discrete-matshow mask panel
    # (train_reconstruct.py:341-346)
    for panel in ("in", "pred", "target", "err", "var", "mask"):
        assert any(f"_{panel}" in f for f in plots), panel
    exports = []
    for root, _, files in os.walk(os.path.join(exp, "export")):
        exports += [f for f in files if f.endswith(".npy")]
    assert any("pred" in f for f in exports)
    assert any("target" in f for f in exports)
    assert any("var" in f for f in exports)

    # the discard-curve calibration artifact of the final test pass
    assert os.path.isfile(os.path.join(exp, "plot_test_SE_discard.png"))


def test_cli_test_end_to_end(tmp_path, monkeypatch):
    """cli.test against a cli.train run: conf.json merge (stored model
    hyperparams win over fresh arg defaults, NO_OVERWRITE list respected),
    best-checkpoint load, test-split iterate, metrics file written — the
    reference's test_reconstruct.py flow."""
    import uncrtaints_tpu.cli.train as cli_train
    import uncrtaints_tpu.cli.test as cli_test
    from uncrtaints_tpu.config import Config
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS

    cfg = _tiny_cfg(tmp_path)
    mk = lambda seed: SyntheticSEN12MSCRTS(
        n_samples=8, n_input_t=cfg.input_t, patch_size=32, seed=seed)
    fake = lambda c: (mk(1), mk(2), mk(3))
    monkeypatch.setattr(cli_train, "build_datasets", fake)
    monkeypatch.setattr(cli_test, "build_datasets", fake)
    cli_train.main(cfg)

    out_dir = tmp_path / "test_out"
    tcfg = cli_test.load_test_config([
        "--experiment_name", "smoke",
        "--weight_folder", str(tmp_path),
        "--res_dir", str(out_dir),
        "--max_samples_count", "4",
        "--batch_size", "4",
        "--input_t", "3",
    ])
    # merged from the stored conf.json (defaults differ)
    assert tcfg.encoder_widths == [16]
    assert tcfg.decoder_widths == [16, 16]
    assert tcfg.n_head == 4 and tcfg.d_model == 32
    # NO_OVERWRITE_TEST: the fresh CLI values win over the stored run's
    assert tcfg.res_dir == str(out_dir)
    assert tcfg.weight_folder == str(tmp_path)
    assert tcfg.max_samples_count == 4 and tcfg.batch_size == 4

    metrics = cli_test.main(tcfg)
    assert metrics and np.isfinite(metrics["RMSE"])
    assert os.path.isfile(os.path.join(str(out_dir), "smoke",
                                       "test_metrics.json"))

    # mesh-sharded eval: same checkpoint, batch sharded over a 2-device
    # data mesh (params replicated). Metrics are sample-weighted, so the
    # sharded run must reproduce the unsharded one up to reduction order.
    scfg = cli_test.load_test_config([
        "--experiment_name", "smoke",
        "--weight_folder", str(tmp_path),
        "--res_dir", str(tmp_path / "test_out_mesh"),
        "--max_samples_count", "4",
        "--batch_size", "4",
        "--input_t", "3",
        "--mesh_shape", "2",
    ])
    sharded = cli_test.main(scfg)
    for key in ("RMSE", "MAE", "PSNR", "SSIM"):
        assert sharded[key] == pytest.approx(metrics[key], rel=1e-4), key


def test_cli_train_pretrain_mono(tmp_path):
    """End-to-end mono pretrain (--model unet): derive forces pretrain /
    sample_type / input_t=1 / l2 loss / batch 32 (train_reconstruct.py:39-51
    rules), data comes from the synthetic SEN12MSCR twin, and the whole
    train -> val -> test loop runs without a variance head."""
    import uncrtaints_tpu.cli.train as cli_train
    from uncrtaints_tpu.config import Config, derive

    cfg = derive(Config(model="unet", use_sar=True, scale_by=10.0,
                        batch_size=8, lr=1e-3, epochs=1,
                        synthetic_data=True, synthetic_patch=32,
                        max_samples_count=32,
                        res_dir=str(tmp_path), experiment_name="mono",
                        encoder_widths=[16, 16], decoder_widths=[16, 16],
                        plot_every=-1, export_every=-1, display_step=1))
    assert cfg.pretrain and cfg.loss == "l2" and cfg.input_t == 1
    assert cfg.batch_size == 32          # unet rule (train_reconstruct.py:51)

    metrics = cli_train.main(cfg)

    exp = os.path.join(str(tmp_path), "mono")
    assert os.path.isfile(os.path.join(exp, "model.ckpt"))
    with open(os.path.join(exp, "test_metrics.json")) as f:
        tm = json.load(f)
    for key in ("RMSE", "MAE", "PSNR", "SAM", "SSIM"):
        assert key in tm and np.isfinite(tm[key]), key


def test_cli_train_resume_end_to_end(tmp_path):
    """--resume_from --trained_checkp --resume_at k: conf.json merged with
    the NO_OVERWRITE_RESUME list, lr rescaled by gamma^k, training continues
    at epoch k+1 with the restored optimizer step counter
    (train_reconstruct.py:66-84, 645-650 semantics)."""
    import uncrtaints_tpu.cli.train as cli_train
    from uncrtaints_tpu.config import Config, derive, apply_resume

    def mk_cfg(**kw):
        base = dict(use_sar=True, scale_by=10.0, batch_size=8, lr=1e-3,
                    input_t=3, synthetic_data=True, synthetic_patch=32,
                    max_samples_count=8, res_dir=str(tmp_path),
                    experiment_name="res", encoder_widths=[16],
                    decoder_widths=[16, 16], n_head=4, d_model=32,
                    plot_every=-1, export_every=-1, display_step=1)
        base.update(kw)
        return derive(Config(**base))

    cli_train.main(mk_cfg(epochs=2))
    exp = os.path.join(str(tmp_path), "res")
    assert os.path.isfile(os.path.join(exp, "model_epoch_2.ckpt"))

    ckpt = os.path.join(exp, "model_epoch_2.ckpt")
    cfg2 = apply_resume(mk_cfg(epochs=3, resume_from=True,
                               trained_checkp=ckpt, resume_at=2))
    assert cfg2.lr == pytest.approx(1e-3 * cfg2.gamma ** 2)

    out = cli_train.main(cfg2)

    # only epoch 3 ran in the resumed process
    assert set(map(int, out["trainlog"])) == {3}
    assert os.path.isfile(os.path.join(exp, "model_epoch_3.ckpt"))
    # optimizer step counter continued: 1 step/epoch (8 samples at B=8)
    with open(os.path.join(exp, "model_epoch_3.meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 3 and meta["step"] == 3


@pytest.mark.parametrize("overrides", [
    dict(loss="GNLL"),                      # derive forces covmode=uni
    dict(loss="MGNLL", covmode="iso"),      # 1-channel variance head
], ids=["gnll_uni", "mgnll_iso"])
def test_cli_train_other_uncertainty_heads(tmp_path, monkeypatch, overrides):
    """End-to-end train -> val -> test for the non-default uncertainty
    recipes: GNLL (univariate, covmode forced uni) and MGNLL iso (scalar
    variance channel broadcast over bands). Exercises the 1-channel /
    13-channel variance split through metrics, calibration, and export."""
    import uncrtaints_tpu.cli.train as cli_train
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS

    cfg = _tiny_cfg(tmp_path, experiment_name="head", export_every=4,
                    plot_every=-1, **overrides)
    mk = lambda seed: SyntheticSEN12MSCRTS(
        n_samples=8, n_input_t=cfg.input_t, patch_size=32, seed=seed)
    monkeypatch.setattr(cli_train, "build_datasets",
                        lambda c: (mk(1), mk(2), mk(3)))

    out = cli_train.main(cfg)

    tm = out["test"]
    for key in ("RMSE", "MAE", "PSNR", "SAM", "SSIM",
                "mean var", "UCE SE", "AUCE SE"):
        assert key in tm and np.isfinite(tm[key]), key

    exports = []
    exp = os.path.join(str(tmp_path), "head")
    for root, _, files in os.walk(os.path.join(exp, "export")):
        exports += files
    assert any("_pred" in f for f in exports)
    if overrides.get("covmode") == "iso":
        # iso exports the compact var map (no [C,C,H,W] covar for a scalar)
        assert any("_var" in f or "_covar" in f for f in exports)
    else:
        assert any("_var" in f for f in exports)  # GNLL: compact var


def test_cli_train_keeps_tail_batch(tmp_path, monkeypatch):
    """drop_last=False parity (train_reconstruct.py:589-609): with 10
    samples at B=8 the tail batch of 2 must train AND be evaluated/exported
    -- on the 8-device mesh the non-divisible tail runs replicated instead
    of crashing the batch sharding."""
    import uncrtaints_tpu.cli.train as cli_train
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS

    cfg = _tiny_cfg(tmp_path, experiment_name="tail", max_samples_count=10,
                    plot_every=-1, export_every=1)
    mk = lambda seed: SyntheticSEN12MSCRTS(
        n_samples=10, n_input_t=cfg.input_t, patch_size=32, seed=seed)
    monkeypatch.setattr(cli_train, "build_datasets",
                        lambda c: (mk(1), mk(2), mk(3)))

    out = cli_train.main(cfg)
    for key in ("RMSE", "MAE", "PSNR"):
        assert np.isfinite(out["test"][key])

    # every test sample -- including the tail two -- was exported
    export_dir = os.path.join(str(tmp_path), "tail", "export",
                              "epoch_1", "test")
    preds = [f for f in os.listdir(export_dir) if "_pred" in f]
    assert len(preds) == 10, sorted(preds)
