"""Config-system tests: flag surface, derived rules, JSON round-trip.

Derived-rule semantics cited from /root/reference/model/train_reconstruct.py:36-84.
"""

import json

import pytest

from uncrtaints_tpu.config import (
    Config, create_parser, parse_config, derive, input_dim,
    NO_OVERWRITE_RESUME,
)


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.model == "uncrtaints"
    assert cfg.encoder_widths == [128]
    assert cfg.decoder_widths == [128] * 5
    assert cfg.out_conv == [13]
    assert cfg.loss == "MGNLL"
    assert cfg.covmode == "diag"
    assert cfg.n_head == 16 and cfg.d_model == 256 and cfg.d_k == 4
    assert cfg.input_t == 3 and cfg.batch_size == 4 and cfg.lr == 1e-2
    assert cfg.mean_nonLinearity and cfg.positional_encoding and cfg.vary_samples


def test_store_false_flag_inversion():
    # reference quirk: passing the flag DISABLES the feature (parse_args.py:31,43,72)
    cfg = parse_config(["--mean_nonLinearity", "--positional_encoding", "--vary_samples"])
    assert not cfg.mean_nonLinearity
    assert not cfg.positional_encoding
    assert not cfg.vary_samples


def test_widths_string_coercion():
    cfg = parse_config(["--encoder_widths", "[64,64,128]", "--decoder_widths", "[32,64,128]"])
    cfg = derive(cfg.replace(model="utae"))
    assert cfg.encoder_widths == [64, 64, 128]
    assert cfg.decoder_widths == [32, 64, 128]


def test_derive_mgnll_diag_adds_13_channels():
    cfg = derive(Config())
    # out_conv [13] -> [26] and softplus forced (train_reconstruct.py:59-61)
    assert cfg.out_conv == [26]
    assert cfg.var_nonLinearity == "softplus"


def test_derive_gnll_forces_uni():
    cfg = derive(Config(loss="GNLL", covmode="diag"))
    assert cfg.covmode == "uni"
    assert cfg.out_conv == [26]


def test_derive_iso_adds_one_channel():
    cfg = derive(Config(covmode="iso"))
    assert cfg.out_conv == [14]


def test_derive_unet_forces_pretrain_and_l2():
    cfg = derive(Config(model="unet",
                        encoder_widths=[64, 64, 128], decoder_widths=[32, 64, 128]))
    assert cfg.loss == "l2"
    assert cfg.pretrain
    assert cfg.batch_size == 32
    assert cfg.input_t == 1 and cfg.n_head == 1
    assert cfg.sample_type == "pretrain"
    assert not cfg.positional_encoding


def test_derive_utae_depth_mismatch_raises():
    with pytest.raises(AssertionError):
        derive(Config(model="utae", encoder_widths=[64, 64], decoder_widths=[64]))


def test_input_dim():
    assert input_dim(Config(use_sar=False)) == 13
    assert input_dim(Config(use_sar=True)) == 15


def test_json_round_trip(tmp_path):
    cfg = derive(Config(use_sar=True, scale_by=10.0))
    p = tmp_path / "conf.json"
    cfg.save_json(str(p))
    loaded = Config.load_json(str(p))
    assert loaded == cfg


def test_merge_json_respects_no_overwrite(tmp_path):
    old = derive(Config(lr=1e-3, epochs=7, region="africa"))
    p = tmp_path / "conf.json"
    old.save_json(str(p))
    new = Config(lr=5e-4, epochs=99, region="all")
    merged = new.merge_json(str(p), NO_OVERWRITE_RESUME)
    assert merged.lr == 5e-4            # protected
    assert merged.epochs == 99          # protected
    assert merged.region == "africa"    # overwritten from file


def test_resume_lr_rescale():
    from uncrtaints_tpu.config import apply_resume
    cfg = Config(resume_at=3, gamma=0.8, lr=1.0, resume_from=False)
    cfg = apply_resume(cfg)
    assert abs(cfg.lr - 0.8 ** 3) < 1e-12
