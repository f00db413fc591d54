"""Parity tests for cli/download.py against util/dl_data.sh.

Expected archive names/sizes are hard-coded from dl_data.sh:60-251 -- the
mediaTUM object names are server-side facts, so the manifest must match
them byte-for-byte or the fetch 404s.
"""

import os
import tarfile

from uncrtaints_tpu.cli import download as dl


def test_ts_train_archive_names_match_reference():
    m = dl.build_manifest("sen12mscrts", ["train"], dl.REGIONS, ["s2", "s1"])
    names = {a.filename for a in m}
    assert names == {
        "s2_africa.tar.gz", "s2_america.tar.gz", "s2_asiaEast.tar.gz",
        "s2_asiaWest.tar.gz", "s2_europa.tar.gz",
        "s1_africa.tar.gz", "s1_america.tar.gz", "s1_asiaEast.tar.gz",
        "s1_asiaWest.tar.gz", "s1_europa.tar.gz",
    }
    assert all(a.object_id == "1639953" for a in m)
    # spot-check sizes from vol_dict
    by_name = {a.filename: a.sectors for a in m}
    assert by_name["s2_africa.tar.gz"] == 98233900
    assert by_name["s1_europa.tar.gz"] == 121213836


def test_ts_test_archive_names_match_reference():
    m = dl.build_manifest("sen12mscrts", ["test"], ["asiaWest"], ["s2", "s1"])
    assert {a.filename for a in m} == {"s2_asiaWest_test.tar.gz",
                                       "s1_asiaWest_test.tar.gz"}
    assert all(a.object_id == "1659251" for a in m)
    assert {a.sectors for a in m} == {15012924, 9252904}


def test_cr_manifest_includes_paired_cloudy():
    """dl_data.sh:211-251 always fetches s2 AND s2_cloudy for SEN12MS-CR."""
    m = dl.build_manifest("sen12mscr", [], [], ["s2"], seasons=["spring"])
    assert {a.filename for a in m} == {"ROIs1158_spring_s2.tar.gz",
                                       "ROIs1158_spring_s2_cloudy.tar.gz"}
    m = dl.build_manifest("sen12mscr", [], [], ["s2", "s1"])
    assert len(m) == 12  # 4 seasons x (s2, s2_cloudy, s1)
    assert {a.object_id for a in m} == {"1554803"}
    by_name = {a.filename: a.sectors for a in m}
    assert by_name["ROIs2017_winter_s1.tar.gz"] == 9460956
    assert by_name["ROIs1970_fall_s2_cloudy.tar.gz"] == 68292448


def test_url_format_matches_reference():
    a = dl.build_manifest("sen12mscrts", ["train"], ["africa"], ["s2"])[0]
    assert a.url == ("https://dataserv.ub.tum.de/s/m1639953/download"
                     "?path=/&files=s2_africa.tar.gz")


def test_disk_space_check(tmp_path):
    m = dl.build_manifest("sen12mscrts", ["train"], dl.REGIONS, ["s1", "s2"])
    # full TS train set is ~500 GB; tmp almost surely has less -> must raise
    import pytest
    avail = dl.available_sectors(str(tmp_path))
    if avail < dl.required_sectors(m):
        with pytest.raises(RuntimeError, match="Not enough space"):
            dl.check_disk_space(m, str(tmp_path))
    tiny = dl.build_manifest("sen12mscrts", ["train"], ["africa"], ["s2"])[:1]
    tiny[0].sectors = 1
    dl.check_disk_space(tiny, str(tmp_path))  # must not raise


def test_fetch_steps_order_and_arrange():
    m = dl.build_manifest("sen12mscrts", ["train", "test"], ["africa"], ["s2"])
    steps = dl.fetch_steps(m, "/data")
    kinds = [s[0] for s in steps]
    # mkdir first, per-archive download/extract/rm, then arrange merges
    assert kinds[0] == "mkdir" and steps[0][1] == "/data/SEN12MSCRTS"
    assert kinds[1:7] == ["download", "extract", "rm"] * 2
    assert kinds[7:] == ["merge", "merge"]
    # train: prefix-stripped region dir; test: full archive-name dir
    assert steps[7][1:] == ("/data/africa", "/data/SEN12MSCRTS")
    assert steps[8][1:] == ("/data/s2_africa_test", "/data/SEN12MSCRTS")

    mono = dl.build_manifest("sen12mscr", [], [], ["s1"], seasons=["winter"])
    msteps = dl.fetch_steps(mono, "/d")
    assert msteps[0] == ("mkdir", "/d/SEN12MSCR")
    assert msteps[-1] == ("move", "/d/ROIs2017_winter_s1", "/d/SEN12MSCR")


def test_run_steps_end_to_end(tmp_path):
    """Execute a real plan against a synthetic archive: extract + merge must
    produce the SEN12MSCRTS layout with train/test ROIs merged."""
    dest = str(tmp_path)
    # synthetic "s2_africa.tar.gz": africa/ROIs0000/1/S2/0/x.tif
    src = tmp_path / "africa" / "ROIs0000" / "1" / "S2" / "0"
    os.makedirs(src)
    (src / "img.tif").write_bytes(b"x")
    ar = tmp_path / "s2_africa.tar.gz"
    with tarfile.open(ar, "w:gz") as tf:
        tf.add(tmp_path / "africa", arcname="africa")
    import shutil
    shutil.rmtree(tmp_path / "africa")

    m = dl.build_manifest("sen12mscrts", ["train"], ["africa"], ["s2"])
    steps = [s for s in dl.fetch_steps(m, dest) if s[0] != "download"]
    for s in steps:
        dl.run_step(s)
    assert os.path.exists(
        tmp_path / "SEN12MSCRTS" / "ROIs0000" / "1" / "S2" / "0" / "img.tif")
    assert not os.path.exists(ar)           # archive deleted
    assert not os.path.exists(tmp_path / "africa")  # merged away


def test_merge_tree_merges_into_existing(tmp_path):
    """train + test share ROI collections: merging must not clobber."""
    a = tmp_path / "new" / "ROIs0000" / "5" / "S1" / "0"
    b = tmp_path / "SEN12MSCRTS" / "ROIs0000" / "1" / "S1" / "0"
    os.makedirs(a), os.makedirs(b)
    (a / "n.tif").write_bytes(b"n")
    (b / "o.tif").write_bytes(b"o")
    dl._merge_tree(str(tmp_path / "new"), str(tmp_path / "SEN12MSCRTS"))
    root = tmp_path / "SEN12MSCRTS" / "ROIs0000"
    assert (root / "5" / "S1" / "0" / "n.tif").exists()
    assert (root / "1" / "S1" / "0" / "o.tif").exists()


def test_dry_run_prints_plan(capsys):
    args = dl.create_parser().parse_args(
        ["--dataset", "sen12mscrts", "--splits", "test", "--regions",
         "africa", "--modalities", "s2", "--dest", "/tmp/_dlplan",
         "--skip_space_check"])
    dl.main(args)
    out = capsys.readouterr().out
    assert "s2_africa_test.tar.gz" in out
    assert "dry run" in out
    assert "wget --no-check-certificate -c" in out


def test_s2cloudless_weights_plan(capsys):
    args = dl.create_parser().parse_args(["--s2cloudless-weights"])
    dl.main(args)
    out = capsys.readouterr().out
    assert dl.S2CLOUDLESS_MODEL in out
