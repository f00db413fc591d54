"""In-tree GeoTIFF codec tests (uncrtaints_tpu/data/tiff.py).

The reference's first pipeline stage is a rasterio GeoTIFF read
(/root/reference/data/dataLoader.py:15-16,24-28); this environment has no
GDAL, so data/tiff.py implements the TIFF 6.0 subset the SEN12MS-CR(-TS)
tiles use. Verified three independent ways:

1. round trip through our own writer (all dtype/planar/compression combos);
2. cross-validation against PIL/Pillow — an independent TIFF producer AND
   consumer (PIL writes uncompressed/LZW/deflate/PackBits files our reader
   must decode bit-exactly, and reads back files our writer produced);
3. the SEN12MSCRTS/SEN12MSCR fixture-tree flows re-run on REAL .tif bytes
   (no .npy monkeypatch) in test_fixture_tree_realtif.py.
"""

import io
import os

import numpy as np
import pytest

from uncrtaints_tpu.data import tiff as tf


def _arr(dtype, S=3, H=21, W=17, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return (rng.standard_normal((S, H, W)) * 100).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, (S, H, W), endpoint=True,
                        dtype=dtype)


# --------------------------------------------------------------------- #
# writer -> reader round trips

@pytest.mark.parametrize("dtype", ["u1", "u2", "i2", "u4", "i4", "f4", "f8"])
@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_roundtrip(tmp_path, dtype, planar, compression):
    a = _arr(dtype)
    p = str(tmp_path / "t.tif")
    tf.write_tiff(p, a, planar=planar, compression=compression)
    b = tf.read_tiff(p)
    assert b.dtype == a.dtype
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("dtype", ["u2", "i2", "u1"])
def test_roundtrip_predictor(tmp_path, dtype):
    a = _arr(dtype)
    p = str(tmp_path / "t.tif")
    tf.write_tiff(p, a, compression="deflate", predictor=2)
    np.testing.assert_array_equal(a, tf.read_tiff(p))


def test_roundtrip_13band_sentinel_shape(tmp_path):
    """The actual S2 tile shape: 13-band uint16 DN in [0, ~16k]."""
    rng = np.random.default_rng(7)
    a = rng.integers(0, 16384, (13, 64, 64), dtype=np.uint16)
    p = str(tmp_path / "s2.tif")
    tf.write_tiff(p, a, compression="deflate", predictor=2,
                  rows_per_strip=16)
    np.testing.assert_array_equal(a, tf.read_tiff(p))


def test_roundtrip_multiple_strips_and_2d(tmp_path):
    a = _arr("u2", S=1, H=37, W=11)[0]
    p = str(tmp_path / "t.tif")
    tf.write_tiff(p, a, rows_per_strip=5)
    np.testing.assert_array_equal(a[None], tf.read_tiff(p))


def test_bounds_roundtrip(tmp_path):
    a = _arr("u2", S=2, H=16, W=32)
    p = str(tmp_path / "t.tif")
    bounds = [500000.0, 4100000.0, 500320.0, 4100160.0]  # 10 m pixels
    tf.write_tiff(p, a, bounds=bounds)
    got = tf.read_tiff_bounds(p)
    np.testing.assert_allclose(got, bounds, rtol=1e-12)
    # no geo tags -> rasterio-fallback zeros
    tf.write_tiff(p, a)
    assert tf.read_tiff_bounds(p) == [0.0, 0.0, 0.0, 0.0]


# --------------------------------------------------------------------- #
# cross-validation vs PIL (independent implementation)

PIL = pytest.importorskip("PIL.Image", reason="Pillow not installed")


@pytest.mark.parametrize("pil_comp", [None, "tiff_lzw", "tiff_adobe_deflate",
                                      "packbits"])
def test_read_pil_written_uint8_rgb(tmp_path, pil_comp):
    """PIL-produced multi-band files decode bit-exactly (incl. LZW with the
    early-change code widths and PackBits)."""
    rng = np.random.default_rng(1)
    hwc = rng.integers(0, 255, (40, 33, 3), endpoint=True, dtype=np.uint8)
    img = PIL.fromarray(hwc, "RGB")
    p = str(tmp_path / "pil.tif")
    img.save(p, format="TIFF",
             **({"compression": pil_comp} if pil_comp else {}))
    got = tf.read_tiff(p)
    np.testing.assert_array_equal(got, np.moveaxis(hwc, -1, 0))


@pytest.mark.parametrize("pil_comp", [None, "tiff_adobe_deflate", "tiff_lzw"])
def test_read_pil_written_uint16(tmp_path, pil_comp):
    """Single-band uint16 (the S2 sample type) via PIL's I;16 mode."""
    rng = np.random.default_rng(2)
    hw = rng.integers(0, 65535, (25, 31), endpoint=True, dtype=np.uint16)
    img = PIL.fromarray(hw, "I;16")
    p = str(tmp_path / "pil16.tif")
    img.save(p, format="TIFF",
             **({"compression": pil_comp} if pil_comp else {}))
    np.testing.assert_array_equal(tf.read_tiff(p), hw[None])


def test_pil_reads_our_files(tmp_path):
    """The writer emits spec-conformant files: PIL (independent consumer)
    reads them back bit-exactly."""
    rng = np.random.default_rng(3)
    hw = rng.integers(0, 65535, (19, 23), endpoint=True, dtype=np.uint16)
    for comp in ("none", "deflate"):
        p = str(tmp_path / f"ours_{comp}.tif")
        tf.write_tiff(p, hw[None], compression=comp)
        with PIL.open(p) as img:
            np.testing.assert_array_equal(np.asarray(img), hw)
    # RGB uint8 chunky
    hwc = rng.integers(0, 255, (12, 14, 3), endpoint=True, dtype=np.uint8)
    p = str(tmp_path / "ours_rgb.tif")
    tf.write_tiff(p, np.moveaxis(hwc, -1, 0))
    with PIL.open(p) as img:
        np.testing.assert_array_equal(np.asarray(img.convert("RGB")), hwc)


# --------------------------------------------------------------------- #
# reader robustness details

def test_big_endian_and_tiled(tmp_path):
    """Hand-build a big-endian tiled file (the two layout dimensions our
    writer does not emit) and decode it."""
    import struct
    H = W = 8
    tw = th = 4
    a = np.arange(H * W, dtype=">u2").reshape(H, W)
    tiles = []
    for ty in range(2):
        for tx in range(2):
            tiles.append(a[ty * th:(ty + 1) * th,
                           tx * tw:(tx + 1) * tw].tobytes())
    off0 = 8
    offs, pos = [], off0
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries = [
        (256, 3, 1, (W,)), (257, 3, 1, (H,)), (258, 3, 1, (16,)),
        (259, 3, 1, (1,)), (277, 3, 1, (1,)),
        (322, 3, 1, (tw,)), (323, 3, 1, (th,)),
        (324, 4, 4, tuple(offs)), (325, 4, 4, tuple(len(t) for t in tiles)),
        (339, 3, 1, (1,)),
    ]
    ifd_off = pos + 4 * 4 * 2  # two external LONG[4] arrays
    ext = b"".join(struct.pack(">4L", *entries[i][3]) for i in (7, 8))
    ent_bytes = b""
    ext_pos = pos
    for tag, ftype, count, vals in entries:
        ent_bytes += struct.pack(">HHL", tag, ftype, count)
        size = {3: 2, 4: 4}[ftype] * count
        if size <= 4:
            payload = struct.pack({3: ">H", 4: ">L"}[ftype] * count, *vals)
            ent_bytes += payload.ljust(4, b"\0")
        else:
            ent_bytes += struct.pack(">L", ext_pos)
            ext_pos += size
    buf = (struct.pack(">2sHL", b"MM", 42, ifd_off) + b"".join(tiles) + ext
           + struct.pack(">H", len(entries)) + ent_bytes
           + struct.pack(">L", 0))
    got = tf.TiffFile(buf).read()
    np.testing.assert_array_equal(got, a.astype("=u2")[None])


def test_lzw_long_runs():
    """LZW across several code-width bumps (table > 2048 entries)."""
    rng = np.random.default_rng(4)
    # long repetitive + random mix stresses both dictionary growth and KwKwK
    a = np.concatenate([
        np.repeat(rng.integers(0, 50, 200, dtype=np.uint8), 37),
        rng.integers(0, 255, 5000, endpoint=True, dtype=np.uint8),
    ])
    img = PIL.fromarray(a.reshape(1, -1), "L")
    bio = io.BytesIO()
    img.save(bio, format="TIFF", compression="tiff_lzw")
    got = tf.TiffFile(bio.getvalue()).read()
    np.testing.assert_array_equal(got[0, 0], a)


def test_unsupported_raises():
    with pytest.raises(ValueError, match="byte-order"):
        tf.TiffFile(b"XX\x00\x00garbage")
    with pytest.raises(ValueError, match="magic"):
        tf.TiffFile(b"II\x07\x00garbage")


# --------------------------------------------------------------------- #
# merge_arrays (rasterio.merge 'first' parity)

def test_merge_2x2_grid():
    S, h, w = 2, 4, 4
    mk = lambda v: np.full((S, h, w), v, np.float32)
    # (l, b, r, t): a 2x2 grid of 4x4 tiles at resolution 1
    bounds = [(0, 4, 4, 8), (4, 4, 8, 8), (0, 0, 4, 4), (4, 0, 8, 4)]
    out = tf.merge_arrays([mk(1), mk(2), mk(3), mk(4)], bounds)
    assert out.shape == (S, 8, 8)
    assert out[0, 0, 0] == 1 and out[0, 0, 7] == 2
    assert out[0, 7, 0] == 3 and out[0, 7, 7] == 4


def test_merge_overlap_first_wins():
    mk = lambda v: np.full((1, 4, 4), v, np.float32)
    out = tf.merge_arrays([mk(9), mk(5)], [(0, 0, 4, 4), (2, 0, 6, 4)])
    assert out.shape == (1, 4, 6)
    assert (out[0, :, :4] == 9).all()      # first source wins the overlap
    assert (out[0, :, 4:] == 5).all()


def test_merge_gap_is_nodata():
    mk = lambda v: np.full((1, 2, 2), v, np.float32)
    out = tf.merge_arrays([mk(1), mk(2)], [(0, 0, 2, 2), (4, 0, 6, 2)])
    assert out.shape == (1, 2, 6)
    assert (out[0, :, 2:4] == 0).all()
