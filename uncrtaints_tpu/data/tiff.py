"""Minimal pure-Python (Geo)TIFF reader/writer for Sentinel patch tiles.

The reference decodes its GeoTIFFs through rasterio/GDAL
(/root/reference/data/dataLoader.py:15-16,24-28) — a native dependency this
environment does not ship. The SEN12MS-CR(-TS) tiles themselves are plain
baseline TIFFs (uint16 13-band S2, float32 2-band S1, 256x256, strip
layout, optionally deflate/LZW compressed, GeoTIFF tags for the affine),
so this module implements the subset of TIFF 6.0 + the GeoTIFF tie-point
tags those files use, from the spec, in numpy:

- classic AND BigTIFF containers, little/big endian
- strip and tile layouts, chunky (PlanarConfiguration=1) and band-planar (2)
- uint8/16/32, int16/32, float32/64 samples (BitsPerSample x SampleFormat)
- compression: none (1), LZW (5, with the spec's early-change code widths),
  zlib/deflate (8 and the legacy 32946), PackBits (32773)
- horizontal-differencing predictor (317=2)
- ModelPixelScale/ModelTiepoint (33550/33922) -> bounds, matching
  `rasterio.open(p).bounds` = (left, bottom, right, top)
- a writer for the same subset (fixtures, HDF5-free export, tests), and a
  bounds-based `merge_arrays` with rasterio.merge's 'first' semantics for
  the custom-sample mosaic path (dataLoader.py:383-393).

Arrays are [bands, H, W] exactly as `rasterio.DatasetReader.read()` returns
them. Everything here is host-side I/O; no jax.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922

# field types: (struct code, byte size)
_TYPES = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("L", 4), 5: ("LL", 8),
          6: ("b", 1), 8: ("h", 2), 9: ("l", 4), 10: ("ll", 8),
          11: ("f", 4), 12: ("d", 8), 13: ("L", 4),
          16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8)}

# (SampleFormat, BitsPerSample) -> numpy dtype char
_DTYPES = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
           (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
           (3, 32): "f4", (3, 64): "f8"}


# --------------------------------------------------------------------- #
# decompressors
# --------------------------------------------------------------------- #

def _lzw_decode(data: bytes) -> bytes:
    """TIFF-flavour LZW (MSB-first bit packing, early code-width change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    table: List[bytes] = []
    prev = b""

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return EOI
        b0 = bitpos >> 3
        chunk = int.from_bytes(data[b0:b0 + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return code

    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            code = read_code()
            if code == EOI:
                break
            entry = table[code]
            out += entry
            prev = entry
            continue
        if code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change: widen when the NEXT code to assign hits 2^w - 1
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:            # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:          # repeat next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _decompress(data: bytes, compression: int) -> bytes:
    if compression == 1:
        return data
    if compression in (8, 32946):
        return zlib.decompress(data)
    if compression == 5:
        return _lzw_decode(data)
    if compression == 32773:
        return _packbits_decode(data)
    raise ValueError(f"unsupported TIFF compression {compression} "
                     "(supported: none, deflate, LZW, PackBits)")


# --------------------------------------------------------------------- #
# reader
# --------------------------------------------------------------------- #

def _read_ifd(buf: bytes, bo: str, big: bool, off: int) -> Dict[int, tuple]:
    """Parse one IFD into {tag: (type, values tuple)}."""
    tags: Dict[int, tuple] = {}
    if big:
        (n,) = struct.unpack_from(bo + "Q", buf, off)
        off += 8
        ent_size, cnt_fmt, inline = 20, "Q", 8
    else:
        (n,) = struct.unpack_from(bo + "H", buf, off)
        off += 2
        ent_size, cnt_fmt, inline = 12, "L", 4
    for i in range(n):
        e = off + i * ent_size
        tag, ftype = struct.unpack_from(bo + "HH", buf, e)
        (count,) = struct.unpack_from(bo + cnt_fmt, buf, e + 4)
        if ftype not in _TYPES:
            continue
        code, size = _TYPES[ftype]
        total = size * count
        vpos = e + ent_size - inline
        if total > inline:
            (vpos,) = struct.unpack_from(bo + cnt_fmt, buf, vpos)
        if ftype in (5, 10):  # RATIONAL: pairs -> floats
            raw = struct.unpack_from(bo + code[0] * 2 * count, buf, vpos)
            vals = tuple(raw[2 * i] / (raw[2 * i + 1] or 1)
                         for i in range(count))
        else:
            vals = struct.unpack_from(bo + code * count, buf, vpos)
        tags[tag] = (ftype, vals)
    return tags


def _tag(tags, tid, default=None):
    if tid in tags:
        v = tags[tid][1]
        return v
    return default


def _tag1(tags, tid, default=None):
    v = _tag(tags, tid)
    return default if v is None else v[0]


def _undo_predictor(a: np.ndarray) -> np.ndarray:
    """Horizontal differencing: rows store per-sample deltas along W.
    a is [..., W, S] (chunky) or [..., W] (planar); cumsum along W wraps in
    the storage dtype (integers only, TIFF predictor=2 is integer-defined)."""
    return np.cumsum(a, axis=-2 if a.ndim >= 2 and a.shape[-1] != a.shape[-2]
                     else -1, dtype=a.dtype)


class TiffFile:
    """One parsed TIFF image (first IFD only — the Sentinel tiles are
    single-image files)."""

    def __init__(self, data: bytes):
        self._buf = data
        bom = data[:2]
        if bom == b"II":
            bo = "<"
        elif bom == b"MM":
            bo = ">"
        else:
            raise ValueError("not a TIFF file (bad byte-order mark)")
        (magic,) = struct.unpack_from(bo + "H", data, 2)
        if magic == 42:
            big = False
            (ifd_off,) = struct.unpack_from(bo + "L", data, 4)
        elif magic == 43:
            big = True
            (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
        else:
            raise ValueError(f"not a TIFF file (magic {magic})")
        self._bo = bo
        t = self._tags = _read_ifd(data, bo, big, ifd_off)

        self.width = int(_tag1(t, _IMAGE_WIDTH))
        self.height = int(_tag1(t, _IMAGE_LENGTH))
        self.samples = int(_tag1(t, _SAMPLES_PER_PIXEL, 1))
        bits = _tag(t, _BITS_PER_SAMPLE, (8,))
        if len(set(bits)) != 1:
            raise ValueError("mixed per-band bit depths are unsupported")
        fmt = _tag(t, _SAMPLE_FORMAT, (1,) * self.samples)
        key = (int(fmt[0]), int(bits[0]))
        if key not in _DTYPES:
            raise ValueError(f"unsupported sample type {key}")
        self.dtype = np.dtype(_DTYPES[key]).newbyteorder(bo)
        self.compression = int(_tag1(t, _COMPRESSION, 1))
        self.planar = int(_tag1(t, _PLANAR_CONFIG, 1))
        self.predictor = int(_tag1(t, _PREDICTOR, 1))
        self.tiled = _TILE_OFFSETS in t

    # ------------------------------------------------------------- #

    def read(self) -> np.ndarray:
        """Decode to [bands, H, W] (rasterio .read() layout)."""
        return self._read_tiled() if self.tiled else self._read_strips()

    def _segment(self, off: int, cnt: int) -> bytes:
        return _decompress(self._buf[off:off + cnt], self.compression)

    def _to_array(self, raw: bytes, rows: int, cols: int,
                  samples: int) -> np.ndarray:
        a = np.frombuffer(raw, dtype=self.dtype,
                          count=rows * cols * samples)
        a = a.reshape(rows, cols, samples)
        if self.predictor == 2:
            a = np.cumsum(a, axis=1, dtype=a.dtype)
        elif self.predictor != 1:
            raise ValueError(f"unsupported predictor {self.predictor}")
        return a

    def _read_strips(self) -> np.ndarray:
        t = self._tags
        offsets = _tag(t, _STRIP_OFFSETS)
        counts = _tag(t, _STRIP_BYTE_COUNTS)
        rps = int(_tag1(t, _ROWS_PER_STRIP, self.height))
        H, W, S = self.height, self.width, self.samples
        strips_per_plane = -(-H // rps)
        if self.planar == 1:
            out = np.empty((H, W, S), self.dtype)
            for i, (o, c) in enumerate(zip(offsets, counts)):
                r0 = i * rps
                rows = min(rps, H - r0)
                out[r0:r0 + rows] = self._to_array(
                    self._segment(int(o), int(c)), rows, W, S)
            return np.ascontiguousarray(
                np.moveaxis(out, -1, 0)).astype(self.dtype.newbyteorder("="))
        # planar: strips are per-band, band-major
        out = np.empty((S, H, W), self.dtype)
        for i, (o, c) in enumerate(zip(offsets, counts)):
            band, si = divmod(i, strips_per_plane)
            r0 = si * rps
            rows = min(rps, H - r0)
            out[band, r0:r0 + rows] = self._to_array(
                self._segment(int(o), int(c)), rows, W, 1)[..., 0]
        return out.astype(self.dtype.newbyteorder("="))

    def _read_tiled(self) -> np.ndarray:
        t = self._tags
        tw = int(_tag1(t, _TILE_WIDTH))
        th = int(_tag1(t, _TILE_LENGTH))
        offsets = _tag(t, _TILE_OFFSETS)
        counts = _tag(t, _TILE_BYTE_COUNTS)
        H, W, S = self.height, self.width, self.samples
        tx = -(-W // tw)
        ty = -(-H // th)
        per_plane = tx * ty
        if self.planar == 1:
            out = np.empty((H, W, S), self.dtype)
            for i, (o, c) in enumerate(zip(offsets, counts)):
                iy, ix = divmod(i, tx)
                a = self._to_array(self._segment(int(o), int(c)), th, tw, S)
                y0, x0 = iy * th, ix * tw
                out[y0:y0 + min(th, H - y0), x0:x0 + min(tw, W - x0)] = \
                    a[:min(th, H - y0), :min(tw, W - x0)]
            return np.ascontiguousarray(
                np.moveaxis(out, -1, 0)).astype(self.dtype.newbyteorder("="))
        out = np.empty((S, H, W), self.dtype)
        for i, (o, c) in enumerate(zip(offsets, counts)):
            band, rem = divmod(i, per_plane)
            iy, ix = divmod(rem, tx)
            a = self._to_array(self._segment(int(o), int(c)), th, tw, 1)[..., 0]
            y0, x0 = iy * th, ix * tw
            out[band, y0:y0 + min(th, H - y0), x0:x0 + min(tw, W - x0)] = \
                a[:min(th, H - y0), :min(tw, W - x0)]
        return out.astype(self.dtype.newbyteorder("="))

    # ------------------------------------------------------------- #

    @property
    def bounds(self) -> List[float]:
        """(left, bottom, right, top) from the GeoTIFF tie-point + scale,
        rasterio `.bounds` parity; zeros when the file carries no geo tags."""
        scale = _tag(self._tags, _MODEL_PIXEL_SCALE)
        tie = _tag(self._tags, _MODEL_TIEPOINT)
        if scale is None or tie is None:
            return [0.0, 0.0, 0.0, 0.0]
        sx, sy = float(scale[0]), float(scale[1])
        i, j, _, x, y = (float(v) for v in tie[:5])
        left = x - i * sx
        top = y + j * sy
        return [left, top - self.height * sy, left + self.width * sx, top]


def read_tiff(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return TiffFile(f.read()).read()


def read_tiff_bounds(path: str) -> List[float]:
    with open(path, "rb") as f:
        return TiffFile(f.read()).bounds


# --------------------------------------------------------------------- #
# writer
# --------------------------------------------------------------------- #

_FMT_OF_KIND = {"u": 1, "i": 2, "f": 3}


def write_tiff(path: str, array: np.ndarray, *,
               planar: int = 1, compression: str = "none",
               predictor: int = 1, rows_per_strip: Optional[int] = None,
               bounds: Optional[Sequence[float]] = None) -> None:
    """Write [bands, H, W] (or [H, W]) as a classic little-endian TIFF.

    compression: 'none' | 'deflate'. predictor=2 applies horizontal
    differencing before deflate (integer dtypes only). ``bounds`` =
    (left, bottom, right, top) emits north-up GeoTIFF scale/tie-point tags.
    """
    a = np.asarray(array)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("expected [bands, H, W]")
    S, H, W = a.shape
    dt = a.dtype
    if dt.kind not in _FMT_OF_KIND:
        raise ValueError(f"unsupported dtype {dt}")
    if predictor == 2 and dt.kind == "f":
        raise ValueError("predictor=2 is integer-only here")
    comp_id = {"none": 1, "deflate": 8}[compression]
    rps = rows_per_strip or max(1, min(H, (1 << 16) // max(1, W * S * dt.itemsize)))
    a = a.astype(dt.newbyteorder("<"))

    # build strip payloads
    strips: List[bytes] = []
    chunky = np.moveaxis(a, 0, -1)  # [H, W, S]
    def enc(rows: np.ndarray) -> bytes:  # rows: [r, W, s]
        if predictor == 2:
            d = rows.copy()
            d[:, 1:] = rows[:, 1:] - rows[:, :-1]
            rows = d
        raw = rows.tobytes()
        return zlib.compress(raw, 6) if comp_id == 8 else raw

    if planar == 1:
        for r0 in range(0, H, rps):
            strips.append(enc(chunky[r0:r0 + rps]))
    elif planar == 2:
        for b in range(S):
            for r0 in range(0, H, rps):
                strips.append(enc(a[b, r0:r0 + rps][..., None]))
    else:
        raise ValueError("planar must be 1 or 2")

    # lay out: header(8) | strip data | external tag arrays | IFD
    header = struct.pack("<2sH", b"II", 42)
    pos = 8
    strip_offsets = []
    body = bytearray()
    for s in strips:
        strip_offsets.append(pos)
        body += s
        pos += len(s)

    tags: List[Tuple[int, int, int, object]] = []  # (tag, type, count, vals)

    def add(tag, ftype, vals):
        vals = tuple(vals) if isinstance(vals, (tuple, list)) else (vals,)
        tags.append((tag, ftype, len(vals), vals))

    add(_IMAGE_WIDTH, 4, W)
    add(_IMAGE_LENGTH, 4, H)
    add(_BITS_PER_SAMPLE, 3, [dt.itemsize * 8] * S)
    add(_COMPRESSION, 3, comp_id)
    # BlackIsZero, except 3-band u8 marked RGB so generic viewers (PIL)
    # can open it; the reader ignores photometric either way
    add(_PHOTOMETRIC, 3, 2 if (S == 3 and dt.itemsize == 1) else 1)
    add(_STRIP_OFFSETS, 4, strip_offsets)
    add(_SAMPLES_PER_PIXEL, 3, S)
    add(_ROWS_PER_STRIP, 4, rps)
    add(_STRIP_BYTE_COUNTS, 4, [len(s) for s in strips])
    add(_PLANAR_CONFIG, 3, planar)
    if predictor != 1:
        add(_PREDICTOR, 3, predictor)
    add(_SAMPLE_FORMAT, 3, [_FMT_OF_KIND[dt.kind]] * S)
    if bounds is not None:
        left, bottom, right, top = (float(v) for v in bounds)
        sx = (right - left) / W
        sy = (top - bottom) / H
        add(_MODEL_PIXEL_SCALE, 12, (sx, sy, 0.0))
        add(_MODEL_TIEPOINT, 12, (0.0, 0.0, 0.0, left, top, 0.0))
    tags.sort(key=lambda e: e[0])

    # external arrays (anything over 4 inline bytes) follow the strip data
    ext = bytearray()
    entries = bytearray()
    ifd_off = pos + _ext_size(tags)
    ext_pos = pos
    for tag, ftype, count, vals in tags:
        code, size = _TYPES[ftype]
        total = size * count
        entries += struct.pack("<HHL", tag, ftype, count)
        payload = struct.pack("<" + code * count, *vals)
        if total <= 4:
            entries += payload.ljust(4, b"\0")
        else:
            entries += struct.pack("<L", ext_pos)
            ext += payload
            ext_pos += total
    ifd = struct.pack("<H", len(tags)) + bytes(entries) + struct.pack("<L", 0)

    with open(path, "wb") as f:
        f.write(header + struct.pack("<L", ifd_off)[:0])  # placeholder noop
        f.seek(0)
        f.write(struct.pack("<2sHL", b"II", 42, ifd_off))
        f.write(body)
        f.write(ext)
        f.write(ifd)


def _ext_size(tags) -> int:
    total = 0
    for _, ftype, count, _ in tags:
        _, size = _TYPES[ftype]
        if size * count > 4:
            total += size * count
    return total


# --------------------------------------------------------------------- #
# mosaic merge (rasterio.merge 'first' parity for same-resolution tiles)
# --------------------------------------------------------------------- #

def merge_arrays(arrays: Sequence[np.ndarray],
                 bounds: Sequence[Sequence[float]],
                 nodata: float = 0.0) -> np.ndarray:
    """Spatially mosaic [bands, h, w] tiles by their (l, b, r, t) bounds.

    rasterio.merge semantics for the reference's 3x3 custom-sample grids
    (dataLoader.py:383-393): the output grid takes the first tile's
    resolution, covers the union of bounds, is initialized to ``nodata``,
    and earlier sources win where tiles overlap (method='first')."""
    if len(arrays) != len(bounds) or not arrays:
        raise ValueError("arrays and bounds must be equal-length, non-empty")
    S, h0, w0 = arrays[0].shape
    l0, b0, r0, t0 = (float(v) for v in bounds[0])
    sx = (r0 - l0) / w0
    sy = (t0 - b0) / h0
    left = min(float(b[0]) for b in bounds)
    right = max(float(b[2]) for b in bounds)
    bottom = min(float(b[1]) for b in bounds)
    top = max(float(b[3]) for b in bounds)
    W = int(round((right - left) / sx))
    H = int(round((top - bottom) / sy))
    out = np.full((S, H, W), nodata, arrays[0].dtype)
    filled = np.zeros((H, W), bool)
    for a, bb in zip(arrays, bounds):
        l, _, _, t = (float(v) for v in bb)
        x0 = int(round((l - left) / sx))
        y0 = int(round((top - t) / sy))
        h, w = a.shape[1:]
        sub = filled[y0:y0 + h, x0:x0 + w]
        put = ~sub
        out[:, y0:y0 + h, x0:x0 + w][:, put] = a[:, put]
        sub |= True
    return out
