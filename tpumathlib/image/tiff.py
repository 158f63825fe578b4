"""Baseline TIFF codec + GeoTIFF tags (≙ nvTIFF decode / decode-encode /
imageinfo / region-decode / nvTIFF-GeoTIFF-Decode-Encode samples).

Supports uncompressed (compression=1) and LZW (compression=5, incl. the
horizontal-differencing predictor and TIFF's early-change width bumps)
grayscale and RGB, 8-bit, single/multi strip, little-endian, MULTI-IMAGE
files (chained IFDs — the nvTIFF multi-image info surface), and the
GeoTIFF georeferencing tags (ModelPixelScale, ModelTiepoint,
GeoKeyDirectory, GeoDoubleParams, GeoAsciiParams — ≙
nvTIFF-GeoTIFF-Decode-Encode). JPEG-in-TIFF is out of scope (the
reference's nvTIFF also supports a subset).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
# GeoTIFF tags (GeoTIFF 1.1 / OGC 19-008r4)
TAG_MODEL_PIXEL_SCALE = 33550   # DOUBLE x3 (sx, sy, sz)
TAG_MODEL_TIEPOINT = 33922      # DOUBLE x6k (i, j, k, x, y, z)
TAG_GEO_KEY_DIRECTORY = 34735   # SHORT x4n
TAG_GEO_DOUBLE_PARAMS = 34736   # DOUBLE xn
TAG_GEO_ASCII_PARAMS = 34737    # ASCII

_TYPE_SIZE = {2: 1, 3: 2, 4: 4, 12: 8}
_TYPE_FMT = {2: "s", 3: "H", 4: "I", 12: "d"}


def _pack_values(ttype: int, values) -> bytes:
    if ttype == 2:  # ascii, NUL-terminated
        b = values.encode() if isinstance(values, str) else bytes(values)
        return b if b.endswith(b"\0") else b + b"\0"
    fmt = _TYPE_FMT[ttype]
    vals = list(np.atleast_1d(values).tolist())
    return struct.pack(f"<{len(vals)}{fmt}", *vals)


def _build_ifd(img: np.ndarray, data_offset: int, ifd_offset: int,
               extra_tags: dict | None):
    """One IFD for ``img`` whose pixel data will live at data_offset.
    Returns (ifd_bytes_without_next_ptr, overflow_bytes, total_ifd_len)."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    entries = {
        _TAG_WIDTH: (3, [w]),
        _TAG_HEIGHT: (3, [h]),
        _TAG_BITS: (3, [8] * spp),
        _TAG_COMPRESSION: (3, [1]),
        _TAG_PHOTOMETRIC: (3, [1 if spp == 1 else 2]),
        _TAG_STRIP_OFFSETS: (4, [data_offset]),
        _TAG_SPP: (3, [spp]),
        _TAG_ROWS_PER_STRIP: (3, [h]),
        _TAG_STRIP_COUNTS: (4, [h * w * spp]),
    }
    for tid, (ttype, values) in (extra_tags or {}).items():
        entries[tid] = (ttype, values)
    ntags = len(entries)
    ifd_len = 2 + ntags * 12 + 4
    overflow_off = ifd_offset + ifd_len
    overflow = bytearray()
    body = struct.pack("<H", ntags)
    for tid in sorted(entries):
        ttype, values = entries[tid]
        payload = _pack_values(ttype, values)
        count = len(payload) // _TYPE_SIZE[ttype] if ttype != 2 \
            else len(payload)
        if len(payload) <= 4:
            raw = payload.ljust(4, b"\0")
        else:
            raw = struct.pack("<I", overflow_off + len(overflow))
            overflow += payload
            if len(overflow) % 2:
                overflow += b"\0"
        body += struct.pack("<HHI", tid, ttype, count) + raw
    return body, bytes(overflow), ifd_len


def tiff_write(path: str, image, extra_tags: dict | None = None) -> None:
    """Write uint8 gray (H,W) or RGB (H,W,3) — or a LIST of such images
    (multi-image file, chained IFDs) — as uncompressed baseline TIFF.
    ``extra_tags`` = {tag_id: (type, values)} (or a list per image)."""
    images = image if isinstance(image, (list, tuple)) else [image]
    extras = extra_tags if isinstance(extra_tags, (list, tuple)) \
        else [extra_tags] * len(images)
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    pos = 8
    for k, img in enumerate(images):
        img = np.ascontiguousarray(img, np.uint8)
        data = img.tobytes()
        # layout per image: IFD | overflow | pixel data
        body, overflow, ifd_len = _build_ifd(img, 0, pos, extras[k])
        data_off = pos + ifd_len + len(overflow)
        body, overflow, _ = _build_ifd(img, data_off, pos, extras[k])
        next_ifd = data_off + len(data)
        if next_ifd % 2:
            data += b"\0"
            next_ifd += 1
        out += body
        out += struct.pack("<I", next_ifd if k + 1 < len(images) else 0)
        out += overflow
        out += data
        pos = next_ifd
    with open(path, "wb") as f:
        f.write(out)


def _read_one_ifd(buf: bytes, ifd_off: int):
    (ntags,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(ntags):
        tid, ttype, count, raw = struct.unpack_from(
            "<HHI4s", buf, ifd_off + 2 + i * 12)
        size = _TYPE_SIZE.get(ttype, 1) * count
        payload = raw[:size] if size <= 4 else \
            buf[struct.unpack("<I", raw)[0]:][:size]
        if ttype == 2:
            val = payload.rstrip(b"\0").decode(errors="replace")
        else:
            fmt = _TYPE_FMT.get(ttype, "B")
            vals = list(struct.unpack(f"<{count}{fmt}", payload))
            val = vals[0] if count == 1 else vals
        tags[tid] = val
    (nxt,) = struct.unpack_from("<I", buf, ifd_off + 2 + ntags * 12)
    return tags, nxt


def _read_ifds(buf: bytes):
    endian, magic, ifd_off = struct.unpack("<2sHI", buf[:8])
    assert endian == b"II" and magic == 42, "unsupported TIFF (big-endian?)"
    out = []
    while ifd_off:
        tags, ifd_off = _read_one_ifd(buf, ifd_off)
        out.append(tags)
    return out


def tiff_info(path: str) -> dict:
    """≙ nvtiffStreamGetFileInfo + the multi-image info sample: first
    image's fields at the top level, ``num_images`` and per-image
    ``images`` list alongside."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds = _read_ifds(buf)

    def one(t):
        return {
            "width": t[_TAG_WIDTH],
            "height": t[_TAG_HEIGHT],
            "samples_per_pixel": t.get(_TAG_SPP, 1),
            "compression": t.get(_TAG_COMPRESSION, 1),
            "photometric": t.get(_TAG_PHOTOMETRIC, 1),
        }

    info = one(ifds[0])
    info["num_images"] = len(ifds)
    info["images"] = [one(t) for t in ifds]
    return info


_TAG_PREDICTOR = 317


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (compression=5) decoder: MSB-first variable-width codes,
    ClearCode=256/EOI=257, 'early change' width bumps (TIFF 6.0 §13 —
    the width grows one code earlier than classic LZW)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:                       # ClearCode
            reset()
            width = 9
            prev = None
            continue
        if code == 257:                       # EndOfInformation
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:                                 # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change: bump width when the NEXT added code would not fit
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _decode_ifd(buf: bytes, t: dict, region: tuple | None):
    comp = t.get(_TAG_COMPRESSION, 1)
    assert comp in (1, 5), f"unsupported TIFF compression {comp}"
    w, h = t[_TAG_WIDTH], t[_TAG_HEIGHT]
    spp = t.get(_TAG_SPP, 1)
    offsets = t[_TAG_STRIP_OFFSETS]
    counts = t[_TAG_STRIP_COUNTS]
    if isinstance(offsets, int):
        offsets = [offsets]
        counts = [counts]
    strips = [buf[o:o + c] for o, c in zip(offsets, counts)]
    if comp == 5:
        strips = [_lzw_decode(s) for s in strips]
    data = b"".join(strips)
    img = np.frombuffer(data[:h * w * spp], np.uint8)
    img = img.reshape(h, w, spp) if spp > 1 else img.reshape(h, w)
    if comp == 5 and t.get(_TAG_PREDICTOR, 1) == 2:
        # horizontal differencing predictor: undo by row-wise cumsum
        img = np.cumsum(img.astype(np.uint32), axis=1).astype(np.uint8)
    if region is not None:
        y0, x0, rh, rw = region
        img = img[y0:y0 + rh, x0:x0 + rw]
    return img.copy()


def tiff_read(path: str, region: tuple | None = None, index: int = 0):
    """Decode image ``index``; ``region`` = (y0, x0, h, w) gives the
    batched-region-decode behavior (≙ nvtiffDecodeRange)."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds = _read_ifds(buf)
    return _decode_ifd(buf, ifds[index], region)


def tiff_read_all(path: str) -> list:
    """Decode every image of a multi-image file (≙ nvtiffDecode over the
    full stream)."""
    with open(path, "rb") as f:
        buf = f.read()
    return [_decode_ifd(buf, t, None) for t in _read_ifds(buf)]


# ---------------- GeoTIFF ----------------

def geotiff_write(path: str, image, *, pixel_scale, tiepoint,
                  geo_keys: list | None = None,
                  ascii_params: str | None = None,
                  double_params: list | None = None) -> None:
    """Write a GeoTIFF (≙ nvTIFF-GeoTIFF-Decode-Encode encode side).

    pixel_scale: (sx, sy, sz); tiepoint: 6k values (i, j, k, x, y, z);
    geo_keys: list of (key_id, tiff_tag_location, count, value) 4-tuples —
    the GeoKeyDirectory entries after the (1, 1, 0, n) header, which is
    added automatically.
    """
    keys = geo_keys or []
    directory = [1, 1, 0, len(keys)]
    for k in keys:
        directory.extend(int(v) for v in k)
    extra = {
        TAG_MODEL_PIXEL_SCALE: (12, list(pixel_scale)),
        TAG_MODEL_TIEPOINT: (12, list(tiepoint)),
        TAG_GEO_KEY_DIRECTORY: (3, directory),
    }
    if double_params:
        extra[TAG_GEO_DOUBLE_PARAMS] = (12, list(double_params))
    if ascii_params:
        extra[TAG_GEO_ASCII_PARAMS] = (2, ascii_params)
    tiff_write(path, image, extra_tags=extra)


def geotiff_read(path: str, index: int = 0):
    """Read a GeoTIFF → (image, geo) with geo = {pixel_scale, tiepoints,
    geo_keys, ascii_params, double_params} (≙ the decode side of
    nvTIFF-GeoTIFF-Decode-Encode, which prints these tags)."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds = _read_ifds(buf)
    t = ifds[index]
    img = _decode_ifd(buf, t, None)
    geo = {}
    if TAG_MODEL_PIXEL_SCALE in t:
        geo["pixel_scale"] = tuple(np.atleast_1d(t[TAG_MODEL_PIXEL_SCALE]))
    if TAG_MODEL_TIEPOINT in t:
        geo["tiepoints"] = tuple(np.atleast_1d(t[TAG_MODEL_TIEPOINT]))
    if TAG_GEO_KEY_DIRECTORY in t:
        d = list(np.atleast_1d(t[TAG_GEO_KEY_DIRECTORY]).astype(int))
        nkeys = d[3]
        geo["geo_keys"] = [tuple(d[4 + 4 * i:8 + 4 * i])
                           for i in range(nkeys)]
    if TAG_GEO_ASCII_PARAMS in t:
        geo["ascii_params"] = t[TAG_GEO_ASCII_PARAMS]
    if TAG_GEO_DOUBLE_PARAMS in t:
        geo["double_params"] = tuple(np.atleast_1d(t[TAG_GEO_DOUBLE_PARAMS]))
    return img, geo
