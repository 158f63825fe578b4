"""TIFF codec + GeoTIFF tags (≙ nvTIFF decode / decode-encode /
imageinfo / region-decode / nvTIFF-GeoTIFF-Decode-Encode /
nvTIFF-Encode-Options samples).

Decode: uncompressed (1), LZW (5, incl. the horizontal-differencing
predictor and TIFF's early-change width bumps), JPEG-in-TIFF (7, full or
JPEGTables-abbreviated strips/tiles, via the suite's own JFIF decoder),
Adobe/legacy Deflate (8/32946), PackBits (32773); grayscale and RGB,
8-bit, single/multi strip, TILED images (TileWidth/TileLength/
TileOffsets/TileByteCounts), little-endian classic AND BigTIFF (version
43, 8-byte offsets), MULTI-IMAGE files (chained IFDs — the nvTIFF
multi-image info surface), and the GeoTIFF georeferencing tags
(ModelPixelScale, ModelTiepoint, GeoKeyDirectory, GeoDoubleParams,
GeoAsciiParams — ≙ nvTIFF-GeoTIFF-Decode-Encode).

Encode (≙ nvTIFF-Encode-Options/nvtiff_encode_options.cpp:139-209's
variant matrix): compression none/lzw/deflate/packbits/jpeg (JPEG rides
the suite's real JFIF encoder, quality + subsampling knobs ≙ the sample's
nvtiffJpegEncodeOptions_t), striped with configurable rows_per_strip or
TILED geometry (tile dims multiples of 16, as nvTIFF requires), classic
or BigTIFF container (≙ NVTIFF_BIG_TIFF), horizontal-differencing
predictor, custom/GeoTIFF tags, multi-page.
"""

from __future__ import annotations

import struct
import zlib

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
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_JPEG_TABLES = 347
# GeoTIFF tags (GeoTIFF 1.1 / OGC 19-008r4)
TAG_MODEL_PIXEL_SCALE = 33550   # DOUBLE x3 (sx, sy, sz)
TAG_MODEL_TIEPOINT = 33922      # DOUBLE x6k (i, j, k, x, y, z)
TAG_GEO_KEY_DIRECTORY = 34735   # SHORT x4n
TAG_GEO_DOUBLE_PARAMS = 34736   # DOUBLE xn
TAG_GEO_ASCII_PARAMS = 34737    # ASCII

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 7: 1, 12: 8, 16: 8}
_TYPE_FMT = {1: "B", 2: "s", 3: "H", 4: "I", 7: "s", 12: "d", 16: "Q"}

COMPRESSIONS = {"none": 1, "lzw": 5, "jpeg": 7, "deflate": 8,
                "packbits": 32773}


def _pack_values(ttype: int, values) -> bytes:
    if ttype == 2:  # ascii, NUL-terminated
        b = values.encode() if isinstance(values, str) else bytes(values)
        return b if b.endswith(b"\0") else b + b"\0"
    if ttype == 7:  # undefined (raw bytes)
        return bytes(values)
    fmt = _TYPE_FMT[ttype]
    vals = list(np.atleast_1d(values).tolist())
    return struct.pack(f"<{len(vals)}{fmt}", *vals)


# ---------------- segment codecs ----------------

def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder (compression=5): MSB-first variable-width codes,
    ClearCode=256/EOI=257, 'early change' width bumps (TIFF 6.0 §13),
    table reset at code 4094."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {}
    next_code = 258
    width = 9
    emit(256, width)                      # leading ClearCode
    omega = b""
    for b in bytes(data):
        w2 = omega + bytes([b])
        if len(w2) == 1 or w2 in table:
            omega = w2
            continue
        emit(table[omega] if len(omega) > 1 else omega[0], width)
        table[w2] = next_code
        next_code += 1
        omega = bytes([b])
        # early-change width bump, mirrored off the decoder below: the
        # encoder's table runs ONE entry ahead of the decoder mid-stream
        # (the decoder appends nothing for the first post-clear code), so
        # the decoder's `len >= (1<<w)-1` is `next_code == (1<<w)` here
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code >= 4094:            # table full → reset
            emit(omega[0], width)
            emit(256, width)
            table.clear()
            next_code = 258
            width = 9
            omega = b""
    if omega:
        emit(table[omega] if len(omega) > 1 else omega[0], width)
        # at flush the counts align (the final emission adds no entry):
        # the decoder appends once more before reading EOI, so EOI must be
        # written at the decoder's post-append width
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
    emit(257, width)                      # EndOfInformation
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


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


def _packbits_encode(data: bytes) -> bytes:
    """PackBits (compression=32773) RLE: runs of >=3 become (257-n, byte),
    literals chunked at <=128."""
    data = bytes(data)
    out = bytearray()
    i = 0
    n = len(data)
    lit_start = -1
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            if lit_start >= 0:
                out.append(i - lit_start - 1)
                out += data[lit_start:i]
                lit_start = -1
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            if lit_start < 0:
                lit_start = i
            i += 1
            if i - lit_start == 128:
                out.append(127)
                out += data[lit_start:i]
                lit_start = -1
    if lit_start >= 0:
        out.append(n - lit_start - 1)
        out += data[lit_start:n]
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:                           # h+1 literal bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:                         # 257-h repeats of next byte
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _jpeg_tables_splice(tables: bytes, seg: bytes) -> bytes:
    """Merge a JPEGTables (tag 347) abbreviated table stream with an
    abbreviated strip/tile stream into one decodable JPEG (TIFF TechNote
    2): SOI + table segments + the strip's segments."""
    assert tables[:2] == b"\xff\xd8" and seg[:2] == b"\xff\xd8"
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return b"\xff\xd8" + body + seg[2:]


def _predictor_encode(seg: np.ndarray) -> np.ndarray:
    out = seg.copy()
    out[:, 1:] = seg[:, 1:] - seg[:, :-1]    # uint8 wraparound per sample
    return out


def _encode_segment(seg: np.ndarray, comp: str, predictor: bool,
                    jpeg_quality: int, jpeg_subsampling: str) -> bytes:
    if comp == "jpeg":
        from tpumathlib.image.jpeg import jfif_encode

        return jfif_encode(seg, quality=jpeg_quality,
                           subsampling=jpeg_subsampling)
    if predictor and comp in ("lzw", "deflate"):
        seg = _predictor_encode(seg)
    raw = seg.tobytes()
    if comp == "none":
        return raw
    if comp == "lzw":
        return _lzw_encode(raw)
    if comp == "deflate":
        return zlib.compress(raw, 6)
    if comp == "packbits":
        return _packbits_encode(raw)
    raise ValueError(f"unsupported compression {comp!r}")


# ---------------- writer ----------------

def _build_ifd(entries: dict, ifd_offset: int, bigtiff: bool):
    """Pack one IFD at ifd_offset. Returns (body_without_next_ptr,
    overflow_bytes, total_ifd_len)."""
    esize, cap, cfmt = (20, 8, "Q") if bigtiff else (12, 4, "I")
    ntags = len(entries)
    ifd_len = (8 + ntags * esize + 8) if bigtiff else (2 + ntags * esize + 4)
    overflow_off = ifd_offset + ifd_len
    overflow = bytearray()
    body = struct.pack("<Q" if bigtiff else "<H", ntags)
    for tid in sorted(entries):
        ttype, values = entries[tid]
        payload = _pack_values(ttype, values)
        count = len(payload) // _TYPE_SIZE[ttype] if ttype not in (2, 7) \
            else len(payload)
        if len(payload) <= cap:
            raw = payload.ljust(cap, b"\0")
        else:
            raw = struct.pack(f"<{cfmt}", overflow_off + len(overflow))
            overflow += payload
            if len(overflow) % 2:
                overflow += b"\0"
        body += struct.pack(f"<HH{cfmt}", tid, ttype, count) + raw
    return body, bytes(overflow), ifd_len


def _image_segments(img: np.ndarray, rows_per_strip: int | None,
                    tile: tuple | None):
    """Split into strip or tile segment arrays + the geometry tags."""
    h, w = img.shape[:2]
    if tile is not None:
        th, tw = tile
        if th % 16 or tw % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        pad_h = (-h) % th
        pad_w = (-w) % tw
        p = np.pad(img, ((0, pad_h), (0, pad_w)) + ((0, 0),) * (img.ndim - 2),
                   mode="edge")
        segs = [p[y:y + th, x:x + tw]
                for y in range(0, p.shape[0], th)
                for x in range(0, p.shape[1], tw)]
        geom = {_TAG_TILE_WIDTH: (3, [tw]), _TAG_TILE_LENGTH: (3, [th])}
        return segs, geom, (_TAG_TILE_OFFSETS, _TAG_TILE_COUNTS)
    rps = rows_per_strip or h
    segs = [img[y:y + rps] for y in range(0, h, rps)]
    geom = {_TAG_ROWS_PER_STRIP: (3 if rps < 65536 else 4, [rps])}
    return segs, geom, (_TAG_STRIP_OFFSETS, _TAG_STRIP_COUNTS)


def tiff_write(path: str, image, extra_tags: dict | None = None, *,
               compression: str = "none", rows_per_strip: int | None = None,
               tile: tuple | None = None, bigtiff: bool = False,
               predictor: bool = False, jpeg_quality: int = 85,
               jpeg_subsampling: str = "444") -> None:
    """Write uint8 gray (H,W) or RGB (H,W,3) — or a LIST of such images
    (multi-image file, chained IFDs) — as TIFF.

    ≙ nvTIFF-Encode-Options (nvtiff_encode_options.cpp:139-209):
    ``compression`` in none/lzw/deflate/packbits/jpeg
    (NVTIFF_COMPRESSION_*; jpeg takes quality + "444"/"420" subsampling ≙
    nvtiffJpegEncodeOptions_t), ``rows_per_strip`` for striped geometry,
    ``tile=(th, tw)`` (multiples of 16) for tiled geometry, ``bigtiff``
    for the 64-bit container (≙ NVTIFF_BIG_TIFF), ``predictor`` for
    horizontal differencing under lzw/deflate.
    ``extra_tags`` = {tag_id: (type, values)} (or a list per image).
    """
    if compression not in COMPRESSIONS:
        raise ValueError(f"compression must be one of {set(COMPRESSIONS)}")
    images = image if isinstance(image, (list, tuple)) else [image]
    extras = extra_tags if isinstance(extra_tags, (list, tuple)) \
        else [extra_tags] * len(images)
    if bigtiff:
        out = bytearray(struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16))
        pos = 16
        nfmt, ofmt, otype = "<Q", "Q", 16
    else:
        out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
        pos = 8
        nfmt, ofmt, otype = "<I", "I", 4
    for k, img in enumerate(images):
        img = np.asarray(img)
        bits = 16 if img.dtype.itemsize == 2 else 8
        if bits == 16 and compression == "jpeg":
            raise ValueError("jpeg compression is 8-bit only")
        # little-endian samples to match the II container
        img = np.ascontiguousarray(
            img, np.uint8 if bits == 8 else np.dtype("<u2"))
        h, w = img.shape[:2]
        spp = 1 if img.ndim == 2 else img.shape[2]
        segs, geom, (off_tag, cnt_tag) = _image_segments(
            img, rows_per_strip, tile)
        blobs = [_encode_segment(s, compression, predictor,
                                 jpeg_quality, jpeg_subsampling)
                 for s in segs]
        photometric = 1 if spp == 1 else (6 if compression == "jpeg" else 2)
        entries = {
            _TAG_WIDTH: (3, [w]),
            _TAG_HEIGHT: (3, [h]),
            _TAG_BITS: (3, [bits] * spp),
            _TAG_COMPRESSION: (3, [COMPRESSIONS[compression]]),
            _TAG_PHOTOMETRIC: (3, [photometric]),
            _TAG_SPP: (3, [spp]),
            off_tag: (otype, [0] * len(blobs)),
            cnt_tag: (4, [len(b) for b in blobs]),
            **geom,
        }
        if predictor and compression in ("lzw", "deflate"):
            entries[_TAG_PREDICTOR] = (3, [2])
        for tid, (ttype, values) in (extras[k] or {}).items():
            entries[tid] = (ttype, values)
        # two passes: measure IFD+overflow, then write with real offsets
        body, overflow, ifd_len = _build_ifd(entries, pos, bigtiff)
        data_off = pos + ifd_len + len(overflow)
        offs = []
        o = data_off
        for b in blobs:
            offs.append(o)
            o += len(b) + (len(b) % 2)
        entries[off_tag] = (otype, offs)
        body, overflow, _ = _build_ifd(entries, pos, bigtiff)
        next_ifd = o
        out += body
        out += struct.pack(nfmt, next_ifd if k + 1 < len(images) else 0)
        out += overflow
        for b in blobs:
            out += b
            if len(b) % 2:
                out += b"\0"
        pos = next_ifd
    with open(path, "wb") as f:
        f.write(out)


# ---------------- reader ----------------

def _read_one_ifd(buf: bytes, ifd_off: int, bigtiff: bool, e: str = "<"):
    if bigtiff:
        (ntags,) = struct.unpack_from(f"{e}Q", buf, ifd_off)
        base, esize, cap, cfmt = ifd_off + 8, 20, 8, "Q"
    else:
        (ntags,) = struct.unpack_from(f"{e}H", buf, ifd_off)
        base, esize, cap, cfmt = ifd_off + 2, 12, 4, "I"
    tags = {}
    for i in range(ntags):
        tid, ttype, count = struct.unpack_from(f"{e}HH{cfmt}", buf,
                                               base + i * esize)
        raw = buf[base + i * esize:base + i * esize + esize][-cap:]
        size = _TYPE_SIZE.get(ttype, 1) * count
        payload = raw[:size] if size <= cap else \
            buf[struct.unpack(f"{e}{cfmt}", raw)[0]:][:size]
        if ttype == 2:
            val = payload.rstrip(b"\0").decode(errors="replace")
        elif ttype == 7:
            val = payload
        else:
            fmt = _TYPE_FMT.get(ttype, "B")
            vals = list(struct.unpack(f"{e}{count}{fmt}", payload))
            val = vals[0] if count == 1 else vals
        tags[tid] = val
    (nxt,) = struct.unpack_from(f"{e}{cfmt}", buf, base + ntags * esize)
    return tags, nxt


def _read_ifds(buf: bytes):
    """Parse all IFDs. Returns (list_of_tag_dicts, endian_char)."""
    endian, magic = struct.unpack("<2sH", buf[:4])
    assert endian in (b"II", b"MM"), f"not a TIFF ({endian!r})"
    e = "<" if endian == b"II" else ">"
    magic = struct.unpack(f"{e}H", buf[2:4])[0]
    if magic == 43:                          # BigTIFF
        osize, pad, ifd_off = struct.unpack_from(f"{e}HHQ", buf, 4)
        assert osize == 8 and pad == 0, "malformed BigTIFF header"
        bigtiff = True
    else:
        assert magic == 42, f"not a TIFF (magic {magic})"
        (ifd_off,) = struct.unpack_from(f"{e}I", buf, 4)
        bigtiff = False
    out = []
    while ifd_off:
        tags, ifd_off = _read_one_ifd(buf, ifd_off, bigtiff, e)
        out.append(tags)
    return out, e


def tiff_info(path: str) -> dict:
    """≙ nvtiffStreamGetFileInfo + the multi-image info sample: first
    image's fields at the top level, ``num_images`` and per-image
    ``images`` list alongside."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds, _e = _read_ifds(buf)

    def one(t):
        info = {
            "width": t[_TAG_WIDTH],
            "height": t[_TAG_HEIGHT],
            "samples_per_pixel": t.get(_TAG_SPP, 1),
            "compression": t.get(_TAG_COMPRESSION, 1),
            "photometric": t.get(_TAG_PHOTOMETRIC, 1),
            "bits_per_sample": (t.get(_TAG_BITS, 8)[0]
                                if isinstance(t.get(_TAG_BITS, 8), list)
                                else t.get(_TAG_BITS, 8)),
        }
        if _TAG_TILE_WIDTH in t:
            info["tile"] = (t[_TAG_TILE_LENGTH], t[_TAG_TILE_WIDTH])
        return info

    info = one(ifds[0])
    info["num_images"] = len(ifds)
    info["images"] = [one(t) for t in ifds]
    return info


def _decode_segment(data: bytes, comp: int, tables: bytes | None,
                    photometric: int):
    """One strip/tile → raw bytes, or a decoded array for JPEG."""
    if comp == 1:
        return data
    if comp == 5:
        return _lzw_decode(data)
    if comp in (8, 32946):
        return zlib.decompress(data)
    if comp == 32773:
        return _packbits_decode(data)
    if comp in (6, 7):
        from tpumathlib.image.jpeg import jfif_decode

        blob = _jpeg_tables_splice(tables, data) if tables else data
        # photometric=2 → the JPEG components are stored as RGB (no
        # YCbCr transform), as libtiff emits by default; 6 → YCbCr
        return jfif_decode(blob,
                           color="rgb" if photometric == 2 else "ycbcr")
    raise AssertionError(f"unsupported TIFF compression {comp}")


def _undo_predictor(arr: np.ndarray) -> np.ndarray:
    """Undo horizontal differencing (predictor=2) within ONE segment —
    the predictor restarts at every strip/tile boundary (TIFF 6.0 §14),
    so it must never run across assembled tiles. Wraps modulo the sample
    width (uint8 or uint16)."""
    wide = np.uint32 if arr.dtype.itemsize == 1 else np.uint64
    return np.cumsum(arr.astype(wide), axis=1).astype(
        arr.dtype.newbyteorder("="))


def _decode_ifd(buf: bytes, t: dict, region: tuple | None,
                endian: str = "<"):
    """Decode one IFD, with REGION PUSHDOWN: only the strips/tiles that
    intersect ``region`` are entropy-decoded (≙ nvtiffDecodeRange's
    partial decode in nvTIFF-Batched-Region-Decode)."""
    comp = t.get(_TAG_COMPRESSION, 1)
    w, h = t[_TAG_WIDTH], t[_TAG_HEIGHT]
    spp = t.get(_TAG_SPP, 1)
    bits = t.get(_TAG_BITS, 8)
    if isinstance(bits, list):
        assert len(set(bits)) == 1, f"mixed bits-per-sample {bits}"
        bits = bits[0]
    assert bits in (8, 16), f"unsupported bits-per-sample {bits}"
    dt = np.uint8 if bits == 8 else np.dtype(endian + "u2")
    bpp = bits // 8
    tiled = _TAG_TILE_OFFSETS in t
    off_tag, cnt_tag = (_TAG_TILE_OFFSETS, _TAG_TILE_COUNTS) if tiled \
        else (_TAG_STRIP_OFFSETS, _TAG_STRIP_COUNTS)
    offsets = t[off_tag]
    counts = t[cnt_tag]
    if isinstance(offsets, int):
        offsets = [offsets]
        counts = [counts]
    tables = t.get(_TAG_JPEG_TABLES)
    tables = bytes(tables) if tables is not None else None
    photometric = t.get(_TAG_PHOTOMETRIC, 1)
    predictor = comp in (5, 8, 32946) and t.get(_TAG_PREDICTOR, 1) == 2
    is_jpeg = comp in (6, 7)
    if region is not None:
        y0, x0, rh, rw = region
        rh = min(rh, h - y0)
        rw = min(rw, w - x0)
        if rh <= 0 or rw <= 0:     # no intersection → empty crop
            shape = (max(rh, 0), max(rw, 0)) + ((spp,) if spp > 1 else ())
            return np.zeros(shape, np.uint8 if bits == 8 else np.uint16)
    else:
        y0 = x0 = 0
        rh, rw = h, w

    def seg(k):
        p = _decode_segment(buf[offsets[k]:offsets[k] + counts[k]], comp,
                            tables, photometric)
        return p

    if tiled:
        th, tw = t[_TAG_TILE_LENGTH], t[_TAG_TILE_WIDTH]
        across = -(-w // tw)
        r0, r1 = y0 // th, -(-(y0 + rh) // th)
        c0, c1 = x0 // tw, -(-(x0 + rw) // tw)

        def tile(r, c):
            p = seg(r * across + c)
            if is_jpeg:
                a = np.atleast_3d(p)[:th, :tw]
            else:
                a = np.frombuffer(p[:th * tw * spp * bpp], dt) \
                    .reshape(th, tw, spp)
            return _undo_predictor(a) if predictor else a

        rows = [np.concatenate([tile(r, c) for c in range(c0, c1)], axis=1)
                for r in range(r0, r1)]
        img = np.concatenate(rows, axis=0)
        img = img[y0 - r0 * th:y0 - r0 * th + rh,
                  x0 - c0 * tw:x0 - c0 * tw + rw]
    else:
        rps = t.get(_TAG_ROWS_PER_STRIP, h) or h
        s0, s1 = y0 // rps, min(-(-(y0 + rh) // rps), len(offsets))

        def strip(k):
            p = seg(k)
            if is_jpeg:
                a = np.atleast_3d(p)[:, :w]
            else:
                a = np.frombuffer(p[:(len(p) // bpp) * bpp], dt)
                a = a[:(len(a) // (w * spp)) * w * spp].reshape(-1, w, spp)
            return _undo_predictor(a) if predictor else a

        img = np.concatenate([strip(k) for k in range(s0, s1)], axis=0)
        img = img[y0 - s0 * rps:y0 - s0 * rps + rh, x0:x0 + rw]
    img = img[:, :, 0] if img.shape[2] == 1 else img
    if img.dtype.itemsize == 2:
        img = img.astype(np.uint16)            # native byte order out
    return np.ascontiguousarray(img)


def tiff_read(path: str, region: tuple | None = None, index: int = 0):
    """Decode image ``index``; ``region`` = (y0, x0, h, w) gives the
    batched-region-decode behavior (≙ nvtiffDecodeRange)."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds, e = _read_ifds(buf)
    return _decode_ifd(buf, ifds[index], region, e)


def tiff_read_regions(path: str, regions, index: int = 0,
                      threads: int = 1) -> list:
    """Batched region decode (≙ nvTIFF-Batched-Region-Decode's
    nvtiffDecodeRange over an image batch): the file is read and its IFD
    parsed ONCE, then every (y0, x0, h, w) region is decoded with strip/
    tile pushdown — only intersecting segments are entropy-decoded.
    ``threads`` > 1 fans the per-region work over a thread pool (the
    deflate/JPEG entropy stages release the GIL in zlib/native code)."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds, e = _read_ifds(buf)
    t = ifds[index]
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(threads) as pool:
            return list(pool.map(lambda r: _decode_ifd(buf, t, r, e),
                                 regions))
    return [_decode_ifd(buf, t, r, e) for r in regions]


def tiff_read_all(path: str) -> list:
    """Decode every image of a multi-image file (≙ nvtiffDecode over the
    full stream)."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds, e = _read_ifds(buf)
    return [_decode_ifd(buf, t, None, e) for t in ifds]


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
    ifds, e = _read_ifds(buf)
    t = ifds[index]
    img = _decode_ifd(buf, t, None, e)
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
