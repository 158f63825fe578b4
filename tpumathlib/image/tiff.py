"""Minimal baseline TIFF codec (≙ nvTIFF decode / decode-encode / imageinfo /
region-decode samples).

Supports uncompressed (compression=1) grayscale and RGB, 8-bit, single
strip or multi-strip, little-endian. Enough to round-trip the pipeline
fixtures; LZW/JPEG-in-TIFF are out of scope (the reference's nvTIFF also
supports a subset)."""

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


def tiff_write(path: str, image: np.ndarray) -> None:
    """Write uint8 gray (H,W) or RGB (H,W,3) as uncompressed baseline TIFF."""
    img = np.ascontiguousarray(image, np.uint8)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    data = img.tobytes()
    # layout: header(8) + IFD + data
    ntags = 9
    ifd_off = 8
    data_off = ifd_off + 2 + ntags * 12 + 4 + 8  # + bits-array slot
    bits_off = ifd_off + 2 + ntags * 12 + 4

    def tag(tid, ttype, count, value):
        return struct.pack("<HHI4s", tid, ttype, count, value)

    def short_val(v):
        return struct.pack("<HH", v, 0)

    def long_val(v):
        return struct.pack("<I", v)

    tags = [
        tag(_TAG_WIDTH, 3, 1, short_val(w)),
        tag(_TAG_HEIGHT, 3, 1, short_val(h)),
        tag(_TAG_BITS, 3, spp,
            short_val(8) if spp == 1 else long_val(bits_off)),
        tag(_TAG_COMPRESSION, 3, 1, short_val(1)),
        tag(_TAG_PHOTOMETRIC, 3, 1, short_val(1 if spp == 1 else 2)),
        tag(_TAG_STRIP_OFFSETS, 4, 1, long_val(data_off)),
        tag(_TAG_SPP, 3, 1, short_val(spp)),
        tag(_TAG_ROWS_PER_STRIP, 3, 1, short_val(h)),
        tag(_TAG_STRIP_COUNTS, 4, 1, long_val(len(data))),
    ]
    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        f.write(struct.pack("<H", ntags))
        f.write(b"".join(tags))
        f.write(struct.pack("<I", 0))  # next IFD
        f.write(struct.pack("<HHHH", 8, 8, 8, 0)[:8])  # bits array slot
        f.write(data)


def _read_ifd(buf: bytes):
    endian, magic, ifd_off = struct.unpack("<2sHI", buf[:8])
    assert endian == b"II" and magic == 42, "unsupported TIFF (big-endian?)"
    (ntags,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(ntags):
        tid, ttype, count, raw = struct.unpack_from("<HHI4s", buf, ifd_off + 2 + i * 12)
        if ttype == 3 and count == 1:
            val = struct.unpack("<HH", raw)[0]
        elif ttype == 4 and count == 1:
            val = struct.unpack("<I", raw)[0]
        elif count > 1:
            off = struct.unpack("<I", raw)[0]
            sz = {3: 2, 4: 4}.get(ttype, 1)
            fmt = {3: "H", 4: "I"}.get(ttype, "B")
            val = list(struct.unpack_from(f"<{count}{fmt}", buf, off))
        else:
            val = struct.unpack("<I", raw)[0]
        tags[tid] = val
    return tags


def tiff_info(path: str) -> dict:
    """≙ nvtiffStreamGetFileInfo / the image-info sample."""
    with open(path, "rb") as f:
        buf = f.read()
    t = _read_ifd(buf)
    return {
        "width": t[_TAG_WIDTH],
        "height": t[_TAG_HEIGHT],
        "samples_per_pixel": t.get(_TAG_SPP, 1),
        "compression": t.get(_TAG_COMPRESSION, 1),
        "photometric": t.get(_TAG_PHOTOMETRIC, 1),
    }


def tiff_read(path: str, region: tuple | None = None) -> np.ndarray:
    """Decode; ``region`` = (y0, x0, h, w) gives the batched-region-decode
    behavior (≙ nvtiffDecodeRange)."""
    with open(path, "rb") as f:
        buf = f.read()
    t = _read_ifd(buf)
    assert t.get(_TAG_COMPRESSION, 1) == 1, "only uncompressed baseline TIFF"
    w, h = t[_TAG_WIDTH], t[_TAG_HEIGHT]
    spp = t.get(_TAG_SPP, 1)
    offsets = t[_TAG_STRIP_OFFSETS]
    counts = t[_TAG_STRIP_COUNTS]
    if isinstance(offsets, int):
        offsets = [offsets]
        counts = [counts]
    data = b"".join(buf[o:o + c] for o, c in zip(offsets, counts))
    img = np.frombuffer(data, np.uint8)
    img = img.reshape(h, w, spp) if spp > 1 else img.reshape(h, w)
    if region is not None:
        y0, x0, rh, rw = region
        img = img[y0:y0 + rh, x0:x0 + rw]
    return img.copy()
