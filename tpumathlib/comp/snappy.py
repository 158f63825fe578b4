"""Snappy BLOCK format codec (the real format, not an alias).

Spec: github.com/google/snappy/blob/master/format_description.txt —
preamble = uncompressed length as little-endian varint; then tagged
elements: tag & 3 == 0 literal (length-1 in the high 6 bits, 60..63 mean
1..4 extra LE length bytes), == 1 copy with 1-byte offset (len 4..11,
offset 11 bits), == 2 copy with 2-byte LE offset, == 3 copy with 4-byte LE
offset. Compressor: the reference implementation's hash-table greedy
matcher (4-byte hashes, 64 KiB-window emit discipline is not required by
the format — any valid element stream decodes).

≙ nvCOMP's Snappy codec (nvcompBatchedSnappy*); host-side like the
reference's CPU-compress interop examples."""

from __future__ import annotations


def _varint_encode(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _varint_decode(b: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        c = b[pos]
        pos += 1
        n |= (c & 0x7F) << shift
        if c < 0x80:
            return n, pos
        shift += 7


def _emit_literal(out: bytearray, lit: bytes):
    n = len(lit)
    if n == 0:
        return
    ln = n - 1
    if ln < 60:
        out.append(ln << 2)
    elif ln < (1 << 8):
        out.append(60 << 2)
        out.append(ln)
    elif ln < (1 << 16):
        out.append(61 << 2)
        out += ln.to_bytes(2, "little")
    elif ln < (1 << 24):
        out.append(62 << 2)
        out += ln.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += ln.to_bytes(4, "little")
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int):
    # split long matches into <=64-byte copies (tag-2 limit)
    while length >= 68:
        out.append((59 << 2) | 2)  # len 60
        out += offset.to_bytes(2, "little")
        length -= 60
    if length > 64:
        out.append((29 << 2) | 2)  # len 30
        out += offset.to_bytes(2, "little")
        length -= 30
    if 4 <= length <= 11 and offset < 2048:
        out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
        out.append(offset & 0xFF)
    else:
        out.append(((length - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    data = bytes(data)
    n = len(data)
    out = bytearray(_varint_encode(n))
    if n < 4:
        _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and i - cand <= 0xFFFF:
            # extend the match
            ln = 4
            while i + ln < n and data[cand + ln] == data[i + ln] \
                    and ln < 1 << 16:
                ln += 1
            _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, ln)
            i += ln
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data[lit_start:])
    return bytes(out)


def decompress(blob: bytes, expected_len: int | None = None) -> bytes:
    n, pos = _varint_decode(blob, 0)
    out = bytearray()
    while pos < len(blob) and len(out) < n:
        tag = blob[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(blob[pos:pos + nb], "little")
                pos += nb
            ln += 1
            out += blob[pos:pos + ln]
            pos += ln
            continue
        if t == 1:
            ln = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | blob[pos]
            pos += 1
        elif t == 2:
            ln = (tag >> 2) + 1
            offset = int.from_bytes(blob[pos:pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            offset = int.from_bytes(blob[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: bad copy offset")
        # overlapping copies replicate byte-by-byte per the spec
        start = len(out) - offset
        for k in range(ln):
            out.append(out[start + k])
    if len(out) != n:
        raise ValueError(f"snappy: length mismatch {len(out)} != {n}")
    return bytes(out)
