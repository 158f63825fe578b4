"""GDeflate-architecture paged deflate codec.

≙ nvCOMP/examples/gdeflate_cpu_compression.cu:1 (CPU-side batched
GDeflate compression via libdeflate + batched decompression) and the
nvcompBatchedGdeflate* chunked API (64 KB max page size).

A GDeflate page interleaves its DEFLATE bitstream across 32 sub-streams
so a SIMT decoder's 32 lanes share the entropy-decode work. Pages
emitted here carry that REAL interleave: a native LZ77 + canonical
length-limited Huffman coder (native/src/gdeflate.cpp) assigns token k
to sub-stream k % 32, each sub-stream self-delimiting so the 32 entropy
decodes are independent (phase 1), with only the LZ copy pass
sequential (phase 2) — structurally the nvCOMP GDeflate decode, though
not bit-identical to the DirectStorage stream (no conformance target
exists in this environment, and bitstream internals are not copied).
Header byte 0x20 = 32 sub-streams; the round-3 single-substream zlib
degenerate form (header 0x01) remains readable for back-compat.
"""

from __future__ import annotations

import zlib

import numpy as np

from tpumathlib.core.errors import check

MAX_PAGE = 64 * 1024   # nvcompGdeflateCPUCompressionMaxAllowedChunkSize
_LANES = 32


def compress(chunk: bytes) -> bytes:
    """One GDeflate page (≤ 64 KiB); larger buffers tile through
    ``compress_buffer`` the way nvCOMP's batched API pages its input."""
    check(len(chunk) <= MAX_PAGE,
          f"gdeflate page must be <= {MAX_PAGE} bytes (got {len(chunk)})")
    from tpumathlib.native import lib

    src = np.frombuffer(bytes(chunk), np.uint8)
    if src.size == 0:
        src = np.zeros(1, np.uint8)
    cap = len(chunk) * 2 + 1024
    dst = np.empty(cap, np.uint8)
    nbytes = lib().gdef_compress(
        np.ascontiguousarray(src), len(chunk), dst, cap)
    check(nbytes > 0, "gdeflate: native compression failed")
    return bytes([_LANES]) + dst[:nbytes].tobytes()


def decompress(page: bytes, out_size: int) -> bytes:
    page = bytes(page)
    check(len(page) >= 1, "gdeflate: empty page")
    if page[0] == 1:     # round-3 degenerate form (raw deflate payload)
        out = zlib.decompressobj(-15).decompress(page[1:], out_size)
        check(len(out) == out_size, "gdeflate: truncated page")
        return out
    check(page[0] == _LANES, "gdeflate: unsupported substream count")
    from tpumathlib.native import lib

    src = np.frombuffer(page, np.uint8)[1:]
    if src.size == 0:
        src = np.zeros(1, np.uint8)
    dst = np.empty(max(out_size, 1), np.uint8)
    n = lib().gdef_decompress(np.ascontiguousarray(src), len(page) - 1,
                              dst, out_size)
    check(n == out_size, "gdeflate: corrupt or truncated page")
    return dst[:out_size].tobytes()


def compress_buffer(data: bytes) -> bytes:
    """Arbitrary-size buffer → multi-page stream (the reference library
    tiles its input into <=64 KiB pages internally; header: 0x21, page
    count u32, then per-page (u32 raw_len, u32 comp_len, page))."""
    import struct

    data = bytes(data)
    pages = [data[i:i + MAX_PAGE] for i in range(0, len(data), MAX_PAGE)] \
        or [b""]
    out = bytearray([0x21]) + struct.pack("<I", len(pages))
    for p in pages:
        c = compress(p)
        out += struct.pack("<II", len(p), len(c)) + c
    return bytes(out)


def decompress_buffer(blob: bytes, out_size: int) -> bytes:
    """Inverse of ``compress_buffer``; single pages (0x20/0x01 headers)
    pass through to the page decoder."""
    import struct

    blob = bytes(blob)
    check(len(blob) >= 1, "gdeflate: empty stream")
    if blob[0] != 0x21:
        return decompress(blob, out_size)
    (npages,) = struct.unpack_from("<I", blob, 1)
    off = 5
    out = bytearray()
    for _ in range(npages):
        raw_len, comp_len = struct.unpack_from("<II", blob, off)
        off += 8
        out += decompress(blob[off:off + comp_len], raw_len)
        off += comp_len
    check(len(out) == out_size, "gdeflate: stream size mismatch")
    return bytes(out)
