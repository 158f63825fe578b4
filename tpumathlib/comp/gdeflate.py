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
