"""GDeflate-style paged deflate codec.

≙ nvCOMP/examples/gdeflate_cpu_compression.cu:1 (CPU-side batched
GDeflate compression via libdeflate + batched decompression) and the
nvcompBatchedGdeflate* chunked API (64 KB max page size).

Format note (explicit, no masquerade): a GDeflate page interleaves its
DEFLATE bitstream across 32 sub-streams for SIMT decoders. This codec
emits the single-substream degenerate form — a one-byte page header
(substream count = 1) followed by a standard raw RFC 1951 DEFLATE
stream. Any RFC 1951 inflater can decode the payload; nvCOMP's GPU
bitstream reader cannot (it expects the 32-way interleave). The page
structure, 64 KB chunk bound, and batched API shape match the reference.
"""

from __future__ import annotations

import zlib

from tpumathlib.core.errors import check

MAX_PAGE = 64 * 1024   # nvcompGdeflateCPUCompressionMaxAllowedChunkSize


def compress(chunk: bytes) -> bytes:
    check(len(chunk) <= MAX_PAGE,
          f"gdeflate page must be <= {MAX_PAGE} bytes (got {len(chunk)})")
    co = zlib.compressobj(9, zlib.DEFLATED, -15)   # raw deflate
    return b"\x01" + co.compress(bytes(chunk)) + co.flush()


def decompress(page: bytes, out_size: int) -> bytes:
    page = bytes(page)
    check(len(page) >= 1 and page[0] == 1,
          "gdeflate: unsupported substream count (only the single-"
          "substream degenerate form is emitted/read)")
    out = zlib.decompressobj(-15).decompress(page[1:], out_size)
    check(len(out) == out_size, "gdeflate: truncated page")
    return out
