"""JPEG2000-class wavelet codec (≙ nvJPEG2000 decode/encode/tile samples).

Pipeline split per SURVEY.md §2.10: the CDF 5/3 reversible integer wavelet
transform (the J2K lossless filter) runs as vectorized int32 lifting steps
on device; the entropy stage is host-side (bitcomp zigzag-packing + rANS —
standing in for EBCOT, which is a bit-serial context coder with no TPU
formulation). Container is our own TMW1 format with per-resolution-level
payloads, giving the progressive/partial-decode structure the nvJPEG2000
tile/partial samples exercise.
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np


def _sym(i, n):
    """Symmetric boundary extension index."""
    return jnp.clip(jnp.where(i < 0, -i, jnp.where(i >= n, 2 * n - 2 - i, i)), 0, n - 1)


def _dwt53_1d(x):
    """One 5/3 lifting level along the last axis (even length)."""
    n = x.shape[-1]
    even = x[..., 0::2]
    odd = x[..., 1::2]
    # predict: d[k] = odd[k] - floor((even[k] + even[k+1])/2)
    even_r = jnp.concatenate([even[..., 1:], even[..., -1:]], axis=-1)
    d = odd - ((even + even_r) >> 1)
    # update: s[k] = even[k] + floor((d[k-1] + d[k] + 2)/4)
    d_l = jnp.concatenate([d[..., :1], d[..., :-1]], axis=-1)
    s = even + ((d_l + d + 2) >> 2)
    return s, d


def _idwt53_1d(s, d):
    d_l = jnp.concatenate([d[..., :1], d[..., :-1]], axis=-1)
    even = s - ((d_l + d + 2) >> 2)
    even_r = jnp.concatenate([even[..., 1:], even[..., -1:]], axis=-1)
    odd = d + ((even + even_r) >> 1)
    n = 2 * s.shape[-1]
    out = jnp.zeros(s.shape[:-1] + (n,), s.dtype)
    out = out.at[..., 0::2].set(even)
    out = out.at[..., 1::2].set(odd)
    return out


@functools.partial(jax.jit, static_argnames=("levels",))
def dwt53_2d(img, levels: int = 3):
    """Multi-level 2D reversible 5/3 DWT of an int32 image (H, W multiples of
    2^levels). Returns the packed coefficient plane (in-place subband layout,
    LL in the top-left corner)."""
    x = img.astype(jnp.int32)
    h, w = x.shape
    out = x
    ch, cw = h, w
    for _ in range(levels):
        sub = out[:ch, :cw]
        s, d = _dwt53_1d(sub)             # along W
        sub = jnp.concatenate([s, d], axis=-1)
        s2, d2 = _dwt53_1d(sub.swapaxes(0, 1))   # along H
        sub = jnp.concatenate([s2, d2], axis=-1).swapaxes(0, 1)
        out = out.at[:ch, :cw].set(sub)
        ch //= 2
        cw //= 2
    return out


@functools.partial(jax.jit, static_argnames=("levels",))
def idwt53_2d(coeffs, levels: int = 3):
    x = coeffs.astype(jnp.int32)
    h, w = x.shape
    ch, cw = h >> levels, w >> levels
    for _ in range(levels):
        ch *= 2
        cw *= 2
        sub = x[:ch, :cw]
        subT = sub.swapaxes(0, 1)
        s2 = subT[..., : ch // 2]
        d2 = subT[..., ch // 2:]
        sub = _idwt53_1d(s2, d2).swapaxes(0, 1)
        s = sub[..., : cw // 2]
        d = sub[..., cw // 2:]
        sub = _idwt53_1d(s, d)
        x = x.at[:ch, :cw].set(sub)
    return x


def _subbands(h, w, levels):
    """(name, (y0, x0, sh, sw)) slices of the packed coefficient plane:
    LL_L, then (HL, LH, HH) per level from coarsest to finest."""
    out = [("LL", (0, 0, h >> levels, w >> levels))]
    for lev in range(levels, 0, -1):
        sh, sw = h >> lev, w >> lev
        out.append((f"HL{lev}", (0, sw, sh, sw)))
        out.append((f"LH{lev}", (sh, 0, sh, sw)))
        out.append((f"HH{lev}", (sh, sw, sh, sw)))
    return out


def j2k_encode(image, levels: int = 3, codestream: bool = True) -> bytes:
    """Lossless encode. Default: a REAL .j2k codestream (reversible 5/3 +
    full EBCOT Tier-1/2 + MQ coder, gray or RGB — decodes bit-exactly in
    openjpeg; ≙ nvJPEG2000/nvJPEG2000-Encoder). codestream=False keeps
    the legacy TMW1 container (device DWT + bitcomp/rANS subbands, uint8
    grayscale with dims divisible by 2^levels)."""
    if codestream:
        from tpumathlib.image.j2k_encoder import j2k_encode_codestream

        return j2k_encode_codestream(np.asarray(image), levels=levels)
    from tpumathlib.comp import ans_compress, bitcomp_compress

    img = np.asarray(image)
    h, w = img.shape
    co = np.asarray(dwt53_2d(jnp.asarray(img, jnp.int32), levels))
    parts = []
    for _, (y0, x0, sh, sw) in _subbands(h, w, levels):
        raw = bitcomp_compress(np.ascontiguousarray(
            co[y0:y0 + sh, x0:x0 + sw]).astype(np.int32).tobytes())
        p = ans_compress(raw)
        if len(p) >= len(raw):  # rANS gains nothing on packed noise
            p = b"\x00" + raw
        else:
            p = b"\x01" + p
        parts.append(struct.pack("<I", len(p)) + p)
    return struct.pack("<4sHHB", b"TMW1", h, w, levels) + b"".join(parts)


def j2k_decode(blob: bytes, region: tuple | None = None) -> np.ndarray:
    """Decode; ``region`` = (y0, x0, h, w) mirrors the nvJPEG2000 partial-
    decode surface. REAL .j2k/.jp2 streams (SOC or jp2-box signature)
    route to the conformant codestream decoder
    (image/j2k_codestream.py, ≙ nvJPEG2000-Decoder); TMW1 is the
    library's own container."""
    blob = bytes(blob)
    if blob[:4] in (b"\xff\x4f\xff\x51", b"\x00\x00\x00\x0c"):
        from tpumathlib.image.j2k_codestream import j2k_decode_codestream

        return j2k_decode_codestream(blob, region=region)
    from tpumathlib.comp import ans_decompress, bitcomp_decompress

    magic, h, w, levels = struct.unpack("<4sHHB", blob[:9])
    assert magic == b"TMW1"
    off = 9
    co = np.zeros((h, w), np.int32)
    for _, (y0, x0, sh, sw) in _subbands(h, w, levels):
        (ln,) = struct.unpack("<I", blob[off:off + 4])
        off += 4
        p = blob[off:off + ln]
        off += ln
        nbytes = sh * sw * 4
        raw = p[1:] if p[0] == 0 else ans_decompress(p[1:], nbytes)
        co[y0:y0 + sh, x0:x0 + sw] = np.frombuffer(
            bitcomp_decompress(raw, nbytes), np.int32).reshape(sh, sw)
    img = np.asarray(idwt53_2d(jnp.asarray(co), levels))
    img = np.clip(img, 0, 255).astype(np.uint8)
    if region is not None:
        y0, x0, rh, rw = region
        img = img[y0:y0 + rh, x0:x0 + rw]
    return img


def j2k_decode_batched(blobs, nthreads: int | None = None) -> list:
    """Decode many codestreams with a pool of decoder instances
    (≙ nvJPEG2000/nvJPEG2000-Decoder-Pipelined — the reference overlaps
    host parsing stages across images; Tier-1 here is host-bound, so a
    thread pool is the TPU-native spelling)."""
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    blobs = list(blobs)
    if not blobs:
        return []
    n = nthreads or min(max(_os.cpu_count() or 1, 1), 8, len(blobs))
    with ThreadPoolExecutor(n) as ex:
        return list(ex.map(j2k_decode, blobs))
