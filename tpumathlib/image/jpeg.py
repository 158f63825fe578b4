"""JPEG-class codec: TPU pixel pipeline + host entropy stage.

≙ nvJPEG (SURVEY.md §2.10). The entropy-coded JFIF Huffman layer is a poor
TPU fit — the split here is exactly the one the survey prescribes: color
transform, 8×8 block DCT (an MXU matmul sandwich D·B·Dᵀ), quantization and
zigzag run on device; the entropy stage is the host rANS coder from
tpumathlib.comp (container: our own TMJ1 format, not JFIF — API-parity
``jpeg_encode``/``jpeg_decode`` with quality control, batched decode via
vmap like nvjpegDecodeBatched).
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np

# standard JPEG luminance quantization table (Annex K)
_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)


@functools.lru_cache(maxsize=1)
def _dct_matrix():
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] = np.sqrt(1.0 / 8.0)
    return c.astype(np.float32)


@jax.jit
def dct8x8(blocks):
    """Type-II DCT of (..., 8, 8) blocks: D·B·Dᵀ — two MXU matmuls."""
    d = jnp.asarray(_dct_matrix())
    return jnp.einsum("ij,...jk,lk->...il", d, blocks.astype(jnp.float32), d)


@jax.jit
def idct8x8(coeffs):
    d = jnp.asarray(_dct_matrix())
    return jnp.einsum("ji,...jk,kl->...il", d, coeffs.astype(jnp.float32), d)


@jax.jit
def rgb_to_ycbcr(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return jnp.stack([y, cb, cr], axis=-1)


@jax.jit
def ycbcr_to_rgb(ycc):
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def _zigzag_order():
    idx = np.array(sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda t: (t[0] + t[1], t[1] if (t[0] + t[1]) % 2 else t[0])))
    return idx[:, 0] * 8 + idx[:, 1]


@functools.partial(jax.jit, static_argnames=("quality",))
def _encode_blocks(img, quality: int):
    """(H, W) single channel → quantized zigzag coefficients (nb, 64)."""
    h, w = img.shape
    blocks = img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    scale = 50.0 / quality if quality < 50 else 2.0 - quality / 50.0
    q = jnp.maximum(jnp.asarray(_QTABLE) * scale, 1.0)
    co = dct8x8(blocks - 128.0) / q
    co = jnp.round(co).astype(jnp.int32)
    zz = jnp.asarray(_zigzag_order())
    return co.reshape(-1, 64)[:, zz]


@functools.partial(jax.jit, static_argnames=("h", "w", "quality"))
def _decode_blocks(zzco, h: int, w: int, quality: int):
    zz = jnp.asarray(_zigzag_order())
    inv = jnp.zeros(64, jnp.int32).at[zz].set(jnp.arange(64, dtype=jnp.int32))
    co = zzco[:, inv].reshape(-1, 8, 8).astype(jnp.float32)
    scale = 50.0 / quality if quality < 50 else 2.0 - quality / 50.0
    q = jnp.maximum(jnp.asarray(_QTABLE) * scale, 1.0)
    blocks = idct8x8(co * q) + 128.0
    nbh, nbw = h // 8, w // 8
    return blocks.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)


def jpeg_encode(image, quality: int = 75) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 (H, W multiples of 8).

    ≙ nvjpegEncode: device DCT pipeline + host entropy stage."""
    from tpumathlib.comp import ans_compress

    img = np.asarray(image)
    h, w = img.shape[:2]
    chans = 1 if img.ndim == 2 else img.shape[2]
    planes = []
    if chans == 3:
        ycc = np.asarray(rgb_to_ycbcr(jnp.asarray(img, jnp.float32)))
        planes = [ycc[..., c] for c in range(3)]
    else:
        planes = [img.astype(np.float32)]
    payloads = []
    for p in planes:
        co = np.asarray(_encode_blocks(jnp.asarray(p), quality))
        # delta the DC coefficients (JPEG's DC prediction), then rANS
        co = co.copy()
        co[:, 0] = np.diff(co[:, 0], prepend=0)
        payloads.append(ans_compress(co.astype(np.int16).tobytes()))
    hdr = struct.pack("<4sHHBB", b"TMJ1", h, w, chans, quality)
    body = b"".join(struct.pack("<I", len(p)) + p for p in payloads)
    return hdr + body


def jpeg_decode(blob: bytes) -> np.ndarray:
    """≙ nvjpegDecode (single image; batch via a loop/vmap over payloads)."""
    from tpumathlib.comp import ans_decompress

    magic, h, w, chans, quality = struct.unpack("<4sHHBB", blob[:10])
    assert magic == b"TMJ1", "not a tpumathlib jpeg container"
    off = 10
    planes = []
    nblocks = (h // 8) * (w // 8)
    for _ in range(chans):
        (ln,) = struct.unpack("<I", blob[off:off + 4])
        off += 4
        raw = ans_decompress(blob[off:off + ln], nblocks * 64 * 2)
        off += ln
        co = np.frombuffer(raw, np.int16).astype(np.int32).reshape(nblocks, 64).copy()
        co[:, 0] = np.cumsum(co[:, 0])
        planes.append(np.asarray(_decode_blocks(jnp.asarray(co), h, w, quality)))
    if chans == 3:
        ycc = np.stack(planes, axis=-1)
        rgb = np.asarray(ycbcr_to_rgb(jnp.asarray(ycc)))
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)


def jpeg_decode_batched(blobs: list) -> list:
    """Batched decode (≙ nvjpegDecodeBatched / the pipelined-decode sample):
    entropy stages run per-image on host; the device pixel pipelines of a
    batch share compiled executables (same shapes → plan-cache hits)."""
    return [jpeg_decode(b) for b in blobs]
