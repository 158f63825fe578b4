"""In-kernel (de)compression — the nvCOMPDx tier.

≙ MathDx/nvCOMPDx: compression executed INSIDE a user kernel so decoded
data feeds compute without an HBM round trip. The TPU-native codec choice
is the cascaded family's delta + zigzag + bitpack (nvCOMP Cascaded with
RLE disabled): for a compile-time bit width b, the bit-level packing is
fully static — output j of every 32-value group reads words (j·b)//32 and
(j·b)//32 + 1 at shift (j·b)%32, so pack/unpack lower to plain vector
shifts and ORs, no gathers. (The LZ-family's byte-serial matching is the
part that does NOT map to the VPU; like the host-interop nvCOMPDx
samples, LZ4 stays a host/native codec here.)

The kernel builders are parameterized by (bits, tile) — the Pallas
analogue of nvCOMPDx's `Size<>() + Direction<>()` compile-time
composition. Delta state carries across grid steps in SMEM scratch, so a
single kernel streams arbitrarily long buffers."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.core.errors import check
from tpumathlib.dx.pallas_utils import interpret_mode


def _unpack_row(words, bits: int):
    """(R, 4·bits) uint32 words → (R, 128) uint32 values: each row holds
    four consecutive 32-value groups. Lane j of group g4 reads word
    wi = g4·bits + (j·bits)//32 at shift (j·bits)%32 (+ the next word when
    the field crosses a boundary).

    The word→lane spreading is TWO exact f32 MXU matmuls against one-hot
    matrices built from iotas (split 16/16 so every operand fits the f32
    mantissa), followed by per-lane variable shifts — the round-2 version
    was a 128-step masked-select chain that left the kernel VPU-bound at
    ~9 GB/s; this form decodes at MXU/DMA speed."""
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
    r = words.shape[0]
    nw = 4 * bits
    hp = jax.lax.Precision.HIGHEST  # DEFAULT would demote to bf16: inexact
    # per-lane constants from iotas (j = lane index within the 128 group)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    j32 = lane % 32
    wi = (lane // 32) * bits + (j32 * bits) // 32          # (1, 128)
    sh = (j32 * bits) % 32
    wrow = jax.lax.broadcasted_iota(jnp.int32, (nw, 128), 0)
    s1 = (wrow == jnp.broadcast_to(wi, (nw, 128))).astype(jnp.float32)
    s2 = (wrow == jnp.broadcast_to(wi + 1, (nw, 128))).astype(jnp.float32)
    # Mosaic lacks direct uint32↔f32 casts: hop through int32 (both halves
    # are < 2^16 so the int32 path is exact)
    hi = (words >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (words & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)

    def spread(s):
        h = jnp.dot(hi, s, preferred_element_type=jnp.float32, precision=hp)
        l = jnp.dot(lo, s, preferred_element_type=jnp.float32, precision=hp)
        return ((h.astype(jnp.int32).astype(jnp.uint32) << jnp.uint32(16))
                | l.astype(jnp.int32).astype(jnp.uint32))

    w1 = spread(s1)                                        # word wi per lane
    shv = jnp.broadcast_to(sh, (r, 128)).astype(jnp.uint32)
    out = w1 >> shv
    if bits < 32:
        # fields crossing a word boundary borrow the next word's low bits
        w2 = spread(s2)
        cross = jnp.broadcast_to(sh + bits > 32, (r, 128))
        # &31 keeps the (unused) non-crossing lanes' shift in range
        borrow = w2 << ((jnp.uint32(32) - shv) & jnp.uint32(31))
        out = jnp.where(cross, out | borrow, out)
    return out & mask


def _pack_row(vals, bits: int):
    """(R, 128) uint32 values → (R, 4·bits) packed words — the exact
    inverse of _unpack_row, same MXU formulation: per-lane shifts, then
    lanes→words gathered by two one-hot matmuls (fields within a word are
    bit-disjoint, so the f32 sums are exact ORs on 16-bit halves)."""
    r = vals.shape[0]
    nw = 4 * bits
    hp = jax.lax.Precision.HIGHEST
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    j32 = lane % 32
    wi = (lane // 32) * bits + (j32 * bits) // 32
    sh = (j32 * bits) % 32
    shv = jnp.broadcast_to(sh, (r, 128)).astype(jnp.uint32)
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
    v = vals & mask
    low = v << shv
    cross = jnp.broadcast_to(sh + bits > 32, (r, 128))
    carry = jnp.where(cross, v >> ((jnp.uint32(32) - shv) & jnp.uint32(31)),
                      jnp.uint32(0))
    # one-hot routing matrices built in the (128, nw) orientation directly
    # (a (1,128)→(128,1) reshape would not be a leading collapse in Mosaic)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (128, nw), 1)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (128, nw), 0)
    j32r = lane_r % 32
    wir = (lane_r // 32) * bits + (j32r * bits) // 32
    t1 = (wcol == wir).astype(jnp.float32)
    t2 = (wcol == wir + 1).astype(jnp.float32)

    def gather(x, t):
        hi = (x >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
        lo = (x & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        h = jnp.dot(hi, t, preferred_element_type=jnp.float32, precision=hp)
        l = jnp.dot(lo, t, preferred_element_type=jnp.float32, precision=hp)
        return ((h.astype(jnp.int32).astype(jnp.uint32) << jnp.uint32(16))
                | l.astype(jnp.int32).astype(jnp.uint32))

    return gather(low, t1) | gather(carry, t2)


def _cumsum_lanes(x):
    """Inclusive prefix sum over the 128-lane axis (Hillis–Steele with
    rolls — jnp.cumsum has no Mosaic lowering; lane width must be a
    multiple of 128 so physical rolls equal logical rolls)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(cols >= sh, pltpu.roll(x, sh, axis=1), 0)
    return x


def _cumsum_rows(x, n: int):
    """Inclusive prefix sum over the sublane axis of (n, 1)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = 1
    while sh < n:
        x = x + jnp.where(rows >= sh, pltpu.roll(x, sh, axis=0), 0)
        sh *= 2
    return x


def _zigzag_enc(x):
    return ((x.astype(jnp.int32) << 1) ^ (x.astype(jnp.int32) >> 31)
            ).astype(jnp.uint32)


def _zigzag_dec(z):
    return ((z >> 1).astype(jnp.int32)
            ^ -(z & jnp.uint32(1)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n", "bits", "tile"))
def dx_decompress(packed, n: int = None, *, bits: int, tile: int = 64):
    """In-kernel cascaded (delta+zigzag+bitpack) decode: packed (G, bits)
    uint32 → int32 values (G·32,). The delta prefix-sum carry rides SMEM
    across grid steps, so decode + consumption stay in one kernel launch
    (≙ nvCOMPDx decompress-then-compute)."""
    check(1 <= bits <= 32, "dx codec packs into 32-bit words: bits must be "
                           "1..32 (wider deltas silently wrap otherwise)")
    g = packed.shape[0]
    check(packed.shape[1] == bits, "packed shape must be (groups, bits)")
    gpad = (-g) % (4 * tile)
    if gpad:
        packed = jnp.pad(packed, ((0, gpad), (0, 0)))
    rows = packed.shape[0] // 4
    pk = packed.reshape(rows, 4 * bits)  # 4 groups per 128-lane row

    def kernel(p_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        z = _unpack_row(p_ref[:], bits)
        d = _zigzag_dec(z)                      # (tile, 128), row-major
        within = _cumsum_lanes(d)
        rowtot = within[:, 127:128]
        rowoff = _cumsum_rows(rowtot, tile) - rowtot  # exclusive over rows
        vals = within + rowoff + carry[0:1, 127:128]
        carry[:] = vals[tile - 1:tile, :]
        o_ref[:] = vals

    out = pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, 4 * bits), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_mode(),
    )(pk)
    out = out.reshape(-1)[:g * 32]
    return out if n is None else out[:n]


@functools.partial(jax.jit, static_argnames=("bits", "tile"))
def dx_compress(values, *, bits: int, tile: int = 64):
    """In-kernel cascaded encode: int32 values (multiple of 32) →
    (G, bits) packed uint32. The caller picks the compile-time bit width
    (≙ the Dx composition's static size); deltas must fit 2^bits after
    zigzag — validate with dx_required_bits."""
    check(1 <= bits <= 32, "dx codec packs into 32-bit words: bits must be "
                           "1..32 (use dx_required_bits to validate inputs)")
    n = values.shape[0]
    check(n % 32 == 0, "value count must be a multiple of 32")
    g = n // 32
    pad = (-g) % (4 * tile)
    if pad:
        # pad with a repeat of the last value → zero deltas
        values = jnp.concatenate(
            [values, jnp.broadcast_to(values[-1], (pad * 32,))])
    rows = values.shape[0] // 128

    def kernel(v_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        v = v_ref[:]                            # (tile, 128)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
        # previous element in row-major order, via rolls (concats at
        # unaligned offsets don't lower in Mosaic)
        lastcol = v[:, 127:128]
        last_prev_row = pltpu.roll(lastcol, 1, axis=0)   # row r-1's col 127
        last_prev_row = jnp.where(ridx == 0, carry[0:1, 127:128],
                                  last_prev_row)
        rolled = pltpu.roll(v, 1, axis=1)                # v[:, j-1] (wraps)
        prev = jnp.where(cols == 0, last_prev_row, rolled)
        delta = v - prev
        carry[:] = v[tile - 1:tile, :]
        # bitpack in-kernel via the MXU routing matmuls (_pack_row) — the
        # round-2 kernel pack was a masked-OR select chain that miscompiled
        # past 8 sublanes AND the XLA fallback loop ran at < 8 GB/s
        o_ref[:] = _pack_row(_zigzag_enc(delta), bits)

    packed = pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile, 4 * bits), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 4 * bits), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_mode(),
    )(values.reshape(rows, 128).astype(jnp.int32))
    return packed.reshape(rows * 4, bits)[:g]


def dx_required_bits(values) -> int:
    """Smallest bit width for dx_compress of these values.

    Raises when the zigzagged deltas need more than 32 bits (possible for
    int32 inputs with extreme jumps — zigzag of an int32 delta can need 33
    bits): such buffers are outside the dx codec's static 32-bit packing
    and must go through the host cascaded codec instead."""
    v = np.asarray(values, np.int64)
    d = np.diff(v, prepend=0)
    zz = (d << 1) ^ (d >> 63)
    req = max(int(zz.max()).bit_length(), 1) if len(zz) else 1
    if req > 32:
        raise ValueError(
            f"deltas need {req} bits > the dx codec's 32-bit word packing; "
            "use comp.cascaded_compress for this buffer")
    return req


def dx_decompress_dot(packed, w, *, bits: int, tile: int = 64,
                      scale: float = 1.0):
    """Decompress-then-compute fusion (the nvCOMPDx selling point): decode
    int32 values in-kernel and immediately contract them against a dense
    matrix on the MXU without re-materializing the decoded buffer in HBM.
    packed (G, bits) → values (G·32 = m·k)... here values form an (m, k)
    i8-range matrix with m = rows(w-compatible): returns
    (values.reshape(-1, w.shape[0]) · scale) @ w."""
    check(1 <= bits <= 32, "dx codec packs into 32-bit words: bits must be 1..32")
    k = w.shape[0]
    check(k == 128, "fused dot consumes the decoded (rows, 128) layout "
                    "directly: reshape the logical matrix so k == 128")
    g = packed.shape[0]
    check(g % 4 == 0, "need whole 128-value rows")
    n_vals = g * 32
    m = n_vals // k

    def kernel(p_ref, w_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        z = _unpack_row(p_ref[:], bits)
        d = _zigzag_dec(z)
        within = _cumsum_lanes(d)
        rowtot = within[:, 127:128]
        rowoff = _cumsum_rows(rowtot, p_ref.shape[0]) - rowtot
        vals = within + rowoff + carry[0:1, 127:128]
        carry[:] = vals[p_ref.shape[0] - 1:p_ref.shape[0], :]
        a = vals.astype(jnp.float32) * scale    # (rows, 128): k == 128
        o_ref[:] = jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    rows = g // 4
    rstep = max(1, min(tile, rows))
    check(rows % rstep == 0, "rows must tile the blocking")
    pk = packed.reshape(rows, 4 * bits)
    out = pl.pallas_call(
        kernel,
        grid=(rows // rstep,),
        in_specs=[pl.BlockSpec((rstep, 4 * bits), lambda i: (i, 0)),
                  pl.BlockSpec((k, w.shape[1]), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rstep, w.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, w.shape[1]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_mode(),
    )(pk, w.astype(jnp.float32))
    return out
