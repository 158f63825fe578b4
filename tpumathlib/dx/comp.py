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
    four consecutive 32-value groups (128 lanes — rolls only operate on
    full physical lane tiles). All indices/shifts are static."""
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
    r = words.shape[0]
    acc = jnp.zeros((r, 128), jnp.uint32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    # masked-select accumulation: 2D single-lane slices only (1D lane
    # extraction + stack mislowers on real Mosaic)
    for g4 in range(4):
        base = g4 * bits
        for j in range(32):
            off = j * bits
            wi, sh = base + off // 32, off % 32
            v = words[:, wi:wi + 1] >> jnp.uint32(sh)
            if sh + bits > 32:
                v = v | (words[:, wi + 1:wi + 2] << jnp.uint32(32 - sh))
            acc = jnp.where(cols == 32 * g4 + j, v & mask, acc)
    return acc


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


@functools.partial(jax.jit, static_argnames=("bits", "tile"))
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
        o_ref[:] = _zigzag_enc(delta)

    zz = pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_mode(),
    )(values.reshape(rows, 128).astype(jnp.int32))
    # bitpack in XLA (device): the Pallas pack network miscompiles on real
    # Mosaic beyond 8 sublanes (masked-OR select chains drop contributions
    # — each stage verified exact in isolation), so the delta/zigzag stage
    # is the in-kernel part and the pack is fused XLA vector ops
    zg = zz.reshape(rows * 4, 32)
    out = jnp.zeros((rows * 4, bits), jnp.uint32)
    for j in range(32):
        off = j * bits
        wi, sh = off // 32, off % 32
        out = out.at[:, wi].set(out[:, wi] | (zg[:, j] << sh))
        if sh + bits > 32:
            out = out.at[:, wi + 1].set(out[:, wi + 1]
                                        | (zg[:, j] >> (32 - sh)))
    return out[:g]


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
