"""Real JPEG2000 codestream decoder (≙ nvJPEG2000/nvJPEG2000-Decoder).

Decodes actual .j2k/.jp2 streams produced by openjpeg-family encoders:
SOC/SIZ/COD/QCD parsing, LRCP packet headers (tag trees, bit-stuffed
header reader), EBCOT Tier-1 (MQ arithmetic decoder + significance/
refinement/cleanup passes with full context modeling; native C++ fast
path in native/src/ebcot.cpp), reversible 5/3 AND irreversible 9/7
synthesis per Annex F, RCT/ICT inverse, DC level shift, multi-tile
grids, precinct subdivision, region (ROI window) decode.

Scope: default code-block options (no bypass/reset/termall); HTJ2K
(T.814) is out of scope (normative CxtVLC tables unavailable here).

The serial entropy tier (MQ + context modeling — inherently bit-sequential)
runs on host per SURVEY.md §2.10's split; the synthesis filter bank is
vectorized NumPy here with the device lifting kernels in image/j2k.py
covering the bulk-throughput path.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from tpumathlib.core.errors import NotSupportedError, check

# MQ-coder probability state machine (ISO/IEC 15444-1 Table C.2)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

_N_CTX = 19          # 0-8 ZC, 9-13 SC, 14-16 MR, 17 RLC, 18 UNI
_CTX_UNI = 18
_CTX_RLC = 17


class MQDecoder:
    """MQ arithmetic decoder (Annex C software conventions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        # context states: (index into _QE, mps)
        self.I = [0] * _N_CTX
        self.mps = [0] * _N_CTX
        self.I[0] = 4          # ZC context 0
        self.I[_CTX_RLC] = 3
        self.I[_CTX_UNI] = 46

    def _bytein(self):
        d = self.data
        if self.bp < len(d) and d[self.bp] == 0xFF:
            if self.bp + 1 >= len(d) or d[self.bp + 1] > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += d[self.bp] << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += (d[self.bp] if self.bp < len(d) else 0xFF) << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[self.I[cx]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = self.mps[cx]
                self.I[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                self.I[cx] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return self.mps[cx]
            # MPS exchange
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                self.I[cx] = nlps
            else:
                d = self.mps[cx]
                self.I[cx] = nmps
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class _HeaderBits:
    """Packet-header bit reader with 0xFF stuffing (B.10.1)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                self.buf = b & 0x7F
                self.nbits = 7
            else:
                self.buf = b
                self.nbits = 8
            self.prev_ff = b == 0xFF
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        # flush to byte boundary; a pending 0xFF forces one stuffed bit
        self.nbits = 0
        if self.prev_ff:
            self.pos += 1
            self.prev_ff = False


class TagTree:
    def __init__(self, w: int, h: int):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        self.low = [np.zeros((hh, ww), np.int32) for ww, hh in self.dims]
        self.known = [np.zeros((hh, ww), bool) for ww, hh in self.dims]

    def decode(self, x: int, y: int, threshold: int, rd: _HeaderBits) -> bool:
        """True iff leaf value < threshold (decoding bits as needed)."""
        path = []
        for lvl in range(len(self.dims) - 1, -1, -1):
            path.append((lvl, x >> lvl, y >> lvl))
        low = 0
        for lvl, xx, yy in path:
            if self.low[lvl][yy, xx] < low:
                self.low[lvl][yy, xx] = low
            while (self.low[lvl][yy, xx] < threshold
                   and not self.known[lvl][yy, xx]):
                if rd.bit():
                    self.known[lvl][yy, xx] = True
                else:
                    self.low[lvl][yy, xx] += 1
            low = self.low[lvl][yy, xx]
            if not self.known[lvl][yy, xx]:
                return False
        return low < threshold

    def value(self, x: int, y: int) -> int:
        return int(self.low[0][y, x])


# ---------------- Tier-1: EBCOT code-block decoding ----------------

def _native_lib():
    """The C++ runtime, or None if unavailable (missing toolchain only);
    genuine native failures propagate (same contract as image/jpeg.py)."""
    try:
        from tpumathlib import native
        return native.lib()
    except (OSError, AttributeError, ImportError):
        return None


def _zc_context(h, v, d, band):
    if band == 1:          # HL: swap h and v roles
        h, v = v, h
    if band == 3:          # HH
        hv = h + v
        if d >= 3:
            return 8
        if d == 2:
            return 7 if hv >= 1 else 6
        if d == 1:
            return 5 if hv >= 2 else (4 if hv == 1 else 3)
        return 2 if hv >= 2 else (1 if hv == 1 else 0)
    if h == 2:
        return 8
    if h == 1:
        if v >= 1:
            return 7
        return 6 if d >= 1 else 5
    if v == 2:
        return 4
    if v == 1:
        return 3
    return 2 if d >= 2 else (1 if d == 1 else 0)


_SC_TABLE = {(1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
             (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
             (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1)}


def decode_codeblock(data: bytes, w: int, h: int, numbps: int,
                     npasses: int, band: int) -> np.ndarray:
    """EBCOT Tier-1: decode one code-block → int32 coefficients.

    Pass sequence: cleanup at the MSB plane, then (sig-prop, refine,
    cleanup) per lower plane (D.4). Default options: single MQ codeword
    segment, non-causal contexts. Runs in native C++
    (native/src/ebcot.cpp, ~100x) when available; the Python path below
    is the retained byte-exact reference the regression tests pin."""
    lib = _native_lib()
    if lib is not None:
        buf = np.frombuffer(bytes(data), np.uint8) if data \
            else np.zeros(0, np.uint8)
        out = np.zeros((h, w), np.int32)
        rc = lib.ebcot_decode_cb(np.ascontiguousarray(buf), len(buf),
                                 w, h, numbps, npasses, band, out)
        check(rc == 0, f"ebcot_decode_cb rc={rc}")
        return out
    return _decode_codeblock_py(data, w, h, numbps, npasses, band)


def _decode_codeblock_py(data: bytes, w: int, h: int, numbps: int,
                         npasses: int, band: int) -> np.ndarray:
    mq = MQDecoder(data)
    sig = np.zeros((h + 2, w + 2), bool)      # 1-padded borders
    sgn = np.zeros((h + 2, w + 2), np.int8)
    visited = np.zeros((h + 2, w + 2), bool)
    refined = np.zeros((h + 2, w + 2), bool)
    mag = np.zeros((h, w), np.int64)

    def neigh_counts(y, x):                   # padded coords
        hh = int(sig[y, x - 1]) + int(sig[y, x + 1])
        vv = int(sig[y - 1, x]) + int(sig[y + 1, x])
        dd = (int(sig[y - 1, x - 1]) + int(sig[y - 1, x + 1])
              + int(sig[y + 1, x - 1]) + int(sig[y + 1, x + 1]))
        return hh, vv, dd

    def decode_sign(y, x):
        hc = int(sig[y, x - 1]) * (1 - 2 * int(sgn[y, x - 1])) \
            + int(sig[y, x + 1]) * (1 - 2 * int(sgn[y, x + 1]))
        vc = int(sig[y - 1, x]) * (1 - 2 * int(sgn[y - 1, x])) \
            + int(sig[y + 1, x]) * (1 - 2 * int(sgn[y + 1, x]))
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        cx, xorbit = _SC_TABLE[(hc, vc)]
        return mq.decode(cx) ^ xorbit         # 1 = negative

    def spp(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    yy, xx = y + 1, x + 1
                    if sig[yy, xx]:
                        continue
                    hh, vv, dd = neigh_counts(yy, xx)
                    if hh + vv + dd == 0:
                        continue
                    visited[yy, xx] = True
                    if mq.decode(_zc_context(hh, vv, dd, band)):
                        sig[yy, xx] = True
                        sgn[yy, xx] = decode_sign(yy, xx)
                        mag[y, x] |= np.int64(1) << p

    def mrp(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    yy, xx = y + 1, x + 1
                    if not sig[yy, xx] or visited[yy, xx]:
                        continue
                    if refined[yy, xx]:
                        cx = 16
                    else:
                        hh, vv, dd = neigh_counts(yy, xx)
                        cx = 15 if hh + vv + dd else 14
                    if mq.decode(cx):
                        mag[y, x] |= np.int64(1) << p
                    refined[yy, xx] = True
                    visited[yy, xx] = True

    def cup(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                # run-length mode: full 4-row column, nothing visited,
                # no significant neighbors anywhere in the column
                if (y0 + 4 <= h
                        and not visited[y0 + 1:y0 + 5, x + 1].any()
                        and not sig[y0 + 1:y0 + 5, x + 1].any()
                        and not sig[y0:y0 + 6, x:x + 3].any()):
                    if not mq.decode(_CTX_RLC):
                        continue
                    r = (mq.decode(_CTX_UNI) << 1) | mq.decode(_CTX_UNI)
                    y = y0 + r
                    yy, xx = y + 1, x + 1
                    sig[yy, xx] = True
                    sgn[yy, xx] = decode_sign(yy, xx)
                    mag[y, x] |= np.int64(1) << p
                    y += 1
                for y in range(y, min(y0 + 4, h)):
                    yy, xx = y + 1, x + 1
                    if visited[yy, xx] or sig[yy, xx]:
                        continue
                    hh, vv, dd = neigh_counts(yy, xx)
                    if mq.decode(_zc_context(hh, vv, dd, band)):
                        sig[yy, xx] = True
                        sgn[yy, xx] = decode_sign(yy, xx)
                        mag[y, x] |= np.int64(1) << p
        visited[:] = False

    p = numbps - 1
    done = 0
    if done < npasses and p >= 0:
        cup(p)
        done += 1
        p -= 1
    while done < npasses and p >= 0:
        spp(p)
        done += 1
        if done < npasses:
            mrp(p)
            done += 1
        if done < npasses:
            cup(p)
            done += 1
        p -= 1
    out = mag.astype(np.int64)
    s = 1 - 2 * sgn[1:h + 1, 1:w + 1].astype(np.int64)
    return (out * s).astype(np.int32)


# ---------------- Annex F: reversible 5/3 synthesis ----------------

def _sr1d(a: np.ndarray) -> np.ndarray:
    """1D inverse 5/3 along the last axis of an interleaved signal
    (even = lowpass, odd = highpass), origin 0."""
    n = a.shape[-1]
    if n == 1:
        return a.copy()
    out = a.astype(np.int64).copy()
    s = out[..., 0::2]
    d = out[..., 1::2]
    ns, nd = s.shape[-1], d.shape[-1]
    # x[2k] = s[k] - floor((d[k-1] + d[k] + 2) / 4) for k = 0..ns-1 with
    # whole-sample symmetric extension: d[-1] := d[0]; for odd n the
    # trailing d[ns-1] := d[nd-1]
    dl = np.concatenate([d[..., :1], d[..., :ns - 1]], axis=-1)
    dr = d if nd == ns else np.concatenate([d, d[..., -1:]], axis=-1)
    even = s - ((dl + dr + 2) >> 2)
    # x[2k+1] = d[k] + floor((x[2k] + x[2k+2]) / 2) for k = 0..nd-1; for
    # even n the trailing even[ns] := even[ns-1]
    er = np.concatenate([even[..., 1:], even[..., -1:]], axis=-1) \
        if nd == ns else even[..., 1:]
    odd = d + ((even[..., :nd] + er[..., :nd]) >> 1)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _sr2d(ll, hl, lh, hh):
    """One 2D synthesis level: interleave, then HORIZONTAL inverse followed
    by VERTICAL (the forward runs vertical-then-horizontal — validated
    bit-exactly against openjpeg; the opposite order leaves ±2 errors on
    mixed-frequency content through the floor nonlinearities)."""
    h0, w0 = ll.shape
    a = np.zeros((h0 + lh.shape[0], w0 + hl.shape[1]), np.int64)
    a[0::2, 0::2] = ll
    a[0::2, 1::2] = hl
    a[1::2, 0::2] = lh
    a[1::2, 1::2] = hh
    a = _sr1d(a)              # horizontal pass
    a = _sr1d(a.T).T          # vertical pass
    return a


# ---------------- Annex F: irreversible 9/7 synthesis ----------------

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _sr1d_97(a: np.ndarray) -> np.ndarray:
    """1D inverse CDF 9/7 along the last axis of an interleaved signal
    (even = lowpass, odd = highpass), whole-sample symmetric extension.
    Vectorized float64 lifting — the exact reverse of the Annex F
    analysis chain (descale, −δ, −γ, −β, −α)."""
    n = a.shape[-1]
    if n == 1:
        return a.copy()
    # scaling pinned against openjpeg: the analysis lowpass carries DC
    # gain 1 (s was divided by K in the forward), so synthesis multiplies
    # s by K and divides d by K
    s = a[..., 0::2] * _K97
    d = a[..., 1::2] / _K97
    ns, nd = s.shape[-1], d.shape[-1]

    def d_at_s(x):                      # (d[k-1] + d[k]) aligned to s_k
        dl = np.concatenate([x[..., :1], x[..., :ns - 1]], axis=-1)
        dr = x if nd == ns else np.concatenate([x, x[..., -1:]], axis=-1)
        return dl, dr[..., :ns]

    def s_at_d(x):                      # (s[k] + s[k+1]) aligned to d_k
        sr = np.concatenate([x[..., 1:], x[..., -1:]], axis=-1) \
            if nd == ns else x[..., 1:]
        return x[..., :nd], sr[..., :nd]

    dl, dr = d_at_s(d)
    s = s - _D97 * (dl + dr)
    sl, sr = s_at_d(s)
    d = d - _G97 * (sl + sr)
    dl, dr = d_at_s(d)
    s = s - _B97 * (dl + dr)
    sl, sr = s_at_d(s)
    d = d - _A97 * (sl + sr)
    out = np.empty_like(a, dtype=np.float64)
    out[..., 0::2] = s
    out[..., 1::2] = d
    return out


def _sr2d_97(ll, hl, lh, hh):
    """One 2D 9/7 synthesis level (horizontal inverse then vertical, the
    order pinned against openjpeg exactly as for the 5/3 path)."""
    h0, w0 = ll.shape
    a = np.zeros((h0 + lh.shape[0], w0 + hl.shape[1]), np.float64)
    a[0::2, 0::2] = ll
    a[0::2, 1::2] = hl
    a[1::2, 0::2] = lh
    a[1::2, 1::2] = hh
    a = _sr1d_97(a)
    a = _sr1d_97(a.T).T
    return a


# ---------------- codestream parsing ----------------

def _unwrap_jp2(blob: bytes) -> bytes:
    """Extract the contiguous codestream from a .jp2 box container."""
    if blob[:4] == b"\xff\x4f\xff\x51":
        return blob
    pos = 0
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack_from(">I", blob, pos)
        typ = blob[pos + 4:pos + 8]
        if typ == b"jp2c":
            end = len(blob) if ln in (0, 1) else pos + ln
            return blob[pos + 8:end]
        pos += max(ln, 8)
    raise NotSupportedError("no JPEG2000 codestream found")


def j2k_decode_codestream(blob: bytes,
                          region: tuple | None = None,
                          max_layers: int | None = None) -> np.ndarray:
    """Decode a real .j2k/.jp2 stream (reversible 5/3 or irreversible
    9/7; single- or multi-tile). Returns uint8 (H, W) or (H, W, C).
    ``region`` = (y0, x0, h, w): only tiles intersecting the region are
    entropy-decoded (the partial-decode contract), and the region is
    returned. ``max_layers`` decodes only the first quality layers of a
    layered stream (≙ nvjpeg2kDecodeParams num_layers — progressive
    quality truncation).

    ≙ nvJPEG2000/nvJPEG2000-Decoder/nvjpeg2000DecodeSample.cpp and
    nvJPEG2000-Decoder-Tile-Partial."""
    blob = _unwrap_jp2(bytes(blob))
    check(blob[:2] == b"\xff\x4f", "not a JPEG2000 codestream (no SOC)")
    pos = 2
    siz = cod = qcd = None
    tile_parts = {}
    while pos < len(blob):
        marker = struct.unpack_from(">H", blob, pos)[0]
        pos += 2
        if marker == 0xFFD9:  # EOC
            break
        (ln,) = struct.unpack_from(">H", blob, pos)
        seg = blob[pos + 2:pos + ln]
        if marker == 0xFF51:
            siz = seg
        elif marker == 0xFF52:
            cod = seg
        elif marker == 0xFF5C:
            qcd = seg
        elif marker == 0xFF90:  # SOT
            isot = struct.unpack_from(">H", seg, 0)[0]
            psot = struct.unpack_from(">I", seg, 2)[0]
            tstart = pos - 2
            psot = psot or (len(blob) - tstart)
            # find SOD inside this tile-part
            q = pos + ln
            while struct.unpack_from(">H", blob, q)[0] != 0xFF93:
                (l2,) = struct.unpack_from(">H", blob, q + 2)
                q += 2 + l2
            tile_parts.setdefault(isot, []).append(
                blob[q + 2:tstart + psot])
            pos = tstart + psot
            continue
        pos += ln
    check(siz is not None and cod is not None and qcd is not None,
          "missing SIZ/COD/QCD")
    check(len(tile_parts) >= 1, "no tile data")

    # SIZ
    (_rsiz, xsiz, ysiz, x0, y0, xt, yt, xt0, yt0, ncomp) = struct.unpack_from(
        ">HIIIIIIIIH", siz, 0)
    check(x0 == 0 and y0 == 0 and xt0 == 0 and yt0 == 0,
          "zero-offset streams only")
    comps = []
    for c in range(ncomp):
        ssiz, xr, yr = struct.unpack_from(">BBB", siz, 36 + 3 * c)
        check(xr == 1 and yr == 1, "component subsampling unsupported")
        comps.append({"depth": (ssiz & 0x7F) + 1, "signed": ssiz >> 7})

    # COD
    scod = cod[0]
    prog, nlayers, mct = cod[1], struct.unpack_from(">H", cod, 2)[0], cod[4]
    nl = cod[5]
    xcb = (cod[6] & 0xF) + 2
    ycb = (cod[7] & 0xF) + 2
    cbsty = cod[8]
    wavelet = cod[9]
    # precinct sizes per resolution (scod&1); without the flag the spec's
    # default is one 2^15-sized precinct — the same code path either way
    if scod & 0x01:
        prec = [(cod[10 + r] & 0xF, cod[10 + r] >> 4)
                for r in range(nl + 1)]
    else:
        prec = [(15, 15)] * (nl + 1)
    check(wavelet in (0, 1), "unknown wavelet kind", err=NotSupportedError)
    reversible = wavelet == 1
    check(cbsty == 0, "code-block style flags (bypass/termall/...) "
                      "unsupported", err=NotSupportedError)
    check(prog == 0, "only LRCP progression is supported",
          err=NotSupportedError)

    # QCD: style 0 = no quantization (one SPqcd byte/band, reversible);
    # style 1 = scalar derived / 2 = scalar expounded (16-bit exponent +
    # 11-bit mantissa per band, irreversible)
    sqcd = qcd[0]
    qstyle = sqcd & 0x1F
    guard = sqcd >> 5
    if reversible:
        check(qstyle == 0, "QCD: expected no-quantization (reversible)")
        exps = [b >> 3 for b in qcd[1:]]
        mants = [0] * len(exps)
    else:
        check(qstyle in (1, 2), "QCD: expected scalar quantization "
                                "(irreversible)")
        vals = struct.unpack(f">{(len(qcd) - 1) // 2}H", qcd[1:])
        exps = [v >> 11 for v in vals]
        mants = [v & 0x7FF for v in vals]
        if qstyle == 1:
            # scalar derived: band values follow from the LL entry
            e0, m0 = exps[0], mants[0]
            exps, mants = [e0], [m0]

    def ll_dim(n, lev):
        return -(-n // (1 << lev))

    def _decode_tile(data, w_full, h_full):

        # band list per resolution: r=0 → [(band=0 LL, lev=nl)];
        # r>=1 → HL,LH,HH at lev = nl - r + 1
        def bands_for_res(r):
            if r == 0:
                return [(0, nl)]
            lev = nl - r + 1
            return [(1, lev), (2, lev), (3, lev)]

        def band_dims(band, lev):
            if band == 0:
                return ll_dim(w_full, lev), ll_dim(h_full, lev)
            wl = ll_dim(w_full, lev - 1)
            hl_ = ll_dim(h_full, lev - 1)
            wlo = ll_dim(w_full, lev)
            hlo = ll_dim(h_full, lev)
            if band == 1:   # HL: high horizontally
                return wl - wlo, hlo
            if band == 2:   # LH
                return wlo, hl_ - hlo
            return wl - wlo, hl_ - hlo

        # band index in the QCD exponent list
        def qcd_index(r, band):
            return 0 if r == 0 else 1 + 3 * (r - 1) + (band - 1)

        def quant_params(r, band, lev):
            """(ε_b, μ_b) — scalar-derived bands follow the LL entry with the
            exponent dropping one per resolution (Annex E.1.1)."""
            if reversible or qstyle == 2:
                i = qcd_index(r, band)
                return exps[i], mants[i]
            return exps[0] - (nl - lev), mants[0]

        # per-component band coefficient arrays
        coeffs = [{} for _ in range(ncomp)]
        # per-resolution geometry: effective code-block sizes are clamped by
        # the precinct (Annex B.7), precinct counts come from the RESOLUTION
        # grid, band-space precincts are half-size for r >= 1
        res_geom = []
        for r in range(nl + 1):
            ppx, ppy = prec[r]
            xcb_r = min(xcb, ppx - (1 if r else 0))
            ycb_r = min(ycb, ppy - (1 if r else 0))
            res_w = ll_dim(w_full, nl - r)
            res_h = ll_dim(h_full, nl - r)
            npw = -(-res_w // (1 << ppx)) if res_w else 0
            nph = -(-res_h // (1 << ppy)) if res_h else 0
            pbw = 1 << (ppx - (1 if r else 0))   # precinct size in band coords
            pbh = 1 << (ppy - (1 if r else 0))
            res_geom.append((xcb_r, ycb_r, npw, nph, pbw, pbh))
        # tag trees are PER (comp, res, band, precinct); Lblock + seen are
        # per code-block (global band grid)
        state = {}
        for c in range(ncomp):
            for r in range(nl + 1):
                xcb_r, ycb_r, npw, nph, pbw, pbh = res_geom[r]
                for band, lev in bands_for_res(r):
                    bw, bh = band_dims(band, lev)
                    ncx = -(-bw // (1 << xcb_r)) if bw else 0
                    ncy = -(-bh // (1 << ycb_r)) if bh else 0
                    state[(c, r, band)] = {
                        "trees": {},        # precinct -> (incl, zbp) TagTrees
                        "lblk": np.full((max(ncy, 1), max(ncx, 1)), 3, np.int32),
                        "ncx": ncx, "ncy": ncy, "bw": bw, "bh": bh,
                        "seen": set(),
                    }
                    coeffs[c][(r, band)] = np.zeros((bh, bw), np.int32)

        def precinct_cbs(st, r, px, py):
            """Code-block index window [cx0, cx1) x [cy0, cy1) of precinct
            (px, py) in this band, and the per-precinct tag trees."""
            xcb_r, ycb_r, npw, nph, pbw, pbh = res_geom[r]
            cpp_x = pbw >> xcb_r              # cb columns per precinct
            cpp_y = pbh >> ycb_r
            cx0 = px * cpp_x
            cy0 = py * cpp_y
            cx1 = min(cx0 + cpp_x, st["ncx"])
            cy1 = min(cy0 + cpp_y, st["ncy"])
            key = (px, py)
            if key not in st["trees"]:
                st["trees"][key] = (
                    TagTree(max(cx1 - cx0, 1), max(cy1 - cy0, 1)),
                    TagTree(max(cx1 - cx0, 1), max(cy1 - cy0, 1)))
            return cx0, cy0, cx1, cy1, st["trees"][key]

        pos = 0
        for layer in range(nlayers if max_layers is None
                           else min(nlayers, max_layers)):
            for r in range(nl + 1):
                xcb_r, ycb_r, npw, nph, pbw, pbh = res_geom[r]
                for c in range(ncomp):
                    for py in range(nph):
                        for px in range(npw):
                            rd = _HeaderBits(data, pos)
                            if not rd.bit():          # zero-length packet
                                rd.align()
                                pos = rd.pos
                                continue
                            blocks = []
                            for band, lev in bands_for_res(r):
                                st = state[(c, r, band)]
                                cx0, cy0, cx1, cy1, (incl_t, zbp_t) = \
                                    precinct_cbs(st, r, px, py)
                                for cy in range(cy0, cy1):
                                    for cx in range(cx0, cx1):
                                        if (cx, cy) in st["seen"]:
                                            # previously included: spec
                                            # B.10.4 — a SINGLE bit per
                                            # later layer, not the tree
                                            incl = bool(rd.bit())
                                        else:
                                            incl = incl_t.decode(
                                                cx - cx0, cy - cy0,
                                                layer + 1, rd)
                                        if not incl:
                                            continue
                                        first = (cx, cy) not in st["seen"]
                                        st["seen"].add((cx, cy))
                                        if first:
                                            t = 1
                                            while not zbp_t.decode(
                                                    cx - cx0, cy - cy0, t, rd):
                                                t += 1
                                        zbp = zbp_t.value(cx - cx0, cy - cy0)
                                        # number of passes
                                        if not rd.bit():
                                            np_ = 1
                                        elif not rd.bit():
                                            np_ = 2
                                        else:
                                            v = rd.bits(2)
                                            if v < 3:
                                                np_ = 3 + v
                                            else:
                                                v = rd.bits(5)
                                                if v < 31:
                                                    np_ = 6 + v
                                                else:
                                                    np_ = 37 + rd.bits(7)
                                        while rd.bit():
                                            st["lblk"][cy, cx] += 1
                                        nbits = int(st["lblk"][cy, cx]) \
                                            + int(math.floor(math.log2(np_)))
                                        ln_ = rd.bits(nbits)
                                        blocks.append((c, r, band, lev, cx, cy,
                                                       zbp, np_, ln_))
                            rd.align()
                            pos = rd.pos
                            for (cc, rr, band, lev, cx, cy, zbp, np_,
                                 ln_) in blocks:
                                # a code-block may contribute byte CHUNKS
                                # in several layers — one MQ stream split
                                # at pass boundaries; accumulate and
                                # decode once after all packets
                                st = state[(cc, rr, band)]
                                acc = st.setdefault("acc", {})
                                ent = acc.setdefault(
                                    (cx, cy), [b"", 0, zbp, lev])
                                ent[0] = ent[0] + data[pos:pos + ln_]
                                ent[1] += np_
                                pos += ln_

        for (cc, rr, band), st in state.items():
            xcb_r, ycb_r = res_geom[rr][0], res_geom[rr][1]
            for (cx, cy), (buf, np_, zbp, lev) in st.get("acc", {}).items():
                x0b = cx << xcb_r
                y0b = cy << ycb_r
                bw = min(1 << xcb_r, st["bw"] - x0b)
                bh = min(1 << ycb_r, st["bh"] - y0b)
                eps_b, _ = quant_params(rr, band, lev)
                mb = guard + eps_b - 1
                numbps = mb - zbp
                blk = decode_codeblock(buf, bw, bh, numbps, np_, band)
                coeffs[cc][(rr, band)][y0b:y0b + bh, x0b:x0b + bw] = blk

        # synthesis per component
        _GAIN = {0: 0, 1: 1, 2: 1, 3: 2}

        def dequant(q, r, band, lev, depth):
            """Annex E midpoint reconstruction: v = sign·(|q|+0.5)·Δ_b with
            Δ_b = 2^(R_b−ε_b)·(1+μ_b/2^11), R_b = depth + band gain."""
            eps_b, mu_b = quant_params(r, band, lev)
            delta = 2.0 ** (depth + _GAIN[band] - eps_b) * (1.0 + mu_b / 2048.0)
            mag = np.abs(q).astype(np.float64)
            return np.where(q == 0, 0.0, np.sign(q) * (mag + 0.5) * delta)

        planes = []
        for c in range(ncomp):
            depth = comps[c]["depth"]
            if reversible:
                cur = coeffs[c][(0, 0)].astype(np.int64)
                for r in range(1, nl + 1):
                    cur = _sr2d(cur, coeffs[c][(r, 1)].astype(np.int64),
                                coeffs[c][(r, 2)].astype(np.int64),
                                coeffs[c][(r, 3)].astype(np.int64))
            else:
                cur = dequant(coeffs[c][(0, 0)], 0, 0, nl, depth)
                for r in range(1, nl + 1):
                    lev = nl - r + 1
                    cur = _sr2d_97(cur,
                                   dequant(coeffs[c][(r, 1)], r, 1, lev, depth),
                                   dequant(coeffs[c][(r, 2)], r, 2, lev, depth),
                                   dequant(coeffs[c][(r, 3)], r, 3, lev, depth))
            planes.append(cur)

        if mct and ncomp >= 3:
            if reversible:                      # RCT inverse
                y_, cb, cr = planes[0], planes[1], planes[2]
                g = y_ - ((cb + cr) >> 2)
                r_ = cr + g
                b_ = cb + g
            else:                               # ICT inverse (irreversible)
                y_, cb, cr = planes[0], planes[1], planes[2]
                r_ = y_ + 1.402 * cr
                g = y_ - 0.344136 * cb - 0.714136 * cr
                b_ = y_ + 1.772 * cb
            planes[0], planes[1], planes[2] = r_, g, b_
        return planes

    ntx = -(-xsiz // xt)
    nty = -(-ysiz // yt)
    if ntx * nty > 1:
        # tile grid: band/code-block anchors coincide with per-tile-size
        # geometry only when the tile side is a multiple of 2^nl (and of
        # the code-block size) — the common openjpeg configuration
        # (≙ nvJPEG2000-Decoder-Tile-Partial); reject the exotic rest
        check(xt % (1 << max(nl, xcb)) == 0
              and yt % (1 << max(nl, ycb)) == 0,
              "tile size must be a multiple of 2^levels and the "
              "code-block size", err=NotSupportedError)
    full = [np.zeros((ysiz, xsiz), np.float64 if wavelet == 0
                     else np.int64) for _ in range(ncomp)]
    for ty in range(nty):
        for tx in range(ntx):
            isot = ty * ntx + tx
            tx0, ty0 = tx * xt, ty * yt
            tw = min(xt, xsiz - tx0)
            th = min(yt, ysiz - ty0)
            if region is not None:
                ry, rx, rh, rw = region
                if (ty0 + th <= ry or ty0 >= ry + rh
                        or tx0 + tw <= rx or tx0 >= rx + rw):
                    continue        # partial decode: skip unneeded tiles
            parts = tile_parts.get(isot)
            check(parts is not None, f"missing tile {isot}")
            tp = _decode_tile(b"".join(parts), tw, th)
            for c in range(ncomp):
                full[c][ty0:ty0 + th, tx0:tx0 + tw] = tp[c]
    planes = full
    out = []
    for c in range(ncomp):
        depth = comps[c]["depth"]
        v = planes[c] + (0 if comps[c]["signed"] else (1 << (depth - 1)))
        if not reversible:
            v = np.floor(v + 0.5)
        out.append(np.clip(v, 0, (1 << depth) - 1))
    arr = out[0] if ncomp == 1 else np.stack(out, axis=-1)
    arr = arr.astype(np.uint8 if max(x["depth"] for x in comps) <= 8
                     else np.uint16)
    if region is not None:
        ry, rx, rh, rw = region
        arr = arr[ry:ry + rh, rx:rx + rw]
    return arr
