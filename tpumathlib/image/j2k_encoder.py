"""Conformant JPEG2000 ENCODER (reversible 5/3, single tile, one layer).

≙ nvJPEG2000/nvJPEG2000-Encoder/nvj2k_encode.cpp:1 — emits real .j2k
codestreams that openjpeg (and this suite's own decoder,
image/j2k_codestream.py) decode bit-exactly: SIZ/COD/QCD markers, RCT,
forward 5/3 DWT (exact lifting mirror of the Annex-F synthesis), full
EBCOT Tier-1 encoding (ZC/SC/MR/RLC contexts, MQ arithmetic encoder per
Annex C), tag-tree packet headers in LRCP order.

Shares the context tables and geometry helpers with the decoder module —
the encoder is its exact mirror, which is also how it is tested
(roundtrip through BOTH decoders).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from tpumathlib.image.j2k_codestream import (
    _CTX_RLC,
    _CTX_UNI,
    _N_CTX,
    _QE,
    _SC_TABLE,
    _zc_context,
)


# ---------------- MQ arithmetic encoder (Annex C) ----------------

class MQEncoder:
    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = -1                 # byte buffer (-1 = none yet)
        self.out = bytearray()
        self.I = [0] * _N_CTX
        self.mps = [0] * _N_CTX
        self.I[0] = 4
        self.I[_CTX_RLC] = 3
        self.I[_CTX_UNI] = 46

    def _byteout(self):
        # NB: after an 0xFF the next byte slot carries 7 data bits PLUS
        # room for a pending carry — C >> 20 must NOT be masked to 7 bits
        # (that drops the carry; Annex C.3.3 BYTEOUT)
        if self.b == 0xFF:
            self.out.append(self.b)
            self.b = self.c >> 20
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            if self.b >= 0:
                self.out.append(self.b)
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.b += 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append(self.b)
                self.b = self.c >> 20
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                if self.b >= 0:
                    self.out.append(self.b)
                self.b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFF0 | (self.c << 1) & 0xF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: int, d: int):
        qe, nmps, nlps, switch = _QE[self.I[cx]]
        if d == self.mps[cx]:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.I[cx] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] ^= 1
            self.I[cx] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS + two byteouts (Annex C.3.4), then drop a trailing 0xFF
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.b != 0xFF and self.b >= 0:
            self.out.append(self.b)
        while self.out and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)


# ---------------- Tier-1: EBCOT code-block encoding ----------------

def encode_codeblock(coefs: np.ndarray, band: int):
    """Encode one int32 code-block losslessly.

    Returns (data, numbps, npasses, pass_lengths) — the exact mirror of
    decode_codeblock's pass sequence (cleanup at the MSB plane, then
    SPP/MRP/CUP per lower plane); pass_lengths[p] is a safe truncation
    byte count through pass p (the quality-layer split points).
    Runs in native C++ (native/src/ebcot.cpp) when available; the
    Python path below is the retained byte-exact reference."""
    from tpumathlib.image.j2k_codestream import _native_lib
    lib = _native_lib()
    if lib is not None:
        import ctypes
        h, w = coefs.shape
        arr = np.ascontiguousarray(coefs, np.int32)
        numbps0 = int(np.abs(arr.astype(np.int64)).max()).bit_length()
        maxp = max(1 + 3 * max(numbps0 - 1, 0), 1)
        # MQ output ≤ ~2 bytes per decision; ≤ 2·h·w decisions per pass
        cap = 4 * maxp * h * w + 1024
        out = getattr(_enc_tls, "buf", None)
        if out is None or out.size < cap:
            out = _enc_tls.buf = np.empty(cap, np.uint8)
        plens = np.empty(maxp, np.int64)
        nb = ctypes.c_int()
        npas = ctypes.c_int()
        n = lib.ebcot_encode_cb(arr, w, h, band, out, out.size,
                                ctypes.byref(nb), ctypes.byref(npas),
                                plens, maxp)
        assert n >= 0, "ebcot_encode_cb buffer overflow"
        return (out[:n].tobytes(), nb.value, npas.value,
                [int(x) for x in plens[:npas.value]])
    return _encode_codeblock_py(coefs, band)


import threading as _threading

_enc_tls = _threading.local()


def _encode_codeblock_py(coefs: np.ndarray, band: int):
    h, w = coefs.shape
    mag_all = np.abs(coefs.astype(np.int64))
    numbps = int(mag_all.max()).bit_length()
    if numbps == 0:
        return b"", 0, 0, []
    mq = MQEncoder()
    sig = np.zeros((h + 2, w + 2), bool)
    sgn = np.zeros((h + 2, w + 2), np.int8)
    visited = np.zeros((h + 2, w + 2), bool)
    refined = np.zeros((h + 2, w + 2), bool)
    neg = coefs < 0

    def neigh_counts(y, x):
        hh = int(sig[y, x - 1]) + int(sig[y, x + 1])
        vv = int(sig[y - 1, x]) + int(sig[y + 1, x])
        dd = (int(sig[y - 1, x - 1]) + int(sig[y - 1, x + 1])
              + int(sig[y + 1, x - 1]) + int(sig[y + 1, x + 1]))
        return hh, vv, dd

    def encode_sign(y, x):
        hc = int(sig[y, x - 1]) * (1 - 2 * int(sgn[y, x - 1])) \
            + int(sig[y, x + 1]) * (1 - 2 * int(sgn[y, x + 1]))
        vc = int(sig[y - 1, x]) * (1 - 2 * int(sgn[y - 1, x])) \
            + int(sig[y + 1, x]) * (1 - 2 * int(sgn[y + 1, x]))
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        cx, xorbit = _SC_TABLE[(hc, vc)]
        mq.encode(cx, int(sgn[y, x]) ^ xorbit)

    def become_sig(y, x, yy, xx):
        sig[yy, xx] = True
        sgn[yy, xx] = 1 if neg[y, x] else 0
        encode_sign(yy, xx)

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
                    bit = int((mag_all[y, x] >> p) & 1)
                    mq.encode(_zc_context(hh, vv, dd, band), bit)
                    if bit:
                        sig[yy, xx] = True
                        sgn[yy, xx] = 1 if neg[y, x] else 0
                        encode_sign(yy, xx)

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
                    mq.encode(cx, int((mag_all[y, x] >> p) & 1))
                    refined[yy, xx] = True
                    visited[yy, xx] = True

    def cup(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                if (y0 + 4 <= h
                        and not visited[y0 + 1:y0 + 5, x + 1].any()
                        and not sig[y0 + 1:y0 + 5, x + 1].any()
                        and not sig[y0:y0 + 6, x:x + 3].any()):
                    bits4 = [(int(mag_all[y0 + i, x]) >> p) & 1
                             for i in range(4)]
                    if not any(bits4):
                        mq.encode(_CTX_RLC, 0)
                        continue
                    mq.encode(_CTX_RLC, 1)
                    r = bits4.index(1)
                    mq.encode(_CTX_UNI, (r >> 1) & 1)
                    mq.encode(_CTX_UNI, r & 1)
                    y = y0 + r
                    yy, xx = y + 1, x + 1
                    sig[yy, xx] = True
                    sgn[yy, xx] = 1 if neg[y, x] else 0
                    encode_sign(yy, xx)
                    y += 1
                for y in range(y, min(y0 + 4, h)):
                    yy, xx = y + 1, x + 1
                    if visited[yy, xx] or sig[yy, xx]:
                        continue
                    hh, vv, dd = neigh_counts(yy, xx)
                    bit = int((mag_all[y, x] >> p) & 1)
                    mq.encode(_zc_context(hh, vv, dd, band), bit)
                    if bit:
                        sig[yy, xx] = True
                        sgn[yy, xx] = 1 if neg[y, x] else 0
                        encode_sign(yy, xx)
        visited[:] = False

    p = numbps - 1
    # per-pass truncation lengths (for quality layers): bytes emitted so
    # far + 4 covers the MQ registers' unflushed state (conservative —
    # overshoot only moves bytes into an earlier layer), clamped to the
    # final flushed length
    plens = []

    def mark():
        plens.append(len(mq.out) + 4)

    cup(p)
    mark()
    npasses = 1
    for p in range(numbps - 2, -1, -1):
        spp(p)
        mark()
        mrp(p)
        mark()
        cup(p)
        mark()
        npasses += 3
    data = mq.flush()
    plens = [min(x, len(data)) for x in plens]
    plens[-1] = len(data)
    return data, numbps, npasses, plens


# ---------------- Tier-2: header bit writer + tag trees ----------------

class _HeaderBitsWriter:
    """Packet-header bit writer with 0xFF stuffing (B.10.1 mirror)."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0
        self.prev_ff = False

    def _cap(self):
        return 7 if self.prev_ff else 8

    def bit(self, b: int):
        self.buf = (self.buf << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == self._cap():
            self.out.append(self.buf)
            self.prev_ff = self.buf == 0xFF
            self.buf = 0
            self.nbits = 0

    def bits(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self):
        while self.nbits:
            self.bit(0)
        if self.prev_ff:
            self.out.append(0)
            self.prev_ff = False

    def data(self) -> bytes:
        return bytes(self.out)


class TagTreeEncoder:
    def __init__(self, w: int, h: int, leaves: np.ndarray):
        self.dims = []
        ww, hh = w, h
        while True:
            self.dims.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww = (ww + 1) // 2
            hh = (hh + 1) // 2
        self.vals = []
        cur = np.asarray(leaves, np.int32).reshape(h, w)
        for ww, hh in self.dims:
            self.vals.append(cur)
            ph = (-cur.shape[0]) % 2
            pw = (-cur.shape[1]) % 2
            big = np.pad(cur, ((0, ph), (0, pw)), constant_values=2**30)
            cur = np.minimum.reduce([big[0::2, 0::2], big[0::2, 1::2],
                                     big[1::2, 0::2], big[1::2, 1::2]])
        self.low = [np.zeros((hh, ww), np.int32) for ww, hh in self.dims]
        self.known = [np.zeros((hh, ww), bool) for ww, hh in self.dims]

    def encode(self, x: int, y: int, threshold: int, wr: _HeaderBitsWriter):
        """Emit bits so the decoder's decode(x, y, threshold) resolves."""
        path = []
        for lvl in range(len(self.dims) - 1, -1, -1):
            path.append((lvl, x >> lvl, y >> lvl))
        low = 0
        for lvl, xx, yy in path:
            if self.low[lvl][yy, xx] < low:
                self.low[lvl][yy, xx] = low
            val = int(self.vals[lvl][yy, xx])
            while (self.low[lvl][yy, xx] < threshold
                   and not self.known[lvl][yy, xx]):
                if self.low[lvl][yy, xx] < val:
                    wr.bit(0)
                    self.low[lvl][yy, xx] += 1
                else:
                    wr.bit(1)
                    self.known[lvl][yy, xx] = True
            low = self.low[lvl][yy, xx]
            if not self.known[lvl][yy, xx]:
                return


def _write_npasses(wr: _HeaderBitsWriter, np_: int):
    if np_ == 1:
        wr.bit(0)
    elif np_ == 2:
        wr.bits(0b10, 2)
    elif np_ <= 5:
        wr.bits(0b11, 2)
        wr.bits(np_ - 3, 2)
    elif np_ <= 36:
        wr.bits(0b1111, 4)
        wr.bits(np_ - 6, 5)
    else:
        wr.bits(0b1111, 4)
        wr.bits(31, 5)
        wr.bits(np_ - 37, 7)


# ---------------- forward 5/3 DWT (mirror of the synthesis) ----------

def _sd1d(x: np.ndarray) -> np.ndarray:
    """1D forward 5/3 along the last axis → interleaved (even=s, odd=d);
    exact inverse of the decoder's _sr1d (same boundary conventions)."""
    n = x.shape[-1]
    if n == 1:
        return x.copy()
    x = x.astype(np.int64)
    e = x[..., 0::2]
    o = x[..., 1::2]
    ns, nd = e.shape[-1], o.shape[-1]
    er = np.concatenate([e[..., 1:], e[..., -1:]], axis=-1) \
        if nd == ns else e[..., 1:]
    d = o - ((e[..., :nd] + er[..., :nd]) >> 1)
    dl = np.concatenate([d[..., :1], d[..., :ns - 1]], axis=-1)
    dr = d if nd == ns else np.concatenate([d, d[..., -1:]], axis=-1)
    s = e + ((dl + dr[..., :ns] + 2) >> 2)
    out = np.empty_like(x)
    out[..., 0::2] = s
    out[..., 1::2] = d
    return out


def _sd2d(a: np.ndarray):
    """One 2D analysis level → (ll, hl, lh, hh); the synthesis runs
    horizontal-then-vertical, so analysis is vertical-then-horizontal."""
    a = _sd1d(a.T).T          # vertical
    a = _sd1d(a)              # horizontal
    return a[0::2, 0::2], a[0::2, 1::2], a[1::2, 0::2], a[1::2, 1::2]


# ---------------- codestream assembly ----------------

def j2k_encode_codestream(image: np.ndarray, levels: int = 5,
                          cb: int = 64, layers: int = 1,
                          rates=None) -> bytes:
    """Encode uint8 gray (H, W) or RGB (H, W, 3) into a lossless .j2k
    codestream (reversible 5/3, RCT for RGB, single tile, LRCP).
    Decodes bit-exactly in openjpeg and in j2k_decode_codestream.

    ``layers`` > 1 emits QUALITY LAYERS (≙ nvjpeg2kEncodeParamsSetEncodeConfig
    num_layers / nvjpeg2kEncodeParamsSpecifyQuality,
    nvJPEG2000/nvJPEG2000-Encoder/nvjpeg2k_encode.cpp:830): coding passes
    are split at GLOBAL bit-plane thresholds, so each prefix of the
    codestream is a progressively better approximation; the full stream
    stays lossless. ``rates`` optionally gives target compression ratios
    for the first layers (e.g. ``[16, 4]`` with layers=3 → ~16:1, ~4:1,
    lossless) — the rate-control knob: thresholds are chosen from the
    measured per-pass truncation lengths (PCRD-lite: global quality
    slopes, exact sizes)."""
    img = np.asarray(image)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    nl = max(0, min(levels, int(math.log2(max(min(h, w), 1))) - 1))
    depth = 8
    ncomp = 1 if gray else 3
    mct = 0 if gray else 1
    planes = []
    if gray:
        planes.append(img.astype(np.int64) - 128)
    else:
        r = img[..., 0].astype(np.int64)
        g = img[..., 1].astype(np.int64)
        b = img[..., 2].astype(np.int64)
        y_ = (r + 2 * g + b) >> 2
        cb_ = b - g
        cr = r - g
        planes = [y_ - 128, cb_, cr]

    xcb = int(math.log2(cb))
    # per-component DWT → coeffs[(r, band)]
    allc = []
    for pl in planes:
        cur = pl
        coeffs = {}
        for lev in range(1, nl + 1):
            ll, hl, lh, hh = _sd2d(cur)
            rres = nl - lev + 1
            coeffs[(rres, 1)] = hl
            coeffs[(rres, 2)] = lh
            coeffs[(rres, 3)] = hh
            cur = ll
        coeffs[(0, 0)] = cur
        allc.append(coeffs)

    # QCD exponents: ε_b = depth + gain (reversible convention), guard 2
    gain = {0: 0, 1: 1, 2: 1, 3: 2}
    guard = 2

    def eps_of(band):
        return depth + gain[band] + (1 if mct else 0)

    def bands_for_res(r):
        return [(0, nl)] if r == 0 else [(1, 0), (2, 0), (3, 0)]

    # encode every code-block
    enc = {}
    for c in range(ncomp):
        for r in range(nl + 1):
            for band, _ in bands_for_res(r):
                arr = allc[c][(r, band)]
                bh, bw = arr.shape
                ncx = -(-bw // cb) if bw else 0
                ncy = -(-bh // cb) if bh else 0
                blocks = {}
                for cy in range(ncy):
                    for cx in range(ncx):
                        blk = arr[cy * cb:(cy + 1) * cb,
                                  cx * cb:(cx + 1) * cb]
                        data, numbps, np_, plens = encode_codeblock(
                            np.asarray(blk, np.int32), band)
                        mb = guard + eps_of(band) - 1
                        zbp = mb - numbps
                        assert zbp >= 0, (numbps, mb)
                        blocks[(cx, cy)] = (data, zbp, np_, plens)
                enc[(c, r, band)] = (ncx, ncy, blocks)

    # ---- layer assignment: global bit-plane thresholds ----
    # pass p of a block codes relative plane 0 (cleanup at the MSB) or
    # (p+2)//3; its GLOBAL depth is zbp + that. Layer l contains passes
    # with depth in (T[l-1], T[l]].
    def depth_of_pass(zbp, p):
        return zbp + (0 if p == 0 else (p + 2) // 3)

    max_depth = 0
    all_blocks = []
    for key, (ncx, ncy, blocks) in enc.items():
        for bkey, (data, zbp, np_, plens) in blocks.items():
            all_blocks.append((data, zbp, np_, plens))
            if np_:
                max_depth = max(max_depth, depth_of_pass(zbp, np_ - 1))
    nlayers = max(1, min(int(layers), max_depth + 1))
    if rates is not None and nlayers > 1:
        # PCRD-lite rate control: cumulative EXACT bytes per threshold
        total_px = h * w * ncomp
        cum = np.zeros(max_depth + 1, np.int64)
        for data, zbp, np_, plens in all_blocks:
            for p in range(np_):
                cum[depth_of_pass(zbp, p)] += (
                    plens[p] - (plens[p - 1] if p else 0))
        cum = np.cumsum(cum)
        thresholds = []
        for ratio in list(rates)[:nlayers - 1]:
            budget = total_px / float(ratio)   # bytes target (8 bpp)
            t_sel = int(np.searchsorted(cum, budget, side="right"))
            thresholds.append(min(max(t_sel, 0), max_depth))
        thresholds = sorted(set(thresholds))
        thresholds.append(max_depth)
        nlayers = len(thresholds)
    else:
        thresholds = [((l + 1) * (max_depth + 1)) // nlayers - 1
                      for l in range(nlayers)]
        thresholds[-1] = max_depth

    def passes_of_layer(zbp, np_, layer):
        lo = thresholds[layer - 1] if layer else -1
        hi = thresholds[layer]
        return [p for p in range(np_)
                if lo < depth_of_pass(zbp, p) <= hi]

    # ---- packets: LRCP over layers, no precincts ----
    body = bytearray()
    states = {}          # (c, r, band) -> per-band tag trees + lblk/seen
    for key, (ncx, ncy, blocks) in enc.items():
        first_layer = np.zeros((max(ncy, 1), max(ncx, 1)), np.int32)
        for (cx, cy), (data, zbp, np_, plens) in blocks.items():
            fl = 0
            for l in range(nlayers):
                if passes_of_layer(zbp, np_, l) or np_ == 0:
                    fl = l
                    break
            first_layer[cy, cx] = fl
        states[key] = {
            "incl": TagTreeEncoder(max(ncx, 1), max(ncy, 1), first_layer),
            "zbpt": TagTreeEncoder(
                max(ncx, 1), max(ncy, 1),
                np.array([[blocks[(x_, y_)][1] if (x_, y_) in blocks else 0
                           for x_ in range(max(ncx, 1))]
                          for y_ in range(max(ncy, 1))], np.int32)),
            "first_layer": first_layer,
            "lblk": np.full((max(ncy, 1), max(ncx, 1)), 3, np.int32),
            "seen": set(),
            "sent": {},   # (cx, cy) -> bytes emitted so far
        }

    for layer in range(nlayers):
        for r in range(nl + 1):
            for c in range(ncomp):
                wr = _HeaderBitsWriter()
                datas = []
                contrib = False
                for band, _ in bands_for_res(r):
                    ncx, ncy, blocks = enc[(c, r, band)]
                    st = states[(c, r, band)]
                    for (cx, cy), (data, zbp, np_, plens) in blocks.items():
                        if st["first_layer"][cy, cx] == layer or (
                                (cx, cy) in st["seen"]
                                and passes_of_layer(zbp, np_, layer)):
                            contrib = True
                wr.bit(1 if contrib else 0)
                if contrib:
                    for band, _ in bands_for_res(r):
                        ncx, ncy, blocks = enc[(c, r, band)]
                        if not blocks:
                            continue
                        st = states[(c, r, band)]
                        incl, zbpt = st["incl"], st["zbpt"]
                        for cy in range(ncy):
                            for cx in range(ncx):
                                data, zbp, np_, plens = blocks[(cx, cy)]
                                ps = passes_of_layer(zbp, np_, layer)
                                prev = (cx, cy) in st["seen"]
                                if prev:
                                    # re-inclusion: a single bit (B.10.4)
                                    wr.bit(1 if ps else 0)
                                    if not ps:
                                        continue
                                else:
                                    incl.encode(cx, cy, layer + 1, wr)
                                    if st["first_layer"][cy, cx] != layer:
                                        continue
                                st["seen"].add((cx, cy))
                                if not prev:
                                    t = 1
                                    while True:
                                        zbpt.encode(cx, cy, t, wr)
                                        if zbpt.known[0][cy, cx]                                                 or t > zbp:
                                            break
                                        t += 1
                                npl = max(len(ps), 1)
                                _write_npasses(wr, npl)
                                sent = st["sent"].get((cx, cy), 0)
                                end = plens[ps[-1]] if ps else 0
                                chunk = data[sent:end]
                                st["sent"][(cx, cy)] = end
                                lblk = int(st["lblk"][cy, cx])
                                nb_needed = max(len(chunk), 1).bit_length()
                                while lblk + int(math.floor(
                                        math.log2(npl))) < nb_needed:
                                    wr.bit(1)
                                    lblk += 1
                                wr.bit(0)
                                st["lblk"][cy, cx] = lblk
                                nbits = lblk + int(math.floor(
                                    math.log2(npl)))
                                wr.bits(len(chunk), nbits)
                                datas.append(chunk)
                wr.align()
                body += wr.data()
                for d in datas:
                    body += d

    # markers
    out = bytearray()
    out += b"\xff\x4f"                                    # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, ncomp)
    for _ in range(ncomp):
        siz += struct.pack(">BBB", depth - 1, 1, 1)
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    cod = bytes([0, 0]) + struct.pack(">H", nlayers) + bytes(
        [mct, nl, xcb - 2, xcb - 2, 0, 1])
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    nbands = 3 * nl + 1
    qcd = bytes([guard << 5])
    qcd += bytes([eps_of(0) << 3])
    for r in range(1, nl + 1):
        for band in (1, 2, 3):
            qcd += bytes([eps_of(band) << 3])
    assert len(qcd) == nbands + 1
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    psot = len(body) + 12 + 2
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + body                             # SOD
    out += b"\xff\xd9"                                    # EOC
    return bytes(out)
