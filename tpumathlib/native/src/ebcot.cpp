// EBCOT Tier-1 entropy engine (MQ coder + context modeling), C++ host side.
//
// Exact mirror of the Python reference paths in
// tpumathlib/image/j2k_codestream.py (decode_codeblock / MQDecoder) and
// tpumathlib/image/j2k_encoder.py (encode_codeblock / MQEncoder) — the
// regression tests pin byte-identical streams and identical coefficients
// against those retained references. This is the serial bit-sequential
// tier of the JPEG2000 pipeline (≙ the entropy stage inside nvJPEG2000,
// /root/reference/nvJPEG2000/nvJPEG2000-Decoder/nvjpeg2000DecodeSample.cpp);
// the wavelet/color stages run on device (image/j2k.py).
//
// Context modeling uses packed per-cell flag words (significance +
// visited/refined + the 8 neighbors' significance and the 4 h/v
// neighbors' signs) with LUTs for the ZC and SC contexts, so each cell
// visit is one load + table lookup instead of eight neighbor loads —
// the state is updated incrementally when a cell becomes significant.
//
// ISO/IEC 15444-1: Annex C (MQ coder), Annex D (coefficient bit modeling).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct QeRow { uint16_t qe; uint8_t nmps, nlps, sw; };

// Table C.2
static const QeRow QE[47] = {
    {0x5601, 1, 1, 1},  {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0}, {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},  {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0},{0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0},{0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0},{0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0},{0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0},{0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0},{0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0},{0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0},{0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0},{0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0},{0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0},{0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0},{0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0},{0x5601, 46, 46, 0},
};

constexpr int N_CTX = 19;   // 0-8 ZC, 9-13 SC, 14-16 MR, 17 RLC, 18 UNI
constexpr int CTX_RLC = 17;
constexpr int CTX_UNI = 18;

// Per-cell flag word layout
constexpr uint32_t F_SIG = 1, F_VIS = 2, F_REF = 4, F_SGN = 8;
// neighbor significance bits (bits 4..11): W E N S NW NE SW SE
constexpr int NB_W = 4, NB_E = 5, NB_N = 6, NB_S = 7,
              NB_NW = 8, NB_NE = 9, NB_SW = 10, NB_SE = 11;
// neighbor sign bits (bits 12..15): set iff that neighbor is
// significant AND negative
constexpr int SB_W = 12, SB_E = 13, SB_N = 14, SB_S = 15;
constexpr uint32_t NEIGH_MASK = 0xFFu << 4;

// Zero-coding context (Table D.1); band: 0 LL, 1 HL, 2 LH, 3 HH.
static int zc_context(int h, int v, int d, int band) {
  if (band == 1) { int t = h; h = v; v = t; }
  if (band == 3) {
    int hv = h + v;
    if (d >= 3) return 8;
    if (d == 2) return hv >= 1 ? 7 : 6;
    if (d == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
    return hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
  }
  if (h == 2) return 8;
  if (h == 1) {
    if (v >= 1) return 7;
    return d >= 1 ? 6 : 5;
  }
  if (v == 2) return 4;
  if (v == 1) return 3;
  return d >= 2 ? 2 : (d == 1 ? 1 : 0);
}

// Sign-coding (Table D.3): by (hc+1)*3 + (vc+1)
static const uint8_t SC_CX[9]  = {13, 12, 11, 10, 9, 10, 11, 12, 13};
static const uint8_t SC_XOR[9] = { 1,  1,  1,  1, 0,  0,  0,  0,  0};

struct Luts {
  uint8_t zc[4][256];   // index = (f >> 4) & 0xFF
  uint8_t sc[256];      // cx | xorbit<<5; index = sig4 | sgn4<<4
  Luts() {
    for (int band = 0; band < 4; band++)
      for (int m = 0; m < 256; m++) {
        int hh = ((m >> (NB_W - 4)) & 1) + ((m >> (NB_E - 4)) & 1);
        int vv = ((m >> (NB_N - 4)) & 1) + ((m >> (NB_S - 4)) & 1);
        int dd = ((m >> (NB_NW - 4)) & 1) + ((m >> (NB_NE - 4)) & 1)
               + ((m >> (NB_SW - 4)) & 1) + ((m >> (NB_SE - 4)) & 1);
        zc[band][m] = (uint8_t)zc_context(hh, vv, dd, band);
      }
    for (int m = 0; m < 256; m++) {
      int w_ = m & 1, e_ = (m >> 1) & 1, n_ = (m >> 2) & 1, s_ = (m >> 3) & 1;
      int ws = (m >> 4) & 1, es = (m >> 5) & 1, ns = (m >> 6) & 1,
          ss = (m >> 7) & 1;
      int hc = w_ * (1 - 2 * ws) + e_ * (1 - 2 * es);
      int vc = n_ * (1 - 2 * ns) + s_ * (1 - 2 * ss);
      hc = hc < -1 ? -1 : (hc > 1 ? 1 : hc);
      vc = vc < -1 ? -1 : (vc > 1 ? 1 : vc);
      int idx = (hc + 1) * 3 + (vc + 1);
      sc[m] = (uint8_t)(SC_CX[idx] | (SC_XOR[idx] << 5));
    }
  }
};
static const Luts LUT;

static inline int sc_index(uint32_t f) {
  // sig bits W,E,N,S live at 4..7; sign bits at 12..15
  return (int)(((f >> 4) & 0xF) | ((f >> 8) & 0xF0));
}

struct MQDec {
  const uint8_t* data; int64_t len; int64_t bp;
  uint32_t c, a; int ct;
  uint8_t I[N_CTX], mps[N_CTX];

  void bytein() {
    if (bp < len && data[bp] == 0xFF) {
      if (bp + 1 >= len || data[bp + 1] > 0x8F) { c += 0xFF00; ct = 8; }
      else { bp += 1; c += (uint32_t)data[bp] << 9; ct = 7; }
    } else {
      bp += 1;
      c += (uint32_t)(bp < len ? data[bp] : 0xFF) << 8;
      ct = 8;
    }
  }

  void init(const uint8_t* d, int64_t n) {
    data = d; len = n; bp = 0;
    uint32_t b0 = n ? d[0] : 0xFF;
    c = b0 << 16;
    bytein();
    c <<= 7;
    ct -= 7;
    a = 0x8000;
    std::memset(I, 0, sizeof I);
    std::memset(mps, 0, sizeof mps);
    I[0] = 4; I[CTX_RLC] = 3; I[CTX_UNI] = 46;
  }

  int decode(int cx) {
    const QeRow& q = QE[I[cx]];
    uint32_t qe = q.qe;
    a -= qe;
    int d;
    if (((c >> 16) & 0xFFFF) < qe) {
      if (a < qe) { d = mps[cx]; I[cx] = q.nmps; }
      else {
        d = 1 - mps[cx];
        if (q.sw) mps[cx] ^= 1;
        I[cx] = q.nlps;
      }
      a = qe;
    } else {
      c -= qe << 16;
      if (a & 0x8000) return mps[cx];
      if (a < qe) {
        d = 1 - mps[cx];
        if (q.sw) mps[cx] ^= 1;
        I[cx] = q.nlps;
      } else { d = mps[cx]; I[cx] = q.nmps; }
    }
    // renormalize: all shifts until a's bit 15 is set, batched via CLZ
    // (byte-equivalent to the per-bit reference loop)
    int k = __builtin_clz(a | 1) - 16;  // |1: corrupt-stream a==0 safety
    do {
      if (ct == 0) bytein();
      int s = k < ct ? k : ct;
      a <<= s;
      c <<= s;
      ct -= s;
      k -= s;
    } while (k > 0);
    a &= 0xFFFF;
    return d;
  }
};

struct MQEnc {
  uint32_t a; uint64_t c; int ct; int b;  // b = -1 means "no byte yet"
  std::vector<uint8_t> out;
  uint8_t I[N_CTX], mps[N_CTX];

  void init() {
    a = 0x8000; c = 0; ct = 12; b = -1;
    out.clear();
    std::memset(I, 0, sizeof I);
    std::memset(mps, 0, sizeof mps);
    I[0] = 4; I[CTX_RLC] = 3; I[CTX_UNI] = 46;
  }

  void byteout() {
    if (b == 0xFF) {
      out.push_back((uint8_t)b);
      b = (int)(c >> 20);
      c &= 0xFFFFF;
      ct = 7;
    } else if (c < 0x8000000) {
      if (b >= 0) out.push_back((uint8_t)b);
      b = (int)((c >> 19) & 0xFF);
      c &= 0x7FFFF;
      ct = 8;
    } else {
      b += 1;
      if (b == 0xFF) {
        c &= 0x7FFFFFF;
        out.push_back((uint8_t)b);
        b = (int)(c >> 20);
        c &= 0xFFFFF;
        ct = 7;
      } else {
        if (b >= 0) out.push_back((uint8_t)b);
        b = (int)((c >> 19) & 0xFF);
        c &= 0x7FFFF;
        ct = 8;
      }
    }
  }

  void renorm() {
    // batched CLZ form of the per-bit loop (byte-equivalent: shifts
    // happen in ct-sized chunks with byteout exactly when ct reaches 0)
    int k = __builtin_clz(a | 1) - 16;
    do {
      int s = k < ct ? k : ct;
      a <<= s;
      c = (c << s) & 0xFFFFFFFFull;
      ct -= s;
      k -= s;
      if (ct == 0) byteout();
    } while (k > 0);
    a &= 0xFFFF;
  }

  void encode(int cx, int d) {
    const QeRow& q = QE[I[cx]];
    uint32_t qe = q.qe;
    if (d == mps[cx]) {
      a -= qe;
      if ((a & 0x8000) == 0) {
        if (a < qe) a = qe; else c += qe;
        I[cx] = q.nmps;
        renorm();
      } else c += qe;
    } else {
      a -= qe;
      if (a < qe) c += qe; else a = qe;
      if (q.sw) mps[cx] ^= 1;
      I[cx] = q.nlps;
      renorm();
    }
  }

  void flush() {
    uint64_t tempc = c + a;
    c |= 0xFFFF;
    if (c >= tempc) c -= 0x8000;
    c = (c << ct) & 0xFFFFFFFFull;
    byteout();
    c = (c << ct) & 0xFFFFFFFFull;
    byteout();
    if (b != 0xFF && b >= 0) out.push_back((uint8_t)b);
    while (!out.empty() && out.back() == 0xFF) out.pop_back();
  }
};

// Padded (h+2) x (w+2) packed flag plane.
struct Flags {
  int w, h, W;
  std::vector<uint32_t> f;
  void init(int w_, int h_) {
    w = w_; h = h_; W = w_ + 2;
    f.assign((size_t)(h + 2) * W, 0);
  }
  inline size_t at(int yy, int xx) const { return (size_t)yy * W + xx; }
  // mark padded cell i significant with sign `neg`, updating neighbors
  inline void set_sig(size_t i, int neg) {
    uint32_t* p = f.data();
    p[i] |= F_SIG | (neg ? F_SGN : 0);
    uint32_t hs = neg ? (1u << SB_E) : 0;   // I am my west nb's EAST
    p[i - 1] |= (1u << NB_E) | hs;
    hs = neg ? (1u << SB_W) : 0;
    p[i + 1] |= (1u << NB_W) | hs;
    hs = neg ? (1u << SB_S) : 0;            // I am my north nb's SOUTH
    p[i - W] |= (1u << NB_S) | hs;
    hs = neg ? (1u << SB_N) : 0;
    p[i + W] |= (1u << NB_N) | hs;
    p[i - W - 1] |= 1u << NB_SE;
    p[i - W + 1] |= 1u << NB_SW;
    p[i + W - 1] |= 1u << NB_NE;
    p[i + W + 1] |= 1u << NB_NW;
  }
  void clear_visited() {
    for (auto& x : f) x &= ~F_VIS;
  }
};

}  // namespace

extern "C" {

// Decode one code-block: data[len] MQ stream, (w, h) block, numbps planes,
// npasses coding passes, band in {0,1,2,3}. out is h*w int32 row-major.
// Returns 0 on success.
int ebcot_decode_cb(const uint8_t* data, int64_t len, int w, int h,
                    int numbps, int npasses, int band, int32_t* out) {
  if (w <= 0 || h <= 0) return -1;
  MQDec mq; mq.init(data, len);
  Flags st; st.init(w, h);
  std::vector<int64_t> mag((size_t)h * w, 0);
  const int W = st.W;
  uint32_t* F = st.f.data();
  const uint8_t* ZC = LUT.zc[band];

  auto decode_sig = [&](size_t i, int64_t* cell, int p) {
    // cell becomes significant: decode sign, update flags + magnitude
    uint8_t sc = LUT.sc[sc_index(F[i])];
    int neg = mq.decode(sc & 0x1F) ^ (sc >> 5);
    st.set_sig(i, neg);
    *cell |= (int64_t)1 << p;
  };

  auto spp = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      int ylim = y0 + 4 < h ? y0 + 4 : h;
      int full = y0 + 4 <= h;
      for (int x = 0; x < w; x++) {
        size_t i0 = st.at(y0 + 1, x + 1);
        // whole-column skip: no cell here can be coded by SPP unless
        // some cell has a significant neighbor (flags only GAIN bits
        // during the pass, so a clean aggregate stays clean for the
        // cells this column visit would have coded first)
        if (full) {
          uint32_t agg = F[i0] | F[i0 + W] | F[i0 + 2 * W] | F[i0 + 3 * W];
          if (!(agg & NEIGH_MASK)) continue;
        }
        int64_t* m0 = &mag[(size_t)y0 * w + x];
        for (int y = y0; y < ylim; y++, i0 += W, m0 += w) {
          uint32_t f = F[i0];
          if ((f & F_SIG) || !(f & NEIGH_MASK)) continue;
          F[i0] = f | F_VIS;
          if (mq.decode(ZC[(f >> 4) & 0xFF])) decode_sig(i0, m0, p);
        }
      }
    }
  };

  auto mrp = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      int ylim = y0 + 4 < h ? y0 + 4 : h;
      int full = y0 + 4 <= h;
      for (int x = 0; x < w; x++) {
        size_t i0 = st.at(y0 + 1, x + 1);
        if (full) {
          // MRP touches only already-significant cells; significance
          // never changes during MRP, so the aggregate test is exact
          uint32_t agg = F[i0] | F[i0 + W] | F[i0 + 2 * W] | F[i0 + 3 * W];
          if (!(agg & F_SIG)) continue;
        }
        int64_t* m0 = &mag[(size_t)y0 * w + x];
        for (int y = y0; y < ylim; y++, i0 += W, m0 += w) {
          uint32_t f = F[i0];
          if (!(f & F_SIG) || (f & F_VIS)) continue;
          int cx = (f & F_REF) ? 16 : ((f & NEIGH_MASK) ? 15 : 14);
          if (mq.decode(cx)) *m0 |= (int64_t)1 << p;
          F[i0] = f | F_REF | F_VIS;
        }
      }
    }
  };

  auto cup = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      for (int x = 0; x < w; x++) {
        int y = y0;
        size_t i0 = st.at(y0 + 1, x + 1);
        if (y0 + 4 <= h) {
          // run-length mode iff the whole 4-cell column is non-visited,
          // non-significant, with NO significant neighbor anywhere (the
          // union of the 4 cells' 3x3 windows == the 6x3 window)
          uint32_t agg = F[i0] | F[i0 + W] | F[i0 + 2 * W] | F[i0 + 3 * W];
          if (!(agg & (F_SIG | F_VIS | NEIGH_MASK))) {
            if (!mq.decode(CTX_RLC)) continue;
            int r = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI);
            y = y0 + r;
            size_t i = i0 + (size_t)r * W;
            decode_sig(i, &mag[(size_t)y * w + x], p);
            y += 1;
          }
        }
        int ylim = y0 + 4 < h ? y0 + 4 : h;
        size_t i = st.at(y + 1, x + 1);
        int64_t* m0 = &mag[(size_t)y * w + x];
        for (; y < ylim; y++, i += W, m0 += w) {
          uint32_t f = F[i];
          if (f & (F_VIS | F_SIG)) continue;
          if (mq.decode(ZC[(f >> 4) & 0xFF])) decode_sig(i, m0, p);
        }
      }
    }
    st.clear_visited();
  };

  int p = numbps - 1;
  int done = 0;
  if (done < npasses && p >= 0) { cup(p); done++; p--; }
  while (done < npasses && p >= 0) {
    spp(p); done++;
    if (done < npasses) { mrp(p); done++; }
    if (done < npasses) { cup(p); done++; }
    p--;
  }
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      int s = (F[st.at(y + 1, x + 1)] & F_SGN) ? -1 : 1;
      out[(size_t)y * w + x] = (int32_t)(mag[(size_t)y * w + x] * s);
    }
  return 0;
}

// Encode one code-block losslessly. coefs is h*w int32 row-major.
// out: caller buffer of capacity cap; plens_out: capacity cap_passes.
// On success returns the data length and fills numbps/npasses/plens
// (per-pass safe truncation byte counts). Returns -1 if a buffer is
// too small.
int64_t ebcot_encode_cb(const int32_t* coefs, int w, int h, int band,
                        uint8_t* out, int64_t cap,
                        int* numbps_out, int* npasses_out,
                        int64_t* plens_out, int cap_passes) {
  if (w <= 0 || h <= 0) return -1;
  int64_t maxmag = 0;
  std::vector<int64_t> mag((size_t)h * w);
  std::vector<uint8_t> neg((size_t)h * w);
  for (size_t i = 0; i < (size_t)h * w; i++) {
    int64_t v = coefs[i];
    neg[i] = v < 0;
    int64_t m = v < 0 ? -v : v;
    mag[i] = m;
    if (m > maxmag) maxmag = m;
  }
  int numbps = 0;
  while ((maxmag >> numbps) != 0) numbps++;
  *numbps_out = numbps;
  if (numbps == 0) { *npasses_out = 0; return 0; }
  int npasses = 1 + 3 * (numbps - 1);
  *npasses_out = npasses;
  if (npasses > cap_passes) return -1;

  MQEnc mq; mq.init();
  Flags st; st.init(w, h);
  const int W = st.W;
  uint32_t* F = st.f.data();
  const uint8_t* ZC = LUT.zc[band];

  auto encode_sig = [&](size_t i, int isneg) {
    uint8_t sc = LUT.sc[sc_index(F[i])];
    mq.encode(sc & 0x1F, isneg ^ (sc >> 5));
    st.set_sig(i, isneg);
  };

  auto spp = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      int ylim = y0 + 4 < h ? y0 + 4 : h;
      int full = y0 + 4 <= h;
      for (int x = 0; x < w; x++) {
        size_t i0 = st.at(y0 + 1, x + 1);
        if (full) {  // exact column skip (see decoder note)
          uint32_t agg = F[i0] | F[i0 + W] | F[i0 + 2 * W] | F[i0 + 3 * W];
          if (!(agg & NEIGH_MASK)) continue;
        }
        size_t c0 = (size_t)y0 * w + x;
        for (int y = y0; y < ylim; y++, i0 += W, c0 += w) {
          uint32_t f = F[i0];
          if ((f & F_SIG) || !(f & NEIGH_MASK)) continue;
          F[i0] = f | F_VIS;
          int bit = (int)((mag[c0] >> p) & 1);
          mq.encode(ZC[(f >> 4) & 0xFF], bit);
          if (bit) encode_sig(i0, neg[c0]);
        }
      }
    }
  };

  auto mrp = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      int ylim = y0 + 4 < h ? y0 + 4 : h;
      int full = y0 + 4 <= h;
      for (int x = 0; x < w; x++) {
        size_t i0 = st.at(y0 + 1, x + 1);
        if (full) {  // MRP: significance static during the pass
          uint32_t agg = F[i0] | F[i0 + W] | F[i0 + 2 * W] | F[i0 + 3 * W];
          if (!(agg & F_SIG)) continue;
        }
        size_t c0 = (size_t)y0 * w + x;
        for (int y = y0; y < ylim; y++, i0 += W, c0 += w) {
          uint32_t f = F[i0];
          if (!(f & F_SIG) || (f & F_VIS)) continue;
          int cx = (f & F_REF) ? 16 : ((f & NEIGH_MASK) ? 15 : 14);
          mq.encode(cx, (int)((mag[c0] >> p) & 1));
          F[i0] = f | F_REF | F_VIS;
        }
      }
    }
  };

  auto cup = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      for (int x = 0; x < w; x++) {
        int y = y0;
        size_t i0 = st.at(y0 + 1, x + 1);
        if (y0 + 4 <= h) {
          uint32_t agg = F[i0] | F[i0 + W] | F[i0 + 2 * W] | F[i0 + 3 * W];
          if (!(agg & (F_SIG | F_VIS | NEIGH_MASK))) {
            int bits4[4], any = 0, r = 0;
            for (int i = 0; i < 4; i++) {
              bits4[i] = (int)((mag[(size_t)(y0 + i) * w + x] >> p) & 1);
              any |= bits4[i];
            }
            if (!any) { mq.encode(CTX_RLC, 0); continue; }
            mq.encode(CTX_RLC, 1);
            while (!bits4[r]) r++;
            mq.encode(CTX_UNI, (r >> 1) & 1);
            mq.encode(CTX_UNI, r & 1);
            y = y0 + r;
            encode_sig(i0 + (size_t)r * W, neg[(size_t)y * w + x]);
            y += 1;
          }
        }
        int ylim = y0 + 4 < h ? y0 + 4 : h;
        size_t i = st.at(y + 1, x + 1);
        size_t c0 = (size_t)y * w + x;
        for (; y < ylim; y++, i += W, c0 += w) {
          uint32_t f = F[i];
          if (f & (F_VIS | F_SIG)) continue;
          int bit = (int)((mag[c0] >> p) & 1);
          mq.encode(ZC[(f >> 4) & 0xFF], bit);
          if (bit) encode_sig(i, neg[c0]);
        }
      }
    }
    st.clear_visited();
  };

  // pass sequence + per-pass truncation marks (bytes so far + 4 covers
  // the MQ registers' unflushed state; clamped to the flushed length)
  std::vector<int64_t> plens;
  plens.reserve(npasses);
  int p = numbps - 1;
  cup(p);
  plens.push_back((int64_t)mq.out.size() + 4);
  for (p = numbps - 2; p >= 0; p--) {
    spp(p); plens.push_back((int64_t)mq.out.size() + 4);
    mrp(p); plens.push_back((int64_t)mq.out.size() + 4);
    cup(p); plens.push_back((int64_t)mq.out.size() + 4);
  }
  mq.flush();
  int64_t n = (int64_t)mq.out.size();
  if (n > cap) return -1;
  std::memcpy(out, mq.out.data(), (size_t)n);
  for (size_t i = 0; i < plens.size(); i++)
    plens_out[i] = plens[i] < n ? plens[i] : n;
  plens_out[plens.size() - 1] = n;
  return n;
}

}  // extern "C"
