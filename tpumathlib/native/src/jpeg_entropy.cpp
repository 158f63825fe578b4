// Baseline-JPEG entropy stage (host side of the nvJPEG split):
// scan-order Huffman encode/decode + the symbol-frequency pass that feeds
// the optimized-table builder.  Mirrors the reference's stage split where
// nvJPEG runs entropy on dedicated engines while the pixel pipeline is
// device work (nvJPEG/nvJPEG-Decoder/nvjpegDecoder.cpp:1,
// nvJPEG-Encoder-MultipleInstances/nvJPEG-Encoder.cpp:1); here the entropy
// stage is native C++ driven from image/jpeg.py via ctypes, byte-exact
// against the pure-Python reference path it replaces.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int bitlength(int v) {
  int a = v < 0 ? -v : v;
  int s = 0;
  while (a) {
    ++s;
    a >>= 1;
  }
  return s;
}

struct BitWriter {
  uint8_t* out;
  int64_t cap;
  int64_t n = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool overflow = false;

  inline void put(uint32_t code, int len) {
    if (!len) return;
    acc = (acc << len) | (code & ((1u << len) - 1));
    nbits += len;
    while (nbits >= 8) {
      nbits -= 8;
      uint8_t b = (acc >> nbits) & 0xFF;
      if (n + 2 > cap) {
        overflow = true;
        return;
      }
      out[n++] = b;
      if (b == 0xFF) out[n++] = 0x00;  // byte stuffing
    }
    acc &= (1ull << nbits) - 1;
  }

  inline void flush() {
    if (nbits) {
      int pad = 8 - nbits;
      put((1u << pad) - 1, pad);  // pad with 1-bits
    }
  }
};

}  // namespace

extern "C" {

// Per-symbol frequencies over the scan-ordered blocks; fdc/fac are
// int64[2][256] (table class 0 = luma, 1 = chroma), counting the exact
// symbol stream the encoder will emit (DC size category; AC RRRRSSSS
// with ZRL/EOB), identical to jpeg.py _block_symbols counting.
void jpeg_symbol_freq(const int32_t* blocks, const uint8_t* comp_id,
                      const uint8_t* tab_sel, int64_t nblocks,
                      int64_t* fdc, int64_t* fac) {
  int pred[4] = {0, 0, 0, 0};
  for (int64_t i = 0; i < nblocks; ++i) {
    const int32_t* blk = blocks + i * 64;
    int c = comp_id[i];
    int t = tab_sel[i];
    int dc = blk[0];
    int diff = dc - pred[c];
    pred[c] = dc;
    fdc[t * 256 + bitlength(diff)]++;
    int last = 63;
    while (last > 0 && blk[last] == 0) --last;
    int run = 0;
    for (int k = 1; k <= last; ++k) {
      int v = blk[k];
      if (v == 0) {
        ++run;
        continue;
      }
      while (run >= 16) {
        fac[t * 256 + 0xF0]++;  // ZRL
        run -= 16;
      }
      fac[t * 256 + ((run << 4) | bitlength(v))]++;
      run = 0;
    }
    if (last < 63) fac[t * 256 + 0x00]++;  // EOB
  }
}

// One-pass symbol extraction: walks the scan-ordered blocks ONCE,
// emitting packed symbol records AND the per-table frequencies (the
// fused form of jpeg_symbol_freq + the symbol derivation inside
// jpeg_scan_encode — the optimized-table encoder needs both, and the
// block walk dominates the cost). Record layout (uint32):
//   bit 0: is_dc | bit 1: table | bits 2..9: sym | bits 10..14: elen |
//   bits 15..30: extra (16 bits; elen <= 15 for baseline 8-bit data,
//   DC diff size <= 11).
// Returns the record count, or -1 on capacity overflow.
int64_t jpeg_scan_symbols(const int32_t* blocks, const uint8_t* comp_id,
                          const uint8_t* tab_sel, int64_t nblocks,
                          int64_t* fdc, int64_t* fac, uint32_t* syms,
                          int64_t cap) {
  int pred[4] = {0, 0, 0, 0};
  int64_t n = 0;
  for (int64_t i = 0; i < nblocks; ++i) {
    const int32_t* blk = blocks + i * 64;
    int c = comp_id[i];
    uint32_t t = tab_sel[i];
    int dc = blk[0];
    int diff = dc - pred[c];
    pred[c] = dc;
    int s = bitlength(diff);
    fdc[t * 256 + s]++;
    int extra = diff >= 0 ? diff : diff + (1 << s) - 1;
    if (n + 70 > cap) return -1;   // max 1 DC + 63 AC + 3 ZRL + EOB
    syms[n++] = 1u | (t << 1) | ((uint32_t)s << 2) | ((uint32_t)s << 10)
                | ((uint32_t)(extra & 0xFFFF) << 15);
    int last = 63;
    while (last > 0 && blk[last] == 0) --last;
    int run = 0;
    for (int k = 1; k <= last; ++k) {
      int v = blk[k];
      if (v == 0) {
        ++run;
        continue;
      }
      while (run >= 16) {
        fac[t * 256 + 0xF0]++;
        syms[n++] = (t << 1) | (0xF0u << 2);
        run -= 16;
      }
      int sz = bitlength(v);
      uint32_t sym = (uint32_t)((run << 4) | sz);
      fac[t * 256 + sym]++;
      int ex = v >= 0 ? v : v + (1 << sz) - 1;
      syms[n++] = (t << 1) | (sym << 2) | ((uint32_t)sz << 10)
                  | ((uint32_t)(ex & 0xFFFF) << 15);
      run = 0;
    }
    if (last < 63) {
      fac[t * 256 + 0x00]++;
      syms[n++] = (t << 1);
    }
  }
  return n;
}

// Emit the jpeg_scan_symbols record stream with the built code tables.
// Returns bytes written, or -1 on overflow / missing code.
int64_t jpeg_emit_symbols(const uint32_t* syms, int64_t nsyms,
                          const uint32_t* dc_codes,
                          const uint32_t* ac_codes, uint8_t* out,
                          int64_t cap) {
  BitWriter bw{out, cap};
  for (int64_t i = 0; i < nsyms; ++i) {
    uint32_t r = syms[i];
    uint32_t t = (r >> 1) & 1;
    uint32_t sym = (r >> 2) & 0xFF;
    int elen = (r >> 10) & 0x1F;
    uint32_t e = (r & 1) ? dc_codes[t * 256 + sym]
                         : ac_codes[t * 256 + sym];
    if (!(e >> 16)) return -1;
    bw.put(e & 0xFFFF, e >> 16);
    if (elen) bw.put((r >> 15) & 0xFFFF, elen);
    if (bw.overflow) return -1;
  }
  bw.flush();
  if (bw.overflow) return -1;
  return bw.n;
}

// Scan-ordered blocks -> entropy-coded bytes (stuffed, 1-padded).
// dc_codes/ac_codes are uint32[2][256] packed (length << 16) | code;
// length 0 marks a symbol absent from the table (error).  Returns bytes
// written, or -1 on buffer overflow / missing code.
int64_t jpeg_scan_encode(const int32_t* blocks, const uint8_t* comp_id,
                         const uint8_t* tab_sel, int64_t nblocks,
                         const uint32_t* dc_codes, const uint32_t* ac_codes,
                         uint8_t* out, int64_t cap) {
  BitWriter bw{out, cap};
  int pred[4] = {0, 0, 0, 0};
  for (int64_t i = 0; i < nblocks; ++i) {
    const int32_t* blk = blocks + i * 64;
    int c = comp_id[i];
    int t = tab_sel[i];
    int dc = blk[0];
    int diff = dc - pred[c];
    pred[c] = dc;
    int s = bitlength(diff);
    uint32_t e = dc_codes[t * 256 + s];
    if (!(e >> 16)) return -1;
    bw.put(e & 0xFFFF, e >> 16);
    if (s) {
      int extra = diff >= 0 ? diff : diff + (1 << s) - 1;
      bw.put((uint32_t)extra, s);
    }
    int last = 63;
    while (last > 0 && blk[last] == 0) --last;
    int run = 0;
    for (int k = 1; k <= last; ++k) {
      int v = blk[k];
      if (v == 0) {
        ++run;
        continue;
      }
      while (run >= 16) {
        uint32_t z = ac_codes[t * 256 + 0xF0];
        if (!(z >> 16)) return -1;
        bw.put(z & 0xFFFF, z >> 16);
        run -= 16;
      }
      int sz = bitlength(v);
      uint32_t a = ac_codes[t * 256 + ((run << 4) | sz)];
      if (!(a >> 16)) return -1;
      bw.put(a & 0xFFFF, a >> 16);
      int extra = v >= 0 ? v : v + (1 << sz) - 1;
      bw.put((uint32_t)extra, sz);
      run = 0;
    }
    if (last < 63) {
      uint32_t e0 = ac_codes[t * 256 + 0x00];
      if (!(e0 >> 16)) return -1;
      bw.put(e0 & 0xFFFF, e0 >> 16);
    }
    if (bw.overflow) return -1;
  }
  bw.flush();
  if (bw.overflow) return -1;
  return bw.n;
}

namespace {

// Bit reader over the RAW (stuffed) entropy segment: 0xFF00 delivers a
// literal 0xFF; any other 0xFF-marker ends the data (reads past the end
// return 0 bits, matching jpeg.py's _BitReader zero-padding).  Restart
// markers are consumed explicitly at MCU boundaries by the caller loop.
struct BitReader {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;

  inline int next_byte() {
    if (pos >= nbytes) return 0;
    uint8_t b = data[pos];
    if (b == 0xFF) {
      if (pos + 1 < nbytes && data[pos + 1] == 0x00) {
        pos += 2;
        return 0xFF;
      }
      // EOI / next marker: stop consuming, zero-pad from here on
      return 0;
    }
    ++pos;
    return b;
  }

  inline uint32_t read(int n) {
    while (nbits < n) {
      acc = (acc << 8) | (uint64_t)next_byte();
      nbits += 8;
    }
    nbits -= n;
    uint32_t v = (acc >> nbits) & ((1ull << n) - 1);
    acc &= (1ull << nbits) - 1;
    return v;
  }

  // byte-align and consume an expected RSTn marker; tolerate trailing
  // stuffing state.  Returns false if the marker is absent.
  inline bool restart_marker() {
    acc = 0;
    nbits = 0;
    if (pos + 1 < nbytes && data[pos] == 0xFF && data[pos + 1] >= 0xD0 &&
        data[pos + 1] <= 0xD7) {
      pos += 2;
      return true;
    }
    return false;
  }
};

inline int huff_decode(BitReader& br, const int32_t* mincode,
                       const int32_t* maxcode, const int32_t* valptr,
                       const uint8_t* symbols) {
  int code = 0;
  for (int l = 1; l <= 16; ++l) {
    code = (code << 1) | (int)br.read(1);
    if (maxcode[l] >= code && code >= mincode[l])
      return symbols[valptr[l] + code - mincode[l]];
  }
  return -1;
}

}  // namespace

// Decode a whole baseline scan.  mcu_comp/mcu_dctab/mcu_actab describe
// the bpm blocks of one MCU; tables are indexed 0-3 DC th / 4-7 AC th with
// mincode/maxcode/valptr int32[8][17] and symbols uint8[8][256] in the
// (mincode, maxcode, valptr, symbols) layout of jpeg.py _build_huff.
// Writes scan-ordered coefficients to out[n_mcu*bpm][64] (zigzag order).
// Returns 0, or -1 on a bad Huffman code / missing restart marker.
//
// Fast path (round 5, ≙ nvJPEG's parallel restart-segment decode,
// nvJPEG/nvJPEG-Decoder/nvjpegDecoder.cpp:46-88): one de-stuffing pass
// splits the scan at RSTn markers into independent segments (predictors
// reset, byte-aligned), then each segment decodes with a 64-bit-buffered
// bit reader + an 8-bit first-level Huffman LUT (codes <= 8 bits resolve
// in one table hit; longer codes fall back to the canonical
// mincode/maxcode walk).  Segments decode on a std::thread pool when the
// host has cores for it; predictor state and output ranges are disjoint
// by construction.
namespace {

struct FastReader {
  const uint8_t* d;
  int64_t n;
  int64_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;

  inline void fill() {
    while (nbits <= 56) {
      uint64_t b = pos < n ? d[pos++] : 0;  // zero-pad past end (T.81
      acc = (acc << 8) | b;                 // Annex F decoder convention)
      nbits += 8;
    }
  }
  inline uint32_t peek8() {
    if (nbits < 8) fill();
    return (acc >> (nbits - 8)) & 0xFF;
  }
  inline void consume(int k) {
    nbits -= k;
    acc &= (nbits >= 64) ? ~0ull : ((1ull << nbits) - 1);
  }
  inline uint32_t read(int k) {
    if (!k) return 0;
    if (nbits < k) fill();
    nbits -= k;
    uint32_t v = (acc >> nbits) & ((1ull << k) - 1);
    acc &= (1ull << nbits) - 1;
    return v;
  }
};

inline int fast_sym(FastReader& fr, const uint16_t* lut,
                    const int32_t* mincode, const int32_t* maxcode,
                    const int32_t* valptr, const uint8_t* symbols) {
  uint32_t p = fr.peek8();
  uint16_t e = lut[p];
  if (e) {
    fr.consume(e >> 8);
    return e & 0xFF;
  }
  // no code of length <= 8 matches this prefix: continue the canonical
  // walk from length 9 with the 8 peeked bits as the running code
  int code = (int)p;
  fr.consume(8);
  for (int l = 9; l <= 16; ++l) {
    code = (code << 1) | (int)fr.read(1);
    if (maxcode[l] >= code && code >= mincode[l])
      return symbols[valptr[l] + code - mincode[l]];
  }
  return -1;
}

// 256-entry first-level LUT: entry = (codelen << 8) | symbol for codes
// of length <= 8 (replicated over the don't-care low bits), 0 = escape.
void build_lut(const int32_t* mincode, const int32_t* maxcode,
               const int32_t* valptr, const uint8_t* symbols,
               uint16_t* lut) {
  std::memset(lut, 0, 256 * sizeof(uint16_t));
  for (int l = 1; l <= 8; ++l) {
    if (maxcode[l] < mincode[l]) continue;
    for (int code = mincode[l]; code <= maxcode[l]; ++code) {
      uint8_t sym = symbols[valptr[l] + code - mincode[l]];
      int base = code << (8 - l);
      for (int f = 0; f < (1 << (8 - l)); ++f)
        lut[base + f] = (uint16_t)((l << 8) | sym);
    }
  }
}

struct SegDecodeCtx {
  const uint8_t* destuffed;
  const int64_t* seg_off;    // nseg+1 offsets into destuffed
  int64_t nseg;
  int64_t n_mcu, restart, bpm;
  const uint8_t *mcu_comp, *mcu_dctab, *mcu_actab;
  const int32_t *mincode, *maxcode, *valptr;
  const uint8_t* symbols;
  const uint16_t* luts;      // [8][256]
  int32_t* out;
  std::atomic<int64_t> next{0};
  std::atomic<int> bad{0};
};

void decode_segment(SegDecodeCtx& ctx, int64_t k) {
  int64_t m0 = ctx.restart ? k * ctx.restart : 0;
  int64_t m1 = ctx.restart ? std::min<int64_t>(m0 + ctx.restart, ctx.n_mcu)
                           : ctx.n_mcu;
  FastReader fr{ctx.destuffed + ctx.seg_off[k],
                ctx.seg_off[k + 1] - ctx.seg_off[k]};
  int pred[4] = {0, 0, 0, 0};
  for (int64_t m = m0; m < m1; ++m) {
    for (int64_t j = 0; j < ctx.bpm; ++j) {
      int32_t* blk = ctx.out + (m * ctx.bpm + j) * 64;
      int c = ctx.mcu_comp[j];
      int td = ctx.mcu_dctab[j];
      int ta = 4 + ctx.mcu_actab[j];
      int s = fast_sym(fr, ctx.luts + td * 256, ctx.mincode + td * 17,
                       ctx.maxcode + td * 17, ctx.valptr + td * 17,
                       ctx.symbols + td * 256);
      if (s < 0) {
        ctx.bad.store(1);
        return;
      }
      int diff = 0;
      if (s) {
        uint32_t v = fr.read(s);
        diff = (int)v;
        if (v < (1u << (s - 1))) diff = (int)v - (1 << s) + 1;  // extend
      }
      pred[c] += diff;
      blk[0] = pred[c];
      int k2 = 1;
      while (k2 < 64) {
        int rs = fast_sym(fr, ctx.luts + ta * 256, ctx.mincode + ta * 17,
                          ctx.maxcode + ta * 17, ctx.valptr + ta * 17,
                          ctx.symbols + ta * 256);
        if (rs < 0) {
          ctx.bad.store(1);
          return;
        }
        if (rs == 0x00) break;  // EOB
        if (rs == 0xF0) {
          k2 += 16;
          continue;
        }
        k2 += rs >> 4;
        int sz = rs & 15;
        uint32_t v = fr.read(sz);
        int val = (int)v;
        if (sz && v < (1u << (sz - 1))) val = (int)v - (1 << sz) + 1;
        if (k2 > 63) {
          ctx.bad.store(1);
          return;
        }
        blk[k2] = val;
        ++k2;
      }
    }
  }
}

}  // namespace

int64_t jpeg_scan_decode(const uint8_t* data, int64_t nbytes, int64_t n_mcu,
                         int64_t restart, const uint8_t* mcu_comp,
                         const uint8_t* mcu_dctab, const uint8_t* mcu_actab,
                         int64_t bpm, const int32_t* mincode,
                         const int32_t* maxcode, const int32_t* valptr,
                         const uint8_t* symbols, int32_t* out) {
  std::memset(out, 0, (size_t)(n_mcu * bpm * 64) * sizeof(int32_t));
  int64_t nseg = restart ? (n_mcu + restart - 1) / restart : 1;

  // de-stuff into one contiguous buffer; segments split at RSTn markers
  std::vector<uint8_t> destuffed((size_t)nbytes);
  std::vector<int64_t> seg_off(nseg + 1, 0);
  {
    int64_t w = 0, pos = 0, seg = 0;
    while (pos < nbytes && seg < nseg) {
      uint8_t b = data[pos];
      if (b != 0xFF) {
        destuffed[w++] = b;
        ++pos;
        continue;
      }
      if (pos + 1 < nbytes && data[pos + 1] == 0x00) {
        destuffed[w++] = 0xFF;
        pos += 2;
        continue;
      }
      if (pos + 1 < nbytes && data[pos + 1] >= 0xD0 &&
          data[pos + 1] <= 0xD7) {
        ++seg;
        if (seg <= nseg) seg_off[seg] = w;
        pos += 2;
        continue;
      }
      break;  // EOI / other marker: zero-pad from here (FastReader)
    }
    // an expected restart marker that never appeared is an error, as in
    // the bit-serial decoder (restart_marker() returning false)
    if (seg < nseg - 1) return -1;
    // close remaining segment bounds at the write head
    for (int64_t s2 = seg + 1; s2 <= nseg; ++s2) seg_off[s2] = w;
  }

  uint16_t luts[8][256];
  for (int t = 0; t < 8; ++t)
    build_lut(mincode + t * 17, maxcode + t * 17, valptr + t * 17,
              symbols + t * 256, luts[t]);

  SegDecodeCtx ctx;
  ctx.destuffed = destuffed.data();
  ctx.seg_off = seg_off.data();
  ctx.nseg = nseg;
  ctx.n_mcu = n_mcu;
  ctx.restart = restart;
  ctx.bpm = bpm;
  ctx.mcu_comp = mcu_comp;
  ctx.mcu_dctab = mcu_dctab;
  ctx.mcu_actab = mcu_actab;
  ctx.mincode = mincode;
  ctx.maxcode = maxcode;
  ctx.valptr = valptr;
  ctx.symbols = symbols;
  ctx.luts = &luts[0][0];
  ctx.out = out;

  int nthreads = (int)std::thread::hardware_concurrency();
  if (const char* env = std::getenv("TPUMATHLIB_JPEG_THREADS"))
    nthreads = std::atoi(env);  // test hook + deployment override
  if (nthreads > (int)nseg) nthreads = (int)nseg;
  if (nthreads > 1) {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t)
      pool.emplace_back([&ctx]() {
        for (;;) {
          int64_t k = ctx.next.fetch_add(1);
          if (k >= ctx.nseg || ctx.bad.load()) return;
          decode_segment(ctx, k);
        }
      });
    for (auto& th : pool) th.join();
  } else {
    for (int64_t k = 0; k < nseg && !ctx.bad.load(); ++k)
      decode_segment(ctx, k);
  }
  return ctx.bad.load() ? -1 : 0;
}

// Restart-interval encode (≙ the DRI/RSTn structure nvJPEG's hardware
// encoder emits to create segment parallelism): encodes MCUs
// [m0*bpm, m1*bpm) with fresh predictors into one segment's bytes.
// The Python driver concatenates segments with RSTn markers between
// them and may fan segments out over a thread pool.
int64_t jpeg_scan_encode_segment(const int32_t* blocks,
                                 const uint8_t* comp_id,
                                 const uint8_t* tab_sel, int64_t b0,
                                 int64_t b1, const uint32_t* dc_codes,
                                 const uint32_t* ac_codes, uint8_t* out,
                                 int64_t cap) {
  return jpeg_scan_encode(blocks + b0 * 64, comp_id + b0, tab_sel + b0,
                          b1 - b0, dc_codes, ac_codes, out, cap);
}

}  // extern "C"
