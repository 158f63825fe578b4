// Baseline-JPEG entropy stage (host side of the nvJPEG split):
// scan-order Huffman encode/decode + the symbol-frequency pass that feeds
// the optimized-table builder.  Mirrors the reference's stage split where
// nvJPEG runs entropy on dedicated engines while the pixel pipeline is
// device work (nvJPEG/nvJPEG-Decoder/nvjpegDecoder.cpp:1,
// nvJPEG-Encoder-MultipleInstances/nvJPEG-Encoder.cpp:1); here the entropy
// stage is native C++ driven from image/jpeg.py via ctypes, byte-exact
// against the pure-Python reference path it replaces.

#include <cstdint>
#include <cstring>

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

// Decode a whole baseline scan (stuffed bytes straight from the stream,
// restart markers handled inline).  mcu_comp/mcu_dctab/mcu_actab describe
// the bpm blocks of one MCU; tables are indexed 0-3 DC th / 4-7 AC th with
// mincode/maxcode/valptr int32[8][17] and symbols uint8[8][256] in the
// (mincode, maxcode, valptr, symbols) layout of jpeg.py _build_huff.
// Writes scan-ordered coefficients to out[n_mcu*bpm][64] (zigzag order).
// Returns 0, or -1 on a bad Huffman code / missing restart marker.
int64_t jpeg_scan_decode(const uint8_t* data, int64_t nbytes, int64_t n_mcu,
                         int64_t restart, const uint8_t* mcu_comp,
                         const uint8_t* mcu_dctab, const uint8_t* mcu_actab,
                         int64_t bpm, const int32_t* mincode,
                         const int32_t* maxcode, const int32_t* valptr,
                         const uint8_t* symbols, int32_t* out) {
  BitReader br{data, nbytes};
  int pred[4] = {0, 0, 0, 0};
  std::memset(out, 0, (size_t)(n_mcu * bpm * 64) * sizeof(int32_t));
  for (int64_t m = 0; m < n_mcu; ++m) {
    if (restart && m && m % restart == 0) {
      if (!br.restart_marker()) return -1;
      pred[0] = pred[1] = pred[2] = pred[3] = 0;
    }
    for (int64_t j = 0; j < bpm; ++j) {
      int32_t* blk = out + (m * bpm + j) * 64;
      int c = mcu_comp[j];
      int td = mcu_dctab[j];
      int ta = 4 + mcu_actab[j];
      int s = huff_decode(br, mincode + td * 17, maxcode + td * 17,
                          valptr + td * 17, symbols + td * 256);
      if (s < 0) return -1;
      int diff = 0;
      if (s) {
        uint32_t v = br.read(s);
        diff = (int)v;
        if (v < (1u << (s - 1))) diff = (int)v - (1 << s) + 1;  // extend
      }
      pred[c] += diff;
      blk[0] = pred[c];
      int k = 1;
      while (k < 64) {
        int rs = huff_decode(br, mincode + ta * 17, maxcode + ta * 17,
                             valptr + ta * 17, symbols + ta * 256);
        if (rs < 0) return -1;
        if (rs == 0x00) break;  // EOB
        if (rs == 0xF0) {
          k += 16;
          continue;
        }
        k += rs >> 4;
        int sz = rs & 15;
        uint32_t v = br.read(sz);
        int val = (int)v;
        if (sz && v < (1u << (sz - 1))) val = (int)v - (1 << sz) + 1;
        if (k > 63) return -1;
        blk[k] = val;
        ++k;
      }
    }
  }
  return 0;
}

}  // extern "C"
