// Interleaved rANS entropy codec (byte symbols, static order-0 table).
//
// ≙ nvCOMP's ANS batched codec (nvCOMP/examples/ans_cpu_compression.*) as
// the HOST-side engine of the comp tier: chunked, multithreaded,
// 4-way-interleaved 32-bit rANS states with 16-bit renormalization —
// ~GB/s-class on host cores, replacing the round-3 per-byte Python loop.
// (The device-side story is documented in tpumathlib/comp/__init__.py:
// byte-granular table decode needs per-lane gathers, which Mosaic does
// not expose; the TPU device codec remains the cascaded scheme.)
//
// Format (little-endian):
//   u32 magic 'rANS' | u32 nchunks | u64 raw_size | u16 freq[256]
//   then per chunk: u32 comp_words | u32 raw_len | u32 state[4] |
//                   u16 words[comp_words]
// Frequencies are quantized to sum 1<<PROB_BITS over the WHOLE buffer
// (one shared table — the nvCOMP static-table configuration).

#include <algorithm>
#include <array>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t PROB_BITS = 12;
constexpr uint32_t PROB_SCALE = 1u << PROB_BITS;
constexpr uint32_t RANS_L = 1u << 16;   // lower bound of the state interval
constexpr uint32_t MAGIC = 0x534e4172;  // "rANS"
constexpr int NWAY = 4;
constexpr size_t CHUNK = 1u << 16;

struct Table {
  uint16_t freq[256];
  uint32_t cum[257];
  uint8_t sym_of_slot[PROB_SCALE];
  void finish() {
    cum[0] = 0;
    for (int s = 0; s < 256; ++s) cum[s + 1] = cum[s] + freq[s];
    for (int s = 0; s < 256; ++s)
      for (uint32_t k = cum[s]; k < cum[s + 1]; ++k) sym_of_slot[k] = (uint8_t)s;
  }
};

// quantize counts to sum PROB_SCALE, every present symbol >= 1
void quantize(const uint64_t counts[256], uint16_t freq[256]) {
  uint64_t total = 0;
  for (int s = 0; s < 256; ++s) total += counts[s];
  if (total == 0) { freq[0] = PROB_SCALE; for (int s = 1; s < 256; ++s) freq[s] = 0; return; }
  uint32_t assigned = 0;
  double rem[256];
  for (int s = 0; s < 256; ++s) {
    if (!counts[s]) { freq[s] = 0; rem[s] = -1.0; continue; }
    double ideal = (double)counts[s] * PROB_SCALE / (double)total;
    uint32_t f = (uint32_t)ideal;
    if (f == 0) f = 1;
    freq[s] = (uint16_t)f;
    rem[s] = ideal - f;
    assigned += f;
  }
  // largest-remainder correction to hit the exact scale
  while (assigned != PROB_SCALE) {
    int best = -1;
    double bestv = assigned < PROB_SCALE ? -2.0 : 2.0;
    for (int s = 0; s < 256; ++s) {
      if (!counts[s]) continue;
      if (assigned < PROB_SCALE) {
        if (rem[s] > bestv) { bestv = rem[s]; best = s; }
      } else {
        if (freq[s] > 1 && rem[s] < bestv) { bestv = rem[s]; best = s; }
      }
    }
    if (best < 0) break;
    if (assigned < PROB_SCALE) { freq[best]++; rem[best] -= 1.0; assigned++; }
    else { freq[best]--; rem[best] += 1.0; assigned--; }
  }
}

// encode one chunk (reverse scan, NWAY interleaved states); returns word count
uint32_t encode_chunk(const uint8_t* src, uint32_t n, const Table& t,
                      uint32_t state_out[NWAY], uint16_t* words, uint32_t cap_words) {
  std::vector<uint16_t> rev;
  rev.reserve(n / 2 + 16);
  uint32_t x[NWAY];
  for (int j = 0; j < NWAY; ++j) x[j] = RANS_L;
  for (int64_t i = (int64_t)n - 1; i >= 0; --i) {
    int j = (int)(i % NWAY);
    uint8_t s = src[i];
    uint32_t f = t.freq[s];
    // ((RANS_L >> PROB_BITS) << 16) * f with RANS_L = 1<<16
    uint32_t x_max = f << 20;
    uint32_t xx = x[j];
    if (xx >= x_max) { rev.push_back((uint16_t)xx); xx >>= 16; }
    x[j] = ((xx / f) << PROB_BITS) + (xx % f) + t.cum[s];
  }
  for (int j = 0; j < NWAY; ++j) state_out[j] = x[j];
  uint32_t nw = (uint32_t)rev.size();
  if (nw > cap_words) return UINT32_MAX;
  // encoder emitted backward; decoder reads forward
  for (uint32_t k = 0; k < nw; ++k) words[k] = rev[nw - 1 - k];
  return nw;
}

void decode_chunk(const uint16_t* words, uint32_t nwords, const uint32_t state_in[NWAY],
                  const Table& t, uint8_t* dst, uint32_t n) {
  uint32_t x[NWAY];
  for (int j = 0; j < NWAY; ++j) x[j] = state_in[j];
  uint32_t w = 0;
  for (uint32_t i = 0; i < n; ++i) {
    int j = (int)(i % NWAY);
    uint32_t xx = x[j];
    uint32_t slot = xx & (PROB_SCALE - 1);
    uint8_t s = t.sym_of_slot[slot];
    dst[i] = s;
    xx = t.freq[s] * (xx >> PROB_BITS) + slot - t.cum[s];
    if (xx < RANS_L && w < nwords) xx = (xx << 16) | words[w++];
    x[j] = xx;
  }
}

}  // namespace

extern "C" {

// returns compressed size in bytes, or -1 if dst capacity insufficient
int64_t rans_compress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap,
                      int nthreads) {
  uint64_t counts[256] = {0};
  for (int64_t i = 0; i < n; ++i) counts[src[i]]++;
  Table t;
  quantize(counts, t.freq);
  t.finish();

  uint32_t nchunks = (uint32_t)((n + CHUNK - 1) / CHUNK);
  if (n == 0) nchunks = 0;
  int64_t header = 4 + 4 + 8 + 256 * 2;
  if (cap < header) return -1;
  std::memcpy(dst, &MAGIC, 4);
  std::memcpy(dst + 4, &nchunks, 4);
  uint64_t raw = (uint64_t)n;
  std::memcpy(dst + 8, &raw, 8);
  std::memcpy(dst + 16, t.freq, 256 * 2);

  // worst case per chunk: every symbol emits one word
  std::vector<uint32_t> nwords(nchunks), rawlen(nchunks);
  std::vector<std::vector<uint16_t>> bufs(nchunks);
  std::vector<std::array<uint32_t, NWAY>> states(nchunks);
  int nt = std::max(1, std::min<int>(nthreads, (int)std::thread::hardware_concurrency()));
  nt = std::min<int>(nt, std::max(1u, nchunks));
  std::vector<std::thread> threads;
  std::atomic_bool fail{false};
  for (int ti = 0; ti < nt; ++ti) {
    threads.emplace_back([&, ti]() {
      for (uint32_t c = ti; c < nchunks; c += nt) {
        uint32_t len = (uint32_t)std::min<int64_t>(CHUNK, n - (int64_t)c * CHUNK);
        rawlen[c] = len;
        bufs[c].resize(len + 16);
        uint32_t nw = encode_chunk(src + (uint64_t)c * CHUNK, len, t,
                                   states[c].data(), bufs[c].data(), len + 16);
        if (nw == UINT32_MAX) { fail = true; return; }
        nwords[c] = nw;
      }
    });
  }
  for (auto& th : threads) th.join();
  if (fail) return -1;

  int64_t off = header;
  for (uint32_t c = 0; c < nchunks; ++c) {
    int64_t need = 4 + 4 + 4 * NWAY + 2 * (int64_t)nwords[c];
    if (off + need > cap) return -1;
    std::memcpy(dst + off, &nwords[c], 4); off += 4;
    std::memcpy(dst + off, &rawlen[c], 4); off += 4;
    std::memcpy(dst + off, states[c].data(), 4 * NWAY); off += 4 * NWAY;
    std::memcpy(dst + off, bufs[c].data(), 2 * (size_t)nwords[c]);
    off += 2 * (int64_t)nwords[c];
  }
  return off;
}

// returns decompressed size, or -1 on malformed input
int64_t rans_decompress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t outcap,
                        int nthreads) {
  if (n < 16 + 512) return -1;
  uint32_t magic, nchunks;
  uint64_t raw;
  std::memcpy(&magic, src, 4);
  if (magic != MAGIC) return -1;
  std::memcpy(&nchunks, src + 4, 4);
  std::memcpy(&raw, src + 8, 8);
  if ((int64_t)raw > outcap) return -1;
  Table t;
  std::memcpy(t.freq, src + 16, 512);
  uint32_t fsum = 0;
  for (int s = 0; s < 256; ++s) fsum += t.freq[s];
  if (fsum != PROB_SCALE) return -1;
  t.finish();

  struct ChunkRef { const uint16_t* words; uint32_t nwords, rawlen; uint32_t states[NWAY]; uint64_t out_off; };
  std::vector<ChunkRef> refs(nchunks);
  int64_t off = 16 + 512;
  uint64_t out_off = 0;
  for (uint32_t c = 0; c < nchunks; ++c) {
    if (off + 8 + 4 * NWAY > n) return -1;
    std::memcpy(&refs[c].nwords, src + off, 4); off += 4;
    std::memcpy(&refs[c].rawlen, src + off, 4); off += 4;
    std::memcpy(refs[c].states, src + off, 4 * NWAY); off += 4 * NWAY;
    refs[c].words = (const uint16_t*)(src + off);
    off += 2 * (int64_t)refs[c].nwords;
    if (off > n) return -1;
    refs[c].out_off = out_off;
    out_off += refs[c].rawlen;
  }
  if (out_off != raw) return -1;

  int nt = std::max(1, std::min<int>(nthreads, (int)std::thread::hardware_concurrency()));
  nt = std::min<int>(nt, std::max(1u, nchunks));
  std::vector<std::thread> threads;
  for (int ti = 0; ti < nt; ++ti) {
    threads.emplace_back([&, ti]() {
      for (uint32_t c = ti; c < nchunks; c += nt)
        decode_chunk(refs[c].words, refs[c].nwords, refs[c].states, t,
                     dst + refs[c].out_off, refs[c].rawlen);
    });
  }
  for (auto& th : threads) th.join();
  return (int64_t)raw;
}

}  // extern "C"
