// GDeflate-architecture paged codec: DEFLATE-class LZ77 + canonical
// Huffman entropy coding with the bitstream INTERLEAVED round-robin
// across 32 sub-streams, so 32 SIMT lanes (or host threads) can run the
// entropy-decode phase in parallel and only the LZ copy phase is
// sequential — the structural property nvCOMP's GDeflate GPU decoder
// exploits (≙ nvcomp/native/gdeflate_cpu.h compressCPU/decompressCPU,
// nvCOMP/examples/gdeflate_cpu_compression.cu:63-71).
//
// This is NOT the DirectStorage GDeflate bitstream (no public conformance
// target exists in this environment); it is an original implementation of
// the same architecture: one shared Huffman table pair per 64 KB page,
// tokens (literal | length+distance with DEFLATE's extra-bit buckets)
// assigned to sub-stream (token_index % 32), each sub-stream
// self-delimiting so lane decodes are independent.
//
// Page layout:
//   u32 raw_size | u32 token_count | u8 lens[(286+30+1)/2] (4-bit code
//   lengths, litlen then dist) | u16 stream_bytes[32] | streams...
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int kLanes = 32;
constexpr int kNumLit = 286;   // 0-255 literals, 256 unused, 257+ lengths
constexpr int kNumDist = 30;
constexpr int kMaxBits = 15;

// DEFLATE length buckets (RFC 1951 3.2.5): code 257+i, base/extra
const uint16_t kLenBase[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
                               23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115,
                               131, 163, 195, 227, 258};
const uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                               2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
const uint16_t kDistBase[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
                                97, 129, 193, 257, 385, 513, 769, 1025, 1537,
                                2049, 3073, 4097, 6145, 8193, 12289, 16385,
                                24577};
const uint8_t kDistExtra[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
                                6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12,
                                13, 13};

int len_code(int len) {
  for (int i = 28; i >= 0; --i)
    if (len >= kLenBase[i]) return i;
  return 0;
}

int dist_code(int d) {
  for (int i = 29; i >= 0; --i)
    if (d >= kDistBase[i]) return i;
  return 0;
}

// ---- canonical length-limited Huffman ------------------------------

// Heap-based Huffman depths, then zlib-style overflow redistribution to
// cap at kMaxBits while keeping the Kraft sum exact.
void huff_lengths(const uint64_t* freq, int n, uint8_t* lens) {
  struct Node { uint64_t f; int left, right; };
  std::vector<Node> nodes;
  std::vector<int> heap;
  for (int i = 0; i < n; ++i) {
    lens[i] = 0;
    if (freq[i]) {
      heap.push_back((int)nodes.size());
      nodes.push_back({freq[i], -1 - i, -1 - i});
    }
  }
  if (heap.empty()) return;
  if (heap.size() == 1) {  // single used symbol still needs 1 bit
    lens[-1 - nodes[heap[0]].left] = 1;
    return;
  }
  auto cmp = [&](int a, int b) { return nodes[a].f > nodes[b].f; };
  std::make_heap(heap.begin(), heap.end(), cmp);
  while (heap.size() > 1) {
    std::pop_heap(heap.begin(), heap.end(), cmp);
    int a = heap.back(); heap.pop_back();
    std::pop_heap(heap.begin(), heap.end(), cmp);
    int b = heap.back(); heap.pop_back();
    nodes.push_back({nodes[a].f + nodes[b].f, a, b});
    heap.push_back((int)nodes.size() - 1);
    std::push_heap(heap.begin(), heap.end(), cmp);
  }
  // depth-first depths (iterative)
  std::vector<std::pair<int, int>> stk{{heap[0], 0}};
  int bl_count[64] = {0};
  while (!stk.empty()) {
    auto [id, d] = stk.back(); stk.pop_back();
    const Node& nd = nodes[id];
    if (nd.left < 0) {
      int depth = d < 1 ? 1 : d;
      lens[-1 - nd.left] = (uint8_t)std::min(depth, 63);
      bl_count[std::min(depth, 63)]++;
    } else {
      stk.push_back({nd.left, d + 1});
      stk.push_back({nd.right, d + 1});
    }
  }
  // overflow redistribution (cap at kMaxBits)
  int overflow = 0;
  for (int b = kMaxBits + 1; b < 64; ++b) overflow += bl_count[b];
  if (overflow) {
    for (int b = kMaxBits + 1; b < 64; ++b) bl_count[b] = 0;
    bl_count[kMaxBits] += overflow;
    // fix Kraft: while over-subscribed, move one code from bits-1 deeper
    auto kraft = [&]() {
      long long s = 0;
      for (int b = 1; b <= kMaxBits; ++b)
        s += (long long)bl_count[b] << (kMaxBits - b);
      return s;
    };
    while (kraft() > (1LL << kMaxBits)) {
      int b = kMaxBits - 1;
      while (bl_count[b] == 0) --b;
      bl_count[b]--;
      bl_count[b + 1] += 2;
      bl_count[kMaxBits]--;  // one overflow code absorbed at b+1
    }
    // reassign lengths by frequency order: rarest symbols get longest
    std::vector<int> used;
    for (int i = 0; i < n; ++i)
      if (lens[i]) used.push_back(i);
    std::sort(used.begin(), used.end(), [&](int a, int b2) {
      return freq[a] < freq[b2];
    });
    int idx = 0;
    for (int b = kMaxBits; b >= 1 && idx < (int)used.size(); --b)
      for (int c = 0; c < bl_count[b] && idx < (int)used.size(); ++c)
        lens[used[idx++]] = (uint8_t)b;
  }
}

// canonical codes from lengths (RFC 1951 3.2.2 ordering)
void huff_codes(const uint8_t* lens, int n, uint16_t* codes) {
  int bl_count[kMaxBits + 1] = {0};
  for (int i = 0; i < n; ++i) bl_count[lens[i]]++;
  bl_count[0] = 0;
  uint32_t next[kMaxBits + 2] = {0};
  uint32_t code = 0;
  for (int b = 1; b <= kMaxBits; ++b) {
    code = (code + bl_count[b - 1]) << 1;
    next[b] = code;
  }
  for (int i = 0; i < n; ++i)
    codes[i] = lens[i] ? (uint16_t)next[lens[i]]++ : 0;
}

// ---- per-lane bit IO (MSB-first, self-delimiting streams) ----------

struct BitWriter {
  std::vector<uint8_t> bytes;
  uint32_t acc = 0;
  int nbits = 0;
  void put(uint32_t v, int bits) {
    acc = (acc << bits) | (v & ((1u << bits) - 1));
    nbits += bits;
    while (nbits >= 8) {
      bytes.push_back((uint8_t)(acc >> (nbits - 8)));
      nbits -= 8;
    }
  }
  void flush() {
    if (nbits) {
      bytes.push_back((uint8_t)(acc << (8 - nbits)));
      nbits = 0;
    }
    acc = 0;
  }
};

struct BitReader {
  const uint8_t* p;
  int64_t n, pos = 0;
  uint32_t acc = 0;
  int nbits = 0;
  uint32_t get(int bits) {
    while (nbits < bits) {
      acc = (acc << 8) | (pos < n ? p[pos++] : 0);
      nbits += 8;
    }
    uint32_t v = (acc >> (nbits - bits)) & ((1u << bits) - 1);
    nbits -= bits;
    return v;
  }
};

struct CanonDecoder {
  // canonical first-code decode: per bit-length, first code + symbol base
  uint32_t first[kMaxBits + 2];
  int offs[kMaxBits + 2];
  std::vector<uint16_t> symbols;
  void build(const uint8_t* lens, int n) {
    int bl_count[kMaxBits + 1] = {0};
    for (int i = 0; i < n; ++i) bl_count[lens[i]]++;
    bl_count[0] = 0;
    uint32_t code = 0;
    int off = 0;
    symbols.clear();
    for (int b = 1; b <= kMaxBits; ++b) {
      code = (code + bl_count[b - 1]) << 1;
      first[b] = code;
      offs[b] = off;
      off += bl_count[b];
    }
    symbols.resize(off);
    std::vector<int> next(kMaxBits + 1, 0);
    for (int b = 1; b <= kMaxBits; ++b) next[b] = offs[b];
    for (int i = 0; i < n; ++i)
      if (lens[i]) symbols[next[lens[i]]++] = (uint16_t)i;
  }
  int decode(BitReader& br) const {
    uint32_t code = 0;
    for (int b = 1; b <= kMaxBits; ++b) {
      code = (code << 1) | br.get(1);
      int cnt = offs[b] + (int)(code - first[b]);
      if (b < kMaxBits) {
        // valid iff code < first[b] + count_at_b
        int count = (b + 1 <= kMaxBits ? offs[b + 1] : (int)symbols.size())
                    - offs[b];
        if ((int)(code - first[b]) < count && code >= first[b])
          return symbols[cnt];
      } else {
        if (cnt >= 0 && cnt < (int)symbols.size()) return symbols[cnt];
      }
    }
    return -1;
  }
};

struct Token { uint16_t litlen; uint16_t lenval; uint16_t dist; };

// greedy hash-chain LZ77 (window = page, capped at DEFLATE's 32 KB)
void lz77(const uint8_t* src, int64_t n, std::vector<Token>& out) {
  constexpr int kHashBits = 15;
  constexpr int kMaxChain = 64;
  std::vector<int32_t> head(1 << kHashBits, -1);
  std::vector<int32_t> prev(n > 0 ? n : 1, -1);
  auto hash3 = [&](int64_t i) {
    return (uint32_t)(src[i] | (src[i + 1] << 8) | (src[i + 2] << 16))
           * 2654435761u >> (32 - kHashBits);
  };
  int64_t i = 0;
  while (i < n) {
    int best_len = 0, best_dist = 0;
    if (i + 3 <= n) {
      uint32_t h = hash3(i);
      int32_t cand = head[h];
      int chain = 0;
      while (cand >= 0 && chain++ < kMaxChain) {
        int64_t d = i - cand;
        if (d > 24577 + 8191) break;  // beyond last dist bucket span
        int maxl = (int)std::min<int64_t>(258, n - i);
        int l = 0;
        while (l < maxl && src[cand + l] == src[i + l]) ++l;
        if (l > best_len) { best_len = l; best_dist = (int)d; }
        cand = prev[cand];
      }
      head[h] = (int32_t)i;
      prev[i] = -1;
    }
    if (best_len >= 3) {
      out.push_back({(uint16_t)(257 + len_code(best_len)),
                     (uint16_t)best_len, (uint16_t)best_dist});
      // insert hash entries inside the match (cheap variant: every pos)
      for (int64_t j = i + 1; j < i + best_len && j + 3 <= n; ++j) {
        uint32_t h = hash3(j);
        prev[j] = head[h];
        head[h] = (int32_t)j;
      }
      i += best_len;
    } else {
      out.push_back({src[i], 0, 0});
      ++i;
    }
  }
}

}  // namespace

extern "C" {

// returns compressed bytes, or -1 on error / insufficient capacity
int64_t gdef_compress(const uint8_t* src, int64_t n,
                      uint8_t* dst, int64_t cap) {
  if (n < 0 || n > 65536) return -1;
  std::vector<Token> toks;
  lz77(src, n, toks);
  uint64_t freq_ll[kNumLit] = {0};
  uint64_t freq_d[kNumDist] = {0};
  for (const Token& t : toks) {
    freq_ll[t.litlen]++;
    if (t.litlen >= 257) freq_d[dist_code(t.dist)]++;
  }
  uint8_t lens[kNumLit + kNumDist] = {0};
  huff_lengths(freq_ll, kNumLit, lens);
  huff_lengths(freq_d, kNumDist, lens + kNumLit);
  uint16_t codes_ll[kNumLit], codes_d[kNumDist];
  huff_codes(lens, kNumLit, codes_ll);
  huff_codes(lens + kNumLit, kNumDist, codes_d);

  // round-robin interleave across 32 lane streams
  BitWriter lanes[kLanes];
  for (size_t k = 0; k < toks.size(); ++k) {
    BitWriter& w = lanes[k % kLanes];
    const Token& t = toks[k];
    w.put(codes_ll[t.litlen], lens[t.litlen]);
    if (t.litlen >= 257) {
      int lc = t.litlen - 257;
      w.put((uint32_t)(t.lenval - kLenBase[lc]), kLenExtra[lc]);
      int dc = dist_code(t.dist);
      w.put(codes_d[dc], lens[kNumLit + dc]);
      w.put((uint32_t)(t.dist - kDistBase[dc]), kDistExtra[dc]);
    }
  }
  int64_t header = 4 + 4 + (kNumLit + kNumDist + 1) / 2 + 2 * kLanes;
  int64_t total = header;
  for (int l = 0; l < kLanes; ++l) {
    lanes[l].flush();
    total += (int64_t)lanes[l].bytes.size();
  }
  if (total > cap) return -1;
  uint8_t* p = dst;
  uint32_t rs = (uint32_t)n, tc = (uint32_t)toks.size();
  std::memcpy(p, &rs, 4); p += 4;
  std::memcpy(p, &tc, 4); p += 4;
  for (int i = 0; i < kNumLit + kNumDist; i += 2)
    *p++ = (uint8_t)(lens[i] | (i + 1 < kNumLit + kNumDist
                                ? lens[i + 1] << 4 : 0));
  for (int l = 0; l < kLanes; ++l) {
    uint16_t sb = (uint16_t)lanes[l].bytes.size();
    std::memcpy(p, &sb, 2); p += 2;
  }
  for (int l = 0; l < kLanes; ++l) {
    std::memcpy(p, lanes[l].bytes.data(), lanes[l].bytes.size());
    p += lanes[l].bytes.size();
  }
  return total;
}

// returns raw bytes written, or -1 on malformed/overflow
int64_t gdef_decompress(const uint8_t* src, int64_t n,
                        uint8_t* dst, int64_t cap) {
  const int64_t hdr = 4 + 4 + (kNumLit + kNumDist + 1) / 2 + 2 * kLanes;
  if (n < hdr) return -1;
  uint32_t raw, tc;
  std::memcpy(&raw, src, 4);
  std::memcpy(&tc, src + 4, 4);
  if ((int64_t)raw > cap || raw > 65536 || tc > 131072) return -1;
  uint8_t lens[kNumLit + kNumDist];
  const uint8_t* p = src + 8;
  for (int i = 0; i < kNumLit + kNumDist; i += 2) {
    lens[i] = (uint8_t)(*p & 0xF);
    if (i + 1 < kNumLit + kNumDist) lens[i + 1] = (uint8_t)(*p >> 4);
    ++p;
  }
  // 4-bit header caps lengths at 15 == kMaxBits by construction
  uint16_t stream_bytes[kLanes];
  int64_t stream_off[kLanes];
  int64_t off = hdr;
  for (int l = 0; l < kLanes; ++l) {
    std::memcpy(&stream_bytes[l], p, 2); p += 2;
    stream_off[l] = off;
    off += stream_bytes[l];
  }
  if (off > n) return -1;
  CanonDecoder dec_ll, dec_d;
  dec_ll.build(lens, kNumLit);
  dec_d.build(lens + kNumLit, kNumDist);

  // PHASE 1 — per-lane entropy decode, each lane independent (the
  // parallelizable phase; a SIMT decoder runs these 32 in lockstep)
  std::vector<Token> lane_toks[kLanes];
  for (int l = 0; l < kLanes; ++l) {
    BitReader br{src + stream_off[l], stream_bytes[l]};
    uint32_t cnt = tc / kLanes + ((uint32_t)l < tc % kLanes ? 1 : 0);
    lane_toks[l].reserve(cnt);
    for (uint32_t k = 0; k < cnt; ++k) {
      int s = dec_ll.decode(br);
      if (s < 0) return -1;
      if (s < 257) {
        lane_toks[l].push_back({(uint16_t)s, 0, 0});
      } else {
        int lc = s - 257;
        int len = kLenBase[lc] + (int)br.get(kLenExtra[lc]);
        int dc = dec_d.decode(br);
        if (dc < 0) return -1;
        int d = kDistBase[dc] + (int)br.get(kDistExtra[dc]);
        lane_toks[l].push_back({(uint16_t)s, (uint16_t)len, (uint16_t)d});
      }
    }
  }

  // PHASE 2 — sequential LZ reconstruction in round-robin token order
  int64_t w = 0;
  size_t idx[kLanes] = {0};
  for (uint32_t k = 0; k < tc; ++k) {
    const Token& t = lane_toks[k % kLanes][idx[k % kLanes]++];
    if (t.litlen < 257) {
      if (w >= (int64_t)raw) return -1;
      dst[w++] = (uint8_t)t.litlen;
    } else {
      if (t.dist <= 0 || t.dist > w || w + t.lenval > (int64_t)raw)
        return -1;
      for (int j = 0; j < t.lenval; ++j, ++w)  // overlapping copies OK
        dst[w] = dst[w - t.dist];
    }
  }
  return w == (int64_t)raw ? w : -1;
}

}  // extern "C"
