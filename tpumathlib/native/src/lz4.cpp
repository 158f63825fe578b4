// LZ4 block-format codec — the native compression component
// (≙ nvCOMP's LZ4 batched codec; the chunked batch layer lives in
// tpumathlib.comp). Independent implementation of the public LZ4 block
// format (token | literals | offset | matchlen), compatible with liblz4
// block decompression.

#include <cstdint>
#include <cstring>

extern "C" {

static const int MINMATCH = 4;
static const int HASH_LOG = 16;

static inline uint32_t hash4(const uint8_t* p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return (v * 2654435761u) >> (32 - HASH_LOG);
}

// Compress src[0..n) into dst (capacity dst_cap). Returns compressed size,
// or -1 if it did not fit.
int64_t lz4_compress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t dst_cap) {
    int64_t table[1 << HASH_LOG];
    for (auto& t : table) t = -1;
    int64_t ip = 0, op = 0, anchor = 0;
    const int64_t mflimit = n - 12;  // LZ4 end-of-block rules

    while (ip < mflimit) {
        int64_t match = -1;
        if (ip + 4 <= n) {
            uint32_t h = hash4(src + ip);
            int64_t cand = table[h];
            table[h] = ip;
            if (cand >= 0 && ip - cand <= 65535 &&
                memcmp(src + cand, src + ip, 4) == 0)
                match = cand;
        }
        if (match < 0) { ip++; continue; }
        // extend match
        int64_t mlen = 4;
        while (ip + mlen < n - 5 && src[match + mlen] == src[ip + mlen]) mlen++;
        int64_t litlen = ip - anchor;
        // token + literals
        int64_t need = 1 + litlen + litlen / 255 + 1 + 2 + mlen / 255 + 1;
        if (op + need >= dst_cap) return -1;
        uint8_t* token = dst + op++;
        if (litlen >= 15) {
            *token = 0xF0;
            int64_t rem = litlen - 15;
            while (rem >= 255) { dst[op++] = 255; rem -= 255; }
            dst[op++] = (uint8_t)rem;
        } else {
            *token = (uint8_t)(litlen << 4);
        }
        memcpy(dst + op, src + anchor, litlen);
        op += litlen;
        // offset
        uint16_t off = (uint16_t)(ip - match);
        dst[op++] = off & 0xFF;
        dst[op++] = off >> 8;
        // match length
        int64_t mrem = mlen - MINMATCH;
        if (mrem >= 15) {
            *token |= 0x0F;
            mrem -= 15;
            while (mrem >= 255) { dst[op++] = 255; mrem -= 255; }
            dst[op++] = (uint8_t)mrem;
        } else {
            *token |= (uint8_t)mrem;
        }
        ip += mlen;
        anchor = ip;
    }
    // final literals
    int64_t litlen = n - anchor;
    if (op + 1 + litlen + litlen / 255 + 1 >= dst_cap) return -1;
    uint8_t* token = dst + op++;
    if (litlen >= 15) {
        *token = 0xF0;
        int64_t rem = litlen - 15;
        while (rem >= 255) { dst[op++] = 255; rem -= 255; }
        dst[op++] = (uint8_t)rem;
    } else {
        *token = (uint8_t)(litlen << 4);
    }
    memcpy(dst + op, src + anchor, litlen);
    op += litlen;
    return op;
}

// Decompress exactly dst_n bytes. Returns bytes consumed from src, or <0 on
// malformed input.
int64_t lz4_decompress(const uint8_t* src, int64_t src_n, uint8_t* dst, int64_t dst_n) {
    int64_t ip = 0, op = 0;
    while (ip < src_n && op < dst_n) {
        uint8_t token = src[ip++];
        int64_t litlen = token >> 4;
        if (litlen == 15) {
            uint8_t b;
            do { if (ip >= src_n) return -2; b = src[ip++]; litlen += b; } while (b == 255);
        }
        if (ip + litlen > src_n || op + litlen > dst_n) return -3;
        memcpy(dst + op, src + ip, litlen);
        ip += litlen;
        op += litlen;
        if (op >= dst_n) break;  // last block has no match part
        if (ip + 2 > src_n) return -4;
        uint16_t off = src[ip] | (src[ip + 1] << 8);
        ip += 2;
        if (off == 0 || off > op) return -5;
        int64_t mlen = (token & 0x0F);
        if (mlen == 15) {
            uint8_t b;
            do { if (ip >= src_n) return -6; b = src[ip++]; mlen += b; } while (b == 255);
        }
        mlen += MINMATCH;
        if (op + mlen > dst_n) return -7;
        for (int64_t i = 0; i < mlen; i++) { dst[op] = dst[op - off]; op++; }
    }
    return op == dst_n ? ip : -8;
}

// CRC32 (IEEE, reflected) — ≙ nvCOMP's nvcomp_crc32 extra.
uint32_t crc32_ieee(const uint8_t* data, int64_t n, uint32_t seed) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t c = i;
            for (int k = 0; k < 8; k++)
                c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
            table[i] = c;
        }
        init = true;
    }
    uint32_t crc = ~seed;
    for (int64_t i = 0; i < n; i++)
        crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
    return ~crc;
}

}  // extern "C"
