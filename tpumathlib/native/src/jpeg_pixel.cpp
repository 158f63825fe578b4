// JPEG pixel pipeline, C++ host side (the backend="native" engine of
// tpumathlib/image/jpeg.py jfif_decode/jfif_encode).
//
// ≙ nvJPEG's CPU-only backend pixel stage (NVJPEG_BACKEND_CPU_ONLY —
// /root/reference/nvJPEG/nvJPEG-Decoder/nvjpegDecoder.cpp decoupled
// decoupled-phase decode): dequant + 8x8 IDCT + upsample + YCbCr->RGB
// on decode; RGB->YCbCr + chroma pooling + 8x8 FDCT + quantization on
// encode. The jit (XLA) pipeline in image/jpeg.py stays the device
// path; this engine exists because on a host whose accelerator sits
// behind a high-latency tunnel the pixel stage belongs next to the
// entropy stage.
//
// The 2-D DCT/IDCT run as two 8x8 matrix-multiply passes with the same
// orthonormal DCT-II matrix the jit pipeline uses (image/jpeg.py
// _dct_matrix), so the two engines agree to float rounding (+-1 LSB
// after quantization); rounding is nearbyintf = round-half-even,
// matching jnp.round.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct DctM {
  float d[8][8];    // D[i][j]: orthonormal DCT-II matrix
  DctM() {
    for (int i = 0; i < 8; i++)
      for (int j = 0; j < 8; j++)
        d[i][j] = (i == 0 ? std::sqrt(1.0 / 8.0)
                          : std::sqrt(2.0 / 8.0) *
                                std::cos((2 * j + 1) * i * M_PI / 16.0));
  }
};
static const DctM DCT;

// JFIF zigzag order: ZZ[k] = natural index of the k-th zigzag coeff.
struct Zig {
  int zz[64];
  Zig() {
    // the standard JFIF zigzag (image/jpeg.py _JFIF_ZZ): odd diagonals
    // run i ascending, even diagonals i descending
    int k = 0;
    for (int s = 0; s < 15; s++) {
      if (s % 2) {
        for (int i = 0; i < 8; i++) {
          int j = s - i;
          if (j >= 0 && j < 8) zz[k++] = i * 8 + j;
        }
      } else {
        for (int i = 7; i >= 0; i--) {
          int j = s - i;
          if (j >= 0 && j < 8) zz[k++] = i * 8 + j;
        }
      }
    }
  }
};
static const Zig ZIG;

// out8x8 = D^T * in * D  (the IDCT sandwich: einsum("ji,jk,kl->il"))
static inline void idct8x8(const float in[64], float out[64]) {
  float t[64];
  // t = D^T * in : t[i][j] = sum_k D[k][i] * in[k][j]
  for (int i = 0; i < 8; i++) {
    float row[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int k = 0; k < 8; k++) {
      float dk = DCT.d[k][i];
      for (int j = 0; j < 8; j++) row[j] += dk * in[k * 8 + j];
    }
    std::memcpy(t + i * 8, row, sizeof row);
  }
  // out = t * D : out[i][j] = sum_k t[i][k] * D[k][j]
  for (int i = 0; i < 8; i++) {
    float row[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int k = 0; k < 8; k++) {
      float tk = t[i * 8 + k];
      for (int j = 0; j < 8; j++) row[j] += tk * DCT.d[k][j];
    }
    std::memcpy(out + i * 8, row, sizeof row);
  }
}

// out8x8 = D * in * D^T  (the FDCT sandwich: einsum("ij,jk,lk->il"))
static inline void fdct8x8(const float in[64], float out[64]) {
  float t[64];
  for (int i = 0; i < 8; i++) {
    float row[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int k = 0; k < 8; k++) {
      float dk = DCT.d[i][k];
      for (int j = 0; j < 8; j++) row[j] += dk * in[k * 8 + j];
    }
    std::memcpy(t + i * 8, row, sizeof row);
  }
  for (int i = 0; i < 8; i++) {
    float row[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int k = 0; k < 8; k++) {
      float tk = t[i * 8 + k];
      for (int j = 0; j < 8; j++) row[j] += tk * DCT.d[j][k];
    }
    std::memcpy(out + i * 8, row, sizeof row);
  }
}

static inline float clamp255(float v) {
  return v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
}

}  // namespace

extern "C" {

// Dequant + IDCT + level shift + round&clamp of one component plane.
// zz: (nby*nbx, 64) int32 coefficients in JFIF zigzag order;
// q: 64 floats, NATURAL order. plane out: (nby*8, nbx*8) floats already
// rounded to integers in [0, 255] (the per-plane saturation the jit
// pipeline applies before the color transform).
int jpeg_idct_plane(const int32_t* zz, const float* q, int64_t nby,
                    int64_t nbx, float* plane) {
  if (nby <= 0 || nbx <= 0) return -1;
  const int64_t stride = nbx * 8;
  float co[64], px[64], dq[64];
  for (int k = 0; k < 64; k++) dq[k] = q[ZIG.zz[k]];  // dequant in zigzag
  for (int64_t by = 0; by < nby; by++) {
    for (int64_t bx = 0; bx < nbx; bx++) {
      const int32_t* src = zz + (by * nbx + bx) * 64;
      for (int k = 0; k < 64; k++) co[ZIG.zz[k]] = (float)src[k] * dq[k];
      idct8x8(co, px);
      float* dst = plane + (by * 8) * stride + bx * 8;
      for (int r = 0; r < 8; r++)
        for (int c = 0; c < 8; c++)
          dst[r * stride + c] = clamp255(nearbyintf(px[r * 8 + c] + 128.0f));
    }
  }
  return 0;
}

// Upsample + color transform + uint8 interleave. planes: Y (and Cb, Cr
// when ncomp == 3) as float planes from jpeg_idct_plane; per-component
// geometry (ph, pw) plane dims, (sy, sx) upsample factors, (oy, ox)
// crop offsets. ycc != 0 applies the BT.601 YCbCr->RGB transform
// (image/jpeg.py ycbcr_to_rgb); ycc == 0 emits components as-is (the
// Adobe transform=0 / RGB case). out: (rh, rw, ncomp) uint8 (ncomp==1
// gives a (rh, rw) plane).
int jpeg_color_out(const float* p0, const float* p1, const float* p2,
                   const int64_t* geom /* ncomp x 6: ph pw sy sx oy ox */,
                   int ncomp, int64_t rh, int64_t rw, int ycc,
                   uint8_t* out) {
  if (ncomp != 1 && ncomp != 3) return -1;
  const float* planes[3] = {p0, p1, p2};
  if (ncomp == 1) {
    const int64_t pw = geom[1], sy = geom[2], sx = geom[3], oy = geom[4],
                  ox = geom[5];
    for (int64_t y = 0; y < rh; y++) {
      const float* row = p0 + ((y + oy) / sy) * pw;
      if (sx == 1) {
        for (int64_t x = 0; x < rw; x++)
          out[y * rw + x] = (uint8_t)row[x + ox];
      } else {
        for (int64_t x = 0; x < rw; x++)
          out[y * rw + x] = (uint8_t)row[(x + ox) / sx];
      }
    }
    return 0;
  }
  // 3 components: precompute per-component column index tables (kills
  // the per-pixel integer division), then gather rows per y
  std::vector<int32_t> xi(3 * (size_t)rw);
  for (int c = 0; c < 3; c++) {
    const int64_t sx = geom[c * 6 + 3], ox = geom[c * 6 + 5];
    int32_t* t = xi.data() + c * rw;
    for (int64_t x = 0; x < rw; x++) t[x] = (int32_t)((x + ox) / sx);
  }
  const int32_t* x0 = xi.data();
  const int32_t* x1 = xi.data() + rw;
  const int32_t* x2 = xi.data() + 2 * rw;
  for (int64_t y = 0; y < rh; y++) {
    const float* rows[3];
    for (int c = 0; c < 3; c++) {
      const int64_t pw = geom[c * 6 + 1], sy = geom[c * 6 + 2],
                    oy = geom[c * 6 + 4];
      rows[c] = planes[c] + ((y + oy) / sy) * pw;
    }
    uint8_t* orow = out + y * rw * 3;
    if (ycc) {
      for (int64_t x = 0; x < rw; x++) {
        float yv = rows[0][x0[x]];
        float cb = rows[1][x1[x]] - 128.0f;
        float cr = rows[2][x2[x]] - 128.0f;
        orow[x * 3 + 0] = (uint8_t)clamp255(nearbyintf(yv + 1.402f * cr));
        orow[x * 3 + 1] = (uint8_t)clamp255(
            nearbyintf(yv - 0.344136f * cb - 0.714136f * cr));
        orow[x * 3 + 2] = (uint8_t)clamp255(nearbyintf(yv + 1.772f * cb));
      }
    } else {
      for (int64_t x = 0; x < rw; x++) {
        orow[x * 3 + 0] = (uint8_t)rows[0][x0[x]];
        orow[x * 3 + 1] = (uint8_t)rows[1][x1[x]];
        orow[x * 3 + 2] = (uint8_t)rows[2][x2[x]];
      }
    }
  }
  return 0;
}

// RGB (or gray) -> Y/Cb/Cr float planes with mean-pooled chroma
// (image/jpeg.py rgb_to_ycbcr + _pool). img: (h, w, 3) uint8; y out
// (h, w); cb/cr out (h/sy, w/sx) — h, w divisible by the factors
// (jfif_encode pads first).
int jpeg_rgb_ycc_pool(const uint8_t* img, int64_t h, int64_t w,
                      int64_t sx, int64_t sy, float* yp, float* cb,
                      float* cr) {
  if (h % sy || w % sx) return -1;
  const int64_t cw = w / sx;
  const float inv = 1.0f / (float)(sx * sy);
  // accumulate chroma into the pooled grid
  std::memset(cb, 0, sizeof(float) * (h / sy) * cw);
  std::memset(cr, 0, sizeof(float) * (h / sy) * cw);
  for (int64_t y = 0; y < h; y++) {
    const uint8_t* row = img + y * w * 3;
    float* yrow = yp + y * w;
    float* cbrow = cb + (y / sy) * cw;
    float* crrow = cr + (y / sy) * cw;
    for (int64_t x = 0; x < w; x++) {
      float r = row[x * 3], g = row[x * 3 + 1], b = row[x * 3 + 2];
      yrow[x] = 0.299f * r + 0.587f * g + 0.114f * b;
      cbrow[x / sx] += 128.0f - 0.168736f * r - 0.331264f * g + 0.5f * b;
      crrow[x / sx] += 128.0f + 0.5f * r - 0.418688f * g - 0.081312f * b;
    }
  }
  for (int64_t i = 0; i < (h / sy) * cw; i++) {
    cb[i] *= inv;
    cr[i] *= inv;
  }
  return 0;
}

// Level shift + FDCT + quantize + zigzag of one plane. plane: (nby*8,
// nbx*8) floats; q: 64 floats NATURAL order (the integer table);
// out: (nby*nbx, 64) int32 in zigzag order.
int jpeg_fdct_plane(const float* plane, const float* q, int64_t nby,
                    int64_t nbx, int32_t* out) {
  if (nby <= 0 || nbx <= 0) return -1;
  const int64_t stride = nbx * 8;
  float in[64], co[64], qinv[64];
  for (int k = 0; k < 64; k++) qinv[k] = 1.0f / q[k];
  for (int64_t by = 0; by < nby; by++) {
    for (int64_t bx = 0; bx < nbx; bx++) {
      const float* src = plane + (by * 8) * stride + bx * 8;
      for (int r = 0; r < 8; r++)
        for (int c = 0; c < 8; c++)
          in[r * 8 + c] = src[r * stride + c] - 128.0f;
      fdct8x8(in, co);
      int32_t* dst = out + (by * nbx + bx) * 64;
      for (int k = 0; k < 64; k++)
        dst[k] = (int32_t)nearbyintf(co[ZIG.zz[k]] * qinv[ZIG.zz[k]]);
    }
  }
  return 0;
}

// Gray-image level path for encode: uint8 plane -> float plane.
int jpeg_u8_to_f32(const uint8_t* img, int64_t n, float* out) {
  for (int64_t i = 0; i < n; i++) out[i] = (float)img[i];
  return 0;
}

}  // extern "C"
