// framepipe: native host-side frame preprocessing for the TPU feed path.
//
// The reference delegates its host pipeline to library native code
// (cv2.VideoCapture decode, torchvision normalize — SURVEY.md section 2b);
// this library is the first-party TPU-host equivalent for the CPU-heavy
// per-frame work that would otherwise bottleneck a >500 fps device feed:
//
//   * fp_resize_half      4K -> 1080p 2x2 box downsample (mp_loader.py:236)
//   * fp_normalize        uint8 -> ImageNet-normalized float32
//                         (mp_loader.py:237-239)
//   * fp_preprocess       fused resize+normalize, multi-threaded
//   * fp_parse_timestamp  burned-in pixel-timestamp checksum decode
//                         (timestamp_utilities.py:46-115)
//
//   * fp_s2d_u8            uint8 space-to-depth pack (device-layout, no float)
//   * fp_preprocess_s2d_u8 fused 4K->1080p downsample + s2d pack, uint8 out
//                          (the shipped feed path: frames travel uint8,
//                          normalization happens on-device in the s2d stem)
//   * fp_yuv420_to_rgb     BT.601 limited-range YUV420->RGB (y4m decode tail,
//                          fixed-point match of data/video.py:268-276)
//   * fp_yuv420_to_s2d_u8  fused y4m decode tail: YUV420 -> RGB -> s2d pack
//                          in one pass (no RGB frame materialized)
//   * fp_yuv420_half_to_s2d_u8  fused 4K y4m tail: YUV420 -> 2x2 box
//                          downsample in YUV space -> RGB -> s2d pack
//                          (one pass; the 4K->1080p feed at ~1.5 B/px read)
//   * fp_plane_half        2x2 box downsample of one 8-bit plane (4K
//                          emit='yuv420': quarter-size planes to device)
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (produces libframepipe.so)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__AVX512VBMI__) && defined(__AVX512BW__)
#include <immintrin.h>
#define FP_AVX512 1
#endif

extern "C" {

// 2x2 box downsample: in [h,w,3] uint8 -> out [h/2,w/2,3] uint8
void fp_resize_half(const uint8_t* in, uint8_t* out, int h, int w) {
  const int oh = h / 2, ow = w / 2;
  for (int y = 0; y < oh; ++y) {
    const uint8_t* r0 = in + (size_t)(2 * y) * w * 3;
    const uint8_t* r1 = r0 + (size_t)w * 3;
    uint8_t* o = out + (size_t)y * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const int i = 6 * x;
      for (int c = 0; c < 3; ++c) {
        o[3 * x + c] =
            (uint8_t)((r0[i + c] + r0[i + 3 + c] + r1[i + c] + r1[i + 3 + c] + 2) >> 2);
      }
    }
  }
}

static void normalize_rows(const uint8_t* in, float* out, int w, int y0,
                           int y1, const float* scale, const float* shift) {
  for (int y = y0; y < y1; ++y) {
    const uint8_t* r = in + (size_t)y * w * 3;
    float* o = out + (size_t)y * w * 3;
    for (int x = 0; x < w * 3; x += 3) {
      o[x] = r[x] * scale[0] + shift[0];
      o[x + 1] = r[x + 1] * scale[1] + shift[1];
      o[x + 2] = r[x + 2] * scale[2] + shift[2];
    }
  }
}

// uint8 [h,w,3] -> float32 [h,w,3], out = (in/255 - mean) / std, threaded
void fp_normalize(const uint8_t* in, float* out, int h, int w,
                  const float* mean, const float* std_, int n_threads) {
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (255.0f * std_[c]);
    shift[c] = -mean[c] / std_[c];
  }
  if (n_threads <= 1) {
    normalize_rows(in, out, w, 0, h, scale, shift);
    return;
  }
  std::vector<std::thread> ts;
  const int rows = (h + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int y0 = t * rows;
    const int y1 = y0 + rows < h ? y0 + rows : h;
    if (y0 >= y1) break;
    ts.emplace_back(normalize_rows, in, out, w, y0, y1, scale, shift);
  }
  for (auto& th : ts) th.join();
}

// fused 2x downsample + normalize: in [h,w,3] uint8 (4K) ->
// out [h/2,w/2,3] float32 normalized, threaded over output rows
void fp_preprocess(const uint8_t* in, float* out, int h, int w,
                   const float* mean, const float* std_, int n_threads) {
  const int oh = h / 2, ow = w / 2;
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (4.0f * 255.0f * std_[c]);
    shift[c] = -mean[c] / std_[c];
  }
  auto rows_fn = [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      const uint8_t* r0 = in + (size_t)(2 * y) * w * 3;
      const uint8_t* r1 = r0 + (size_t)w * 3;
      float* o = out + (size_t)y * ow * 3;
      for (int x = 0; x < ow; ++x) {
        const int i = 6 * x;
        for (int c = 0; c < 3; ++c) {
          const int s = r0[i + c] + r0[i + 3 + c] + r1[i + c] + r1[i + 3 + c];
          o[3 * x + c] = s * scale[c] + shift[c];
        }
      }
    }
  };
  if (n_threads <= 1) {
    rows_fn(0, oh);
    return;
  }
  std::vector<std::thread> ts;
  const int rows = (oh + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int y0 = t * rows;
    const int y1 = y0 + rows < oh ? y0 + rows : oh;
    if (y0 >= y1) break;
    ts.emplace_back(rows_fn, y0, y1);
  }
  for (auto& th : ts) th.join();
}

// fused 2x downsample + normalize + space-to-depth(4x4) pack:
// in [h,w,3] uint8 (4K) -> out [h/8, w/8, 48] float32 normalized, packed for
// the TPU s2d stem (models/resnet.py): out[y, x, (by*4+bx)*3 + c] holds the
// normalized pixel of 1080p position (4y+by, 4x+bx).
void fp_preprocess_s2d(const uint8_t* in, float* out, int h, int w,
                       const float* mean, const float* std_, int n_threads) {
  const int oh1 = h / 2, ow1 = w / 2;     // 1080p intermediate
  const int oh = oh1 / 4, ow = ow1 / 4;   // packed grid
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (4.0f * 255.0f * std_[c]);
    shift[c] = -mean[c] / std_[c];
  }
  auto rows_fn = [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {        // packed row
      float* o = out + (size_t)y * ow * 48;
      for (int by = 0; by < 4; ++by) {     // 1080p row within the 4x4 block
        const int ry = (y * 4 + by) * 2;   // source 4K row (pre-downsample)
        const uint8_t* r0 = in + (size_t)ry * w * 3;
        const uint8_t* r1 = r0 + (size_t)w * 3;
        for (int x = 0; x < ow; ++x) {
          for (int bx = 0; bx < 4; ++bx) {
            const int i = ((x * 4 + bx) * 2) * 3;
            float* dst = o + (size_t)x * 48 + (by * 4 + bx) * 3;
            for (int c = 0; c < 3; ++c) {
              const int s =
                  r0[i + c] + r0[i + 3 + c] + r1[i + c] + r1[i + 3 + c];
              dst[c] = s * scale[c] + shift[c];
            }
          }
        }
      }
    }
  };
  if (n_threads <= 1) {
    rows_fn(0, oh);
    return;
  }
  std::vector<std::thread> ts;
  const int rows = (oh + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int y0 = t * rows;
    const int y1 = y0 + rows < oh ? y0 + rows : oh;
    if (y0 >= y1) break;
    ts.emplace_back(rows_fn, y0, y1);
  }
  for (auto& th : ts) th.join();
}

// space-to-depth(4x4) pack of an already-preprocessed float frame:
// in [h,w,3] float32 -> out [h/4, w/4, 48] float32
void fp_pack_s2d(const float* in, float* out, int h, int w, int n_threads) {
  const int oh = h / 4, ow = w / 4;
  auto rows_fn = [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      float* o = out + (size_t)y * ow * 48;
      for (int by = 0; by < 4; ++by) {
        const float* r = in + (size_t)(y * 4 + by) * w * 3;
        for (int x = 0; x < ow; ++x) {
          const float* src = r + (size_t)x * 12;  // 4 px * 3 ch
          float* dst = o + (size_t)x * 48 + by * 12;
          std::memcpy(dst, src, 12 * sizeof(float));
        }
      }
    }
  };
  if (n_threads <= 1) {
    rows_fn(0, oh);
    return;
  }
  std::vector<std::thread> ts;
  const int rows = (oh + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int y0 = t * rows;
    const int y1 = y0 + rows < oh ? y0 + rows : oh;
    if (y0 >= y1) break;
    ts.emplace_back(rows_fn, y0, y1);
  }
  for (auto& th : ts) th.join();
}

}  // extern "C" (helpers below need C++ linkage; exports reopen it)

// ---------------------------------------------------------------------------
// uint8 feed path (the shipped design: frames travel to the device as uint8
// s2d-packed tensors, normalization happens on-device in the s2d stem).
// Layout contract (matches playground3d_tpu.data.video.pack_s2d):
//   out[y, x, (by*4+bx)*3 + c] = src_1080p[4y+by, 4x+bx, c]
// ---------------------------------------------------------------------------

// generic row-parallel runner
template <typename F>
static void run_rows(int n_rows, int n_threads, F&& fn) {
  if (n_threads <= 1) {
    fn(0, n_rows);
    return;
  }
  std::vector<std::thread> ts;
  const int rows = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int y0 = t * rows;
    const int y1 = y0 + rows < n_rows ? y0 + rows : n_rows;
    if (y0 >= y1) break;
    ts.emplace_back(fn, y0, y1);
  }
  for (auto& th : ts) th.join();
}

// scatter one already-downsampled RGB row (w_row pixels = 3*w_row bytes)
// into the s2d block row `by` of packed output row `o` (w_row/4 blocks).
static inline void s2d_scatter_row(const uint8_t* row, uint8_t* o, int w_row,
                                   int by) {
  const int blocks = w_row / 4;
  uint8_t* dst = o + by * 12;
  for (int x = 0; x < blocks; ++x) {
    std::memcpy(dst + (size_t)x * 48, row + (size_t)x * 12, 12);
  }
}

// uint8 [h,w,3] -> uint8 [h/4, w/4, 48] s2d pack (no arithmetic)
extern "C" void fp_s2d_u8(const uint8_t* in, uint8_t* out, int h, int w,
                          int n_threads) {
  const int oh = h / 4, ow = w / 4;
  run_rows(oh, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      uint8_t* o = out + (size_t)y * ow * 48;
      for (int by = 0; by < 4; ++by) {
        s2d_scatter_row(in + (size_t)(y * 4 + by) * w * 3, o, ow * 4, by);
      }
    }
  });
}

// exact 2x2 box average of one interleaved-RGB row pair into a uint8 row:
// dst[3X+c] = (r0[6X+c] + r0[6X+3+c] + r1[6X+c] + r1[6X+3+c] + 2) >> 2.
static void downsample_row_u8_scalar(const uint8_t* r0, const uint8_t* r1,
                                     uint8_t* dst, int ow) {
  for (int X = 0; X < ow; ++X) {
    const uint8_t* p0 = r0 + 6 * X;
    const uint8_t* p1 = r1 + 6 * X;
    uint8_t* o = dst + 3 * X;
    o[0] = (uint8_t)((p0[0] + p0[3] + p1[0] + p1[3] + 2) >> 2);
    o[1] = (uint8_t)((p0[1] + p0[4] + p1[1] + p1[4] + 2) >> 2);
    o[2] = (uint8_t)((p0[2] + p0[5] + p1[2] + p1[5] + 2) >> 2);
  }
}

#ifdef FP_AVX512
// AVX512 exact 2x2 box average, two passes:
//  1. d[j] = (r0[j] + r0[j+3] + r1[j] + r1[j+3] + 2) >> 2 for every byte j
//     (elementwise widen-add-narrow; only bytes with j%6 < 3 are kept later)
//  2. select kept bytes dst[3X+c] = d[6X+c] with one VBMI permutex2var per
//     96 d-bytes (48 outputs).
static void downsample_row_u8_avx512(const uint8_t* r0, const uint8_t* r1,
                                     uint8_t* dst, int ow, uint8_t* dbuf) {
  const int n = ow * 6;  // source bytes consumed (pairs of pixels)
  int j = 0;
  // pass 1: d over all source bytes (32 at a time; +3 unaligned loads)
  for (; j + 35 <= n; j += 32) {
    __m512i a = _mm512_cvtepu8_epi16(_mm256_loadu_si256((const __m256i*)(r0 + j)));
    __m512i b = _mm512_cvtepu8_epi16(_mm256_loadu_si256((const __m256i*)(r0 + j + 3)));
    __m512i c = _mm512_cvtepu8_epi16(_mm256_loadu_si256((const __m256i*)(r1 + j)));
    __m512i e = _mm512_cvtepu8_epi16(_mm256_loadu_si256((const __m256i*)(r1 + j + 3)));
    __m512i s = _mm512_add_epi16(_mm512_add_epi16(a, b), _mm512_add_epi16(c, e));
    s = _mm512_srli_epi16(_mm512_add_epi16(s, _mm512_set1_epi16(2)), 2);
    _mm256_storeu_si256((__m256i*)(dbuf + j), _mm512_cvtepi16_epi8(s));
  }
  for (; j + 3 < n; ++j) {
    dbuf[j] = (uint8_t)((r0[j] + r0[j + 3] + r1[j] + r1[j + 3] + 2) >> 2);
  }
  // pass 2: keep bytes with j%6 in {0,1,2}
  alignas(64) static thread_local uint8_t idx_mem[64];
  static thread_local bool idx_init = false;
  if (!idx_init) {
    for (int k = 0; k < 48; ++k) idx_mem[k] = (uint8_t)(6 * (k / 3) + k % 3);
    for (int k = 48; k < 64; ++k) idx_mem[k] = 0;
    idx_init = true;
  }
  const __m512i idx = _mm512_load_si512((const void*)idx_mem);
  const __mmask64 m48 = 0xFFFFFFFFFFFFULL;
  int X = 0;
  for (; (X + 16) * 6 <= n; X += 16) {  // 16 px = 96 d-bytes -> 48 out bytes
    // indices run 0..92: <64 selects from lo, >=64 from hi. The hi load may
    // read up to 32 bytes past n on the final block; dbuf carries slack.
    __m512i lo = _mm512_loadu_si512((const void*)(dbuf + 6 * X));
    __m512i hi = _mm512_loadu_si512((const void*)(dbuf + 6 * X + 64));
    __m512i sel = _mm512_permutex2var_epi8(lo, idx, hi);
    _mm512_mask_storeu_epi8(dst + 3 * X, m48, sel);
  }
  for (; X < ow; ++X) {
    const uint8_t* p = dbuf + 6 * X;
    dst[3 * X] = p[0];
    dst[3 * X + 1] = p[1];
    dst[3 * X + 2] = p[2];
  }
}
#endif  // FP_AVX512

static inline void downsample_row_u8(const uint8_t* r0, const uint8_t* r1,
                                     uint8_t* dst, int ow, uint8_t* dbuf) {
#ifdef FP_AVX512
  if (dbuf != nullptr && ow >= 32) {
    downsample_row_u8_avx512(r0, r1, dst, ow, dbuf);
    return;
  }
#endif
  (void)dbuf;
  downsample_row_u8_scalar(r0, r1, dst, ow);
}

// fused 2x box downsample + s2d pack, all uint8:
// in [h,w,3] (4K) -> out [h/8, w/8, 48]; matches pack_s2d(resize_half(in)).
extern "C" void fp_preprocess_s2d_u8(const uint8_t* in, uint8_t* out, int h,
                                     int w, int n_threads) {
  const int ow1 = w / 2;           // 1080p row width (pixels)
  const int oh = (h / 2) / 4, ow = ow1 / 4;
  run_rows(oh, n_threads, [&](int y0, int y1) {
    std::vector<uint8_t> buf((size_t)ow1 * 3);
    std::vector<uint8_t> dbuf((size_t)ow1 * 6 + 64);  // slack for SIMD overread
    for (int y = y0; y < y1; ++y) {
      uint8_t* o = out + (size_t)y * ow * 48;
      for (int by = 0; by < 4; ++by) {
        const int ry = (y * 4 + by) * 2;  // source 4K row
        downsample_row_u8(in + (size_t)ry * w * 3, in + (size_t)(ry + 1) * w * 3,
                          buf.data(), ow1, dbuf.data());
        s2d_scatter_row(buf.data(), o, ow1, by);
      }
    }
  });
}

// ---------------------------------------------------------------------------
// y4m decode tail: BT.601 limited-range YUV420 -> RGB, fixed point.
// Matches data/video.py:268-276 (float path) within +-1 LSB:
//   y' = (Y-16)*255/219; u' = (U-128)*255/224; v' = (V-128)*255/224
//   r = y' + 1.402 v'; g = y' - 0.344136 u' - 0.714136 v'; b = y' + 1.772 u'
// Fixed-point 16.16 with +0.5 rounding (the Python adds 0.5 then clips).
// ---------------------------------------------------------------------------

static inline uint8_t clamp_u8(int v) {
  return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// 16.16 fixed-point coefficients (see section comment for float originals)
constexpr int CY = 76309;    // 255/219 * 65536
constexpr int CRV = 104597;  // 1.402   * 255/224 * 65536
constexpr int CGU = 25675;   // 0.344136* 255/224 * 65536
constexpr int CGV = 53279;   // 0.714136* 255/224 * 65536
constexpr int CBU = 132201;  // 1.772   * 255/224 * 65536
constexpr int CHALF = 32768;

#ifdef FP_AVX512
// 16 px per iteration in i32 lanes — bit-identical to the scalar kernel.
static void yuv_row_to_rgb_avx512(const uint8_t* yr, const uint8_t* ur,
                                  const uint8_t* vr, uint8_t* dst, int* x_io,
                                  int w) {
  const __m512i vCY = _mm512_set1_epi32(CY), vCRV = _mm512_set1_epi32(CRV);
  const __m512i vCGU = _mm512_set1_epi32(CGU), vCGV = _mm512_set1_epi32(CGV);
  const __m512i vCBU = _mm512_set1_epi32(CBU), vHALF = _mm512_set1_epi32(CHALF);
  const __m512i v16 = _mm512_set1_epi32(16), v128 = _mm512_set1_epi32(128);
  const __m512i v0 = _mm512_setzero_si512(), v255 = _mm512_set1_epi32(255);
  const __m512i dup = _mm512_set_epi32(7, 7, 6, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 0, 0);
  // drop the zero byte of each [r,g,b,0] i32 pixel: keep bytes k + k/3
  alignas(64) uint8_t idx_mem[64];
  for (int k = 0; k < 48; ++k) idx_mem[k] = (uint8_t)(k + k / 3);
  for (int k = 48; k < 64; ++k) idx_mem[k] = 0;
  const __m512i pack_idx = _mm512_load_si512((const void*)idx_mem);
  const __mmask64 m48 = 0xFFFFFFFFFFFFULL;

  int x = *x_io;
  for (; x + 16 <= w; x += 16) {
    __m512i y = _mm512_cvtepu8_epi32(_mm_loadu_si128((const __m128i*)(yr + x)));
    __m512i cy = _mm512_mullo_epi32(_mm512_sub_epi32(y, v16), vCY);
    __m512i u8x = _mm512_cvtepu8_epi32(_mm_loadl_epi64((const __m128i*)(ur + x / 2)));
    __m512i v8x = _mm512_cvtepu8_epi32(_mm_loadl_epi64((const __m128i*)(vr + x / 2)));
    __m512i uu = _mm512_sub_epi32(_mm512_permutexvar_epi32(dup, u8x), v128);
    __m512i vv = _mm512_sub_epi32(_mm512_permutexvar_epi32(dup, v8x), v128);
    __m512i rv = _mm512_add_epi32(_mm512_mullo_epi32(vv, vCRV), vHALF);
    __m512i guv = _mm512_sub_epi32(
        _mm512_sub_epi32(vHALF, _mm512_mullo_epi32(uu, vCGU)),
        _mm512_mullo_epi32(vv, vCGV));
    __m512i bu = _mm512_add_epi32(_mm512_mullo_epi32(uu, vCBU), vHALF);
    __m512i R = _mm512_srai_epi32(_mm512_add_epi32(cy, rv), 16);
    __m512i G = _mm512_srai_epi32(_mm512_add_epi32(cy, guv), 16);
    __m512i B = _mm512_srai_epi32(_mm512_add_epi32(cy, bu), 16);
    R = _mm512_min_epi32(_mm512_max_epi32(R, v0), v255);
    G = _mm512_min_epi32(_mm512_max_epi32(G, v0), v255);
    B = _mm512_min_epi32(_mm512_max_epi32(B, v0), v255);
    __m512i px = _mm512_or_si512(
        R, _mm512_or_si512(_mm512_slli_epi32(G, 8), _mm512_slli_epi32(B, 16)));
    __m512i packed = _mm512_permutexvar_epi8(pack_idx, px);
    _mm512_mask_storeu_epi8(dst + 3 * x, m48, packed);
  }
  *x_io = x;
}
#endif  // FP_AVX512

// convert one luma row (chroma row given at half horizontal resolution)
static inline void yuv_row_to_rgb(const uint8_t* yr, const uint8_t* ur,
                                  const uint8_t* vr, uint8_t* dst, int w) {
  constexpr int HALF = CHALF;
  int x_done = 0;
#ifdef FP_AVX512
  if (w >= 16) yuv_row_to_rgb_avx512(yr, ur, vr, dst, &x_done, w);
#endif
  for (int x2 = x_done / 2; x2 < w / 2; ++x2) {
    const int uu = ur[x2] - 128, vv = vr[x2] - 128;
    const int rv = CRV * vv + HALF, guv = -CGU * uu - CGV * vv + HALF,
              bu = CBU * uu + HALF;
    for (int k = 0; k < 2; ++k) {
      const int x = 2 * x2 + k;
      const int cy = CY * (yr[x] - 16);
      dst[3 * x] = clamp_u8((cy + rv) >> 16);
      dst[3 * x + 1] = clamp_u8((cy + guv) >> 16);
      dst[3 * x + 2] = clamp_u8((cy + bu) >> 16);
    }
  }
  if (w & 1) {
    const int x = w - 1;
    const int uu = ur[x / 2] - 128, vv = vr[x / 2] - 128;
    const int cy = CY * (yr[x] - 16);
    dst[3 * x] = clamp_u8((cy + CRV * vv + HALF) >> 16);
    dst[3 * x + 1] = clamp_u8((cy - CGU * uu - CGV * vv + HALF) >> 16);
    dst[3 * x + 2] = clamp_u8((cy + CBU * uu + HALF) >> 16);
  }
}

// YUV420 planes -> interleaved RGB uint8 [h,w,3]
extern "C" void fp_yuv420_to_rgb(const uint8_t* Y, const uint8_t* U,
                                 const uint8_t* V, uint8_t* out, int h, int w,
                                 int n_threads) {
  // 4:2:0 chroma rows are ceil(w/2) wide: a floor stride would misalign
  // every chroma row (and read 1 byte OOB on the last) for odd widths
  const int cw = (w + 1) / 2;
  run_rows(h, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      yuv_row_to_rgb(Y + (size_t)y * w, U + (size_t)(y / 2) * cw,
                     V + (size_t)(y / 2) * cw, out + (size_t)y * w * 3, w);
    }
  });
}

// fused y4m decode tail: YUV420 -> RGB -> s2d pack in one pass, no full RGB
// frame materialized. in planes at [h,w]; out [h/4, w/4, 48] uint8.
extern "C" void fp_yuv420_to_s2d_u8(const uint8_t* Y, const uint8_t* U,
                                    const uint8_t* V, uint8_t* out, int h,
                                    int w, int n_threads) {
  const int oh = h / 4, ow = w / 4;
  const int cw = (w + 1) / 2;  // ceil: 4:2:0 chroma row width for odd w
  run_rows(oh, n_threads, [&](int y0, int y1) {
    std::vector<uint8_t> buf((size_t)w * 3);
    for (int y = y0; y < y1; ++y) {
      uint8_t* o = out + (size_t)y * ow * 48;
      for (int by = 0; by < 4; ++by) {
        const int ry = y * 4 + by;
        yuv_row_to_rgb(Y + (size_t)ry * w, U + (size_t)(ry / 2) * cw,
                       V + (size_t)(ry / 2) * cw, buf.data(), w);
        s2d_scatter_row(buf.data(), o, w, by);
      }
    }
  });
}

// exact 2x2 box average of a planar (single-channel) row pair:
// dst[x] = (r0[2x] + r0[2x+1] + r1[2x] + r1[2x+1] + 2) >> 2.
// AVX-512 body: vpmaddubsw with weight 1 gives the horizontal pair sums in
// i16 lanes directly (unsigned bytes x signed 1), so one madd per source row
// replaces the widen+shift dance of the interleaved-RGB kernel.
static inline void down2_row_planar(const uint8_t* r0, const uint8_t* r1,
                                    uint8_t* dst, int ow) {
  int x = 0;
#ifdef FP_AVX512
  const __m512i ones = _mm512_set1_epi8(1);
  const __m512i two = _mm512_set1_epi16(2);
  for (; x + 32 <= ow; x += 32) {
    __m512i a = _mm512_loadu_si512((const void*)(r0 + 2 * x));
    __m512i b = _mm512_loadu_si512((const void*)(r1 + 2 * x));
    __m512i s = _mm512_add_epi16(_mm512_maddubs_epi16(a, ones),
                                 _mm512_maddubs_epi16(b, ones));
    s = _mm512_srli_epi16(_mm512_add_epi16(s, two), 2);
    _mm256_storeu_si256((__m256i*)(dst + x), _mm512_cvtepi16_epi8(s));
  }
#endif
  for (; x < ow; ++x) {
    dst[x] = (uint8_t)((r0[2 * x] + r0[2 * x + 1] + r1[2 * x] + r1[2 * x + 1] + 2) >> 2);
  }
}

// exact 2x2 box downsample of one 8-bit plane: in [h,w] -> out [h/2,w/2].
// Building block for the 4K emit='yuv420' feed: downsample Y/U/V planes on
// the host (quarter the bytes shipped) and leave color conversion + s2d
// packing on device (pipeline.multi_cam.yuv420_flat_to_s2d).
extern "C" void fp_plane_half(const uint8_t* in, uint8_t* out, int h, int w,
                              int n_threads) {
  const int oh = h / 2, ow = w / 2;
  run_rows(oh, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      down2_row_planar(in + (size_t)(2 * y) * w, in + (size_t)(2 * y + 1) * w,
                       out + (size_t)y * ow, ow);
    }
  });
}

// fused half-res y4m decode tail for 4K sources: YUV420 planes at [h,w]
// -> exact 2x2 box downsample IN YUV SPACE -> fixed-point RGB -> s2d pack,
// one pass over the source planes (reads 1.5 B/px of 4K, writes 0.375).
// Downsampling before conversion halves the conversion arithmetic and the
// traffic vs the RGB-domain chain (fp_yuv420_to_rgb @4K + fp_preprocess_
// s2d_u8), and is the hardware-scaler ordering; it is NOT bit-identical to
// downsampling the converted RGB (the reference resizes decoded BGR,
// mp_loader.py:236 — differences are sub-LSB rounding of an already-lossy
// 2x2 average). out [(h/2)/4, (w/2)/4, 48]; bit-exact against
// pack_s2d(yuv420_to_rgb(box2(Y), box2(U), box2(V))).
extern "C" void fp_yuv420_half_to_s2d_u8(const uint8_t* Y, const uint8_t* U,
                                         const uint8_t* V, uint8_t* out,
                                         int h, int w, int n_threads) {
  const int w1 = w / 2;          // downsampled luma width
  const int cw = (w + 1) / 2;    // source chroma width (4:2:0 rows are ceil(w/2))
  const int cw1 = w1 / 2;        // downsampled chroma width
  const int oh = (h / 2) / 4, ow = w1 / 4;
  const int ch = (h + 1) / 2;  // source chroma rows (ceil, like the width)
  run_rows(oh, n_threads, [&](int y0, int y1) {
    std::vector<uint8_t> yrow((size_t)w1 + 64), urow((size_t)cw1 + 64),
        vrow((size_t)cw1 + 64), buf((size_t)w1 * 3);
    int have_cy = -1;
    for (int y = y0; y < y1; ++y) {
      uint8_t* o = out + (size_t)y * ow * 48;
      for (int by = 0; by < 4; ++by) {
        const int ry = y * 4 + by;  // output (1080p) luma row
        down2_row_planar(Y + (size_t)(2 * ry) * w, Y + (size_t)(2 * ry + 1) * w,
                         yrow.data(), w1);
        const int cy = ry / 2;  // output chroma row
        if (cy != have_cy) {
          const int c0 = 2 * cy, c1 = c0 + 1 < ch ? c0 + 1 : c0;
          down2_row_planar(U + (size_t)c0 * cw, U + (size_t)c1 * cw,
                           urow.data(), cw1);
          down2_row_planar(V + (size_t)c0 * cw, V + (size_t)c1 * cw,
                           vrow.data(), cw1);
          have_cy = cy;
        }
        yuv_row_to_rgb(yrow.data(), urow.data(), vrow.data(), buf.data(), w1);
        s2d_scatter_row(buf.data(), o, w1, by);
      }
    }
  });
}

// Burned-in timestamp decode by 6-region pixel checksum (exact match).
// frame: [h,w,3] uint8. geometry: x0,y0,cell_w,cell_h,n_cells,dec_idx,
// h13,h23,w12. checksums: [10,6] int32 reference table (digit-major).
// out_digits: [n_cells] int32 (-1 for the decimal cell). Returns 0 on
// success, 1 + failing cell index on checksum mismatch.
extern "C" int fp_parse_timestamp(const uint8_t* frame, int h, int w, int x0, int y0,
                       int cell_w, int cell_h, int n_cells, int dec_idx,
                       int h13, int h23, int w12, const int32_t* checksums,
                       int32_t* out_digits) {
  if (y0 + cell_h > h || x0 + n_cells * cell_w > w) return -1;
  for (int j = 0; j < n_cells; ++j) {
    if (j == dec_idx) {
      out_digits[j] = -1;
      continue;
    }
    int cs[6] = {0, 0, 0, 0, 0, 0};
    const int cx = x0 + j * cell_w;
    for (int y = 0; y < cell_h; ++y) {
      const uint8_t* row = frame + ((size_t)(y0 + y) * w + cx) * 3;
      const int band = y < h13 ? 0 : (y < h23 ? 1 : 2);
      for (int x = 0; x < cell_w; ++x) {
        const int lum = row[3 * x] + row[3 * x + 1] + row[3 * x + 2];
        if (lum > 3 * 127) cs[2 * band + (x < w12 ? 0 : 1)] += 1;
      }
    }
    int best = -1;
    for (int d = 0; d < 10; ++d) {
      int err = 0;
      for (int k = 0; k < 6; ++k) {
        const int diff = cs[k] - checksums[6 * d + k];
        err += diff < 0 ? -diff : diff;
      }
      if (err == 0) {
        best = d;
        break;
      }
    }
    if (best < 0) return 1 + j;
    out_digits[j] = best;
  }
  return 0;
}
