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
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (produces libframepipe.so)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

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

// Burned-in timestamp decode by 6-region pixel checksum (exact match).
// frame: [h,w,3] uint8. geometry: x0,y0,cell_w,cell_h,n_cells,dec_idx,
// h13,h23,w12. checksums: [10,6] int32 reference table (digit-major).
// out_digits: [n_cells] int32 (-1 for the decimal cell). Returns 0 on
// success, 1 + failing cell index on checksum mismatch.
int fp_parse_timestamp(const uint8_t* frame, int h, int w, int x0, int y0,
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

}  // extern "C"
