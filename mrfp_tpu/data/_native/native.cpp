// Native host-side data kernels for mrfp_tpu.
//
// The reference has zero first-party native code (SURVEY.md §2: its native
// layer is cuDNN/NCCL inside wheels); our host runtime keeps the label
// pipeline off the Python interpreter: LUT remaps and confusion-matrix
// accumulation run here, multi-threaded, called through ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC native.cpp -o libmrfpnative.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Apply a 256-entry LUT to a uint8 label map (the encode_segmap equivalent,
// main.py:106-112 collapsed to one gather).
void remap_u8(const uint8_t* in, uint8_t* out, int64_t n, const uint8_t* lut) {
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    out[i + 0] = lut[in[i + 0]];
    out[i + 1] = lut[in[i + 1]];
    out[i + 2] = lut[in[i + 2]];
    out[i + 3] = lut[in[i + 3]];
    out[i + 4] = lut[in[i + 4]];
    out[i + 5] = lut[in[i + 5]];
    out[i + 6] = lut[in[i + 6]];
    out[i + 7] = lut[in[i + 7]];
  }
  for (; i < n; ++i) out[i] = lut[in[i]];
}

// Confusion-matrix accumulation (metrics.py:122-126 semantics): rows = label,
// cols = pred, labels outside [0, C) ignored. hist is int64 C*C, accumulated
// in place. Multi-threaded with per-thread local histograms.
void fast_hist_i32(const int32_t* pred, const int32_t* label, int64_t n,
                   int32_t num_classes, int64_t* hist, int32_t num_threads) {
  const int C = num_classes;
  const int nt = std::max(1, (int)num_threads);
  std::vector<std::vector<int64_t>> locals(nt, std::vector<int64_t>(C * C, 0));
  std::vector<std::thread> threads;
  const int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
      auto& h = locals[t];
      for (int64_t i = lo; i < hi; ++i) {
        const int32_t l = label[i];
        if (l >= 0 && l < C) {
          const int32_t p = pred[i];
          h[(int64_t)l * C + p] += 1;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < nt; ++t)
    for (int64_t k = 0; k < (int64_t)C * C; ++k) hist[k] += locals[t][k];
}

// HWC uint8 -> HWC float32 with optional scale/shift (the ToTensor tail,
// dataloaders.py:118-136, without the Python loop).
void u8_to_f32(const uint8_t* in, float* out, int64_t n, float scale,
               float shift) {
  for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i] * scale + shift;
}

// Copy-remap with an int64 key/value mapping read from the ORIGINAL array
// (the SYNTHIA/Mapillary mechanism, main.py:560-564/742-745): out prefilled
// by caller; only listed keys overwrite.
void copy_remap_u8(const uint8_t* in, uint8_t* out, int64_t n,
                   const int32_t* keys, const int32_t* vals, int32_t n_pairs) {
  uint8_t lut[256];
  bool hit[256];
  std::memset(hit, 0, sizeof(hit));
  for (int32_t k = 0; k < n_pairs; ++k) {
    if (keys[k] >= 0 && keys[k] < 256) {
      lut[keys[k]] = (uint8_t)vals[k];
      hit[keys[k]] = true;
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    if (hit[in[i]]) out[i] = lut[in[i]];
  }
}

// Saturation jitter (ImageEnhance.Color): blend toward the ITU-R 601-2
// integer luma in ONE pass — PIL materializes the L image, re-expands it to
// RGB and runs Blend.c; semantics here are bit-exact to that chain
// (data/color.py documents the derivation: integer luma with the 0x8000
// rounding bit, f32 trunc blend).
void saturation_u8(const uint8_t* in, uint8_t* out, int64_t n_pixels,
                   float factor, int32_t num_threads) {
  const int nt = std::max(1, (int)num_threads);
  std::vector<std::thread> threads;
  const int64_t chunk = (n_pixels + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([=]() {
      const int64_t lo = t * chunk, hi = std::min(n_pixels, lo + chunk);
      for (int64_t k = lo; k < hi; ++k) {
        const uint32_t r = in[3 * k], g = in[3 * k + 1], b = in[3 * k + 2];
        const float lum =
            (float)((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
        for (int c = 0; c < 3; ++c) {
          const float v = lum + factor * ((float)in[3 * k + c] - lum);
          const int iv = (int)v;  // C cast truncates toward zero
          out[3 * k + c] = (uint8_t)std::min(255, std::max(0, iv));
        }
      }
    });
  }
  for (auto& th : threads) th.join();
}

// Hue jitter: RGB -> HSV -> (H + delta) mod 256 -> RGB in one pass,
// bit-exact to PIL convert("HSV") / convert("RGB") (Pillow Convert.c).
// The float/double narrowing below is load-bearing: Pillow's C evaluates
// the hue expression and the fmod step in double (double literals promote)
// but assigns through float locals; data/color.py documents the derivation
// (verified exhaustively over all 16.7M inputs against the PIL oracle).
void hue_shift_u8(const uint8_t* in, uint8_t* out, int64_t n_pixels,
                  int32_t delta, int32_t num_threads) {
  const uint8_t d = (uint8_t)(delta & 0xFF);
  const int nt = std::max(1, (int)num_threads);
  std::vector<std::thread> threads;
  const int64_t chunk = (n_pixels + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([=]() {
      const int64_t lo = t * chunk, hi = std::min(n_pixels, lo + chunk);
      // Branch-free body (ternaries compile to selects) so -march=native
      // can vectorize the whole loop. fp-semantics notes:
      // - fmod(x, 1.0) == x - floor(x) exactly for the positive x here
      //   (x = h/6 + 1 in (5/6, 1.8+]), so the vector-hostile libm fmod
      //   is replaced without changing a single bit;
      // - divisions use a 1-substituted denominator under the achromatic /
      //   zero mask instead of branching (results are masked out).
      for (int64_t k = lo; k < hi; ++k) {
        const uint8_t r8 = in[3 * k], g8 = in[3 * k + 1], b8 = in[3 * k + 2];
        const uint8_t maxc = std::max(r8, std::max(g8, b8));
        const uint8_t minc = std::min(r8, std::min(g8, b8));
        const uint8_t uv = maxc;
        const bool chroma = maxc != minc;
        const float cr = (float)(maxc - minc);
        const float crs = chroma ? cr : 1.0f;
        const float maxs = maxc ? (float)maxc : 1.0f;
        const float s = cr / maxs;
        const float rc = ((float)(maxc - r8)) / crs;
        const float gc = ((float)(maxc - g8)) / crs;
        const float bc = ((float)(maxc - b8)) / crs;
        const float h0 = (maxc == r8) ? (bc - gc)
                       : (maxc == g8) ? (float)(2.0 + rc - bc)
                                      : (float)(4.0 + gc - rc);
        const double hx = (double)h0 / 6.0 + 1.0;
        const float h = (float)(hx - floor(hx));
        const int ih = (int)((double)h * 255.0);
        const int is = (int)((double)s * 255.0);
        uint8_t uh = chroma ? (uint8_t)std::min(255, std::max(0, ih)) : 0;
        const uint8_t us = chroma ? (uint8_t)std::min(255, std::max(0, is)) : 0;
        uh = (uint8_t)(uh + d);
        const double fh = (double)uh * 6.0 / 255.0;
        const int i = (int)fh;                 // fh >= 0: trunc == floor
        const float f = (float)(fh - (double)i);
        const float fs = (float)((double)us / 255.0);
        const double v = (double)uv;
        const int p = (int)nearbyint(v * (1.0 - (double)fs));
        const int q = (int)nearbyint(v * (1.0 - (double)fs * (double)f));
        const int tt = (int)nearbyint(v * (1.0 - (double)fs * (1.0 - (double)f)));
        const uint8_t up = (uint8_t)std::min(255, std::max(0, p));
        const uint8_t uq = (uint8_t)std::min(255, std::max(0, q));
        const uint8_t ut = (uint8_t)std::min(255, std::max(0, tt));
        const int im = i - (i / 6) * 6;        // i in [0,6] -> im in [0,5] or 0
        const uint8_t r = (im == 1) ? uq : (im == 2 || im == 3) ? up
                        : (im == 4) ? ut : uv;
        const uint8_t g = (im == 0) ? ut : (im == 3) ? uq
                        : (im >= 4) ? up : uv;
        const uint8_t b = (im == 0 || im == 1) ? up : (im == 2) ? ut
                        : (im == 5) ? uq : uv;
        const bool gray = us == 0;
        out[3 * k]     = gray ? uv : r;
        out[3 * k + 1] = gray ? uv : g;
        out[3 * k + 2] = gray ? uv : b;
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
