// Native host-side data kernels for mrfp_tpu.
//
// The reference has zero first-party native code (SURVEY.md §2: its native
// layer is cuDNN/NCCL inside wheels); our host runtime keeps the label
// pipeline off the Python interpreter: LUT remaps and confusion-matrix
// accumulation run here, multi-threaded, called through ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC native.cpp -o libmrfpnative.so

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

}  // extern "C"
