// Native data-loader core for lightgrad_tpu.
//
// The reference's data pipeline is pure numpy (reference lightgrad/data.py);
// this is the framework's native runtime tier for host-side IO: dataset
// decode (u8 -> normalized f32), epoch shuffling (Fisher-Yates over a
// splitmix64 stream) and parallel shuffled-batch gather into pinned
// contiguous buffers ready for a single device upload.  Exposed to Python
// via ctypes (see native.py); built by the Makefile in this directory.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// u8 -> f32 * scale (dataset decode/normalize, e.g. MNIST /255)
void lg_u8_to_f32(const uint8_t* src, float* dst, int64_t n, float scale) {
  int64_t nthreads = std::min<int64_t>(std::thread::hardware_concurrency(), 16);
  if (n < (1 << 16) || nthreads <= 1) {
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * scale;
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) dst[i] = src[i] * scale;
    });
  }
  for (auto& th : ts) th.join();
}

static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

// Fisher-Yates permutation of [0, n) from a 64-bit seed
void lg_shuffle_perm(int64_t* idx, int64_t n, uint64_t seed) {
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  uint64_t s = seed;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(splitmix64(s) % (uint64_t)(i + 1));
    int64_t tmp = idx[i];
    idx[i] = idx[j];
    idx[j] = tmp;
  }
}

// Gather rows[idx[b]] of an (n, row_bytes) table into a contiguous batch,
// parallelized over rows.
void lg_gather_rows(const uint8_t* src, const int64_t* idx, int64_t batch,
                    int64_t row_bytes, uint8_t* dst) {
  int64_t nthreads = std::min<int64_t>(std::thread::hardware_concurrency(), 16);
  if (batch * row_bytes < (1 << 18) || nthreads <= 1) {
    for (int64_t b = 0; b < batch; ++b)
      std::memcpy(dst + b * row_bytes, src + idx[b] * row_bytes, row_bytes);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (batch + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(batch, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] {
      for (int64_t b = lo; b < hi; ++b)
        std::memcpy(dst + b * row_bytes, src + idx[b] * row_bytes, row_bytes);
    });
  }
  for (auto& th : ts) th.join();
}

// One-hot encode int labels into an (n, num_classes) f32 matrix
void lg_one_hot(const int32_t* labels, float* dst, int64_t n,
                int64_t num_classes) {
  std::memset(dst, 0, sizeof(float) * n * num_classes);
  for (int64_t i = 0; i < n; ++i) {
    int32_t c = labels[i];
    if (c >= 0 && c < num_classes) dst[i * num_classes + c] = 1.0f;
  }
}

}  // extern "C"
