// nodems_data: native host-side input pipeline for neural_ode_metasolver_tpu.
//
// The reference delegates its input pipeline to torchvision's Python
// transforms (odenet_mnist/data.py, odenet_cifar10/data.py). Here the
// per-batch hot loop — gather by shuffled index, reflect the reference's
// RandomCrop(size, padding=4) + RandomHorizontalFlip + Normalize — is a
// multithreaded C++ kernel writing straight into a preallocated NHWC float32
// buffer, so the TPU step never waits on Python-loop augmentation.
//
// C ABI (ctypes-friendly), no external dependencies.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// SplitMix64 — deterministic, seedable, cheap. One stream per sample so the
// result is independent of thread scheduling.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97f4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  // uniform integer in [0, n)
  uint32_t below(uint32_t n) { return static_cast<uint32_t>(next() % n); }
  // uniform float in [0, 1)
  float uniform() { return (next() >> 40) * (1.0f / (1ull << 24)); }
};

struct AugmentJob {
  const float* images;  // (n, h, w, c) NHWC
  const int64_t* indices;
  int64_t batch, h, w, c;
  int pad;
  int do_flip;
  const float* mean;  // per-channel or nullptr
  const float* stddev;
  uint64_t seed;
  float* out;  // (batch, h, w, c)
};

void augment_range(const AugmentJob& job, int64_t b0, int64_t b1) {
  const int64_t h = job.h, w = job.w, c = job.c;
  const int64_t img_sz = h * w * c;
  const int pad = job.pad;
  std::vector<float> padded;
  if (pad > 0) {
    // zero ONCE: the interior is fully overwritten per sample and the
    // border is never dirtied, so per-sample refills only add ~50%
    // memory traffic to the hot loop
    padded.assign((h + 2 * pad) * (w + 2 * pad) * c, 0.0f);
  }

  for (int64_t b = b0; b < b1; ++b) {
    Rng rng(job.seed * 0x9E3779B97f4A7C15ull + static_cast<uint64_t>(b));
    const float* src = job.images + job.indices[b] * img_sz;
    float* dst = job.out + b * img_sz;

    int top = 0, left = 0;
    const float* crop_src = src;
    int64_t src_w = w;
    if (pad > 0) {
      // zero-pad then crop at a random offset (torchvision RandomCrop)
      const int64_t pw = w + 2 * pad;
      for (int64_t y = 0; y < h; ++y) {
        std::memcpy(&padded[((y + pad) * pw + pad) * c], src + y * w * c,
                    sizeof(float) * w * c);
      }
      top = static_cast<int>(rng.below(2 * pad + 1));
      left = static_cast<int>(rng.below(2 * pad + 1));
      crop_src = &padded[(top * pw + left) * c];
      src_w = pw;
    }
    const bool flip = job.do_flip && rng.uniform() < 0.5f;

    for (int64_t y = 0; y < h; ++y) {
      const float* row = crop_src + y * src_w * c;
      float* out_row = dst + y * w * c;
      if (!flip) {
        std::memcpy(out_row, row, sizeof(float) * w * c);
      } else {
        for (int64_t x = 0; x < w; ++x) {
          std::memcpy(out_row + x * c, row + (w - 1 - x) * c,
                      sizeof(float) * c);
        }
      }
    }
    if (job.mean != nullptr) {
      for (int64_t i = 0; i < h * w; ++i) {
        for (int64_t ch = 0; ch < c; ++ch) {
          dst[i * c + ch] = (dst[i * c + ch] - job.mean[ch]) / job.stddev[ch];
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Gather + RandomCrop(pad) + RandomHorizontalFlip + Normalize, multithreaded.
// images: (n, h, w, c) float32 NHWC; indices: (batch,) int64 rows to gather;
// mean/stddev: (c,) or nullptr; out: (batch, h, w, c) float32, preallocated.
// Deterministic in (seed, batch position) regardless of thread count.
void nodems_augment_batch(const float* images, int64_t n, int64_t h, int64_t w,
                          int64_t c, const int64_t* indices, int64_t batch,
                          int pad, int do_flip, const float* mean,
                          const float* stddev, uint64_t seed, float* out,
                          int num_threads) {
  (void)n;
  AugmentJob job{images, indices, batch, h, w, c, pad, do_flip,
                 mean, stddev, seed, out};
  if (num_threads <= 1 || batch < 64) {
    augment_range(job, 0, batch);
    return;
  }
  int nt = std::min<int64_t>(num_threads, batch);
  std::vector<std::thread> threads;
  int64_t chunk = (batch + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b0 = t * chunk;
    int64_t b1 = std::min<int64_t>(b0 + chunk, batch);
    if (b0 >= b1) break;
    threads.emplace_back([&job, b0, b1] { augment_range(job, b0, b1); });
  }
  for (auto& th : threads) th.join();
}

// Shuffle indices [0, n) with SplitMix64-seeded Fisher-Yates.
void nodems_shuffle_indices(int64_t* indices, int64_t n, uint64_t seed) {
  for (int64_t i = 0; i < n; ++i) indices[i] = i;
  Rng rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = static_cast<int64_t>(rng.next() % (i + 1));
    std::swap(indices[i], indices[j]);
  }
}

int nodems_abi_version() { return 1; }

}  // extern "C"
