// Fused host-side augmentation kernel: pad -> random crop -> hflip ->
// normalize, uint8 NHWC in, float32 NHWC out, multithreaded over samples.
//
// Replaces the reference's per-sample PIL transform stack
// (cdf_alignment/resnet-20-cifar-10/data/cifar10.py:11-16 RandomCrop+Flip+
// ToTensor+Normalize) with one cache-friendly pass so the host input
// pipeline keeps up with the TPU (the reference hides this cost behind
// CUDA's slowness; a v5e chip consumes >300k images/s).
//
// Build: make -C native   (produces libaugment.so; loaded via ctypes from
// alignq_tpu/data/native_augment.py — no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// One sample: crop the (h, w) window at offset (oy, ox) out of the
// zero-padded (h + 2*pad, w + 2*pad) image, flip horizontally if asked,
// then (x/255 - mean) / std per channel.
static void augment_one(const uint8_t* in, float* out, int h, int w, int c,
                        int oy, int ox, bool flip, const float* scale,
                        const float* shift, int pad) {
  for (int y = 0; y < h; ++y) {
    const int sy = y + oy - pad;  // source row in the unpadded image
    const bool row_ok = sy >= 0 && sy < h;
    for (int x = 0; x < w; ++x) {
      const int dx = flip ? (w - 1 - x) : x;
      float* dst = out + (static_cast<size_t>(y) * w + dx) * c;
      const int sx = x + ox - pad;
      if (row_ok && sx >= 0 && sx < w) {
        const uint8_t* src = in + (static_cast<size_t>(sy) * w + sx) * c;
        for (int k = 0; k < c; ++k) dst[k] = src[k] * scale[k] + shift[k];
      } else {
        for (int k = 0; k < c; ++k) dst[k] = shift[k];  // zero pixel
      }
    }
  }
}

// Batch entry point. oy/ox in [0, 2*pad]; flip 0/1 per sample.
// mean/std given in [0,1] units (torchvision convention); we fold the /255.
void augment_batch(const uint8_t* in, float* out, int n, int h, int w, int c,
                   const int32_t* oy, const int32_t* ox, const uint8_t* flip,
                   const float* mean, const float* std_, int pad,
                   int num_threads) {
  std::vector<float> scale(c), shift(c);
  for (int k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * std_[k]);
    shift[k] = -mean[k] / std_[k];
  }
  const size_t img_in = static_cast<size_t>(h) * w * c;
  const size_t img_out = img_in;
  auto worker = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      augment_one(in + i * img_in, out + i * img_out, h, w, c, oy[i], ox[i],
                  flip[i] != 0, scale.data(), shift.data(), pad);
    }
  };
  if (num_threads <= 1 || n < 2 * num_threads) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& th : threads) th.join();
}

// Normalize-only path (eval loaders): (x/255 - mean)/std, multithreaded.
void normalize_batch(const uint8_t* in, float* out, int n, int h, int w,
                     int c, const float* mean, const float* std_,
                     int num_threads) {
  std::vector<float> scale(c), shift(c);
  for (int k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * std_[k]);
    shift[k] = -mean[k] / std_[k];
  }
  const size_t img = static_cast<size_t>(h) * w * c;
  auto worker = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      const uint8_t* src = in + i * img;
      float* dst = out + i * img;
      for (size_t p = 0; p < img; p += c)
        for (int k = 0; k < c; ++k) dst[p + k] = src[p + k] * scale[k] + shift[k];
    }
  };
  if (num_threads <= 1 || n < 2 * num_threads) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
