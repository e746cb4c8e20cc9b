// e4s_tpu native host-side preprocessing kernels.
//
// The training input pipeline spends its host CPU time on three dense
// per-pixel transforms (ref: src/datasets/dataset.py TO_TENSOR/NORMALIZE +
// label converters, src/utils/torch_utils.py labelMap2OneHot):
//   1. uint8 HWC -> float32 CHW in [-1, 1]
//   2. 19-class label remap (CelebA / face-parsing taxonomies -> 12-class)
//   3. 12-class label map -> one-hot float32 planes
// numpy does each as a separate pass with temporaries; these kernels fuse the
// work into single OpenMP-parallel passes. Loaded via ctypes
// (e4s_tpu/datasets/native.py) with a pure-numpy fallback when the shared
// object is unavailable.
//
// Build: ./native/build.sh  (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// uint8 [H,W,3] -> float32 [3,H,W], (x/255 - 0.5) / 0.5
void to_tensor_normalize(const uint8_t* src, float* dst, int64_t h, int64_t w,
                         int normalize) {
  const int64_t plane = h * w;
  const float scale = 1.0f / 255.0f;
#pragma omp parallel for
  for (int64_t i = 0; i < plane; ++i) {
    const uint8_t* px = src + i * 3;
    float r = px[0] * scale, g = px[1] * scale, b = px[2] * scale;
    if (normalize) {
      r = r * 2.0f - 1.0f;
      g = g * 2.0f - 1.0f;
      b = b * 2.0f - 1.0f;
    }
    dst[i] = r;
    dst[plane + i] = g;
    dst[2 * plane + i] = b;
  }
}

// label remap through a 256-entry LUT: uint8 [N] -> int32 [N]
void remap_labels(const uint8_t* src, int32_t* dst, const int32_t* lut,
                  int64_t n) {
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    dst[i] = lut[src[i]];
  }
}

// int32 [H,W] 12-class labels -> float32 [C,H,W] one-hot
void label_to_onehot(const int32_t* labels, float* dst, int64_t h, int64_t w,
                     int64_t num_cls) {
  const int64_t plane = h * w;
  std::memset(dst, 0, sizeof(float) * plane * num_cls);
#pragma omp parallel for
  for (int64_t i = 0; i < plane; ++i) {
    const int32_t c = labels[i];
    if (c >= 0 && c < num_cls) {
      dst[c * plane + i] = 1.0f;
    }
  }
}

// fused: uint8 [H,W] raw 19-cls labels -> (int32 [H,W] 12-cls, float32
// [C,H,W] one-hot) in one pass
void remap_and_onehot(const uint8_t* src, const int32_t* lut, int32_t* labels,
                      float* onehot, int64_t h, int64_t w, int64_t num_cls) {
  const int64_t plane = h * w;
  std::memset(onehot, 0, sizeof(float) * plane * num_cls);
#pragma omp parallel for
  for (int64_t i = 0; i < plane; ++i) {
    const int32_t c = lut[src[i]];
    labels[i] = c;
    if (c >= 0 && c < num_cls) {
      onehot[c * plane + i] = 1.0f;
    }
  }
}

// horizontal flip in-place layouts: float32 [C,H,W]
void hflip_chw(float* data, int64_t c, int64_t h, int64_t w) {
#pragma omp parallel for collapse(2)
  for (int64_t ch = 0; ch < c; ++ch) {
    for (int64_t row = 0; row < h; ++row) {
      float* base = data + (ch * h + row) * w;
      for (int64_t i = 0; i < w / 2; ++i) {
        float tmp = base[i];
        base[i] = base[w - 1 - i];
        base[w - 1 - i] = tmp;
      }
    }
  }
}

}  // extern "C"
