// Native scene renderer for the synthetic multi-robot dataset.
//
// The Python generator (mrp_gnn_tpu/data/synthetic.py) draws K layered
// billboards with per-robot parallax; at swarm scale the per-pixel work
// (background gradient, rect fills, sensor noise) dominates host time and
// starves the accelerator (measured: 22 ms/scene for 32 robots vs a 1.4 ms
// device step). This C++ port runs the same painter's algorithm with OpenMP
// across robots; scene parameters (rect geometry, colors, classes, camera
// offsets) stay in Python so the world layout is identical across backends —
// only the sensor-noise RNG differs (xoshiro128+ here vs numpy PCG64).
//
// C ABI, loaded via ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

// xoshiro128+ — deterministic, splittable enough for per-robot streams.
struct Rng {
  uint32_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 expansion
    for (int i = 0; i < 4; i++) {
      seed += 0x9e3779b97f4a7c15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = static_cast<uint32_t>((z ^ (z >> 31)) >> 16);
    }
  }
  static uint32_t rotl(uint32_t x, int k) { return (x << k) | (x >> (32 - k)); }
  uint32_t next() {
    uint32_t result = s[0] + s[3];
    uint32_t t = s[1] << 9;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 11);
    return result;
  }
  float uniform() { return (next() >> 8) * (1.0f / 16777216.0f); }
  // Box-Muller; one value per call (second draw discarded for simplicity).
  float normal() {
    float u1 = std::max(uniform(), 1e-7f), u2 = uniform();
    return std::sqrt(-2.0f * std::log(u1)) *
           std::cos(6.2831853f * u2);
  }
};

}  // namespace

extern "C" {

// images: [N, H, W, 3] f32; depth: [N, H, W] f32; seg: [N, H, W] i32.
// Rects are ordered far-to-near (painter's algorithm), as in the Python
// generator. noise_std <= 0 disables sensor noise.
void render_scene(int n_robots, int H, int W, int K,
                  const float* depths, const float* cx, const float* cy,
                  const float* rw, const float* rh,
                  const float* colors /* K*3 */, const int32_t* classes,
                  const float* offsets /* N */, float focal, float bg_depth,
                  uint64_t noise_seed, float noise_std,
                  float* images, float* depth, int32_t* seg) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n_robots; i++) {
    float* img = images + static_cast<size_t>(i) * H * W * 3;
    float* dep = depth + static_cast<size_t>(i) * H * W;
    int32_t* sg = seg + static_cast<size_t>(i) * H * W;

    // Background: horizontal gradient, slightly view-shifted.
    for (int y = 0; y < H; y++) {
      for (int x = 0; x < W; x++) {
        float xs = static_cast<float>(x) / (W - 1);
        float g = 0.15f + 0.2f * std::sin(6.2831853f *
                                          (xs + 0.05f * offsets[i]));
        float* px = img + (static_cast<size_t>(y) * W + x) * 3;
        px[0] = 0.2f + 0.5f * g;
        px[1] = 0.25f + 0.3f * g;
        px[2] = 0.35f - 0.2f * g;
        dep[y * W + x] = bg_depth;
        sg[y * W + x] = 0;
      }
    }

    // Rect fills, far to near.
    for (int k = 0; k < K; k++) {
      float dx = focal * offsets[i] / depths[k];
      int x0 = std::clamp(static_cast<int>(cx[k] - rw[k] / 2 + dx), 0, W);
      int x1 = std::clamp(static_cast<int>(cx[k] + rw[k] / 2 + dx), 0, W);
      int y0 = std::clamp(static_cast<int>(cy[k] - rh[k] / 2), 0, H);
      int y1 = std::clamp(static_cast<int>(cy[k] + rh[k] / 2), 0, H);
      if (x0 >= x1 || y0 >= y1) continue;
      const float* c = colors + k * 3;
      for (int y = y0; y < y1; y++) {
        for (int x = x0; x < x1; x++) {
          float* px = img + (static_cast<size_t>(y) * W + x) * 3;
          px[0] = c[0]; px[1] = c[1]; px[2] = c[2];
          dep[y * W + x] = depths[k];
          sg[y * W + x] = classes[k];
        }
      }
    }

    // Sensor noise, clipped to [0, 1].
    if (noise_std > 0.0f) {
      Rng rng(noise_seed + static_cast<uint64_t>(i) * 0x9e3779b9ULL);
      const size_t n = static_cast<size_t>(H) * W * 3;
      for (size_t p = 0; p < n; p++) {
        img[p] = std::min(1.0f, std::max(0.0f,
                                         img[p] + noise_std * rng.normal()));
      }
    }
  }
}

}  // extern "C"
