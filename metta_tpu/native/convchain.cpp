// ConvChain texture synthesis — native inner loop for the mapgen scene.
//
// Role parity: the reference implements compute-heavy procedural generation
// scenes in Python (mettagrid/mapgen/scenes/convchain.py) backed by its C++
// engine build; here the MCMC inner loop (millions of pattern evaluations per
// map) is native, called through ctypes from metta_tpu/mapgen/scenes_texture.py.
//
// Algorithm (ConvChain, Gumin): learn N×N boolean pattern weights from a
// sample; run Metropolis MCMC over the output field where each flip's
// acceptance ratio is the product of pattern-weight ratios in its N-neighborhood.
//
// Build: g++ -O3 -shared -fPIC convchain.cpp -o libconvchain.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Rng {
  // xorshift64* — deterministic, seedable
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int below(int n) { return static_cast<int>(next() % static_cast<uint64_t>(n)); }
};

inline int pattern_index(const uint8_t* field, int W, int H, int x, int y, int n) {
  int idx = 0;
  for (int dy = 0; dy < n; ++dy) {
    for (int dx = 0; dx < n; ++dx) {
      int xx = (x + dx) % W;
      int yy = (y + dy) % H;
      idx = (idx << 1) | field[yy * W + xx];
    }
  }
  return idx;
}

}  // namespace

extern "C" {

// Learn pattern weights from a sample (with all 8 symmetries), then anneal the
// field in place.
// sample: SH×SW uint8 (0/1); field: H×W uint8 (0/1), pre-initialized (random);
// n: receptor size (<=4); temperature; iterations: MCMC steps (per-cell scale);
// seed: RNG seed.
void convchain_run(const uint8_t* sample, int SW, int SH,
                   uint8_t* field, int W, int H,
                   int n, double temperature, int iterations, uint64_t seed) {
  const int n_patterns = 1 << (n * n);
  std::vector<double> weights(n_patterns, 0.0);

  // collect sample patterns under the 8 symmetries
  for (int y = 0; y < SH; ++y) {
    for (int x = 0; x < SW; ++x) {
      // extract the n×n patch (toroidal)
      uint8_t patch[16];
      for (int dy = 0; dy < n; ++dy)
        for (int dx = 0; dx < n; ++dx)
          patch[dy * n + dx] = sample[((y + dy) % SH) * SW + ((x + dx) % SW)];
      // 8 symmetries: 4 rotations × reflection
      for (int sym = 0; sym < 8; ++sym) {
        int idx = 0;
        for (int dy = 0; dy < n; ++dy) {
          for (int dx = 0; dx < n; ++dx) {
            int sx = dx, sy = dy;
            // rotate sym%4 times then maybe reflect
            for (int r = 0; r < sym % 4; ++r) {
              int t = sx;
              sx = n - 1 - sy;
              sy = t;
            }
            if (sym >= 4) sx = n - 1 - sx;
            idx = (idx << 1) | patch[sy * n + sx];
          }
        }
        weights[idx] += 1.0;
      }
    }
  }
  for (auto& w : weights)
    if (w <= 0.0) w = 0.1;

  Rng rng(seed);
  const double inv_t = temperature > 0 ? 1.0 / temperature : 1.0;
  const long total = static_cast<long>(iterations) * W * H;
  for (long it = 0; it < total; ++it) {
    int x = rng.below(W);
    int y = rng.below(H);
    double q = 1.0;
    // patterns covering (x, y): top-left corners in [x-n+1, x] × [y-n+1, y]
    const int cell = y * W + x;
    field[cell] ^= 1;
    for (int sy = y - n + 1; sy <= y; ++sy) {
      for (int sx = x - n + 1; sx <= x; ++sx) {
        int px = (sx % W + W) % W;
        int py = (sy % H + H) % H;
        int ind_new = pattern_index(field, W, H, px, py, n);
        field[cell] ^= 1;
        int ind_old = pattern_index(field, W, H, px, py, n);
        field[cell] ^= 1;
        q *= weights[ind_new] / weights[ind_old];
      }
    }
    bool accept = q >= 1.0 || rng.uniform() < std::pow(q, inv_t);
    if (!accept) field[cell] ^= 1;  // revert
  }
}

}  // extern "C"
