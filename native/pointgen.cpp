// Native data-plane for nsfnet_tpu: collocation-point generation.
//
// The reference generates points in pure Python: a double loop for
// Latin-Hypercube sampling (tools.py:30-57) and an O(N_f * N_b)
// pure-Python nearest-boundary sort (tools.py:59-83) that takes minutes at
// N_f=120k. This library provides the multithreaded native equivalents,
// exposed over a minimal C ABI consumed via ctypes
// (nsfnet_tpu/data/native.py). NumPy fallbacks exist for every entry
// point, so the framework works without the compiled library.
//
// Build: `make -C native` (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw, n / 4096));
  if (n_threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Latin-Hypercube sample: n points in d dims, one uniform draw per stratum
// per dim, strata independently permuted per dim (tools.py:30-57 semantics).
// out: [n, d] row-major float64; bounds: [d, 2] (lo, hi) pairs.
void lh_sample(int64_t n, int64_t d, const double* bounds, uint64_t seed,
               double* out) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::vector<int64_t> perm(n);
  std::vector<double> col(n);
  for (int64_t j = 0; j < d; ++j) {
    for (int64_t i = 0; i < n; ++i)
      col[i] = (static_cast<double>(i) + uni(rng)) / static_cast<double>(n);
    std::iota(perm.begin(), perm.end(), 0);
    std::shuffle(perm.begin(), perm.end(), rng);
    const double lo = bounds[2 * j], hi = bounds[2 * j + 1];
    for (int64_t i = 0; i < n; ++i)
      out[i * d + j] = col[perm[i]] * (hi - lo) + lo;
  }
}

// Min Euclidean distance from each of n points to a set of m reference
// points (tools.py:63-66), multithreaded.
void min_distance(int64_t n, const double* pts, int64_t m, const double* ref,
                  double* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const double x = pts[2 * i], y = pts[2 * i + 1];
      double best = 1e300;
      for (int64_t k = 0; k < m; ++k) {
        const double dx = x - ref[2 * k], dy = y - ref[2 * k + 1];
        const double d2 = dx * dx + dy * dy;
        if (d2 < best) best = d2;
      }
      out[i] = std::sqrt(best);
    }
  });
}

// Closed-form distance to the boundary of an axis-aligned box
// (cavity_data.py:118-126's KD-tree query, exact for the square domain).
void box_boundary_distance(int64_t n, const double* pts, double lo, double hi,
                           double* out) {
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      const double x = pts[2 * i], y = pts[2 * i + 1];
      double d = std::min(std::min(x - lo, hi - x), std::min(y - lo, hi - y));
      out[i] = d > 0.0 ? d : 0.0;
    }
  });
}

// SDF weights: w = min_w + (1-min_w)*exp(-decay*d), mean-normalized
// (cavity_data.py:118-130). d computed in closed form for the box.
void sdf_weights(int64_t n, const double* pts, double lo, double hi,
                 double min_w, double decay, float* out) {
  std::vector<double> w(n);
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      const double x = pts[2 * i], y = pts[2 * i + 1];
      double d = std::min(std::min(x - lo, hi - x), std::min(y - lo, hi - y));
      if (d < 0.0) d = 0.0;
      w[i] = min_w + (1.0 - min_w) * std::exp(-decay * d);
    }
  });
  double mean = std::accumulate(w.begin(), w.end(), 0.0) / static_cast<double>(n);
  const double inv = mean > 0.0 ? 1.0 / mean : 1.0;
  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(w[i] * inv);
}

// Argsort by distance-to-boundary-set (tools.py:68-83), multithreaded
// distance pass + single-threaded stable sort of indices.
void sort_by_distance(int64_t n, const double* pts, int64_t m,
                      const double* ref, int64_t* order) {
  std::vector<double> d(n);
  min_distance(n, pts, m, ref, d.data());
  std::iota(order, order + n, 0);
  std::stable_sort(order, order + n,
                   [&](int64_t a, int64_t b) { return d[a] < d[b]; });
}

}  // extern "C"
