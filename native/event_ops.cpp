// Host-side event-stream kernels for the openess-tpu data plane.
//
// Replaces the reference's numba-JIT index scan (DSEC/utils/eventslicer.py:
// 152-203) and the numpy/torch host voxelizers (DSEC/dataset/
// representations.py:15-43, datasets/data_util.py:51-117) with tight C++
// loops, exposed via ctypes (no pybind11 in this image). The device (Pallas/
// XLA) voxelizer remains the training-path default; these cover the
// CPU-bound offline tier and give the input pipeline a fast host fallback
// that overlaps with TPU compute.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// Nonzero mean/std normalization of a scratch grid. mode: 0 = none,
// 1 = unbiased std (torch default, representations.py:45-53),
// 2 = biased std (np.std, data_util.py:38-48).
void normalize_nonzero_mode(float* g, int64_t n, int mode) {
  if (mode == 0) return;
  double sum = 0, sq = 0;
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float v = g[i];
    if (v != 0.f) { sum += v; sq += (double)v * v; ++cnt; }
  }
  if (cnt == 0) return;
  const double mean = sum / cnt;
  double var = sq / cnt - mean * mean;
  if (mode == 1) {
    if (cnt < 2) return;
    var *= (double)cnt / (double)(cnt - 1);
  }
  if (var <= 0) return;
  const float m = (float)mean, inv = (float)(1.0 / std::sqrt(var));
  for (int64_t i = 0; i < n; ++i) {
    if (g[i] != 0.f) g[i] = (g[i] - m) * inv;
  }
}

}  // namespace

extern "C" {

// DSEC-style signed trilinear voxel grid (±polarity, 8-corner interpolation).
// x, y: rectified float coords; p in {0,1}; t monotonic. grid: [C*H*W] f32,
// assumed zero-initialized by the caller.
void voxelize_trilinear(
    const float* x, const float* y, const float* p, const float* t,
    int64_t n, int C, int H, int W, float* grid) {
  if (n == 0) return;
  const float t0v = t[0];
  float dt = t[n - 1] - t0v;
  if (dt <= 0.f) dt = 1.f;
  const float tscale = (C - 1) / dt;
  const int64_t HW = (int64_t)H * W;
  for (int64_t i = 0; i < n; ++i) {
    const float xf = x[i], yf = y[i];
    const float tn = (t[i] - t0v) * tscale;
    // trunc toward zero, matching torch .int() (representations.py:27-29)
    const int x0 = (int)xf, y0 = (int)yf, t0 = (int)tn;
    const float value = 2.f * p[i] - 1.f;
    for (int dx = 0; dx < 2; ++dx) {
      const int xl = x0 + dx;
      if (xl < 0 || xl >= W) continue;
      const float wx = 1.f - std::fabs((float)xl - xf);
      for (int dy = 0; dy < 2; ++dy) {
        const int yl = y0 + dy;
        if (yl < 0 || yl >= H) continue;
        const float wy = 1.f - std::fabs((float)yl - yf);
        for (int dtt = 0; dtt < 2; ++dtt) {
          const int tl = t0 + dtt;
          if (tl < 0 || tl >= C) continue;
          const float wt = 1.f - std::fabs((float)tl - tn);
          grid[tl * HW + (int64_t)yl * W + xl] += value * wx * wy * wt;
        }
      }
    }
  }
}

// Multithreaded trilinear voxelizer: events are partitioned across threads,
// each accumulating into a private grid (no atomics needed on any ISA),
// followed by a parallel tree-free reduction. The per-window time
// normalization uses the GLOBAL first/last timestamps, so results are
// bit-identical in structure to the single-threaded kernel.
void voxelize_trilinear_mt(
    const float* x, const float* y, const float* p, const float* t,
    int64_t n, int C, int H, int W, float* grid, int n_threads) {
  if (n == 0) return;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads <= 1 || n < 65536) {
    voxelize_trilinear(x, y, p, t, n, C, H, W, grid);
    return;
  }
  const int64_t cells = (int64_t)C * H * W;
  const float t0v = t[0];
  float dt = t[n - 1] - t0v;
  if (dt <= 0.f) dt = 1.f;
  const float tscale = (C - 1) / dt;
  std::vector<std::vector<float>> priv(n_threads - 1);
  std::vector<std::thread> threads;
  const int64_t per = (n + n_threads - 1) / n_threads;

  auto work = [&](int ti, float* g) {
    const int64_t lo = ti * per;
    const int64_t hi = std::min(lo + per, n);
    const int64_t HW = (int64_t)H * W;
    for (int64_t i = lo; i < hi; ++i) {
      const float xf = x[i], yf = y[i];
      const float tn = (t[i] - t0v) * tscale;
      const int x0 = (int)xf, y0 = (int)yf, tt0 = (int)tn;
      const float value = 2.f * p[i] - 1.f;
      for (int dx = 0; dx < 2; ++dx) {
        const int xl = x0 + dx;
        if (xl < 0 || xl >= W) continue;
        const float wx = 1.f - std::fabs((float)xl - xf);
        for (int dy = 0; dy < 2; ++dy) {
          const int yl = y0 + dy;
          if (yl < 0 || yl >= H) continue;
          const float wy = 1.f - std::fabs((float)yl - yf);
          for (int dtt = 0; dtt < 2; ++dtt) {
            const int tl = tt0 + dtt;
            if (tl < 0 || tl >= C) continue;
            const float wt = 1.f - std::fabs((float)tl - tn);
            g[tl * HW + (int64_t)yl * W + xl] += value * wx * wy * wt;
          }
        }
      }
    }
  };

  for (int ti = 1; ti < n_threads; ++ti) {
    priv[ti - 1].assign(cells, 0.f);
    threads.emplace_back(work, ti, priv[ti - 1].data());
  }
  work(0, grid);
  for (auto& th : threads) th.join();
  for (auto& g : priv) {
    for (int64_t i = 0; i < cells; ++i) grid[i] += g[i];
  }
}

// Batched windowed DSEC trilinear voxelization: n_win independent windows,
// window w holding counts[w] valid events at offset w*K in the flat x/y/p/t
// arrays. Windows are distributed dynamically across n_threads; each thread
// reuses one private CHW scratch grid. Per window: trilinear scatter,
// optional nonzero normalization (norm_mode as above), bottom-crop, and the
// requested output layout. This batches the whole input-pipeline hot loop
// (dsec.py get_batch) into ONE native call whose parallel axis is the B*T
// window grid.
//
// layout 0: out[w] = [(H-crop_bottom), W, C] (HWC, strided transpose).
// layout 1: out[w] = [C, (H-crop_bottom), W] (planar CHW, pure memcpy) —
//   the TPU wire format: the device entry buffer keeps (H, W) as the tiled
//   minor dims so XLA pads nothing (vs 25x pad of a C=5 minor dim).
void voxelize_trilinear_windows(
    const float* x, const float* y, const float* p, const float* t,
    const int64_t* counts, int64_t n_win, int64_t K,
    int C, int H, int W, int crop_bottom, int norm_mode,
    float* out, int n_threads, int layout) {
  const int Ho = H - crop_bottom;
  const int64_t cells = (int64_t)C * H * W;
  const int64_t out_cells = (int64_t)Ho * W * C;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = (int)std::min<int64_t>(std::max(n_threads, 1), n_win);

  std::atomic<int64_t> next(0);
  auto work = [&]() {
    std::vector<float> scratch(cells);
    const int64_t HW = (int64_t)H * W;
    for (;;) {
      const int64_t w = next.fetch_add(1);
      if (w >= n_win) return;
      float* o = out + w * out_cells;
      const int64_t n = counts[w];
      if (n == 0) {
        std::memset(o, 0, out_cells * sizeof(float));
        continue;
      }
      float* g = scratch.data();
      std::memset(g, 0, cells * sizeof(float));
      voxelize_trilinear(x + w * K, y + w * K, p + w * K, t + w * K,
                         n, C, H, W, g);
      normalize_nonzero_mode(g, cells, norm_mode);
      if (layout == 1) {
        for (int c = 0; c < C; ++c) {
          std::memcpy(o + (int64_t)c * Ho * W, g + (int64_t)c * HW,
                      (size_t)Ho * W * sizeof(float));
        }
      } else {
        for (int c = 0; c < C; ++c) {
          const float* gc = g + (int64_t)c * HW;
          for (int h = 0; h < Ho; ++h) {
            const float* row = gc + (int64_t)h * W;
            float* orow = o + ((int64_t)h * W) * C + c;
            for (int wv = 0; wv < W; ++wv) orow[(int64_t)wv * C] = row[wv];
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int ti = 1; ti < n_threads; ++ti) threads.emplace_back(work);
  work();
  for (auto& th : threads) th.join();
}

// Batched windowed DDD17 voxelization (bilinear in t, per-polarity), same
// window layout as voxelize_trilinear_windows. out[w] = [H, W, Cout] with
// Cout = 2*C (separate_pol: pos bins then neg bins) or C (pos - neg);
// layout 1 emits planar [Cout, H, W] instead (TPU wire format, memcpy).
void voxelize_bilinear_t_windows(
    const float* x, const float* y, const float* p, const float* t,
    const int64_t* counts, int64_t n_win, int64_t K,
    int C, int H, int W, int separate_pol, int norm_mode,
    float* out, int n_threads, int layout) {
  const int Cout = separate_pol ? 2 * C : C;
  const int64_t HW = (int64_t)H * W;
  const int64_t cells = (int64_t)C * HW;
  const int64_t out_cells = (int64_t)HW * Cout;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = (int)std::min<int64_t>(std::max(n_threads, 1), n_win);

  std::atomic<int64_t> next(0);
  auto work = [&]() {
    std::vector<float> pos(cells), neg(cells), merged;
    if (!separate_pol) merged.resize(cells);
    for (;;) {
      const int64_t w = next.fetch_add(1);
      if (w >= n_win) return;
      float* o = out + w * out_cells;
      const int64_t n = counts[w];
      if (n == 0) {
        std::memset(o, 0, out_cells * sizeof(float));
        continue;
      }
      std::memset(pos.data(), 0, cells * sizeof(float));
      std::memset(neg.data(), 0, cells * sizeof(float));
      // integer-coordinate variant taking float inputs (loader arrays are
      // f32); time math in double as in voxelize_bilinear_t
      {
        const float* xs = x + w * K;
        const float* ys = y + w * K;
        const float* ps = p + w * K;
        const float* ts = t + w * K;
        const double t0v = (double)ts[0];
        double dt = (double)ts[n - 1] - t0v;
        if (dt == 0) dt = 1.0;
        const double tscale = (C - 1) / dt;
        for (int64_t i = 0; i < n; ++i) {
          const int64_t xi = (int64_t)xs[i], yi = (int64_t)ys[i];
          if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
          const double tsn = ((double)ts[i] - t0v) * tscale;
          if (tsn < 0 || tsn >= C) continue;
          const int ti = (int)tsn;
          const float dts = (float)(tsn - ti);
          float* g = (ps[i] == 1.f) ? pos.data() : neg.data();
          const int64_t base = (int64_t)yi * W + xi;
          if (ti < C) g[ti * HW + base] += 1.f - dts;
          if (ti + 1 < C) g[(ti + 1) * HW + base] += dts;
        }
      }
      if (separate_pol) {
        // normalize over the concatenated (pos, neg) grid like the numpy
        // reference (data_util.py:38-48 applies to the stacked grid)
        if (norm_mode) {
          std::vector<float>* grids[2] = {&pos, &neg};
          double sum = 0, sq = 0;
          int64_t cnt = 0;
          for (auto* gv : grids)
            for (int64_t i = 0; i < cells; ++i) {
              const float v = (*gv)[i];
              if (v != 0.f) { sum += v; sq += (double)v * v; ++cnt; }
            }
          if (cnt > 0) {
            const double mean = sum / cnt;
            double var = sq / cnt - mean * mean;
            if (norm_mode == 1 && cnt >= 2)
              var *= (double)cnt / (double)(cnt - 1);
            if (var > 0) {
              const float m = (float)mean, inv = (float)(1.0 / std::sqrt(var));
              for (auto* gv : grids)
                for (int64_t i = 0; i < cells; ++i)
                  if ((*gv)[i] != 0.f) (*gv)[i] = ((*gv)[i] - m) * inv;
            }
          }
        }
        if (layout == 1) {
          std::memcpy(o, pos.data(), (size_t)cells * sizeof(float));
          std::memcpy(o + cells, neg.data(), (size_t)cells * sizeof(float));
        } else {
          for (int c = 0; c < C; ++c) {
            const float* gp = pos.data() + (int64_t)c * HW;
            const float* gn = neg.data() + (int64_t)c * HW;
            for (int64_t hw = 0; hw < HW; ++hw) {
              o[hw * Cout + c] = gp[hw];
              o[hw * Cout + C + c] = gn[hw];
            }
          }
        }
      } else {
        for (int64_t i = 0; i < cells; ++i) merged[i] = pos[i] - neg[i];
        normalize_nonzero_mode(merged.data(), cells, norm_mode);
        if (layout == 1) {
          std::memcpy(o, merged.data(), (size_t)cells * sizeof(float));
        } else {
          for (int c = 0; c < C; ++c) {
            const float* gm = merged.data() + (int64_t)c * HW;
            for (int64_t hw = 0; hw < HW; ++hw) o[hw * Cout + c] = gm[hw];
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int ti = 1; ti < n_threads; ++ti) threads.emplace_back(work);
  work();
  for (auto& th : threads) th.join();
}

// DDD17-style voxel grid: integer coords, bilinear binning along time only,
// separate polarity grids (pos then neg), each [C*H*W] zero-initialized.
void voxelize_bilinear_t(
    const int64_t* xs, const int64_t* ys, const float* p, const int64_t* t,
    int64_t n, int C, int H, int W, float* grid_pos, float* grid_neg) {
  if (n == 0) return;
  const double t0v = (double)t[0];
  double dt = (double)t[n - 1] - t0v;
  if (dt == 0) dt = 1.0;
  const double tscale = (C - 1) / dt;
  const int64_t HW = (int64_t)H * W;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t xi = xs[i], yi = ys[i];
    if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
    const double ts = ((double)t[i] - t0v) * tscale;
    if (ts < 0 || ts >= C) continue;
    const int ti = (int)ts;
    const float dts = (float)(ts - ti);
    float pol = p[i];
    if (pol == 0.f) pol = -1.f;
    float* g = (pol == 1.f) ? grid_pos : grid_neg;
    const int64_t base = (int64_t)yi * W + xi;
    if (ti < C) g[ti * HW + base] += 1.f - dts;
    if (ti + 1 < C) g[(ti + 1) * HW + base] += dts;
  }
}

// 2-channel (neg, pos) event count histogram.
void event_histogram(
    const int64_t* xs, const int64_t* ys, const float* p,
    int64_t n, int H, int W, float* hist_neg, float* hist_pos) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t xi = xs[i], yi = ys[i];
    if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
    float* h = (p[i] == 1.f || p[i] > 0.f) ? hist_pos : hist_neg;
    h[yi * W + xi] += 1.f;
  }
}

// Exact time-window boundary search on a sorted int64 timestamp slice
// (the numba get_time_indices_offsets contract, eventslicer.py:152-203):
// returns idx such that t[idx_start] >= t_start and t[idx_start-1] < t_start.
void time_indices_offsets(
    const int64_t* t, int64_t n, int64_t t_start, int64_t t_end,
    int64_t* idx_start, int64_t* idx_end) {
  *idx_start = std::lower_bound(t, t + n, t_start) - t;
  *idx_end = std::lower_bound(t, t + n, t_end) - t;
}

// Sorted-chunk wire packer for the Pallas sorted-chunk voxelizer
// (openess_tpu/ops/voxelize_chunked.py — see its module docstring for the
// format). Per window: quantize coords to 1/32-px int16 fixed point,
// counting-sort kept events by (16-row tile, x corner), and greedily cut
// the sorted stream into chunks of <= `chunk` events whose x corners fit
// one 128-aligned kernel lane block (2 tiles + spill for trilinear, 1 for
// integer coords). Bit-identical twin of `chunk_events_window`
// (round-half-even quantization via nearbyint; trunc-toward-zero corner
// from integer division). Windows are distributed dynamically across
// threads.
//
// In/out layout: x/y/p as float, t as double [n_win, K] with `valid` uint8;
// outputs xq/yq int16, pq uint8, t_rel float [n_win, nbc, chunk] (caller
// pre-zeroed), counts int32 [n_win, nbc], packed tile descriptors
// (row offset | col offset << 16) int32 [n_win, nbc], t_range [n_win].
void chunk_events_windows(
    const float* x, const float* y, const float* p, const double* t,
    const uint8_t* valid, int64_t n_win, int64_t K,
    int H, int W, int chunk, int nbc, int integer_coords,
    int16_t* xq_o, int16_t* yq_o, uint8_t* pq_o, float* tr_o,
    int32_t* counts_o, int32_t* r0_o, float* trange_o, int n_threads) {
  const int kTile = 16, kFp = 32, kTileC = 128;
  const int n_tiles = (H + kTile - 1) / kTile;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = (int)std::min<int64_t>(std::max(n_threads, 1), n_win);

  const int64_t n_key = (int64_t)n_tiles * W;  // (row tile, x corner) buckets
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    std::vector<int32_t> xq(K), yq(K), key(K), kept(K);
    std::vector<int32_t> key_pos(n_key + 1);  // counts, then slot cursors
    for (;;) {
      const int64_t w = next.fetch_add(1);
      if (w >= n_win) return;
      const float* xw = x + w * K;
      const float* yw = y + w * K;
      const float* pw = p + w * K;
      const double* tw = t + w * K;
      const uint8_t* vw = valid + w * K;
      int16_t* xqw = xq_o + w * (int64_t)nbc * chunk;
      int16_t* yqw = yq_o + w * (int64_t)nbc * chunk;
      uint8_t* pqw = pq_o + w * (int64_t)nbc * chunk;
      float* trw = tr_o + w * (int64_t)nbc * chunk;
      int32_t* cntw = counts_o + w * nbc;
      int32_t* r0w = r0_o + w * nbc;

      // pass 1: t range over valid, quantize, keep-mask, sort-key counts
      double t_first = 0, t_last = 0;
      bool any_valid = false;
      std::fill(key_pos.begin(), key_pos.end(), 0);
      int64_t n_kept = 0;
      for (int64_t i = 0; i < K; ++i) {
        if (!vw[i]) continue;
        const double ti = tw[i];
        if (!any_valid) { t_first = t_last = ti; any_valid = true; }
        else { t_first = std::min(t_first, ti); t_last = std::max(t_last, ti); }
        // f32 x * 32 is exact (mantissa shift), so rounding in float matches
        // the numpy reference's float64 round-half-even bit for bit
        float qx = std::nearbyintf(xw[i] * (float)kFp);
        float qy = std::nearbyintf(yw[i] * (float)kFp);
        qx = std::min(std::max(qx, -32768.f), 32767.f);
        qy = std::min(std::max(qy, -32768.f), 32767.f);
        const int32_t xi = (int32_t)qx, yi = (int32_t)qy;
        bool keep;
        if (integer_coords) {
          keep = xi >= 0 && xi < W * kFp && yi >= 0 && yi < H * kFp;
        } else {
          keep = xi > -2 * kFp && xi < W * kFp && yi > -2 * kFp &&
                 yi < H * kFp;
        }
        if (!keep) continue;
        const int32_t y0 = yi / kFp;  // trunc toward zero (torch .int())
        const int32_t x0 = xi / kFp;
        const int32_t yt = std::min(std::max(y0, 0), H - 1) / kTile;
        const int32_t xc = std::min(std::max(x0, 0), W - 1);
        xq[n_kept] = xi;
        yq[n_kept] = yi;
        key[n_kept] = yt * W + xc;  // (row tile, x corner)
        kept[n_kept] = (int32_t)i;
        ++key_pos[key[n_kept] + 1];
        ++n_kept;
      }
      trange_o[w] = any_valid
          ? (float)std::max(t_last - t_first, 1.0 * (t_last == t_first))
          : 1.f;
      if (trange_o[w] <= 0.f) trange_o[w] = 1.f;
      for (int c = 0; c < nbc; ++c) { cntw[c] = 0; r0w[c] = 0; }
      if (n_kept == 0) continue;

      // pass 2: greedy chunk layout straight from the (row tile, x corner)
      // histogram. Within a row tile the sorted run's x corner is monotone,
      // so a chunk is cut when its events would overflow the kernel's lane
      // block ([c0, c0+2*128) incl. the +1 x-corner spill for trilinear;
      // [c0, c0+128) exact for integer coords), the row tile changes, or
      // the chunk fills (capacity cuts re-anchor c0, matching the numpy
      // reference). A bucket's events land in globally CONSECUTIVE wire
      // slots (capacity continuations are adjacent chunks packed from 0),
      // so key_pos[k] becomes the bucket's running slot cursor and the
      // placement pass below is one stable counting-sort write — no
      // cache-hostile rank indirection. nbc from num_chunks() provably
      // suffices; the guards drop (never write OOB) on a too-small nbc.
      const int32_t span = integer_coords ? kTileC : 2 * kTileC - 1;
      const int64_t wire_end = (int64_t)nbc * chunk;
      int32_t cchunk = -1, in_chunk = 0, c0 = 0, prev_yt = -1;
      bool exhausted = false;
      for (int64_t k = 0; k < n_key; ++k) {
        const int32_t cnt = key_pos[k + 1];  // bucket count (pre-prefix)
        if (cnt == 0) continue;
        if (exhausted) { key_pos[k] = -1; continue; }
        const int32_t yt = (int32_t)(k / W);
        const int32_t x0b = (int32_t)(k % W);  // clipped x corner
        if (cchunk < 0 || yt != prev_yt || x0b - c0 >= span ||
            in_chunk >= chunk) {
          if (cchunk + 1 >= nbc) { exhausted = true; key_pos[k] = -1; continue; }
          ++cchunk;
          in_chunk = 0;
          prev_yt = yt;
          c0 = (x0b / kTileC) * kTileC;
          // packed descriptor: row offset | (col offset << 16)
          r0w[cchunk] = yt * kTile | (c0 << 16);
        }
        key_pos[k] = cchunk * chunk + in_chunk;  // bucket cursor
        int64_t rem = std::min<int64_t>(cnt, wire_end - key_pos[k]);
        if (rem < cnt) exhausted = true;
        while (rem > 0) {
          const int64_t put = std::min<int64_t>(rem, chunk - in_chunk);
          in_chunk += (int32_t)put;
          rem -= put;
          cntw[cchunk] = in_chunk;
          if (in_chunk >= chunk && rem > 0) {
            ++cchunk;  // capacity continuation (< nbc by the rem cap)
            in_chunk = 0;
            c0 = (x0b / kTileC) * kTileC;  // re-anchor, as numpy does
            r0w[cchunk] = prev_yt * kTile | (c0 << 16);
          }
        }
      }
      // padding chunks repeat the last chunk's descriptor
      for (int32_t c = std::max(cchunk, 0) + 1; c < nbc; ++c)
        r0w[c] = r0w[std::max(cchunk, 0)];

      // pass 3: stable counting-sort placement in time order
      for (int64_t e = 0; e < n_kept; ++e) {
        int32_t& cur = key_pos[key[e]];
        if (cur < 0) continue;  // dropped bucket (too-small nbc)
        const int64_t slot = cur++;
        if (slot >= wire_end) continue;  // truncated bucket tail
        xqw[slot] = (int16_t)xq[e];
        yqw[slot] = (int16_t)yq[e];
        const int64_t i = kept[e];
        pqw[slot] = (uint8_t)(pw[i] > 0.f ? 1 : 0);
        trw[slot] = (float)(tw[i] - t_first);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int ti = 1; ti < n_threads; ++ti) threads.emplace_back(work);
  work();
  for (auto& th : threads) th.join();
}

// Nonzero-mean/std normalization in place (biased, EventPreprocessor /
// data_util.py:38-48 semantics).
void normalize_nonzero_inplace(float* grid, int64_t n) {
  double sum = 0, sq = 0;
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float v = grid[i];
    if (v != 0.f) { sum += v; sq += (double)v * v; ++cnt; }
  }
  if (cnt == 0) return;
  const double mean = sum / cnt;
  const double var = sq / cnt - mean * mean;
  const double std = var > 0 ? std::sqrt(var) : 0.0;
  if (std == 0) return;
  const float m = (float)mean, inv = (float)(1.0 / std);
  for (int64_t i = 0; i < n; ++i) {
    if (grid[i] != 0.f) grid[i] = (grid[i] - m) * inv;
  }
}

}  // extern "C"
