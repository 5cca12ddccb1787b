// Fast PLY vertex-body codec for rtgs_tpu (host-side native component).
//
// The reference loads scenes through pyntcloud/pandas (a full DataFrame
// round trip, /root/reference/src/rtgs/scene.py:95-97); our numpy reader is
// already a single memcpy for the interleaved record buffer, but splitting
// 62 interleaved properties into structure-of-arrays columns is a strided
// transpose that numpy does one column at a time. This file does the
// deinterleave (and the inverse interleave for writing) with OpenMP-free
// portable threads, saturating memory bandwidth for multi-million-splat
// scenes.
//
// Exposed via ctypes (no pybind11 in the image): plain C ABI.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Split an interleaved record buffer into per-column destination buffers.
//   src:        nrows * row_stride bytes
//   offsets:    per-column byte offset within a record
//   widths:     per-column byte width (4 or 8 for the 3DGS schema)
//   dsts:       per-column destination buffers (nrows * width bytes each)
void ply_deinterleave(const char* src, int64_t nrows, int64_t row_stride,
                      const int64_t* offsets, const int64_t* widths,
                      int32_t ncols, char** dsts, int32_t nthreads) {
  if (nthreads < 1) nthreads = 1;
  auto worker = [&](int64_t r0, int64_t r1) {
    for (int32_t c = 0; c < ncols; ++c) {
      const int64_t off = offsets[c];
      const int64_t w = widths[c];
      char* dst = dsts[c];
      const char* s = src + r0 * row_stride + off;
      char* d = dst + r0 * w;
      if (w == 4) {
        for (int64_t r = r0; r < r1; ++r) {
          std::memcpy(d, s, 4);
          s += row_stride;
          d += 4;
        }
      } else if (w == 8) {
        for (int64_t r = r0; r < r1; ++r) {
          std::memcpy(d, s, 8);
          s += row_stride;
          d += 8;
        }
      } else {
        for (int64_t r = r0; r < r1; ++r) {
          std::memcpy(d, s, static_cast<size_t>(w));
          s += row_stride;
          d += w;
        }
      }
    }
  };
  if (nthreads == 1 || nrows < (1 << 14)) {
    worker(0, nrows);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (nrows + nthreads - 1) / nthreads;
  for (int32_t t = 0; t < nthreads; ++t) {
    const int64_t r0 = t * chunk;
    const int64_t r1 = std::min<int64_t>(nrows, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back(worker, r0, r1);
  }
  for (auto& th : threads) th.join();
}

// Inverse: pack per-column buffers into an interleaved record buffer.
void ply_interleave(char* dst, int64_t nrows, int64_t row_stride,
                    const int64_t* offsets, const int64_t* widths,
                    int32_t ncols, const char** srcs, int32_t nthreads) {
  if (nthreads < 1) nthreads = 1;
  auto worker = [&](int64_t r0, int64_t r1) {
    for (int32_t c = 0; c < ncols; ++c) {
      const int64_t off = offsets[c];
      const int64_t w = widths[c];
      const char* s = srcs[c] + r0 * w;
      char* d = dst + r0 * row_stride + off;
      for (int64_t r = r0; r < r1; ++r) {
        std::memcpy(d, s, static_cast<size_t>(w));
        s += w;
        d += row_stride;
      }
    }
  };
  if (nthreads == 1 || nrows < (1 << 14)) {
    worker(0, nrows);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (nrows + nthreads - 1) / nthreads;
  for (int32_t t = 0; t < nthreads; ++t) {
    const int64_t r0 = t * chunk;
    const int64_t r1 = std::min<int64_t>(nrows, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back(worker, r0, r1);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
