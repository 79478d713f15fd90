// MAGI-TPU native IO runtime.
//
// The reference shells out to external native tools for its IO hot paths
// (zstd subprocess for checkpoint shards, ref: checkpointing.py:40-51;
// ffmpeg for frame (de)muxing, ref: video_process.py:207-275).  This
// library provides in-process native equivalents:
//   * threaded shard reading with transparent zstd decompression
//   * bf16<->f32 bulk conversion (checkpoint materialization)
//   * uint8 HWC <-> f32 CHW video frame packing (VAE host boundary)
//
// Exposed via a C ABI for ctypes; Python falls back to numpy/zstandard
// when the library is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC magi_io.cpp -lzstd -o libmagi_io.so

#include <zstd.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int clamp_threads(int n) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  return std::max(1, std::min(n <= 0 ? hw : n, hw));
}

// Run fn(i) for i in [0, n) across t threads.
template <typename F>
void parallel_for(int64_t n, int threads, F fn) {
  threads = clamp_threads(threads);
  if (n <= 0) return;
  if (threads == 1 || n < 4) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// chunked range split for elementwise conversions
template <typename F>
void parallel_chunks(int64_t n, int threads, F fn) {
  threads = clamp_threads(threads);
  const int64_t min_chunk = 1 << 20;
  int64_t n_chunks = std::max<int64_t>(1, std::min<int64_t>(threads, (n + min_chunk - 1) / min_chunk));
  int64_t per = (n + n_chunks - 1) / n_chunks;
  parallel_for(n_chunks, threads, [&](int64_t c) {
    int64_t lo = c * per;
    int64_t hi = std::min(n, lo + per);
    if (lo < hi) fn(lo, hi);
  });
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// zstd
// ---------------------------------------------------------------------------

// Returns decompressed size, or -1 on error.
int64_t magi_zstd_decompress(const uint8_t* src, int64_t src_size, uint8_t* dst, int64_t dst_cap) {
  size_t r = ZSTD_decompress(dst, static_cast<size_t>(dst_cap), src, static_cast<size_t>(src_size));
  if (ZSTD_isError(r)) return -1;
  return static_cast<int64_t>(r);
}

// Decompressed-size probe (-1 unknown, -2 error).
int64_t magi_zstd_content_size(const uint8_t* src, int64_t src_size) {
  unsigned long long r = ZSTD_getFrameContentSize(src, static_cast<size_t>(src_size));
  if (r == ZSTD_CONTENTSIZE_UNKNOWN) return -1;
  if (r == ZSTD_CONTENTSIZE_ERROR) return -2;
  return static_cast<int64_t>(r);
}

// ---------------------------------------------------------------------------
// threaded shard reading (path ends with .zst -> decompress)
// Returns 0 on success; out_sizes[i] = bytes written or -1 per-file error.
// ---------------------------------------------------------------------------

int32_t magi_read_files(const char** paths, int32_t n, uint8_t** dsts, const int64_t* dst_caps,
                        int64_t* out_sizes, int32_t n_threads) {
  std::atomic<int32_t> status(0);
  parallel_for(n, n_threads, [&](int64_t i) {
    out_sizes[i] = -1;
    FILE* f = std::fopen(paths[i], "rb");
    if (!f) { status.store(1); return; }
    std::fseek(f, 0, SEEK_END);
    int64_t fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    const char* dot = std::strrchr(paths[i], '.');
    bool zst = dot && std::strcmp(dot, ".zst") == 0;
    if (!zst) {
      if (fsize > dst_caps[i]) { std::fclose(f); status.store(1); return; }
      size_t got = std::fread(dsts[i], 1, static_cast<size_t>(fsize), f);
      std::fclose(f);
      if (static_cast<int64_t>(got) != fsize) { status.store(1); return; }
      out_sizes[i] = fsize;
    } else {
      std::vector<uint8_t> comp(static_cast<size_t>(fsize));
      size_t got = std::fread(comp.data(), 1, comp.size(), f);
      std::fclose(f);
      if (static_cast<int64_t>(got) != fsize) { status.store(1); return; }
      int64_t r = magi_zstd_decompress(comp.data(), fsize, dsts[i], dst_caps[i]);
      if (r < 0) { status.store(1); return; }
      out_sizes[i] = r;
    }
  });
  return status.load();
}

// File size helper (after zstd content-size probe for .zst).
int64_t magi_payload_size(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  int64_t fsize = std::ftell(f);
  const char* dot = std::strrchr(path, '.');
  bool zst = dot && std::strcmp(dot, ".zst") == 0;
  if (!zst) { std::fclose(f); return fsize; }
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> head(static_cast<size_t>(std::min<int64_t>(fsize, 1 << 16)));
  size_t got = std::fread(head.data(), 1, head.size(), f);
  std::fclose(f);
  if (got == 0) return -1;
  int64_t c = magi_zstd_content_size(head.data(), static_cast<int64_t>(got));
  return c >= 0 ? c : -1;
}

// ---------------------------------------------------------------------------
// dtype conversion
// ---------------------------------------------------------------------------

void magi_bf16_to_f32(const uint16_t* src, float* dst, int64_t n, int32_t n_threads) {
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t bits = static_cast<uint32_t>(src[i]) << 16;
      std::memcpy(&dst[i], &bits, 4);
    }
  });
}

void magi_f32_to_bf16(const float* src, uint16_t* dst, int64_t n, int32_t n_threads) {
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t bits;
      std::memcpy(&bits, &src[i], 4);
      // round-to-nearest-even
      uint32_t rounding = 0x7FFF + ((bits >> 16) & 1);
      dst[i] = static_cast<uint16_t>((bits + rounding) >> 16);
    }
  });
}

// ---------------------------------------------------------------------------
// video frame packing (VAE host boundary)
// ---------------------------------------------------------------------------

// uint8 [T,H,W,3] -> f32 [3,T,H,W] in [-1, 1]
void magi_u8_thwc_to_f32_cthw(const uint8_t* src, float* dst, int64_t T, int64_t H, int64_t W,
                              int32_t n_threads) {
  const int64_t HW = H * W;
  const float inv = 1.0f / 127.5f;
  parallel_for(T, n_threads, [&](int64_t t) {
    const uint8_t* s = src + t * HW * 3;
    for (int64_t p = 0; p < HW; ++p) {
      for (int c = 0; c < 3; ++c) {
        dst[(c * T + t) * HW + p] = static_cast<float>(s[p * 3 + c]) * inv - 1.0f;
      }
    }
  });
}

// f32 [3,T,H,W] in [-1,1] -> uint8 [T,H,W,3]
void magi_f32_cthw_to_u8_thwc(const float* src, uint8_t* dst, int64_t T, int64_t H, int64_t W,
                              int32_t n_threads) {
  const int64_t HW = H * W;
  parallel_for(T, n_threads, [&](int64_t t) {
    uint8_t* d = dst + t * HW * 3;
    for (int64_t p = 0; p < HW; ++p) {
      for (int c = 0; c < 3; ++c) {
        float v = src[(c * T + t) * HW + p] * 127.5f + 127.5f;
        v = std::min(255.0f, std::max(0.0f, v));
        d[p * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  });
}

}  // extern "C"
