// av1tpu native IO: multithreaded YUV 4:2:0 10-bit luma ingestion.
//
// The reference ETL reads frames single-threaded through Python file IO
// (pesquisa_v5/005_rearrange_video_YUV_420_10bit_LOSSLESS.py:142-232). This
// library saturates NVMe/page-cache bandwidth instead: per-frame pread()
// calls fan out over a thread pool directly into the caller's pinned numpy
// buffer (zero intermediate copies), and the tiler emits the same row-major
// zero-padded block layout as av1tpu.ingest.tiler (bit-identical).
//
// C ABI (ctypes-friendly): all functions return 0 on success, negative
// errno-style codes on failure.

#include <cstdint>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>
#include <sys/stat.h>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrShortRead = -2;
constexpr int kErrRange = -3;
constexpr int kErrArg = -4;

struct Geometry {
  int64_t width, height;
  int64_t y_bytes() const { return width * height * 2; }
  int64_t frame_bytes() const {
    int64_t cw = (width + 1) / 2, ch = (height + 1) / 2;
    return y_bytes() + 2 * cw * ch * 2;
  }
};

int read_one_frame(int fd, const Geometry& g, int64_t frame_index,
                   uint16_t* dst, bool validate) {
  const int64_t offset = frame_index * g.frame_bytes();
  int64_t remaining = g.y_bytes();
  char* out = reinterpret_cast<char*>(dst);
  int64_t pos = offset;
  while (remaining > 0) {
    ssize_t got = pread(fd, out, remaining, pos);
    if (got <= 0) return kErrShortRead;
    remaining -= got;
    out += got;
    pos += got;
  }
  if (validate) {
    const int64_t n = g.width * g.height;
    for (int64_t i = 0; i < n; ++i) {
      if (dst[i] > 1023) return kErrRange;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Read `num_frames` luma planes (little-endian uint16, H*W each) into
// `out` (num_frames * H * W uint16, caller-allocated), parallelized over
// `num_threads` workers (0 = hardware concurrency).
int av1tpu_read_y_frames(const char* path, int64_t width, int64_t height,
                         const int64_t* frame_indices, int64_t num_frames,
                         uint16_t* out, int validate, int num_threads) {
  if (width <= 0 || height <= 0 || num_frames < 0) return kErrArg;
  Geometry g{width, height};
  int fd = open(path, O_RDONLY);
  if (fd < 0) return kErrOpen;

  int workers = num_threads > 0
                    ? num_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  if (workers < 1) workers = 1;
  if (workers > num_frames && num_frames > 0) workers = static_cast<int>(num_frames);

  std::atomic<int64_t> next(0);
  std::atomic<int> status(0);
  const int64_t plane = width * height;

  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= num_frames || status.load() != 0) return;
      int rc = read_one_frame(fd, g, frame_indices[i], out + i * plane,
                              validate != 0);
      if (rc != 0) status.store(rc);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  close(fd);
  return status.load();
}

// Tile (num_frames, H, W) planes into row-major zero-padded
// (num_frames * rows * cols, bs, bs) blocks. Layout matches
// av1tpu.ingest.tiler.tile_frames exactly.
int av1tpu_tile_frames(const uint16_t* frames, int64_t num_frames,
                       int64_t height, int64_t width, int64_t block_size,
                       uint16_t* out_blocks, int num_threads) {
  if (block_size <= 0 || num_frames < 0) return kErrArg;
  const int64_t rows = (height + block_size - 1) / block_size;
  const int64_t cols = (width + block_size - 1) / block_size;
  const int64_t blocks_per_frame = rows * cols;
  const int64_t block_elems = block_size * block_size;

  int workers = num_threads > 0
                    ? num_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  if (workers < 1) workers = 1;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t f = next.fetch_add(1);
      if (f >= num_frames) return;
      const uint16_t* plane = frames + f * height * width;
      uint16_t* fout = out_blocks + f * blocks_per_frame * block_elems;
      for (int64_t r = 0; r < rows; ++r) {
        for (int64_t c = 0; c < cols; ++c) {
          uint16_t* blk = fout + (r * cols + c) * block_elems;
          for (int64_t y = 0; y < block_size; ++y) {
            const int64_t src_y = r * block_size + y;
            uint16_t* dst_row = blk + y * block_size;
            if (src_y >= height) {
              std::memset(dst_row, 0, block_size * sizeof(uint16_t));
              continue;
            }
            const int64_t src_x = c * block_size;
            const int64_t valid =
                std::min<int64_t>(block_size, width - src_x);
            if (valid > 0) {
              std::memcpy(dst_row, plane + src_y * width + src_x,
                          valid * sizeof(uint16_t));
            }
            if (valid < block_size) {
              std::memset(dst_row + (valid > 0 ? valid : 0), 0,
                          (block_size - (valid > 0 ? valid : 0)) *
                              sizeof(uint16_t));
            }
          }
        }
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

// File sanity: returns frame count via *out_frames, or negative error.
int av1tpu_probe_yuv(const char* path, int64_t width, int64_t height,
                     int64_t* out_frames, int64_t* out_remainder) {
  Geometry g{width, height};
  struct stat st;
  if (stat(path, &st) != 0) return kErrOpen;
  if (st.st_size < g.frame_bytes()) return kErrShortRead;
  *out_frames = st.st_size / g.frame_bytes();
  *out_remainder = st.st_size % g.frame_bytes();
  return 0;
}

}  // extern "C"
