// mirror_loader: native batch assembly for per-slide feature files.
//
// The training hot path reads one .npy feature file per sample, samples
// num_wsi_feature_tokens rows (with replacement iff the slide has fewer
// rows — the semantics of /root/reference/datasets/dataset_pretrain.py:157-161)
// and packs them into a fixed-shape [B, T, D] batch. Doing this in Python
// serializes on the interpreter; here each sample is assembled by a worker
// thread reading the memory-mapped file directly into the output buffer,
// fully parallel and GIL-free. Exposed over a C ABI for ctypes.
//
// Supported input: .npy version 1.0/2.0, C-order, dtype <f4 (float32) or
// <f2 is NOT supported (features are written as float32 by the pipeline).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmirror_loader.so \
//            mirror_loader.cpp -lpthread
// (mirror_tpu/data/native_loader.py builds this automatically.)

#include <atomic>
#include <cstdint>
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct NpyInfo {
  int64_t rows = 0;
  int64_t cols = 0;
  int64_t data_offset = 0;
  bool ok = false;
  std::string error;
};

// Minimal .npy header parser (format spec v1.0/v2.0), float32 C-order 2-D.
NpyInfo parse_npy_header(const unsigned char* buf, size_t size) {
  NpyInfo info;
  if (size < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) {
    info.error = "not a .npy file";
    return info;
  }
  const int major = buf[6];
  size_t header_len, header_start;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    header_start = 10;
  } else {
    // v2.0 length field is 4 bytes: require them before reading (a 10-11
    // byte buffer would read past the end — masked today only because
    // mmap zero-fills to the page boundary, but the parser takes a plain
    // (buf, size) pair and must not rely on that)
    if (size < 12) {
      info.error = "truncated header";
      return info;
    }
    header_len = buf[8] | (buf[9] << 8) | (static_cast<size_t>(buf[10]) << 16) |
                 (static_cast<size_t>(buf[11]) << 24);
    header_start = 12;
  }
  if (header_start + header_len > size) {
    info.error = "truncated header";
    return info;
  }
  std::string header(reinterpret_cast<const char*>(buf + header_start),
                     header_len);
  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos) {
    info.error = "dtype is not <f4";
    return info;
  }
  if (header.find("'fortran_order': True") != std::string::npos) {
    info.error = "fortran order not supported";
    return info;
  }
  const size_t sh = header.find("'shape':");
  if (sh == std::string::npos) {
    info.error = "no shape";
    return info;
  }
  const size_t open = header.find('(', sh);
  const size_t close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) {
    info.error = "bad shape";
    return info;
  }
  const std::string shape = header.substr(open + 1, close - open - 1);
  // exactly one comma => 2-D; sscanf alone would silently accept the first
  // two dims of an N-D array and read it with wrong strides
  if (std::count(shape.begin(), shape.end(), ',') != 1 ||
      (std::sscanf(shape.c_str(), "%ld, %ld", &info.rows, &info.cols) != 2 &&
       std::sscanf(shape.c_str(), "%ld,%ld", &info.rows, &info.cols) != 2)) {
    info.error = "shape is not 2-D";
    return info;
  }
  if (info.rows < 0 || info.cols <= 0) {
    info.error = "bad dims";
    return info;
  }
  info.data_offset = static_cast<int64_t>(header_start + header_len);
  info.ok = true;
  return info;
}

struct MappedFile {
  unsigned char* data = nullptr;
  size_t size = 0;
  bool ok = false;
};

MappedFile map_file(const char* path) {
  MappedFile m;
  const int fd = ::open(path, O_RDONLY);
  if (fd < 0) return m;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size <= 0) {
    ::close(fd);
    return m;
  }
  void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (p == MAP_FAILED) return m;
  m.data = static_cast<unsigned char*>(p);
  m.size = st.st_size;
  m.ok = true;
  return m;
}

// Sample one slide's rows into out[t, :] for t in [0, n_tokens).
// Returns 0 on success, a negative error code otherwise.
int gather_one(const char* path, int64_t n_tokens, int64_t feature_dim,
               uint64_t seed, float* out) {
  MappedFile m = map_file(path);
  if (!m.ok) return -1;
  NpyInfo info = parse_npy_header(m.data, m.size);
  if (!info.ok || info.cols != feature_dim) {
    ::munmap(m.data, m.size);
    return info.ok ? -3 : -2;
  }
  // a truncated file whose header promises more data than is mapped would
  // make the memcpys below read past the mapping (SIGBUS, uncatchable)
  const uint64_t need = static_cast<uint64_t>(info.rows) *
                        static_cast<uint64_t>(info.cols) * sizeof(float);
  if (static_cast<uint64_t>(info.data_offset) + need > m.size) {
    ::munmap(m.data, m.size);
    return -4;  // truncated data section
  }
  if (info.rows == 0) {
    // uniform_int_distribution(0, -1) is UB; mirror the numpy path's
    // rng.choice(0, t) ValueError with a clean error code instead
    ::munmap(m.data, m.size);
    return -5;  // empty slide
  }
  const float* rows =
      reinterpret_cast<const float*>(m.data + info.data_offset);
  std::mt19937_64 rng(seed);
  const int64_t n = info.rows;
  if (n >= n_tokens) {
    // sample WITHOUT replacement: partial Fisher-Yates over an index pool
    std::vector<int64_t> pool(n);
    for (int64_t i = 0; i < n; ++i) pool[i] = i;
    for (int64_t t = 0; t < n_tokens; ++t) {
      std::uniform_int_distribution<int64_t> dist(t, n - 1);
      std::swap(pool[t], pool[dist(rng)]);
      std::memcpy(out + t * feature_dim, rows + pool[t] * feature_dim,
                  feature_dim * sizeof(float));
    }
  } else {
    // fewer rows than tokens: sample WITH replacement
    std::uniform_int_distribution<int64_t> dist(0, n - 1);
    for (int64_t t = 0; t < n_tokens; ++t) {
      const int64_t r = dist(rng);
      std::memcpy(out + t * feature_dim, rows + r * feature_dim,
                  feature_dim * sizeof(float));
    }
  }
  ::munmap(m.data, m.size);
  return 0;
}

}  // namespace

extern "C" {

// Reads the (rows, cols) of a .npy file. Returns 0 on success.
int mirror_npy_shape(const char* path, int64_t* rows, int64_t* cols) {
  MappedFile m = map_file(path);
  if (!m.ok) return -1;
  NpyInfo info = parse_npy_header(m.data, m.size);
  ::munmap(m.data, m.size);
  if (!info.ok) return -2;
  *rows = info.rows;
  *cols = info.cols;
  return 0;
}

// Assemble a [batch, n_tokens, feature_dim] float32 batch from `batch`
// feature files, each sampled with its own seed. `paths` is a flat array of
// NUL-terminated strings. Runs one worker thread per sample (bounded by
// num_threads). Returns 0 on success; otherwise the first nonzero
// per-sample error code.
int mirror_gather_batch(const char** paths, int64_t batch, int64_t n_tokens,
                        int64_t feature_dim, const uint64_t* seeds,
                        float* out, int64_t num_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> status(0);
  const int64_t workers =
      std::max<int64_t>(1, std::min<int64_t>(num_threads, batch));
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int64_t w = 0; w < workers; ++w) {
    threads.emplace_back([&]() {
      for (;;) {
        const int64_t i = next.fetch_add(1);
        if (i >= batch) break;
        const int rc = gather_one(paths[i], n_tokens, feature_dim, seeds[i],
                                  out + i * n_tokens * feature_dim);
        if (rc != 0) {
          int expected = 0;
          status.compare_exchange_strong(expected, rc);
        }
      }
    });
  }
  for (auto& t : threads) t.join();
  return status.load();
}

}  // extern "C"
