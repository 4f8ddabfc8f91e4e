// ptts_io — native data-loading core for prompt_tts_tpu.
//
// The reference leans on torch's C++ DataLoader/ATen for its host data
// path (SURVEY.md §2: its only native code lives in dependencies).  This
// library is the TPU framework's equivalent: tar indexing, .npy parsing,
// and the normalize+transpose collate that turns int16 EnCodec codes
// [B, n_q, T] into model latents [B, T, n_q] float32 in [-1, 1] — the
// memory-bandwidth-bound host work, multithreaded in C++.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//        ptts_io.cpp -o libptts_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kTarBlock = 512;

struct TarEntry {
  char name[256];
  uint64_t offset;  // payload offset in file
  uint64_t size;    // payload size in bytes
};

uint64_t parse_octal(const char* p, size_t n) {
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] >= '0' && p[i] <= '7') v = v * 8 + (p[i] - '0');
  }
  return v;
}

int num_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

template <typename F>
void parallel_for(int64_t n, F&& fn) {
  int nt = std::min<int64_t>(num_threads(), n);
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([=]() {
      for (int64_t i = t; i < n; i += nt) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Scan a (possibly uncompressed) tar file; fill up to `max_entries`
// TarEntry records. Returns the number of entries, or -1 on error.
int64_t ptts_tar_index(const char* path, TarEntry* out,
                       int64_t max_entries) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char header[kTarBlock];
  int64_t count = 0;
  uint64_t pos = 0;
  while (std::fread(header, 1, kTarBlock, f) == kTarBlock) {
    pos += kTarBlock;
    if (header[0] == '\0') break;  // end-of-archive zero block
    uint64_t size = parse_octal(header + 124, 12);
    char type = header[156];
    if ((type == '0' || type == '\0') && count < max_entries) {
      std::memset(out[count].name, 0, sizeof(out[count].name));
      // USTAR prefix + name
      if (std::memcmp(header + 257, "ustar", 5) == 0 && header[345] != '\0') {
        size_t plen = strnlen(header + 345, 155);
        std::memcpy(out[count].name, header + 345, plen);
        out[count].name[plen] = '/';
        std::memcpy(out[count].name + plen + 1, header,
                    strnlen(header, 100));
      } else {
        std::memcpy(out[count].name, header, strnlen(header, 100));
      }
      out[count].offset = pos;
      out[count].size = size;
      ++count;
    }
    uint64_t skip = (size + kTarBlock - 1) / kTarBlock * kTarBlock;
    if (std::fseek(f, static_cast<long>(skip), SEEK_CUR) != 0) break;
    pos += skip;
  }
  std::fclose(f);
  return count;
}

// Read `size` bytes at `offset` from `path` into `out`. Returns 0 on ok.
int ptts_read_at(const char* path, uint64_t offset, uint64_t size,
                 uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  size_t got = std::fread(out, 1, size, f);
  std::fclose(f);
  return got == size ? 0 : -3;
}

// Parse a .npy v1/v2 buffer holding an integer [n_q, T] array; write the
// values as int16 into `out` (caller sizes it as n_q*T). Supports dtypes
// <i2, <i4, <i8. Returns 0 on ok and fills rows/cols.
int ptts_npy_to_i16(const uint8_t* buf, uint64_t len, int16_t* out,
                    int64_t* rows, int64_t* cols) {
  if (len < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) return -1;
  int major = buf[6];
  uint64_t header_len;
  uint64_t data_off;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    data_off = 10 + header_len;
  } else {
    header_len = buf[8] | (buf[9] << 8) | (uint64_t(buf[10]) << 16) |
                 (uint64_t(buf[11]) << 24);
    data_off = 12 + header_len;
  }
  std::string header(reinterpret_cast<const char*>(buf + (major == 1 ? 10 : 12)),
                     header_len);
  if (header.find("'fortran_order': True") != std::string::npos) return -2;

  int itemsize;
  if (header.find("'<i2'") != std::string::npos) itemsize = 2;
  else if (header.find("'<i4'") != std::string::npos) itemsize = 4;
  else if (header.find("'<i8'") != std::string::npos) itemsize = 8;
  else return -3;

  auto sp = header.find("'shape': (");
  if (sp == std::string::npos) return -4;
  long r = 0, c = 0;
  if (std::sscanf(header.c_str() + sp, "'shape': (%ld, %ld)", &r, &c) != 2)
    return -4;
  *rows = r;
  *cols = c;
  uint64_t n = static_cast<uint64_t>(r) * c;
  if (data_off + n * itemsize > len) return -5;

  const uint8_t* data = buf + data_off;
  switch (itemsize) {
    case 2:
      std::memcpy(out, data, n * 2);
      break;
    case 4: {
      const int32_t* p = reinterpret_cast<const int32_t*>(data);
      for (uint64_t i = 0; i < n; ++i) out[i] = static_cast<int16_t>(p[i]);
      break;
    }
    case 8: {
      const int64_t* p = reinterpret_cast<const int64_t*>(data);
      for (uint64_t i = 0; i < n; ++i) out[i] = static_cast<int16_t>(p[i]);
      break;
    }
  }
  return 0;
}

// Collate: int16 codes [B, n_q, T] -> float32 latents [B, T, n_q] mapped
// through c * 2/1023 - 1 (the reference /1023 + Normalize(0.5, 0.5)).
// Multithreaded over the batch.
void ptts_collate_codes(const int16_t* codes, int64_t B, int64_t n_q,
                        int64_t T, float* out) {
  const float scale = 2.0f / 1023.0f;
  parallel_for(B, [&](int64_t b) {
    const int16_t* src = codes + b * n_q * T;
    float* dst = out + b * T * n_q;
    for (int64_t q = 0; q < n_q; ++q) {
      const int16_t* row = src + q * T;
      for (int64_t t = 0; t < T; ++t) {
        dst[t * n_q + q] = row[t] * scale - 1.0f;
      }
    }
  });
}

// PCM16 -> float32 [-1, 1), multithreaded.
void ptts_pcm16_to_f32(const int16_t* pcm, int64_t n, float* out) {
  const float inv = 1.0f / 32768.0f;
  constexpr int64_t kChunk = 1 << 20;
  int64_t chunks = (n + kChunk - 1) / kChunk;
  parallel_for(chunks, [&](int64_t c) {
    int64_t lo = c * kChunk, hi = std::min(n, lo + kChunk);
    for (int64_t i = lo; i < hi; ++i) out[i] = pcm[i] * inv;
  });
}

int ptts_version() { return 1; }

}  // extern "C"
