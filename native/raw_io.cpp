// Native IO core for consistent_depth_tpu.
//
// Fast C++ implementations of the hot host-side IO paths, exposed via a
// plain C ABI for ctypes binding (no pybind11 in this image):
//   - .raw float32 codec (bit-compatible with the reference layout,
//     see consistent_depth_tpu/io/image_io.py)
//   - batched .raw reads into a caller-provided arena (dataset load)
//   - COLMAP dense-array (.geometric.bin) reader
//
// Build: make -C native   ->  libcdtpu.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int32_t kCv32F = 5;
constexpr int32_t kCnShift = 3;
constexpr int32_t kCnMax = 512;

#pragma pack(push, 1)
struct RawHeader {
  int32_t h;
  int32_t w;
  int32_t cv_type;
  uint64_t pixel_size;
};
#pragma pack(pop)

static_assert(sizeof(RawHeader) == 20, "raw header must be 20 bytes");

int read_header(FILE* f, RawHeader* hdr, int32_t* channels) {
  if (fread(hdr, sizeof(RawHeader), 1, f) != 1) return -1;
  const int32_t d = ((hdr->cv_type - kCv32F) >> kCnShift) + 1;
  if (d < 1 || d > kCnMax) return -2;
  if (static_cast<uint64_t>(d) * 4 != hdr->pixel_size) return -3;
  *channels = d;
  return 0;
}

}  // namespace

extern "C" {

// Reads only the header. Returns 0 on success; fills h, w, channels.
int cdtpu_raw_header(const char* path, int32_t* h, int32_t* w,
                     int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  RawHeader hdr;
  int32_t d;
  const int rc = read_header(f, &hdr, &d);
  fclose(f);
  if (rc != 0) return rc;
  *h = hdr.h;
  *w = hdr.w;
  *channels = d;
  return 0;
}

// Reads the full image into out (caller-allocated, h*w*channels floats).
int cdtpu_raw_read(const char* path, float* out, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  RawHeader hdr;
  int32_t d;
  int rc = read_header(f, &hdr, &d);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  const int64_t count =
      static_cast<int64_t>(hdr.h) * hdr.w * d;
  if (count > capacity) {
    fclose(f);
    return -4;
  }
  const size_t got = fread(out, sizeof(float), count, f);
  fclose(f);
  return got == static_cast<size_t>(count) ? 0 : -5;
}

// Writes an (h, w, channels) float32 image.
int cdtpu_raw_write(const char* path, const float* data, int32_t h,
                    int32_t w, int32_t channels) {
  if (channels < 1 || channels > kCnMax) return -2;
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  RawHeader hdr{h, w, kCv32F + ((channels - 1) << kCnShift),
                static_cast<uint64_t>(channels) * 4};
  int ok = fwrite(&hdr, sizeof(hdr), 1, f) == 1;
  const int64_t count = static_cast<int64_t>(h) * w * channels;
  ok = ok && fwrite(data, sizeof(float), count, f) ==
                 static_cast<size_t>(count);
  fclose(f);
  return ok ? 0 : -5;
}

// Batched read: paths is a \n-joined list of n files, each expected to
// have identical (h, w, channels); out is an arena of n*h*w*channels
// floats. Returns 0 or the (negative) error of the first failing file.
int cdtpu_raw_read_batch(const char* paths_joined, int32_t n, int32_t h,
                         int32_t w, int32_t channels, float* out) {
  const int64_t stride = static_cast<int64_t>(h) * w * channels;
  const char* p = paths_joined;
  for (int32_t i = 0; i < n; ++i) {
    const char* end = strchr(p, '\n');
    std::string path = end ? std::string(p, end - p) : std::string(p);
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) return -1;
    RawHeader hdr;
    int32_t d;
    int rc = read_header(f, &hdr, &d);
    if (rc != 0 || hdr.h != h || hdr.w != w || d != channels) {
      fclose(f);
      return rc != 0 ? rc : -6;
    }
    const size_t got = fread(out + i * stride, sizeof(float), stride, f);
    fclose(f);
    if (got != static_cast<size_t>(stride)) return -5;
    if (!end) break;
    p = end + 1;
  }
  return 0;
}

// COLMAP dense array reader. Header "w&h&c&" ASCII then float32
// column-major (w, h, c). Output is row-major (h, w, c).
int cdtpu_colmap_array_header(const char* path, int32_t* w, int32_t* h,
                              int32_t* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char buf[64];
  int vals[3] = {0, 0, 0};
  int vi = 0, bi = 0;
  int ch;
  while (vi < 3 && (ch = fgetc(f)) != EOF) {
    if (ch == '&') {
      buf[bi] = 0;
      vals[vi++] = atoi(buf);
      bi = 0;
    } else if (bi < 63) {
      buf[bi++] = static_cast<char>(ch);
    }
  }
  fclose(f);
  if (vi != 3) return -2;
  *w = vals[0];
  *h = vals[1];
  *c = vals[2];
  return 0;
}

int cdtpu_colmap_array_read(const char* path, float* out, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int delims = 0, ch;
  int32_t w = 0, h = 0, c = 0;
  {
    char buf[64];
    int vals[3] = {0, 0, 0};
    int vi = 0, bi = 0;
    while (vi < 3 && (ch = fgetc(f)) != EOF) {
      if (ch == '&') {
        buf[bi] = 0;
        vals[vi++] = atoi(buf);
        bi = 0;
      } else if (bi < 63) {
        buf[bi++] = static_cast<char>(ch);
      }
    }
    if (vi != 3) {
      fclose(f);
      return -2;
    }
    w = vals[0];
    h = vals[1];
    c = vals[2];
    (void)delims;
  }
  const int64_t count = static_cast<int64_t>(w) * h * c;
  if (count > capacity) {
    fclose(f);
    return -4;
  }
  std::vector<float> col(count);
  const size_t got = fread(col.data(), sizeof(float), count, f);
  fclose(f);
  if (got != static_cast<size_t>(count)) return -5;
  // column-major (w, h, c) -> row-major (h, w, c)
  for (int32_t k = 0; k < c; ++k) {
    const float* src = col.data() + static_cast<int64_t>(k) * w * h;
    for (int32_t x = 0; x < w; ++x) {
      for (int32_t y = 0; y < h; ++y) {
        out[(static_cast<int64_t>(y) * w + x) * c + k] =
            src[static_cast<int64_t>(x) * h + y];
      }
    }
  }
  return 0;
}

}  // extern "C"
