// Native depth IO: minimal 16-bit grayscale PNG codec + threaded batch loader.
//
// The reference's Integrate stage decodes the raw depth PNG sequence on the
// host (OpenCV imread in Integrate/main.cpp — SURVEY.md §3.5 [K]); the
// decode is pure host-side runtime work, so it stays native here too.  This
// implements exactly the subset the augmented ICL-NUIM layout uses
// (8/16-bit grayscale, non-interlaced, all five PNG row filters) over zlib,
// plus a std::thread fan-out so a host core per file keeps the TPU fed.
//
// C ABI (ctypes-consumed by elasticreconstruction_tpu.native.loader):
//   er_read_depth_png(path, out, max_pixels, &w, &h)      -> 0 on success
//   er_write_depth_png(path, data, w, h)                  -> 0 on success
//   er_read_depth_batch(paths, n, out, w, h, nthreads)    -> 0 on success

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | p[3];
}

void put_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(n);
  bool ok = fread(out.data(), 1, n, f) == size_t(n);
  fclose(f);
  return ok;
}

// Decode a grayscale non-interlaced PNG into uint16 (8-bit widened).
int decode(const std::vector<uint8_t>& buf, uint16_t* out, int max_pixels,
           int* out_w, int* out_h) {
  if (buf.size() < 8 + 25 || memcmp(buf.data(), kSig, 8) != 0) return -1;
  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1;
  std::vector<uint8_t> idat;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > buf.size()) return -2;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = be32(data); h = be32(data + 4);
      bit_depth = data[8]; color_type = data[9];
      if (data[12] != 0) return -3;  // interlaced unsupported
      if (color_type != 0) return -4;  // grayscale only
      if (bit_depth != 8 && bit_depth != 16) return -5;
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0) return -6;
  if (int64_t(w) * h > max_pixels) return -7;

  const int bpp = bit_depth / 8;            // bytes per pixel
  const size_t stride = size_t(w) * bpp;    // bytes per row (unfiltered)
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -8;

  std::vector<uint8_t> prev(stride, 0), cur(stride);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    const uint8_t* row = src + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
      int b = prev[x];
      int c = x >= size_t(bpp) ? prev[x - bpp] : 0;
      int v = row[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -9;
      }
      cur[x] = uint8_t(v);
    }
    uint16_t* dst = out + size_t(y) * w;
    if (bit_depth == 16) {
      for (uint32_t x = 0; x < w; ++x)
        dst[x] = (uint16_t(cur[2 * x]) << 8) | cur[2 * x + 1];
    } else {
      for (uint32_t x = 0; x < w; ++x) dst[x] = cur[x];
    }
    std::swap(prev, cur);
  }
  *out_w = int(w);
  *out_h = int(h);
  return 0;
}

void append_chunk(std::vector<uint8_t>& out, const char* type,
                  const uint8_t* data, uint32_t len) {
  size_t at = out.size();
  out.resize(at + 12 + len);
  put_be32(&out[at], len);
  memcpy(&out[at + 4], type, 4);
  if (len) memcpy(&out[at + 8], data, len);
  uint32_t crc = crc32(0, &out[at + 4], 4 + len);
  put_be32(&out[at + 8 + len], crc);
}

}  // namespace

extern "C" {

int er_read_depth_png(const char* path, uint16_t* out, int max_pixels,
                      int* out_w, int* out_h) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -100;
  return decode(buf, out, max_pixels, out_w, out_h);
}

int er_write_depth_png(const char* path, const uint16_t* data, int w, int h) {
  // Filter 0 rows, big-endian 16-bit samples.
  const size_t stride = size_t(w) * 2;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = &raw[(stride + 1) * y];
    row[0] = 0;
    for (int x = 0; x < w; ++x) {
      uint16_t v = data[size_t(y) * w + x];
      row[1 + 2 * x] = v >> 8;
      row[2 + 2 * x] = v & 0xff;
    }
  }
  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
    return -1;

  std::vector<uint8_t> out(kSig, kSig + 8);
  uint8_t ihdr[13];
  put_be32(ihdr, w);
  put_be32(ihdr + 4, h);
  ihdr[8] = 16; ihdr[9] = 0; ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  append_chunk(out, "IHDR", ihdr, 13);
  append_chunk(out, "IDAT", comp.data(), comp_cap);
  append_chunk(out, "IEND", nullptr, 0);

  FILE* f = fopen(path, "wb");
  if (!f) return -2;
  bool ok = fwrite(out.data(), 1, out.size(), f) == out.size();
  fclose(f);
  return ok ? 0 : -3;
}

int er_read_depth_batch(const char** paths, int n, uint16_t* out, int w, int h,
                        int nthreads) {
  if (nthreads < 1) nthreads = 1;
  std::vector<int> rc(n, 0);
  auto work = [&](int t) {
    for (int k = t; k < n; k += nthreads) {
      int gw = 0, gh = 0;
      rc[k] = er_read_depth_png(paths[k], out + size_t(k) * w * h, w * h, &gw, &gh);
      if (rc[k] == 0 && (gw != w || gh != h)) rc[k] = -200;
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(work, t);
  for (auto& t : ts) t.join();
  for (int k = 0; k < n; ++k)
    if (rc[k] != 0) return rc[k];
  return 0;
}

}  // extern "C"
