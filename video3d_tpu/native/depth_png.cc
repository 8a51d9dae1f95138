// Fast 16-bit grayscale PNG depth decoder (ScanNet depth frames).
//
// The per-frame depth decode sits on the host dataloader's critical path
// (the reference does it through PIL per sample, video_utils.py:215-218).
// This is a minimal, allocation-free PNG reader specialized for ScanNet's
// format — 16-bit grayscale (color type 0), non-interlaced — with zlib
// inflate and full filter reconstruction. Called from Python via ctypes;
// the GIL is released during the call, so the dataloader thread pool gets
// true parallel decode.
//
// Build: make (g++ -O3 -shared -fPIC depth_png.cc -lz)

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kPngMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

inline uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Returns 0 on success. Negative error codes:
//  -1 bad magic / truncated, -2 unsupported format (not 16-bit gray,
//  interlaced, ...), -3 zlib failure, -4 output buffer too small,
//  -5 bad filter byte.
// On success *out_w/*out_h are set and `out` holds row-major uint16
// (host byte order) depth values.
int decode_depth_png(const uint8_t* data, int64_t size, uint16_t* out,
                     int64_t out_capacity, int32_t* out_w, int32_t* out_h) {
  if (size < 8 || memcmp(data, kPngMagic, 8) != 0) return -1;

  int64_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  idat.reserve(size_t(size));

  while (pos + 8 <= size) {
    uint32_t len = read_be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + int64_t(len) > size) return -1;

    if (memcmp(type, "IHDR", 4) == 0) {
      if (len != 13) return -1;
      width = read_be32(body);
      height = read_be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + int64_t(len);
  }

  if (width == 0 || height == 0) return -1;
  if (bit_depth != 16 || color_type != 0 || interlace != 0) return -2;
  if (int64_t(width) * height > out_capacity) return -4;

  const size_t bpp = 2;  // bytes per pixel (16-bit gray)
  const size_t stride = size_t(width) * bpp;
  std::vector<uint8_t> raw((stride + 1) * height);

  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -3;
  zs.next_in = idat.data();
  zs.avail_in = uInt(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw.size());
  int zret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zret != Z_STREAM_END) return -3;

  // Reconstruct filters scanline by scanline.
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* line = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    uint8_t* cur = raw.data() + size_t(y) * (stride + 1) + 1;  // in place

    switch (filter) {
      case 0:  // None
        break;
      case 1:  // Sub
        for (size_t i = bpp; i < stride; ++i) cur[i] = uint8_t(src[i] + cur[i - bpp]);
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i) cur[i] = uint8_t(src[i] + prev[i]);
        break;
      case 3:  // Average
        for (size_t i = 0; i < bpp; ++i) cur[i] = uint8_t(src[i] + prev[i] / 2);
        for (size_t i = bpp; i < stride; ++i)
          cur[i] = uint8_t(src[i] + (int(cur[i - bpp]) + int(prev[i])) / 2);
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < bpp; ++i)
          cur[i] = uint8_t(src[i] + paeth(0, prev[i], 0));
        for (size_t i = bpp; i < stride; ++i)
          cur[i] = uint8_t(src[i] + paeth(cur[i - bpp], prev[i], prev[i - bpp]));
        break;
      default:
        return -5;
    }
    // big-endian 16-bit -> host order into the output
    uint16_t* out_row = out + size_t(y) * width;
    for (uint32_t x = 0; x < width; ++x) {
      out_row[x] = uint16_t((cur[2 * x] << 8) | cur[2 * x + 1]);
    }
    memcpy(prev.data(), cur, stride);
  }

  *out_w = int32_t(width);
  *out_h = int32_t(height);
  return 0;
}

}  // extern "C"
