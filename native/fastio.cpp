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
  // Values too large for the fast fixed-point path: fall back to snprintf.
  // Bound is UINT64_MAX / 1e6 (~1.8446e13): above it `v * 1e6` overflows
  // uint64 and the digits would be garbage.
  if (v >= 1.8446744073709e13) {
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

// JET colormap LUT application: gray (n,) -> bgr (n, 3). The table is the
// EXACT cv2.applyColorMap(..., COLORMAP_JET) 256-entry LUT (captured from
// OpenCV 5.0; byte-tested in tests/test_io.py) so the depth viz PNG matches
// the reference byte-for-byte (generate_construction_data.py:1690-1709).
static const uint8_t kJetLutBGR[256][3] = {
  {128,0,0}, {132,0,0}, {136,0,0}, {140,0,0}, {144,0,0}, {148,0,0}, {152,0,0}, {156,0,0},
  {160,0,0}, {164,0,0}, {168,0,0}, {172,0,0}, {176,0,0}, {180,0,0}, {184,0,0}, {188,0,0},
  {192,0,0}, {196,0,0}, {200,0,0}, {204,0,0}, {208,0,0}, {212,0,0}, {216,0,0}, {220,0,0},
  {224,0,0}, {228,0,0}, {232,0,0}, {236,0,0}, {240,0,0}, {244,0,0}, {248,0,0}, {252,0,0},
  {255,0,0}, {255,4,0}, {255,8,0}, {255,12,0}, {255,16,0}, {255,20,0}, {255,24,0}, {255,28,0},
  {255,32,0}, {255,36,0}, {255,40,0}, {255,44,0}, {255,48,0}, {255,52,0}, {255,56,0}, {255,60,0},
  {255,64,0}, {255,68,0}, {255,72,0}, {255,76,0}, {255,80,0}, {255,84,0}, {255,88,0}, {255,92,0},
  {255,96,0}, {255,100,0}, {255,104,0}, {255,108,0}, {255,112,0}, {255,116,0}, {255,120,0}, {255,124,0},
  {255,128,0}, {255,132,0}, {255,136,0}, {255,140,0}, {255,144,0}, {255,148,0}, {255,152,0}, {255,156,0},
  {255,160,0}, {255,164,0}, {255,168,0}, {255,172,0}, {255,176,0}, {255,180,0}, {255,184,0}, {255,188,0},
  {255,192,0}, {255,196,0}, {255,200,0}, {255,204,0}, {255,208,0}, {255,212,0}, {255,216,0}, {255,220,0},
  {255,224,0}, {255,228,0}, {255,232,0}, {255,236,0}, {255,240,0}, {255,244,0}, {255,248,0}, {255,252,0},
  {254,255,2}, {250,255,6}, {246,255,10}, {242,255,14}, {238,255,18}, {234,255,22}, {230,255,26}, {226,255,30},
  {222,255,34}, {218,255,38}, {214,255,42}, {210,255,46}, {206,255,50}, {202,255,54}, {198,255,58}, {194,255,62},
  {190,255,66}, {186,255,70}, {182,255,74}, {178,255,78}, {174,255,82}, {170,255,86}, {166,255,90}, {162,255,94},
  {158,255,98}, {154,255,102}, {150,255,106}, {146,255,110}, {142,255,114}, {138,255,118}, {134,255,122}, {130,255,126},
  {126,255,130}, {122,255,134}, {118,255,138}, {114,255,142}, {110,255,146}, {106,255,150}, {102,255,154}, {98,255,158},
  {94,255,162}, {90,255,166}, {86,255,170}, {82,255,174}, {78,255,178}, {74,255,182}, {70,255,186}, {66,255,190},
  {62,255,194}, {58,255,198}, {54,255,202}, {50,255,206}, {46,255,210}, {42,255,214}, {38,255,218}, {34,255,222},
  {30,255,226}, {26,255,230}, {22,255,234}, {18,255,238}, {14,255,242}, {10,255,246}, {6,255,250}, {1,255,254},
  {0,252,255}, {0,248,255}, {0,244,255}, {0,240,255}, {0,236,255}, {0,232,255}, {0,228,255}, {0,224,255},
  {0,220,255}, {0,216,255}, {0,212,255}, {0,208,255}, {0,204,255}, {0,200,255}, {0,196,255}, {0,192,255},
  {0,188,255}, {0,184,255}, {0,180,255}, {0,176,255}, {0,172,255}, {0,168,255}, {0,164,255}, {0,160,255},
  {0,156,255}, {0,152,255}, {0,148,255}, {0,144,255}, {0,140,255}, {0,136,255}, {0,132,255}, {0,128,255},
  {0,124,255}, {0,120,255}, {0,116,255}, {0,112,255}, {0,108,255}, {0,104,255}, {0,100,255}, {0,96,255},
  {0,92,255}, {0,88,255}, {0,84,255}, {0,80,255}, {0,76,255}, {0,72,255}, {0,68,255}, {0,64,255},
  {0,60,255}, {0,56,255}, {0,52,255}, {0,48,255}, {0,44,255}, {0,40,255}, {0,36,255}, {0,32,255},
  {0,28,255}, {0,24,255}, {0,20,255}, {0,16,255}, {0,12,255}, {0,8,255}, {0,4,255}, {0,0,255},
  {0,0,252}, {0,0,248}, {0,0,244}, {0,0,240}, {0,0,236}, {0,0,232}, {0,0,228}, {0,0,224},
  {0,0,220}, {0,0,216}, {0,0,212}, {0,0,208}, {0,0,204}, {0,0,200}, {0,0,196}, {0,0,192},
  {0,0,188}, {0,0,184}, {0,0,180}, {0,0,176}, {0,0,172}, {0,0,168}, {0,0,164}, {0,0,160},
  {0,0,156}, {0,0,152}, {0,0,148}, {0,0,144}, {0,0,140}, {0,0,136}, {0,0,132}, {0,0,128}
};

void jet_colormap(const uint8_t* gray, uint8_t* bgr, long n) {
  for (long i = 0; i < n; ++i) {
    const uint8_t* c = kJetLutBGR[gray[i]];
    bgr[3 * i] = c[0]; bgr[3 * i + 1] = c[1]; bgr[3 * i + 2] = c[2];
  }
}

}  // extern "C"
