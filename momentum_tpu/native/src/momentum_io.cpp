// Native IO runtime for momentum_tpu.
//
// The reference keeps its hot IO paths in C++ (ezc3d for C3D parsing,
// momentum/io/motion/mmo_io.cpp for binary motion). The TPU framework keeps
// the same split: XLA owns the compute path, and this small C++ library owns
// the host-side binary IO — memory-mapped C3D point-stream decoding and .mmo
// motion files — exposed through a minimal extern "C" surface consumed via
// ctypes (no pybind11 dependency). Python fallbacks exist for every entry
// point; this library is the default fast path once built.
//
// Build: g++ -O3 -shared -fPIC momentum_io.cpp -o libmomentum_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
  bool ok = false;
};

Buffer read_file(const char* path) {
  Buffer b;
  FILE* f = std::fopen(path, "rb");
  if (!f) return b;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  b.data.resize(static_cast<size_t>(n));
  b.ok = (std::fread(b.data.data(), 1, b.data.size(), f) == b.data.size());
  std::fclose(f);
  return b;
}

inline uint16_t rd_u16(const uint8_t* p, bool be) {
  return be ? static_cast<uint16_t>((p[0] << 8) | p[1])
            : static_cast<uint16_t>(p[0] | (p[1] << 8));
}

inline int16_t rd_i16(const uint8_t* p, bool be) {
  return static_cast<int16_t>(rd_u16(p, be));
}

inline float rd_f32(const uint8_t* p, bool be, bool dec) {
  if (dec) {
    // VAX F: swap 16-bit words, read LE IEEE, divide by 4
    uint8_t sw[4] = {p[2], p[3], p[0], p[1]};
    float v;
    std::memcpy(&v, sw, 4);
    return v / 4.0f;
  }
  uint8_t tmp[4];
  if (be) {
    tmp[0] = p[3]; tmp[1] = p[2]; tmp[2] = p[1]; tmp[3] = p[0];
  } else {
    std::memcpy(tmp, p, 4);
  }
  float v;
  std::memcpy(&v, tmp, 4);
  return v;
}

struct C3dHeader {
  int n_points = 0;
  int analog_per_frame = 0;
  int n_frames = 0;
  int data_start = 0;   // byte offset
  float scale = 0.f;    // >0 => int data
  float rate = 0.f;
  bool be = false;      // big endian (MIPS)
  bool dec = false;     // VAX floats
  bool ok = false;
};

C3dHeader parse_header(const Buffer& b) {
  C3dHeader h;
  if (b.data.size() < 512) return h;
  const uint8_t* d = b.data.data();
  if (d[1] != 0x50) return h;
  int param_block = d[0];
  size_t pstart = static_cast<size_t>(param_block - 1) * 512;
  if (pstart + 4 > b.data.size()) return h;
  // processor type = 83 + x: 84 Intel (LE IEEE), 85 DEC (VAX), 86 MIPS (BE)
  int proc = d[pstart + 3];
  h.be = (proc == 86);
  h.dec = (proc == 85);
  h.n_points = rd_u16(d + 2, h.be);
  h.analog_per_frame = rd_u16(d + 4, h.be);
  int first = rd_u16(d + 6, h.be);
  int last = rd_u16(d + 8, h.be);
  h.n_frames = last - first + 1;
  h.scale = rd_f32(d + 12, h.be, h.dec);
  h.rate = rd_f32(d + 20, h.be, h.dec);
  // Mislabeled files: sanity-check and fall back to IEEE decode
  if (h.dec && !(h.rate >= 1.f && h.rate <= 1e4f && std::fabs(h.scale) < 1e6f)) {
    float ieee_rate = rd_f32(d + 20, h.be, false);
    float ieee_scale = rd_f32(d + 12, h.be, false);
    if (ieee_rate >= 1.f && ieee_rate <= 1e4f && std::fabs(ieee_scale) < 1e6f) {
      h.dec = false;
      h.scale = ieee_scale;
      h.rate = ieee_rate;
    }
  }
  h.data_start = (rd_u16(d + 16, h.be) - 1) * 512;
  h.ok = h.n_points > 0 && h.n_frames > 0 && h.data_start > 0;
  return h;
}

}  // namespace

extern "C" {

// Query: returns 0 on success; fills n_frames, n_points, rate.
int c3d_query(const char* path, int* n_frames, int* n_points, float* rate) {
  Buffer b = read_file(path);
  if (!b.ok) return -1;
  C3dHeader h = parse_header(b);
  if (!h.ok) return -2;
  *n_frames = h.n_frames;
  *n_points = h.n_points;
  *rate = h.rate;
  return 0;
}

// Decode point data: positions (F*M*3 floats), occluded (F*M uint8).
int c3d_read_points(const char* path, float* positions, uint8_t* occluded) {
  Buffer b = read_file(path);
  if (!b.ok) return -1;
  C3dHeader h = parse_header(b);
  if (!h.ok) return -2;
  const uint8_t* d = b.data.data();
  const bool use_float = h.scale < 0;
  const float s = std::fabs(h.scale);
  const int fw = h.n_points * 4 + h.analog_per_frame;
  const size_t word = use_float ? 4 : 2;
  if (h.data_start + static_cast<size_t>(h.n_frames) * fw * word > b.data.size())
    return -3;
  for (int f = 0; f < h.n_frames; ++f) {
    const uint8_t* row = d + h.data_start + static_cast<size_t>(f) * fw * word;
    for (int m = 0; m < h.n_points; ++m) {
      const uint8_t* p = row + static_cast<size_t>(m) * 4 * word;
      float x, y, z, res;
      if (use_float) {
        x = rd_f32(p + 0, h.be, h.dec);
        y = rd_f32(p + 4, h.be, h.dec);
        z = rd_f32(p + 8, h.be, h.dec);
        res = rd_f32(p + 12, h.be, h.dec);
      } else {
        x = rd_i16(p + 0, h.be) * s;
        y = rd_i16(p + 2, h.be) * s;
        z = rd_i16(p + 4, h.be) * s;
        res = static_cast<float>(rd_i16(p + 6, h.be));
      }
      size_t o = (static_cast<size_t>(f) * h.n_points + m);
      positions[o * 3 + 0] = x;
      positions[o * 3 + 1] = y;
      positions[o * 3 + 2] = z;
      occluded[o] = res < 0 ? 1 : 0;
    }
  }
  return 0;
}

// .mmo reader (mmo_io.cpp layout): returns 0 and fills dims on success.
int mmo_query(const char* path, long long* n_params, long long* n_joints,
              long long* n_frames) {
  Buffer b = read_file(path);
  if (!b.ok || b.data.size() < 24) return -1;
  uint64_t p, j, f;
  std::memcpy(&p, b.data.data(), 8);
  std::memcpy(&j, b.data.data() + 8, 8);
  std::memcpy(&f, b.data.data() + 16, 8);
  *n_params = static_cast<long long>(p);
  *n_joints = static_cast<long long>(j);
  *n_frames = static_cast<long long>(f);
  return 0;
}

// Fills poses (F*P floats), scale (J floats), and name blobs as
// newline-joined strings written into caller buffers of given capacities.
int mmo_read(const char* path, float* poses, float* scale, char* param_names,
             long long param_cap, char* joint_names, long long joint_cap) {
  Buffer b = read_file(path);
  if (!b.ok || b.data.size() < 24) return -1;
  const uint8_t* d = b.data.data();
  uint64_t p, j, f;
  std::memcpy(&p, d, 8);
  std::memcpy(&j, d + 8, 8);
  std::memcpy(&f, d + 16, 8);
  size_t off = 24;
  auto read_names = [&](uint64_t count, char* out, long long cap) -> bool {
    long long w = 0;
    for (uint64_t i = 0; i < count; ++i) {
      if (off + 8 > b.data.size()) return false;
      uint64_t ln;
      std::memcpy(&ln, d + off, 8);
      off += 8;
      if (off + ln > b.data.size()) return false;
      if (w + static_cast<long long>(ln) + 1 >= cap) return false;
      std::memcpy(out + w, d + off, ln);
      w += static_cast<long long>(ln);
      out[w++] = '\n';
      off += ln;
    }
    out[w > 0 ? w - 1 : 0] = '\0';
    return true;
  };
  if (!read_names(p, param_names, param_cap)) return -2;
  if (!read_names(j, joint_names, joint_cap)) return -3;
  if (off + 4 * (j + p * f) > b.data.size()) return -4;
  std::memcpy(scale, d + off, 4 * j);
  off += 4 * j;
  std::memcpy(poses, d + off, 4 * p * f);
  return 0;
}

}  // extern "C"

#include <algorithm>

// ---------------------------------------------------------------------------
// GIF89a animation encoder (offline viewer export; LZW per the GIF spec).
// Quantizes RGB to a uniform 6x7x6 cube — identical palette to the Python
// fallback in momentum_tpu/gui/gif.py.

namespace {

class BitWriter {
 public:
  explicit BitWriter(std::vector<uint8_t>& out) : out_(out) {}
  void emit(uint32_t code, int bits) {
    buf_ |= static_cast<uint64_t>(code) << cnt_;
    cnt_ += bits;
    while (cnt_ >= 8) {
      out_.push_back(static_cast<uint8_t>(buf_ & 0xFF));
      buf_ >>= 8;
      cnt_ -= 8;
    }
  }
  void flush() {
    if (cnt_ > 0) out_.push_back(static_cast<uint8_t>(buf_ & 0xFF));
    buf_ = 0;
    cnt_ = 0;
  }

 private:
  std::vector<uint8_t>& out_;
  uint64_t buf_ = 0;
  int cnt_ = 0;
};

void lzw_encode(const uint8_t* idx, size_t n, std::vector<uint8_t>& out) {
  constexpr int kMinCode = 8;
  constexpr int kClear = 1 << kMinCode;           // 256
  constexpr int kEoi = kClear + 1;                // 257
  constexpr int kMaxCode = 4096;
  // prefix-tree table: node = prev_code * 256 + next_pixel
  std::vector<int32_t> table(kMaxCode * 256);
  auto reset = [&]() { std::fill(table.begin(), table.end(), -1); };
  reset();
  BitWriter bw(out);
  int code_size = kMinCode + 1;
  int next_code = kEoi + 1;
  bw.emit(kClear, code_size);
  if (n == 0) {
    bw.emit(kEoi, code_size);
    bw.flush();
    return;
  }
  int prefix = idx[0];
  for (size_t i = 1; i < n; ++i) {
    const uint8_t px = idx[i];
    const int32_t slot = prefix * 256 + px;
    if (table[slot] >= 0) {
      prefix = table[slot];
      continue;
    }
    bw.emit(static_cast<uint32_t>(prefix), code_size);
    table[slot] = next_code++;
    if (next_code > (1 << code_size) && code_size < 12) {
      ++code_size;
    } else if (next_code >= kMaxCode) {
      bw.emit(kClear, code_size);
      reset();
      next_code = kEoi + 1;
      code_size = kMinCode + 1;
    }
    prefix = px;
  }
  bw.emit(static_cast<uint32_t>(prefix), code_size);
  bw.emit(kEoi, code_size);
  bw.flush();
}

inline void put_u16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back(static_cast<uint8_t>(x & 0xFF));
  v.push_back(static_cast<uint8_t>(x >> 8));
}

}  // namespace

extern "C" int gif_encode(const uint8_t* frames, long long f, long long h,
                          long long w, int delay_cs, int loop,
                          const char* out_path) {
  if (f <= 0 || h <= 0 || w <= 0) return 1;
  std::vector<uint8_t> out;
  out.reserve(static_cast<size_t>(f * h * w / 2 + 4096));
  const char* hdr = "GIF89a";
  out.insert(out.end(), hdr, hdr + 6);
  put_u16(out, static_cast<uint16_t>(w));
  put_u16(out, static_cast<uint16_t>(h));
  out.push_back(0xF7);  // GCT, 256 entries, 8 bpp
  out.push_back(0);
  out.push_back(0);
  // palette: 6x7x6 levels + zero padding
  const int lr = 6, lg = 7, lb = 6;
  for (int r = 0; r < lr; ++r)
    for (int g = 0; g < lg; ++g)
      for (int bb = 0; bb < lb; ++bb) {
        out.push_back(static_cast<uint8_t>(r * 255 / (lr - 1)));
        out.push_back(static_cast<uint8_t>(g * 255 / (lg - 1)));
        out.push_back(static_cast<uint8_t>(bb * 255 / (lb - 1)));
      }
  for (int i = lr * lg * lb; i < 256; ++i) {
    out.push_back(0); out.push_back(0); out.push_back(0);
  }
  // netscape loop
  const uint8_t ns[] = {0x21, 0xFF, 0x0B, 'N', 'E', 'T', 'S', 'C', 'A', 'P',
                        'E', '2', '.', '0', 0x03, 0x01};
  out.insert(out.end(), ns, ns + sizeof(ns));
  put_u16(out, static_cast<uint16_t>(loop));
  out.push_back(0);

  const size_t npx = static_cast<size_t>(h * w);
  std::vector<uint8_t> indices(npx);
  for (long long fr = 0; fr < f; ++fr) {
    const uint8_t* img = frames + fr * npx * 3;
    for (size_t p = 0; p < npx; ++p) {
      const int r = (img[3 * p + 0] * (lr - 1) + 127) / 255;
      const int g = (img[3 * p + 1] * (lg - 1) + 127) / 255;
      const int bb = (img[3 * p + 2] * (lb - 1) + 127) / 255;
      indices[p] = static_cast<uint8_t>((r * lg + g) * lb + bb);
    }
    // graphic control
    const uint8_t gc[] = {0x21, 0xF9, 0x04, 0x04};
    out.insert(out.end(), gc, gc + 4);
    put_u16(out, static_cast<uint16_t>(delay_cs));
    out.push_back(0);
    out.push_back(0);
    // image descriptor
    out.push_back(0x2C);
    put_u16(out, 0); put_u16(out, 0);
    put_u16(out, static_cast<uint16_t>(w));
    put_u16(out, static_cast<uint16_t>(h));
    out.push_back(0);
    out.push_back(8);  // LZW min code size
    std::vector<uint8_t> data;
    lzw_encode(indices.data(), npx, data);
    for (size_t off = 0; off < data.size(); off += 255) {
      const size_t len = std::min<size_t>(255, data.size() - off);
      out.push_back(static_cast<uint8_t>(len));
      out.insert(out.end(), data.begin() + off, data.begin() + off + len);
    }
    out.push_back(0);
  }
  out.push_back(0x3B);
  FILE* fp = std::fopen(out_path, "wb");
  if (!fp) return 2;
  const bool ok = std::fwrite(out.data(), 1, out.size(), fp) == out.size();
  std::fclose(fp);
  return ok ? 0 : 3;
}
