// libwdjpeg.so — host-side JPEG decode for the rawframe input pipeline.
//
// TPU-native replacement for the reference's per-frame cv2/torchvision JPEG
// reads in its dataset hot loop (reference workoutdetector/datasets/
// common.py:99-117 FrameDataset.__getitem__ → read_image ×num_segments,
// SURVEY §3.1 "HOT LOOP (worker procs)"). Design points:
//
//  * RGB straight out of libjpeg (JCS_RGB) — no BGR detour + cvtColor pass.
//  * DCT-scaled decode (libjpeg scale_num/8): when the consumer only needs a
//    short-side=scale frame, the IDCT emits ~scale-sized pixels directly
//    instead of decoding full resolution and resizing after — the decode
//    cost drops with the square of the scale factor.
//  * batch API over a std::thread pool: ctypes releases the GIL for the
//    whole call, so an 8-frame clip decodes on 8 cores regardless of the
//    Python loader's process model.
//  * resize(short side → scale) + center-crop(crop×crop) finish in C++
//    (separable bilinear), emitting the exact read_prepped() geometry of
//    native/decoder.cc — Python never touches non-final pixels.
//
// Error model: never abort the process (libjpeg's default error handler
// calls exit()) — longjmp back, return a negative code, let Python fall
// back to cv2 for that file.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void emit_silent(j_common_ptr, int) {}

// Separable bilinear resize, uint8 RGB interleaved. Matches the geometry of
// cv2.INTER_LINEAR (half-pixel centers); tests bound the pixel drift vs the
// cv2 reference pipeline.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
    return;
  }
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    float cx = (x + 0.5f) * sx - 0.5f;
    cx = std::max(0.0f, std::min(cx, static_cast<float>(sw - 1)));
    x0[x] = static_cast<int>(cx);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    fx[x] = cx - x0[x];
  }
  for (int y = 0; y < dh; ++y) {
    float cy = (y + 0.5f) * sy - 0.5f;
    cy = std::max(0.0f, std::min(cy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(cy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float fy = cy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float wx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + (r0[b + c] - r0[a + c]) * wx;
        const float bot = r1[a + c] + (r1[b + c] - r1[a + c]) * wx;
        const float v = top + (bot - top) * fy;
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// EXIF orientation (tag 0x0112) from the APP1 segment, 1 if absent or
// unparseable. libjpeg ignores EXIF; cv2.imread applies it — files with
// a non-identity orientation are REJECTED (rc -4) so the Python caller
// falls back to cv2 and keeps the upright-image behavior.
uint32_t rd(const uint8_t* p, int n, bool be) {
  uint32_t v = 0;
  for (int i = 0; i < n; ++i) v = (v << 8) | p[be ? i : n - 1 - i];
  return v;
}

int exif_orientation(const uint8_t* data, long len) {
  long i = 2;  // past SOI
  while (i + 4 <= len && data[i] == 0xFF) {
    const uint8_t marker = data[i + 1];
    if (marker == 0xDA || marker == 0xD9) break;  // SOS/EOI: no APP1
    const long seg = (static_cast<long>(data[i + 2]) << 8) | data[i + 3];
    if (seg < 2 || i + 2 + seg > len) break;
    if (marker == 0xE1 && seg >= 16 &&
        std::memcmp(data + i + 4, "Exif\0\0", 6) == 0) {
      const uint8_t* t = data + i + 10;          // TIFF header
      const long tlen = seg - 8;
      if (tlen < 8) break;
      bool be;
      if (t[0] == 'M' && t[1] == 'M') be = true;
      else if (t[0] == 'I' && t[1] == 'I') be = false;
      else break;
      const uint32_t ifd = rd(t + 4, 4, be);
      if (ifd + 2 > static_cast<uint32_t>(tlen)) break;
      const uint32_t n = rd(t + ifd, 2, be);
      for (uint32_t e = 0; e < n; ++e) {
        const uint32_t off = ifd + 2 + 12 * e;
        if (off + 12 > static_cast<uint32_t>(tlen)) break;
        if (rd(t + off, 2, be) == 0x0112)
          return static_cast<int>(rd(t + off + 8, 2, be));
      }
      break;
    }
    i += 2 + seg;
  }
  return 1;
}

// Decode one JPEG from memory. target_short > 0 enables DCT prescaling to
// the smallest IDCT scale whose short side is still >= target_short.
// Returns 0 and fills *w/*h (buffer `out` must hold h*w*3) — the caller
// first asks for dims with out == nullptr (two-phase).
int decode_mem(const uint8_t* data, long len, int target_short, uint8_t* out,
               long out_cap, int* h, int* w) {
  if (len >= 4 && exif_orientation(data, len) != 1)
    return -4;  // EXIF-rotated: caller must use the cv2 path
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  err.pub.emit_message = emit_silent;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr → RGB; CMYK will error out
  if (target_short > 0) {
    const int src_short = std::min(cinfo.image_width, cinfo.image_height);
    int num = 8;
    while (num > 1 && (src_short * (num - 1)) / 8 >= target_short) --num;
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }
  jpeg_calc_output_dimensions(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  if (out == nullptr) {  // dims-only probe
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (static_cast<long>(*h) * (*w) * 3 > out_cap ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  jpeg_start_decompress(&cinfo);
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rowp = out + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return -1;
  }
  buf->resize(static_cast<size_t>(n));
  const size_t got = std::fread(buf->data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n) ? 0 : -1;
}

// decode one file → read_prepped geometry (short side → scale, center crop
// crop×crop) into out (crop*crop*3).
int decode_prepped_one(const char* path, int scale, int crop, uint8_t* out) {
  std::vector<uint8_t> file;
  if (read_file(path, &file) != 0) return -1;
  int h = 0, w = 0;
  // probe dims at the DCT-scaled size
  if (decode_mem(file.data(), static_cast<long>(file.size()), scale, nullptr,
                 0, &h, &w) != 0)
    return -2;
  std::vector<uint8_t> px(static_cast<size_t>(h) * w * 3);
  if (decode_mem(file.data(), static_cast<long>(file.size()), scale,
                 px.data(), static_cast<long>(px.size()), &h, &w) != 0)
    return -2;
  // short side → scale (aspect preserved), matching resize_short_side
  int th, tw;
  if (h <= w) {
    th = scale;
    tw = std::max(1L, std::lround(static_cast<double>(w) * scale / h));
  } else {
    th = std::max(1L, std::lround(static_cast<double>(h) * scale / w));
    tw = scale;
  }
  std::vector<uint8_t> rs(static_cast<size_t>(th) * tw * 3);
  resize_bilinear(px.data(), h, w, rs.data(), th, tw);
  // center crop crop×crop (crop <= scale enforced by the wrapper)
  const int y = std::max(0, (th - crop) / 2);
  const int x = std::max(0, (tw - crop) / 2);
  for (int r = 0; r < crop; ++r) {
    std::memcpy(out + static_cast<size_t>(r) * crop * 3,
                rs.data() + (static_cast<size_t>(y + r) * tw + x) * 3,
                static_cast<size_t>(crop) * 3);
  }
  return 0;
}

}  // namespace

extern "C" {

// Dims of a JPEG file without decoding. Returns 0 on success.
int wdj_dims(const char* path, int* h, int* w) {
  std::vector<uint8_t> file;
  if (read_file(path, &file) != 0) return -1;
  return decode_mem(file.data(), static_cast<long>(file.size()), 0, nullptr,
                    0, h, w);
}

// Full-resolution RGB decode from memory. Python's read_image reads the
// file bytes once and feeds this twice (dims probe, then decode).
int wdj_decode_mem(const uint8_t* data, long len, uint8_t* out, long cap,
                   int* h, int* w) {
  return decode_mem(data, len, 0, out, cap, h, w);
}

// Batch: n files → out (n, crop, crop, 3) with read_prepped geometry
// (DCT-prescale → short side = scale → center crop). threads <= 0 picks
// hardware_concurrency. Returns 0, or -(i+1) for the first failed index.
int wdj_decode_batch_prepped(const char** paths, int n, int scale, int crop,
                             uint8_t* out, int threads) {
  if (n <= 0) return 0;
  if (crop > scale) scale = crop;
  int nt = threads > 0 ? threads
                       : static_cast<int>(std::thread::hardware_concurrency());
  nt = std::max(1, std::min(nt, n));
  std::vector<int> rc(static_cast<size_t>(n), 0);
  const size_t frame = static_cast<size_t>(crop) * crop * 3;
  if (nt == 1) {
    for (int i = 0; i < n; ++i)
      rc[i] = decode_prepped_one(paths[i], scale, crop, out + frame * i);
  } else {
    std::vector<std::thread> pool;
    std::atomic<int> next{0};
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&]() {
        for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
          rc[i] = decode_prepped_one(paths[i], scale, crop, out + frame * i);
      });
    }
    for (auto& th : pool) th.join();
  }
  for (int i = 0; i < n; ++i)
    if (rc[i] != 0) return -(i + 1);
  return 0;
}

}  // extern "C"
