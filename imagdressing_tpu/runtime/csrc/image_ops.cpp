// Native image data path for the training input pipeline.
//
// The reference feeds training through torch DataLoader worker processes
// doing PIL decode + torchvision transforms (/root/reference/IGPair.py:40-99,
// train.py:409-421). Python-side decode easily starves a TPU train step, so
// the hot path — JPEG decode, bilinear resize, crop, normalize — runs here
// in C++ (libjpeg + hand-rolled SIMD-friendly loops), exposed through a
// plain C ABI consumed via ctypes (imagdressing_tpu/runtime/native.py).
//
// All functions return 0 on success, negative on failure.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <algorithm>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize uint8 HWC -> uint8 HWC.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw, int ch) {
  const float ry = dh > 1 ? static_cast<float>(sh - 1) / (dh - 1) : 0.f;
  const float rx = dw > 1 ? static_cast<float>(sw - 1) / (dw - 1) : 0.f;
  for (int y = 0; y < dh; ++y) {
    const float fy = y * ry;
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * ch;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * ch;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      const float fx = x * rx;
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      for (int c = 0; c < ch; ++c) {
        const float top =
            row0[x0 * ch + c] * (1.f - wx) + row0[x1 * ch + c] * wx;
        const float bot =
            row1[x0 * ch + c] * (1.f - wx) + row1[x1 * ch + c] * wx;
        out[x * ch + c] =
            static_cast<uint8_t>(top * (1.f - wy) + bot * wy + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode a JPEG buffer. Returns 0 and fills *out_h/*out_w on success.
// `out` must hold max_h*max_w*3 bytes; decode fails (-2) if larger.
int igd_jpeg_decode(const uint8_t* data, int64_t size, uint8_t* out,
                    int max_h, int max_w, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  if (h > max_h || w > max_w || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

// Resize (bilinear, shorter side -> `size`), crop at (top, left) to
// (crop_h, crop_w), normalize to [-1, 1] float32 HWC.
int igd_resize_crop_normalize(const uint8_t* src, int sh, int sw, int size,
                              int top, int left, int crop_h, int crop_w,
                              float* out) {
  int rh, rw;
  if (sh < sw) {
    rh = size;
    rw = std::max(1, static_cast<int>(static_cast<int64_t>(sw) * size / sh));
  } else {
    rw = size;
    rh = std::max(1, static_cast<int>(static_cast<int64_t>(sh) * size / sw));
  }
  if (top < 0 || left < 0 || top + crop_h > rh || left + crop_w > rw)
    return -1;
  std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * 3);
  resize_bilinear_u8(src, sh, sw, resized.data(), rh, rw, 3);
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* row =
        resized.data() + (static_cast<size_t>(top + y) * rw + left) * 3;
    float* orow = out + static_cast<size_t>(y) * crop_w * 3;
    for (int i = 0; i < crop_w * 3; ++i) {
      orow[i] = row[i] * (1.f / 127.5f) - 1.f;
    }
  }
  return 0;
}

// CLIP view: shortest-side bicubic-ish (bilinear here) resize to `size`,
// center crop size x size, CLIP mean/std normalize.
int igd_clip_preprocess(const uint8_t* src, int sh, int sw, int size,
                        float* out) {
  static const float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
  static const float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};
  int rh, rw;
  if (sh < sw) {
    rh = size;
    rw = std::max(size, static_cast<int>(static_cast<int64_t>(sw) * size / sh));
  } else {
    rw = size;
    rh = std::max(size, static_cast<int>(static_cast<int64_t>(sh) * size / sw));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * 3);
  resize_bilinear_u8(src, sh, sw, resized.data(), rh, rw, 3);
  const int top = (rh - size) / 2;
  const int left = (rw - size) / 2;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row =
        resized.data() + (static_cast<size_t>(top + y) * rw + left) * 3;
    float* orow = out + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      for (int c = 0; c < 3; ++c) {
        orow[x * 3 + c] =
            (row[x * 3 + c] * (1.f / 255.f) - kMean[c]) / kStd[c];
      }
    }
  }
  return 0;
}

}  // extern "C"
