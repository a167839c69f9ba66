// Native host-side kernels for the maskflownet_tpu data runtime.
//
// PNG scanline unfiltering (RFC 2083 filters 0-4) for the 16-bit flow PNG
// codecs (KITTI / HD1K ground truth and submission files). The Python image
// stack in this environment cannot decode 16-bit RGB PNGs losslessly, so the
// framework ships its own codec; the per-byte sequential recurrences of the
// Sub/Average/Paeth filters are the hot loop and live here. Exposed via a
// plain C ABI for ctypes.
//
// Also: batched uint8 crop+flip gather used by the host input pipeline.

#include <cstdint>
#include <cstring>

extern "C" {

// data: h scanlines, each `stride` bytes of raw (filtered) bytes; filters[y]
// is the per-scanline filter id. Unfilters in place. bpp = bytes per pixel.
// Returns 0 on success, -1 on an unknown filter id.
int png_unfilter(uint8_t* data, int64_t h, int64_t stride, int64_t bpp,
                 const uint8_t* filters) {
  for (int64_t y = 0; y < h; ++y) {
    uint8_t* row = data + y * stride;
    const uint8_t* prev = y > 0 ? data + (y - 1) * stride : nullptr;
    switch (filters[y]) {
      case 0:
        break;
      case 1:  // Sub
        for (int64_t i = bpp; i < stride; ++i) row[i] += row[i - bpp];
        break;
      case 2:  // Up
        if (prev)
          for (int64_t i = 0; i < stride; ++i) row[i] += prev[i];
        break;
      case 3:  // Average
        for (int64_t i = 0; i < stride; ++i) {
          unsigned left = i >= bpp ? row[i - bpp] : 0;
          unsigned up = prev ? prev[i] : 0;
          row[i] = static_cast<uint8_t>(row[i] + ((left + up) >> 1));
        }
        break;
      case 4:  // Paeth
        for (int64_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? row[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
          int p = a + b - c;
          int pa = p > a ? p - a : a - p;
          int pb = p > b ? p - b : b - p;
          int pc = p > c ? p - c : c - p;
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          row[i] = static_cast<uint8_t>(row[i] + pred);
        }
        break;
      default:
        return -1;
    }
  }
  return 0;
}

// Batched crop (+ optional horizontal flip) of HWC uint8/float32 planes into
// a preallocated output. Used by the host loader to assemble training
// batches without per-sample Python copies.
void crop_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
             int64_t y0, int64_t x0, int64_t th, int64_t tw, int flip,
             uint8_t* dst) {
  for (int64_t y = 0; y < th; ++y) {
    const uint8_t* srow = src + ((y0 + y) * sw + x0) * c;
    uint8_t* drow = dst + y * tw * c;
    if (!flip) {
      std::memcpy(drow, srow, static_cast<size_t>(tw * c));
    } else {
      for (int64_t x = 0; x < tw; ++x)
        std::memcpy(drow + x * c, srow + (tw - 1 - x) * c,
                    static_cast<size_t>(c));
    }
  }
}

void crop_f32(const float* src, int64_t sh, int64_t sw, int64_t c, int64_t y0,
              int64_t x0, int64_t th, int64_t tw, int flip, float* dst) {
  for (int64_t y = 0; y < th; ++y) {
    const float* srow = src + ((y0 + y) * sw + x0) * c;
    float* drow = dst + y * tw * c;
    if (!flip) {
      std::memcpy(drow, srow, sizeof(float) * tw * c);
    } else {
      for (int64_t x = 0; x < tw; ++x)
        std::memcpy(drow + x * c, srow + (tw - 1 - x) * c, sizeof(float) * c);
    }
  }
}

}  // extern "C"
