// emoxhost — native host-side data-path kernels for emox.
//
// The reference leans on third-party native code for its host data path
// (decord/PyAV video decode, librosa resampling — reference Net.py:7,16,
// magicanimate/utils/videoreader.py). emox's equivalents are implemented
// here in C++ and exposed through a C ABI consumed via ctypes
// (emox/data/native.py), with pure-numpy fallbacks when the library is not
// built. These run on dataloader threads and release the GIL (ctypes calls
// drop it), so preprocessing overlaps TPU step time even on few cores.
//
// Build: make -C native   ->  native/libemoxhost.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---- version ----------------------------------------------------------
int eh_abi_version() { return 1; }

// ---- audio ------------------------------------------------------------

// Linear-interpolation resampler: src[n_src] @ src_rate -> dst[n_dst].
// n_dst must equal round(n_src * dst_rate / src_rate) as computed by the
// caller; the mapping matches numpy.interp on the same grids.
void eh_resample_linear(const float* src, int64_t n_src, double src_rate,
                        float* dst, int64_t n_dst, double dst_rate) {
  if (n_src <= 0 || n_dst <= 0) return;
  const double step = src_rate / dst_rate;
  for (int64_t i = 0; i < n_dst; ++i) {
    const double pos = i * step;
    const int64_t i0 = std::min<int64_t>((int64_t)pos, n_src - 1);
    const int64_t i1 = std::min<int64_t>(i0 + 1, n_src - 1);
    const double frac = pos - (double)i0;
    dst[i] = (float)((1.0 - frac) * src[i0] + frac * src[i1]);
  }
}

// Zero-padded waveform window: out[out_n] = wav[start : start+out_n] with
// out-of-range samples set to 0 (the dataset's audio-margin slicing,
// emox/data/dataset.py::_wav_slice).
void eh_wav_window(const float* wav, int64_t n, int64_t start, float* out,
                   int64_t out_n) {
  for (int64_t i = 0; i < out_n; ++i) {
    const int64_t j = start + i;
    out[i] = (j >= 0 && j < n) ? wav[j] : 0.0f;
  }
}

// Per-video-frame RMS envelope (fixtures/diagnostics).
void eh_rms_envelope(const float* wav, int64_t n, double samples_per_frame,
                     float* out, int64_t frames) {
  for (int64_t f = 0; f < frames; ++f) {
    const int64_t a = (int64_t)(f * samples_per_frame);
    const int64_t b = std::min<int64_t>((int64_t)((f + 1) * samples_per_frame), n);
    double acc = 0.0;
    for (int64_t i = a; i < b; ++i) acc += (double)wav[i] * wav[i];
    const int64_t len = b - a;
    out[f] = len > 0 ? (float)std::sqrt(acc / (double)len) : 0.0f;
  }
}

// ---- pixels -----------------------------------------------------------

// uint8 HWC -> float32 [-1, 1] (frame normalisation hot loop).
void eh_u8_to_unit_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kScale = 1.0f / 127.5f;
  for (int64_t i = 0; i < n; ++i) dst[i] = (float)src[i] * kScale - 1.0f;
}

// float32 [-1, 1] -> uint8 (video writer path).
void eh_unit_f32_to_u8(const float* src, uint8_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = (src[i] + 1.0f) * 127.5f;
    v = std::min(255.0f, std::max(0.0f, v));
    dst[i] = (uint8_t)(v + 0.5f);
  }
}

// Bilinear resize, float32 HWC (align_corners=false, half-pixel centers —
// matches cv2.INTER_LINEAR / jax.image "linear").
void eh_resize_bilinear_f32(const float* src, int sh, int sw, int c,
                            float* dst, int dh, int dw) {
  const double sy = (double)sh / dh, sx = (double)sw / dw;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, (double)sh - 1));
    const int y0 = (int)fy, y1 = std::min(y0 + 1, sh - 1);
    const double wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, (double)sw - 1));
      const int x0 = (int)fx, x1 = std::min(x0 + 1, sw - 1);
      const double wx = fx - x0;
      for (int k = 0; k < c; ++k) {
        const double v00 = src[(y0 * sw + x0) * c + k];
        const double v01 = src[(y0 * sw + x1) * c + k];
        const double v10 = src[(y1 * sw + x0) * c + k];
        const double v11 = src[(y1 * sw + x1) * c + k];
        dst[(y * dw + x) * c + k] =
            (float)((1 - wy) * ((1 - wx) * v00 + wx * v01) +
                    wy * ((1 - wx) * v10 + wx * v11));
      }
    }
  }
}

// Fused augmentation: crop[y0:y0+ch, x0:x0+cw] -> optional horizontal flip
// -> bilinear resize to (dh, dw) -> optional brightness/contrast (contrast
// pivots on the crop mean). One pass over the output, one reduction over
// the crop; replaces the numpy crop-view + flip-view + resize + two
// elementwise passes in emox/data/augment.py.
void eh_augment_frame_f32(const float* src, int sh, int sw, int c,
                          int y0, int x0, int ch, int cw, int flip,
                          float brightness, float contrast,
                          float* dst, int dh, int dw) {
  // Clamp the crop against the source extent instead of bailing: an early
  // return would hand the caller's uninitialized dst buffer back as a
  // "valid" frame (the numpy fallback clamps via slicing, and the two
  // paths must stay bit-compatible in behavior class).
  y0 = std::max(0, std::min(y0, sh - 1));
  x0 = std::max(0, std::min(x0, sw - 1));
  ch = std::max(1, std::min(ch, sh - y0));
  cw = std::max(1, std::min(cw, sw - x0));
  // crop mean (for contrast pivot), single pass, all channels
  double mean = 0.0;
  if (contrast != 1.0f) {
    double acc = 0.0;
    for (int y = y0; y < y0 + ch; ++y) {
      const float* row = src + ((int64_t)y * sw + x0) * c;
      const int64_t n = (int64_t)cw * c;
      for (int64_t i = 0; i < n; ++i) acc += row[i];
    }
    mean = acc / ((double)ch * cw * c);
  }
  const double sy = (double)ch / dh, sx = (double)cw / dw;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, (double)ch - 1));
    const int yy0 = (int)fy, yy1 = std::min(yy0 + 1, ch - 1);
    const double wy = fy - yy0;
    for (int x = 0; x < dw; ++x) {
      const int xo = flip ? (dw - 1 - x) : x;
      double fx = (xo + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, (double)cw - 1));
      const int xx0 = (int)fx, xx1 = std::min(xx0 + 1, cw - 1);
      const double wx = fx - xx0;
      const float* r0 = src + ((int64_t)(y0 + yy0) * sw + x0) * c;
      const float* r1 = src + ((int64_t)(y0 + yy1) * sw + x0) * c;
      for (int k = 0; k < c; ++k) {
        double v = (1 - wy) * ((1 - wx) * r0[xx0 * c + k] + wx * r0[xx1 * c + k]) +
                   wy * ((1 - wx) * r1[xx0 * c + k] + wx * r1[xx1 * c + k]);
        if (contrast != 1.0f) v = (v - mean) * contrast + mean;
        v += brightness;
        v = std::max(-1.0, std::min(1.0, v));
        dst[((int64_t)y * dw + x) * c + k] = (float)v;
      }
    }
  }
}

}  // extern "C"
