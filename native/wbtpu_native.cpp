// Native host runtime for whitebox_tpu — C++ equivalents of the reference's
// native host-side code paths (the TPU compute path stays JAX/XLA/Pallas).
//
// Covers the host hot loops:
//  - WAV chunk probing + interleaved->planar PCM decode
//  - native-PCM -> unclamped-normalized f32 (the device sample-pool
//    representation; exact semantics of dsp/sampler.cpp's normalizers)
//  - f32 -> i16/i24/i32 export conversion (audio_format_conv.cpp semantics)
//  - waveform peak summarize (gfx/waveform_visual.cpp's scalar loop)
//  - Pallas mix-plan row expansion (per-(tile,track) slot tables)
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment); every
// entry point has a NumPy fallback in Python, so the .so is an accelerator,
// not a requirement.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// PCM normalization (sampler.cpp:7-18 semantics, unclamped linear-path form)
// ---------------------------------------------------------------------------

// fmt codes match whitebox_tpu.core.formats.AudioFormat
enum WbFormat : int32_t { WB_I8 = 1, WB_I16 = 2, WB_I24 = 3, WB_I24_X8 = 4, WB_I32 = 5, WB_F32 = 6 };

// Interleaved native PCM -> planar normalized f32 with tail padding.
// src: interleaved frames*channels elements (i16/i32/f32 depending on fmt).
// dst: channels * stride floats, zero-initialized by caller.
int32_t wb_normalize_planar(
    const void* src, int32_t fmt, int64_t frames, int32_t channels,
    float* dst, int64_t stride) {
  const float i16n = (float)(1.0 / 32767.0);
  const double i24n = 1.0 / (double)((1 << 23) - 1);
  const double i32n = 1.0 / 2147483647.0;
  for (int32_t c = 0; c < channels; c++) {
    float* out = dst + (int64_t)c * stride;
    switch (fmt) {
      case WB_I16: {
        const int16_t* s = (const int16_t*)src;
        for (int64_t i = 0; i < frames; i++) out[i] = (float)((float)s[i * channels + c] * i16n);
        break;
      }
      case WB_I24:
      case WB_I24_X8: {
        const int32_t* s = (const int32_t*)src;
        for (int64_t i = 0; i < frames; i++) out[i] = (float)(i24n * (double)s[i * channels + c]);
        break;
      }
      case WB_I32: {
        const int32_t* s = (const int32_t*)src;
        for (int64_t i = 0; i < frames; i++) out[i] = (float)(i32n * (double)s[i * channels + c]);
        break;
      }
      case WB_F32: {
        const float* s = (const float*)src;
        for (int64_t i = 0; i < frames; i++) out[i] = s[i * channels + c];
        break;
      }
      default:
        return -1;
    }
  }
  return 0;
}

// Interleaved i24 3-byte little-endian -> sign-extended int32
void wb_i24_bytes_to_codes(const uint8_t* src, int64_t count, int32_t* dst) {
  for (int64_t i = 0; i < count; i++) {
    uint32_t u = (uint32_t)src[i * 3] | ((uint32_t)src[i * 3 + 1] << 8) | ((uint32_t)src[i * 3 + 2] << 16);
    int32_t v = (int32_t)u;
    if (v >= (1 << 23)) v -= (1 << 24);
    dst[i] = v;
  }
}

// ---------------------------------------------------------------------------
// Export conversion (audio_format_conv.cpp semantics: asymmetric scaling,
// C trunc-toward-zero)
// ---------------------------------------------------------------------------

void wb_f32_to_i16_interleaved(const float* const* planar, int32_t channels, int64_t frames, int16_t* dst) {
  for (int32_t c = 0; c < channels; c++) {
    const float* s = planar[c];
    for (int64_t i = 0; i < frames; i++) {
      float v = s[i];
      dst[i * channels + c] = (int16_t)(v > 0.0f ? v * 32767.0f : v * 32768.0f);
    }
  }
}

void wb_f32_to_i32_interleaved(const float* const* planar, int32_t channels, int64_t frames, int32_t* dst) {
  for (int32_t c = 0; c < channels; c++) {
    const float* s = planar[c];
    for (int64_t i = 0; i < frames; i++) {
      float v = s[i];
      double scaled = v > 0.0f ? (double)v * 2147483647.0 : (double)v * 2147483648.0;
      if (scaled > 2147483647.0) scaled = 2147483647.0;
      if (scaled < -2147483648.0) scaled = -2147483648.0;
      dst[i * channels + c] = (int32_t)scaled;
    }
  }
}

// ---------------------------------------------------------------------------
// Peak summarize (waveform_visual.cpp:9-173 scalar loop over int32 codes)
// ---------------------------------------------------------------------------

void wb_peaks_level(const int32_t* codes, int64_t count, int32_t mip, int32_t* out, int64_t out_count) {
  const int64_t block = 1ll << (mip - 1);
  const int64_t chunk = 1ll << mip;
  for (int64_t i = 0; i < out_count; i += 2) {
    int64_t idx = i * block;
    int64_t chunk_len = std::min(chunk, count - idx);
    int32_t min_val = INT32_MAX, max_val = INT32_MIN;
    int64_t min_idx = 0, max_idx = 0;
    for (int64_t j = 0; j < chunk_len; j++) {
      int32_t v = codes[idx + j];
      if (v < min_val) { min_val = v; min_idx = j; }
      if (v > max_val) { max_val = v; max_idx = j; }
    }
    if (max_idx < min_idx) { out[i] = max_val; out[i + 1] = min_val; }
    else { out[i] = min_val; out[i + 1] = max_val; }
  }
}

// ---------------------------------------------------------------------------
// Pallas mix-plan row expansion (ops/mix_pallas.build_plan inner loops)
// ---------------------------------------------------------------------------

// Inputs: per-segment-row arrays from the carve (n rows), channel bases
// [num_samples, channels]. Outputs: flat [n_tiles, T, K, ...] arrays
// (zero/sentinel-initialized by the caller) + cursor scratch [n_tiles*T].
int32_t wb_build_mix_plan(
    int64_t n_rows,
    const int32_t* track, const int32_t* dst_start, const int32_t* length,
    const int32_t* sample_id, const int32_t* src_int, const float* gain,
    const uint8_t* clampf, const int32_t* fin_start, const float* fin_inv,
    const int32_t* fout_end, const float* fout_inv,
    const int32_t* channel_base, int32_t channels,
    int32_t tile, int32_t n_tiles, int32_t T, int32_t K,
    int32_t* row_al, int32_t* delta, int32_t* ms, int32_t* me,
    float* out_gain, int32_t* out_clamp,
    int32_t* out_fis, float* out_fii, int32_t* out_foe, float* out_foi,
    int32_t* cursor) {
  const int32_t NOFADE = 1 << 30;
  for (int64_t r = 0; r < n_rows; r++) {
    int32_t trk = track[r];
    int64_t d0 = dst_start[r];
    int64_t dend = d0 + length[r];
    int32_t t0 = (int32_t)(d0 / tile);
    int32_t t1 = (int32_t)((dend - 1) / tile);
    for (int32_t ti = t0; ti <= t1; ti++) {
      int64_t g0 = (int64_t)ti * tile;
      int64_t cell = (int64_t)ti * T + trk;
      int32_t k = cursor[cell]++;
      if (k >= K) return -1;  // slot overflow (caller falls back)
      int64_t base = ((int64_t)ti * T + trk) * K + k;
      for (int32_t ch = 0; ch < channels; ch++) {
        int64_t w = (int64_t)channel_base[(int64_t)sample_id[r] * channels + ch] + src_int[r] + (g0 - d0);
        int64_t w_al = (w / 1024) * 1024;
        if (w < 0 && w % 1024 != 0) w_al -= 1024;  // floor for negative (cannot happen with guards)
        row_al[base * channels + ch] = (int32_t)(w_al / 128);
        delta[base * channels + ch] = (int32_t)(w - w_al);
      }
      int64_t msv = std::max(d0, g0) - g0;
      int64_t mev = std::min<int64_t>(dend, g0 + tile) - g0;
      ms[base] = (int32_t)msv;
      me[base] = (int32_t)mev;
      out_gain[base] = gain[r];
      out_clamp[base] = clampf[r] ? 1 : 0;
      int64_t fis = (int64_t)fin_start[r] - g0;
      int64_t foe = (int64_t)fout_end[r] - g0;
      out_fis[base] = (int32_t)std::max<int64_t>(fis, -NOFADE);
      out_foe[base] = (int32_t)std::min<int64_t>(foe, NOFADE);
      out_fii[base] = fin_inv[r];
      out_foi[base] = fout_inv[r];
    }
  }
  return 0;
}

// Version marker for the loader (2: + wb_carve_audio, native/wb_carve.cpp)
int32_t wb_native_version() { return 3; }

}  // extern "C"
