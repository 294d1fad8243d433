// Reference-twin shim: compiles the REAL upstream sources into a C ABI so
// tests can fuzz the Python oracle against compiled C++ behavior instead of
// a hand-read transcription.
//
// Sources pulled in (read-only, via -I $REF/src):
//   dsp/sampler.cpp      — Sampler::stream (fast + linear paths)
//   core/core_math.h     — beat_to_samples / samples_to_beat / db_to_linear
//   core/panning_law.cpp — calculate_panning_coefs
//
// This file adds only marshalling; all audio math executes upstream code.

#include <cstdint>
#include <cstring>

#include "core/core_math.h"
#include "core/panning_law.h"
#include "dsp/sampler.h"

// Sample's out-of-line members live in dsp/sample.cpp, which drags in the
// codec libraries (libsndfile/dr_mp3/stb_vorbis) we don't need. Sampler only
// touches the inline accessors plus format/channels/count/sample_data, so we
// provide minimal non-owning stand-ins: the shim caller owns every channel
// buffer and ~Sample must not free them (Vector frees only its own pointer
// array).
namespace wb {

Sample::Sample(AudioFormat format, uint32_t sample_rate) : format(format), sample_rate(sample_rate) {
}

Sample::~Sample() {
}

}  // namespace wb

extern "C" {

// Formats match wb::AudioFormat underlying values (audio_format.h).
void wbref_sampler_stream(
    int32_t format,
    uint32_t src_channels,
    uint64_t count,
    void** channel_ptrs,  // src_channels pointers, each padded past count
    double* sample_offset_io,
    double playback_speed,
    uint32_t num_channels,
    uint32_t num_samples,
    uint32_t buffer_offset,
    float gain,
    float** dst_buffers) {
  wb::Sample sample((wb::AudioFormat)format, 48000);
  sample.channels = src_channels;
  sample.count = (size_t)count;
  for (uint32_t c = 0; c < src_channels; c++) {
    sample.sample_data.push_back((std::byte*)channel_ptrs[c]);
  }

  wb::dsp::Sampler sampler;
  sampler.playback_speed_ = playback_speed;
  sampler.sample_offset_ = *sample_offset_io;
  sampler.resampler_type_ = wb::dsp::ResamplerType::Linear;
  sampler.stream(&sample, num_channels, num_samples, buffer_offset, gain, dst_buffers);
  *sample_offset_io = sampler.sample_offset_;
}

double wbref_beat_to_samples(double beat, double sample_rate, double beat_duration) {
  return wb::beat_to_samples(beat, sample_rate, beat_duration);
}

double wbref_samples_to_beat(double samples, double sample_rate, double beat_duration) {
  return wb::samples_to_beat(samples, sample_rate, beat_duration);
}

double wbref_samples_to_beat_u64(uint64_t samples, double sample_rate, double beat_duration) {
  return wb::samples_to_beat((size_t)samples, sample_rate, beat_duration);
}

float wbref_db_to_linear(float db) {
  return wb::math::db_to_linear(db);
}

void wbref_panning_coefs(float pan, int32_t law, float* out_lr) {
  wb::PanningCoefficient c = wb::calculate_panning_coefs(pan, (wb::PanningLaw)law);
  out_lr[0] = c.left;
  out_lr[1] = c.right;
}

}  // extern "C"
