"""TPU compute path: XLA programs + Pallas kernels.

- ``mix``        : the timeline mix (segment lookup, interpolated fetch,
                   gain/pan, ordered track sum, hard clip) — the fused
                   replacement for engine.cpp:1576/track.cpp:587/sampler.cpp:88.
- ``dsarith``    : double-single (two-float) arithmetic for f64-grade
                   resampler phase on an f32 device.
- ``peaks``      : waveform min/max peak-mipmap generation (replaces
                   gfx/waveform_visual.cpp's CPU loop + GPU shaders).
- ``resample``   : standalone linear/sinc resampling kernels.
- ``biquad``     : biquad design + log-depth scan filtering (effects core).
- ``mix_pallas`` : hand-scheduled Pallas TPU mix kernel (fast path).
"""
