"""whitebox_tpu — a TPU-native (JAX/XLA/Pallas) offline audio render framework.

A ground-up rebuild of the audio compute core of the ``native-m/whitebox``
C++ DAW (reference mounted at /root/reference) as a *timeline-at-once*
renderer over ``[tracks, channels, frames]`` tensors:

- ``core``     : beat/sample math, dB/pan laws, PCM format conversion
                 (mirrors reference src/core/core_math.h, panning_law.cpp,
                 audio_format_conv.cpp).
- ``session``  : clips / tracks / session model + ``.wb`` msgpack project
                 format (mirrors src/engine/clip.h, track.h, project.cpp).
- ``timeline`` : exact block-transport math, event carving into segment
                 tables, and the NumPy block-sequential parity oracle
                 (mirrors src/engine/engine.cpp:1576 / track.cpp:258,587
                 and src/dsp/sampler.cpp).
- ``ops``      : the TPU compute path — fused mix, resampling, waveform
                 peak mipmaps, biquads — as XLA programs + Pallas kernels.
- ``effects``  : native jittable effect-chain API (replaces src/plughost).
- ``midi``     : MIDI notes, voice allocation, and the parity synth.
- ``render``   : the offline bounce/export driver (the capability the
                 reference only stubs; see src/ui/export_audio_dlg.cpp).
- ``parallel`` : mesh/sharding config for multi-chip rendering.
- ``io``       : WAV codec (pure Python + native C++ accelerator).
"""

__version__ = "0.1.0"

from whitebox_tpu.core import formats, math, panning  # noqa: F401
