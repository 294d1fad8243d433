"""Host-side IO: WAV codec (pure Python with optional native C++ accelerator).

Replaces the reference's libsndfile/dr_mp3/vorbis decode stack
(src/dsp/sample.cpp:112-320) and the never-wired AudioSFEncoder
(src/dsp/codec.cpp) with a self-contained RIFF/WAVE codec — the formats the
render path actually produces/consumes. MP3/OGG/FLAC decode can be layered
on via ffmpeg when available; see io.wav.load_audio_file.
"""

from whitebox_tpu.io import wav  # noqa: F401
