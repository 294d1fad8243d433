"""Core layer: pure math, PCM formats, panning laws, buffer conversions.

Mirrors the reference's ``src/core`` (core_math.h, panning_law.cpp,
audio_format.h, audio_format_conv.cpp). The reference's concurrency toolkit
(spinlocks, SPSC rings, pool allocators — src/core/queue.h, thread.h,
memory.h) is intentionally not rebuilt: the offline timeline-at-once
renderer has no real-time threads; XLA owns scheduling and memory.
"""

from whitebox_tpu.core import buffers, formats, math, panning  # noqa: F401
