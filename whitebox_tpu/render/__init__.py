"""Offline render drivers — the bounce/export path.

The reference's export dialog is a non-functional stub
(src/ui/export_audio_dlg.cpp:181-189 toggles a bool; its AudioSFEncoder is
never invoked — SURVEY §2.9). This package is that missing capability,
built timeline-at-once on TPU: carve -> device tables -> chunked jitted mix
-> WAV, with RTF/throughput metrics (the analogue of the engine's
duty-cycle PerformanceMeasurer, src/core/timing.h:54).
"""

from whitebox_tpu.render.bounce import bounce  # noqa: F401
from whitebox_tpu.render.metrics import RenderStats  # noqa: F401
