"""Render performance metrics.

The reference's only perf instrument is a duty-cycle EMA over audio blocks
(PerformanceMeasurer, src/core/timing.h:54-67: block_ms / budget_ms). The
offline analogue is the realtime factor (RTF = rendered seconds per wall
second; duty cycle = 1/RTF) plus device throughput in Msamples/s.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class RenderStats:
    frames: int = 0
    channels: int = 2
    tracks: int = 0
    sample_rate: float = 48000.0
    wall_seconds: float = 0.0
    carve_seconds: float = 0.0
    compile_seconds: float = 0.0
    device_seconds: float = 0.0
    #: device->host transfer, reported separately: over this sandbox's relay
    #: tunnel it is ~25 MB/s and would swamp device time; on production
    #: hosts it is PCIe-speed. wall_seconds = carve + device (+0 readback),
    #: matching the documented benchmark methodology.
    readback_seconds: float = 0.0
    #: level meters (vu_meter.h:16-45 equivalent, fed where track.cpp:732
    #: pushes: post chain + volume/pan, pre sum). Filled when bounce(...,
    #: meters=True): track_peak/track_rms are [tracks, channels] f32,
    #: output_peak/output_rms are [channels] f32 (post-master, post-clip).
    track_peak: object = None
    track_rms: object = None
    output_peak: object = None
    output_rms: object = None
    #: EBU R128 measurement of the finished output (ops/loudness.py
    #: LoudnessStats). Filled when bounce(..., loudness=True).
    loudness: object = None
    #: roofline cost estimate (render/roofline.py CostEstimate): minimum
    #: HBM bytes + MXU FLOPs this render must spend. Read
    #: roofline_fraction for achieved utilization.
    cost: object = None

    @property
    def audio_seconds(self) -> float:
        return self.frames / self.sample_rate

    @property
    def rtf(self) -> float:
        """Realtime factor; the engine's implicit budget is rtf >= 1."""
        return self.audio_seconds / self.wall_seconds if self.wall_seconds > 0 else float("inf")

    @property
    def duty_cycle(self) -> float:
        """PerformanceMeasurer-equivalent: fraction of the realtime budget used."""
        return 1.0 / self.rtf if self.rtf > 0 else float("inf")

    @property
    def msamples_per_sec(self) -> float:
        """Track-samples processed per second (tracks x channels x frames)."""
        total = self.frames * self.channels * max(self.tracks, 1)
        return total / self.wall_seconds / 1e6 if self.wall_seconds > 0 else float("inf")

    @property
    def roofline_fraction(self) -> float:
        """Achieved fraction of the v5e roofline (1.0 = speed-of-light):
        estimated minimum device time / measured device time."""
        if self.cost is None or self.device_seconds <= 0:
            return float("nan")
        return self.cost.utilization(self.device_seconds)

    def summary(self) -> str:
        s = (
            f"rendered {self.audio_seconds:.2f}s ({self.frames} frames, {self.tracks} tracks) "
            f"in {self.wall_seconds:.3f}s wall = {self.rtf:.1f}x realtime "
            f"[carve {self.carve_seconds:.3f}s, compile {self.compile_seconds:.3f}s, "
            f"device {self.device_seconds:.3f}s, readback {self.readback_seconds:.3f}s, "
            f"{self.msamples_per_sec:.0f} Msamples/s]"
        )
        if self.cost is not None and self.device_seconds > 0:
            s += f" [{self.cost.summary(self.device_seconds)}]"
        return s


class Stopwatch:
    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        t = time.perf_counter()
        dt = t - self.t0
        self.t0 = t
        return dt
