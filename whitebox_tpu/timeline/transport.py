"""Block transport grid — the engine's per-block f64 time bookkeeping.

Engine::process (engine.cpp:1576) advances two float64 accumulators each
block::

    buffer_duration          = n_samples / sample_rate
    buffer_duration_in_beats = buffer_duration / beat_duration
    playhead        += buffer_duration_in_beats                  (engine.cpp:1622)
    sample_position += beat_to_samples(bd_beats, rate, beat_dur) (engine.cpp:1620)

Because each step adds the *same* f64 constant with sequential rounding, the
playhead/sample_position at block k are NOT exactly ``p0 + k*c`` — they carry
the accumulated rounding the C++ engine carries. Event carving (clip-start
frame positions!) depends on these exact values, so the timeline compiler
reproduces the accumulation with ``np.add.accumulate`` (sequential pairwise
f64 adds, identical to the C++ loop).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from whitebox_tpu.core.math import beat_to_samples


@dataclass
class BlockTransport:
    sample_rate: float
    buffer_size: int
    beat_duration: float
    playhead_start: float = 0.0

    @property
    def buffer_duration(self) -> float:
        return float(self.buffer_size) / self.sample_rate

    @property
    def buffer_duration_in_beats(self) -> float:
        return self.buffer_duration / self.beat_duration

    @property
    def sample_position_step(self) -> float:
        """The f64 constant added to sample_position per block."""
        return beat_to_samples(self.buffer_duration_in_beats, self.sample_rate, self.beat_duration)

    def playhead_grid(self, num_blocks: int) -> np.ndarray:
        """playhead value at the start of blocks 0..num_blocks (inclusive),
        with exact sequential f64 accumulation."""
        steps = np.full(num_blocks + 1, self.buffer_duration_in_beats, dtype=np.float64)
        steps[0] = self.playhead_start
        return np.add.accumulate(steps)

    def sample_position_grid(self, num_blocks: int) -> np.ndarray:
        """sample_position at the start of blocks 0..num_blocks (inclusive)."""
        steps = np.full(num_blocks + 1, self.sample_position_step, dtype=np.float64)
        steps[0] = 0.0
        return np.add.accumulate(steps)

    def blocks_for_beats(self, end_beat: float) -> int:
        """Number of blocks needed so the playhead passes end_beat."""
        total = max(end_beat - self.playhead_start, 0.0)
        n = int(np.ceil(total / self.buffer_duration_in_beats))
        # Accumulated-rounding safety: make sure the grid really covers it.
        while float(self.playhead_grid(n)[-1]) < end_beat:
            n += 1
        return n

    def blocks_for_frames(self, frames: int) -> int:
        return -(-int(frames) // int(self.buffer_size))
