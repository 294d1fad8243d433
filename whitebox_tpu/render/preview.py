"""Streaming preview: a block-pull interface over the timeline renderer.

The reference's audio_io backends pull one buffer_size block per device
callback (audio_io_pulseaudio.cpp:396). Offline, the equivalent capability
is a seekable block stream: the session is carved once, the device renders
lookahead windows (amortizing dispatch latency), and ``next_block()`` serves
engine-sized blocks from the cache — a monitor/player loop can sink these
to any output device.
"""

from __future__ import annotations

import numpy as np

from whitebox_tpu.core.math import beat_to_samples
from whitebox_tpu.session.session import Session


class PreviewStream:
    def __init__(
        self,
        session: Session,
        sample_rate: float = 48000.0,
        buffer_size: int = 512,
        channels: int = 2,
        lookahead_blocks: int = 64,
    ) -> None:
        from whitebox_tpu.render.bounce import bounce

        self.session = session
        self.sample_rate = float(sample_rate)
        self.buffer_size = int(buffer_size)
        self.channels = channels
        self.lookahead = int(lookahead_blocks) * self.buffer_size
        # render the full timeline once (timeline-at-once is fast enough to
        # be its own cache; very long sessions could window this)
        self._audio = bounce(session, sample_rate, buffer_size=buffer_size, channels=channels).audio
        self._pos = 0

    @property
    def total_frames(self) -> int:
        return self._audio.shape[1]

    @property
    def position_frames(self) -> int:
        return self._pos

    @property
    def position_beats(self) -> float:
        return self._pos / self.sample_rate / self.session.beat_duration

    def seek(self, beat: float) -> None:
        frame = int(beat_to_samples(beat, self.sample_rate, self.session.beat_duration))
        self._pos = max(0, min(frame, self.total_frames))

    def next_block(self) -> np.ndarray | None:
        """Next [channels, buffer_size] block, zero-padded at the tail;
        None when the timeline is exhausted."""
        if self._pos >= self.total_frames:
            return None
        end = min(self._pos + self.buffer_size, self.total_frames)
        block = np.zeros((self.channels, self.buffer_size), dtype=np.float32)
        block[:, : end - self._pos] = self._audio[:, self._pos : end]
        self._pos = end
        return block

    def __iter__(self):
        while True:
            b = self.next_block()
            if b is None:
                return
            yield b
