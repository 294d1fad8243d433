"""MIDI note model — mirrors src/core/midi.{h,cpp} and src/engine/midi_data.

Notes are kept sorted by ``min_time`` (beat units). ``flags`` carries the
reference's bitfield (midi.h:16).
"""

from __future__ import annotations

import bisect
import enum
from dataclasses import dataclass, field


class MidiNoteFlags(enum.IntFlag):
    NONE = 0
    MUTED = 1 << 0
    SELECTED = 1 << 1
    MODIFIED = 1 << 2
    DELETED = 1 << 3


@dataclass
class MidiNote:
    min_time: float = 0.0  # beats
    max_time: float = 0.0  # beats
    meta_id: int = 0
    key: int = 60
    flags: int = 0
    velocity: float = 1.0


class MidiNoteBuffer:
    """Sorted note sequence + min/max metadata (midi_data.h:9-39)."""

    def __init__(self, notes: list[MidiNote] | None = None) -> None:
        self.notes: list[MidiNote] = list(notes or [])
        self.min_note: int = 127
        self.max_note: int = 0
        self.max_length: float = 0.0
        self.create_metadata()

    def create_metadata(self) -> None:
        self.notes.sort(key=lambda n: n.min_time)
        for i, n in enumerate(self.notes):
            n.meta_id = i
        if self.notes:
            self.min_note = min(n.key for n in self.notes)
            self.max_note = max(n.key for n in self.notes)
            self.max_length = max(n.max_time for n in self.notes)
        else:
            self.min_note, self.max_note, self.max_length = 127, 0, 0.0

    def add_note(self, note: MidiNote) -> None:
        self.notes.append(note)
        self.create_metadata()

    def find_first_note(self, time_pos: float, channel: int = 0) -> int:
        """Index of the first note with max_time > time_pos (playback cursor
        seek; mirrors MidiAsset::find_first_note, assets_table.cpp:99)."""
        lo, hi = 0, len(self.notes)
        while lo < hi:
            mid = (lo + hi) // 2
            if self.notes[mid].max_time <= time_pos:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def __len__(self) -> int:
        return len(self.notes)

    def __iter__(self):
        return iter(self.notes)

    def __getitem__(self, i):
        return self.notes[i]
