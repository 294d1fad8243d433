"""Undo/redo command history over the session edit API."""

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.midi.notes import MidiNoteBuffer
from whitebox_tpu.session import Session
from whitebox_tpu.session.history import (
    ClipAddAudio, ClipAdjustGain, ClipDelete, ClipMove, ClipResize,
    CommandManager, DeleteRegion, NoteAdd, TrackSetParam,
)
from whitebox_tpu.session.sample import Sample


@pytest.fixture
def ctx():
    s = Session(bpm=120.0)
    data = np.zeros((1, 48000), dtype=np.float32)
    asset = s.sample_table.add_sample(Sample.from_planar(data, 48000, AudioFormat.F32), key="a")
    s.add_track("t0")
    mgr = CommandManager(s)
    return s, asset, mgr


def spans(track):
    return [(c.min_time, c.max_time) for c in track.clips]


class TestHistory:
    def test_add_undo_redo(self, ctx):
        s, asset, mgr = ctx
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="c", min_time=0.0, max_time=4.0, asset=asset))
        assert spans(s.tracks[0]) == [(0.0, 4.0)]
        assert mgr.undo()
        assert spans(s.tracks[0]) == []
        assert mgr.redo()
        assert spans(s.tracks[0]) == [(0.0, 4.0)]

    def test_move_with_trim_undo_restores_trimmed(self, ctx):
        s, asset, mgr = ctx
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="a", min_time=0.0, max_time=4.0, asset=asset))
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="b", min_time=6.0, max_time=10.0, asset=asset))
        mgr.execute(ClipMove(track_idx=0, clip_id=1, relative_pos=-4.0))  # b -> [2,6) trims a
        assert spans(s.tracks[0]) == [(0.0, 2.0), (2.0, 6.0)]
        mgr.undo()
        assert spans(s.tracks[0]) == [(0.0, 4.0), (6.0, 10.0)]  # trim fully restored
        mgr.redo()
        assert spans(s.tracks[0]) == [(0.0, 2.0), (2.0, 6.0)]

    def test_resize_and_delete_region(self, ctx):
        s, asset, mgr = ctx
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="a", min_time=0.0, max_time=8.0, asset=asset))
        mgr.execute(DeleteRegion(track_idx=0, min_time=3.0, max_time=5.0))
        assert spans(s.tracks[0]) == [(0.0, 3.0), (5.0, 8.0)]
        mgr.undo()
        assert spans(s.tracks[0]) == [(0.0, 8.0)]
        mgr.execute(ClipResize(track_idx=0, clip_id=0, relative_pos=-2.0))
        assert spans(s.tracks[0]) == [(0.0, 6.0)]

    def test_param_and_gain(self, ctx):
        s, asset, mgr = ctx
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="a", min_time=0.0, max_time=2.0, asset=asset, gain=1.0))
        mgr.execute(TrackSetParam(track_idx=0, volume_db=-6.0, pan=0.5))
        mgr.execute(ClipAdjustGain(track_idx=0, clip_id=0, gain=0.5))
        assert s.tracks[0].volume_db == -6.0
        assert s.tracks[0].clips[0].audio.gain == 0.5
        mgr.undo()
        assert s.tracks[0].clips[0].audio.gain == 1.0
        mgr.undo()
        assert s.tracks[0].volume_db == 0.0 and s.tracks[0].pan == 0.0

    def test_redo_cleared_on_new_command(self, ctx):
        s, asset, mgr = ctx
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="a", min_time=0.0, max_time=2.0, asset=asset))
        mgr.undo()
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="b", min_time=4.0, max_time=6.0, asset=asset))
        assert not mgr.can_redo
        assert spans(s.tracks[0]) == [(4.0, 6.0)]

    def test_note_add_undo(self, ctx):
        s, asset, mgr = ctx
        midi = s.midi_table.create_midi(MidiNoteBuffer([]))
        s.add_midi_clip(s.tracks[0], "m", 0.0, 4.0, asset=midi)
        mgr.execute(NoteAdd(track_idx=0, clip_id=0, min_time=0.0, max_time=1.0, key=64))
        assert len(midi.notes) == 1
        mgr.undo()
        assert len(midi.notes) == 0
        mgr.redo()
        assert len(midi.notes) == 1

    def test_modified_flag(self, ctx):
        s, asset, mgr = ctx
        assert not mgr.is_modified
        mgr.execute(ClipAddAudio(track_idx=0, clip_name="a", min_time=0.0, max_time=2.0, asset=asset))
        assert mgr.is_modified
        mgr.mark_saved()
        assert not mgr.is_modified
        mgr.undo()
        assert mgr.is_modified
