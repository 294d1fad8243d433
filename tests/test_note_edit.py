"""MIDI note-edit API (engine.cpp:1103-1463) + note/track commands."""

import numpy as np
import pytest

from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer, MidiNoteFlags
from whitebox_tpu.session import Session
from whitebox_tpu.session.history import (
    ClipChangeColor,
    ClipDuplicate,
    ClipRename,
    ClipShift,
    CommandManager,
    MidiClipParamChange,
    NoteDelete,
    NoteMove,
    NotePaint,
    NoteResize,
    NoteSelect,
    NoteSelectOrDeselectAll,
    NoteSlice,
    NoteVelocity,
    TrackAdd,
    TrackDelete,
    TrackMove,
)


def _session_with_notes(notes=None):
    s = Session(bpm=120.0)
    tr = s.add_track("midi")
    asset = s.midi_table.create_midi(MidiNoteBuffer(notes or []))
    s.add_midi_clip(tr, "m", 0.0, 8.0, asset=asset)
    return s, tr, tr.clips[0]


def _notes(buf):
    return [(n.min_time, n.max_time, n.key, n.velocity) for n in buf.notes]


class TestNoteEditApi:
    def test_add_note_sorts_and_reports_modified(self):
        s, tr, clip = _session_with_notes()
        r1 = s.add_note(tr, clip, 2.0, 3.0, 0.8, 64)
        r2 = s.add_note(tr, clip, 0.0, 1.0, 0.9, 60)
        # the new (earlier) note sorts to the front; its post-sort id is 0
        assert r1.modified_notes == [0]
        assert r2.modified_notes == [0]
        assert _notes(clip.midi.asset.notes) == [(0.0, 1.0, 60, 0.9), (2.0, 3.0, 64, 0.8)]
        # MODIFIED flags cleared by update_channel (midi_data.cpp:126)
        assert all(not (n.flags & MidiNoteFlags.MODIFIED) for n in clip.midi.asset.notes)

    def test_add_note_rejects_audio_clip(self):
        s = Session()
        tr = s.add_track("a")
        assert s.add_note(tr, type("C", (), {"is_midi": lambda self: False})(), 0, 1, 1.0, 60) is None

    def test_move_note_returns_backup(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0, key=60), MidiNote(2.0, 3.0, key=64)])
        r = s.move_note(tr, clip, 0, relative_key_pos=5, relative_pos=4.0)
        assert [(n.min_time, n.max_time, n.key) for n in r.deleted_notes] == [(0.0, 1.0, 60)]
        # moved past the other note: sorts to id 1
        assert r.modified_notes == [1]
        assert _notes(clip.midi.asset.notes)[1] == (4.0, 5.0, 65, 1.0)

    def test_move_selected_notes(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0, key=60), MidiNote(2.0, 3.0, key=64)])
        s.select_note(tr, clip, 0.0, 1.5, 0, 131)  # selects only the first
        r = s.move_selected_note(tr, clip, relative_key_pos=12, relative_pos=0.5)
        assert len(r.deleted_notes) == 1
        assert _notes(clip.midi.asset.notes)[0] == (0.5, 1.5, 72, 1.0)
        # selection survives the move
        assert clip.midi.asset.notes.num_selected == 1

    def test_resize_note_both_sides(self):
        s, tr, clip = _session_with_notes([MidiNote(1.0, 2.0, key=60)])
        s.resize_note(tr, clip, 0, relative_pos=-0.5, left_side=True)
        assert _notes(clip.midi.asset.notes)[0][:2] == (0.5, 2.0)
        s.resize_note(tr, clip, 0, relative_pos=1.0, left_side=False)
        assert _notes(clip.midi.asset.notes)[0][:2] == (0.5, 3.0)
        assert clip.midi.asset.notes.max_length == 3.0

    def test_slice_note(self):
        s, tr, clip = _session_with_notes([MidiNote(1.0, 3.0, key=60, velocity=0.7)])
        r = s.slice_note(tr, clip, 2.0, velocity=0.3, note_key=60)
        assert r is not None
        # both halves keep the ORIGINAL velocity (engine.cpp:1278 tmp_velocity)
        assert _notes(clip.midi.asset.notes) == [(1.0, 2.0, 60, 0.7), (2.0, 3.0, 60, 0.7)]

    def test_slice_note_misses(self):
        s, tr, clip = _session_with_notes([MidiNote(1.0, 3.0, key=60)])
        assert s.slice_note(tr, clip, 0.5, 1.0, 60) is None  # outside
        assert s.slice_note(tr, clip, 2.0, 1.0, 61) is None  # wrong key
        assert s.slice_note(tr, clip, 1.0, 1.0, 60) is None  # on the edge

    def test_select_note_box_is_exclusive(self):
        s, tr, clip = _session_with_notes(
            [MidiNote(0.0, 1.0, key=60), MidiNote(2.0, 3.0, key=64), MidiNote(4.0, 5.0, key=70)])
        r = s.select_note(tr, clip, 1.5, 4.5, 60, 65)
        assert r.selected == [1] and r.deselected == []
        assert (r.min_key, r.max_key) == (64, 64)
        # a second box select drops the previous selection first
        r2 = s.select_note(tr, clip, 3.5, 6.0, 0, 131)
        assert r2.deselected == [1] and r2.selected == [2]
        assert clip.midi.asset.notes.num_selected == 1

    def test_select_or_deselect_all(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0), MidiNote(2.0, 3.0)])
        r = s.select_or_deselect_notes(tr, clip, True)
        assert r.deselected == [0, 1]  # upstream quirk: changed ids land here
        assert clip.midi.asset.notes.num_selected == 2
        r = s.select_or_deselect_notes(tr, clip, False)
        assert r.deselected == [0, 1]
        assert clip.midi.asset.notes.num_selected == 0

    def test_append_note_selection_toggles(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0), MidiNote(2.0, 3.0)])
        s.append_note_selection(tr, clip, True, [0])
        assert clip.midi.asset.notes.num_selected == 1
        s.append_note_selection(tr, clip, True, [0, 1])
        assert clip.midi.asset.notes.num_selected == 1
        assert bool(clip.midi.asset.notes[1].flags & MidiNoteFlags.SELECTED)

    def test_mute_selected_notes(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0), MidiNote(2.0, 3.0)])
        s.select_or_deselect_notes(tr, clip, True)
        ids = s.mute_selected_note(tr, clip, True)
        assert ids == [0, 1]
        assert all(n.flags & MidiNoteFlags.MUTED for n in clip.midi.asset.notes)
        # already-muted notes are skipped on a second mute pass
        assert s.mute_selected_note(tr, clip, True) == []
        assert s.mute_selected_note(tr, clip, False) == [0, 1]

    def test_delete_marked_notes_selected(self):
        s, tr, clip = _session_with_notes(
            [MidiNote(0.0, 1.0, key=60), MidiNote(2.0, 3.0, key=64), MidiNote(4.0, 5.0, key=70)])
        s.select_note(tr, clip, 1.5, 3.5, 0, 131)
        r = s.delete_marked_notes(tr, clip, delete_selected=True)
        assert [(n.min_time, n.key) for n in r.deleted_notes] == [(2.0, 64)]
        assert _notes(clip.midi.asset.notes) == [(0.0, 1.0, 60, 1.0), (4.0, 5.0, 70, 1.0)]

    def test_delete_marked_notes_deleted_flag(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0), MidiNote(2.0, 3.0)])
        clip.midi.asset.notes[0].flags |= MidiNoteFlags.DELETED
        r = s.delete_marked_notes(tr, clip, delete_selected=False)
        assert len(r.deleted_notes) == 1
        # the DELETED flag is cleared on the backup (engine.cpp:1354)
        assert not (r.deleted_notes[0].flags & MidiNoteFlags.DELETED)
        assert len(clip.midi.asset.notes) == 1

    def test_change_velocity(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0, velocity=0.5), MidiNote(2.0, 3.0, velocity=0.6)])
        old = s.change_note_velocity(tr, clip, 0, 0.25)
        assert old == 0.5 and clip.midi.asset.notes[0].velocity == 0.75
        s.select_or_deselect_notes(tr, clip, True)
        pairs = s.change_selected_note_velocity(tr, clip, -0.1)
        assert pairs == [(0, 0.75), (1, 0.6)]
        assert clip.midi.asset.notes[1].velocity == 0.5


class TestNoteBufferQueries:
    def test_find_note(self):
        buf = MidiNoteBuffer([MidiNote(0.0, 1.0, key=60), MidiNote(0.5, 2.0, key=64)])
        assert buf.find_note(0.75, 64) == 1
        assert buf.find_note(1.0, 60) is None  # max_time exclusive
        assert buf.find_note(0.0, 60) == 0

    def test_find_notes_box(self):
        buf = MidiNoteBuffer([MidiNote(0.0, 1.0, key=60), MidiNote(2.0, 3.0, key=64),
                              MidiNote(4.0, 5.0, key=70)])
        assert buf.find_notes(0.5, 2.5, 0, 131) == [0, 1]
        assert buf.find_notes(0.0, 10.0, 62, 66) == [1]

    def test_update_channel_sort_order(self):
        buf = MidiNoteBuffer([])
        buf.notes = [MidiNote(1.0, 2.0, key=64, velocity=0.5), MidiNote(1.0, 2.0, key=60, velocity=0.9),
                     MidiNote(1.0, 2.0, key=60, velocity=0.2), MidiNote(0.0, 1.0, key=70)]
        buf.update_channel()
        # (min_time, key, velocity) ordering (midi_data.cpp:106-114)
        assert [(n.min_time, n.key, n.velocity) for n in buf.notes] == [
            (0.0, 70, 1.0), (1.0, 60, 0.2), (1.0, 60, 0.9), (1.0, 64, 0.5)]
        assert buf.min_note == 60 and buf.max_note == 70 and buf.max_length == 2.0


class TestNoteCommands:
    def test_note_commands_undo_redo(self):
        s, tr, clip = _session_with_notes([MidiNote(0.0, 1.0, key=60, velocity=0.5)])
        mgr = CommandManager(s)
        mgr.execute(NotePaint(track_idx=0, clip_id=0,
                              notes=[MidiNote(2.0, 3.0, key=64), MidiNote(4.0, 5.0, key=66)]))
        mgr.execute(NoteSelect(track_idx=0, clip_id=0, min_pos=1.5, max_pos=10.0))
        mgr.execute(NoteMove(track_idx=0, clip_id=0, relative_key_pos=2, relative_pos=0.5))
        mgr.execute(NoteResize(track_idx=0, clip_id=0, note_id=0, relative_pos=0.25, left_side=False))
        mgr.execute(NoteSlice(track_idx=0, clip_id=0, slice_pos=0.5, note_key=60))
        mgr.execute(NoteVelocity(track_idx=0, clip_id=0, note_id=0, relative_velocity=0.3))
        mgr.execute(NoteDelete(track_idx=0, clip_id=0, delete_selected=True))
        final = _notes(clip.midi.asset.notes)
        assert len(final) == 2  # slice halves of the unselected note remain

        states = []
        while mgr.undo():
            states.append(_notes(clip.midi.asset.notes))
        assert _notes(clip.midi.asset.notes) == [(0.0, 1.0, 60, 0.5)]
        while mgr.redo():
            pass
        assert _notes(clip.midi.asset.notes) == final

    def test_clip_cosmetic_commands(self):
        s, tr, clip = _session_with_notes()
        mgr = CommandManager(s)
        mgr.execute(ClipRename(track_idx=0, clip_id=0, new_name="renamed"))
        mgr.execute(ClipChangeColor(track_idx=0, clip_id=0, color=7))
        mgr.execute(MidiClipParamChange(track_idx=0, clip_id=0, transpose=3, rate=2))
        assert clip.name == "renamed" and clip.color == 7
        assert clip.midi.transpose == 3 and clip.midi.rate == 2
        mgr.undo(); mgr.undo(); mgr.undo()
        c = tr.clips[0]
        assert c.name == "m" and c.color == tr.color
        assert c.midi.transpose == 0 and c.midi.rate == 1

    def test_clip_shift_and_duplicate(self):
        s = Session(bpm=120.0)
        t0 = s.add_track("a")
        t1 = s.add_track("b")
        asset = s.midi_table.create_midi(MidiNoteBuffer([MidiNote(0.0, 1.0)]))
        s.add_midi_clip(t0, "m", 0.0, 4.0, asset=asset)
        mgr = CommandManager(s)
        mgr.execute(ClipShift(track_idx=0, clip_id=0, relative_pos=-1.0))
        assert t0.clips[0].start_offset == pytest.approx(1.0)
        mgr.execute(ClipDuplicate(src_track_idx=0, dst_track_idx=1, clip_id=0, relative_pos=2.0))
        assert len(t1.clips) == 1
        assert (t1.clips[0].min_time, t1.clips[0].max_time) == (2.0, 6.0)
        mgr.undo()
        assert len(t1.clips) == 0
        mgr.undo()
        assert t0.clips[0].start_offset == 0.0


class TestTrackStructuralCommands:
    def test_track_add_delete_move_undo(self):
        s = Session()
        for name in ("a", "b", "c"):
            s.add_track(name)
        s.tracks[1].volume_db = -6.0
        mgr = CommandManager(s)

        mgr.execute(TrackAdd(track_name="d", volume_db=-3.0))
        assert [t.name for t in s.tracks] == ["a", "b", "c", "d"]
        mgr.execute(TrackMove(from_slot=3, to_slot=0))
        assert [t.name for t in s.tracks] == ["d", "a", "b", "c"]
        mgr.execute(TrackDelete(track_idx=2))
        assert [t.name for t in s.tracks] == ["d", "a", "c"]

        mgr.undo()
        assert [t.name for t in s.tracks] == ["d", "a", "b", "c"]
        assert s.tracks[2].volume_db == -6.0
        mgr.undo()
        assert [t.name for t in s.tracks] == ["a", "b", "c", "d"]
        mgr.undo()
        assert [t.name for t in s.tracks] == ["a", "b", "c"]
        mgr.redo(); mgr.redo(); mgr.redo()
        assert [t.name for t in s.tracks] == ["d", "a", "c"]

    def test_structural_undo_preserves_clips(self):
        s = Session()
        tr = s.add_track("a")
        asset = s.midi_table.create_midi(MidiNoteBuffer([MidiNote(0.0, 1.0, key=60)]))
        s.add_midi_clip(tr, "m", 0.0, 4.0, asset=asset)
        mgr = CommandManager(s)
        mgr.execute(TrackDelete(track_idx=0))
        assert s.tracks == []
        mgr.undo()
        assert len(s.tracks) == 1 and len(s.tracks[0].clips) == 1
        assert s.tracks[0].clips[0].midi.asset.notes[0].key == 60
