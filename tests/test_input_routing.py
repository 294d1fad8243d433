"""Input-routing model for recording (session/input.py) — the
track_input.h:10-45 / engine.cpp:142-199,1638-1648,1677-1713 semantics:
packed-u32 input encoding, armed-track input groups, one N-channel
capture stream fanning out to multiple simultaneously armed tracks, and
`.wb` persistence of input assignments."""

import numpy as np
import pytest

from whitebox_tpu.session import Session
from whitebox_tpu.session.input import (
    MultiTrackRecording, TrackInput, TrackInputType, build_input_groups,
)

RATE = 48000.0


class TestPackedU32:
    def test_round_trip_all_types(self):
        for t in TrackInputType:
            for idx in (0, 1, 7, 0xFFFFFF):
                inp = TrackInput(t, idx)
                packed = inp.as_packed_u32()
                # track_input.h:20-22: index & 0xFFFFFF | type << 24
                assert packed == (idx & 0xFFFFFF) | (int(t) << 24)
                back = TrackInput.from_packed_u32(packed)
                assert back == inp

    def test_index_masked_to_24_bits(self):
        inp = TrackInput(TrackInputType.EXTERNAL_MONO, 0x1FFFFFF)
        assert TrackInput.from_packed_u32(inp.as_packed_u32()).index == 0xFFFFFF

    def test_channel_widths(self):
        assert TrackInput(TrackInputType.EXTERNAL_STEREO, 0).channels == 2
        assert TrackInput(TrackInputType.EXTERNAL_MONO, 3).channels == 1


class TestInputGroups:
    def _session(self):
        s = Session(bpm=120.0)
        for i in range(5):
            s.add_track(f"t{i}")
        return s

    def test_groups_form_only_for_armed_external(self):
        s = self._session()
        s.set_track_input(0, "external_stereo", 0, armed=True)
        s.set_track_input(1, "external_mono", 2, armed=False)  # not armed
        s.set_track_input(2, "midi", 0, armed=True)  # midi: no audio group
        s.set_track_input(3, "external_stereo", 0, armed=True)  # shares group 0
        groups = build_input_groups(s)
        assert len(groups) == 1
        assert groups[0].track_indices == [0, 3]
        assert groups[0].input == TrackInput(TrackInputType.EXTERNAL_STEREO, 0)

    def test_distinct_inputs_distinct_groups_insertion_order(self):
        s = self._session()
        s.set_track_input(1, "external_mono", 1, armed=True)
        s.set_track_input(0, "external_stereo", 0, armed=True)
        s.set_track_input(4, "external_mono", 1, armed=True)
        groups = build_input_groups(s)
        # track order defines insertion order: stereo@0 seen at track 0 first
        assert [g.input.type for g in groups] == [
            TrackInputType.EXTERNAL_STEREO, TrackInputType.EXTERNAL_MONO]
        assert groups[1].track_indices == [1, 4]

    def test_arm_track_toggles_membership(self):
        s = self._session()
        s.set_track_input(0, "external_mono", 0)
        assert build_input_groups(s) == []
        s.arm_track(0)
        assert len(build_input_groups(s)) == 1
        s.arm_track(0, False)
        assert build_input_groups(s) == []

    def test_none_input_clears_assignment(self):
        s = self._session()
        s.set_track_input(0, "external_mono", 0, armed=True)
        s.set_track_input(0, "none", armed=True)
        assert s.tracks[0].input is None
        assert build_input_groups(s) == []


class TestMultiTrackRecording:
    def test_three_takes_from_one_4ch_stream_bit_exact(self):
        """VERDICT r4 #6 done-criterion: 3 takes from one 4-channel capture
        stream, each bit-exact to its channel slice; two tracks share one
        input (same audio), the third records a different slice."""
        s = Session(bpm=120.0)
        for i in range(3):
            s.add_track(f"t{i}")
        s.set_track_input(0, "external_stereo", 0, armed=True)  # ch [0,1]
        s.set_track_input(1, "external_stereo", 0, armed=True)  # ch [0,1] too
        s.set_track_input(2, "external_mono", 3, armed=True)    # ch [3]
        rec = s.record_armed(RATE, at_beat=1.0)
        assert rec.capture_channels_required == 4
        rng = np.random.default_rng(7)
        blocks = [rng.standard_normal((4, n)).astype(np.float32) * 0.4
                  for n in (512, 512, 300, 512, 64)]
        for b in blocks:
            rec.record_block(b)
        clips = rec.finalize()
        assert len(clips) == 3 and all(c is not None for c in clips)
        full = np.concatenate(blocks, axis=1)
        got0 = np.asarray(clips[0].audio.asset.sample.data)
        got1 = np.asarray(clips[1].audio.asset.sample.data)
        got2 = np.asarray(clips[2].audio.asset.sample.data)
        np.testing.assert_array_equal(got0, full[0:2])
        np.testing.assert_array_equal(got1, full[0:2])
        np.testing.assert_array_equal(got2, full[3:4])
        # clips placed at the record start; tracks disarmed (stop_record)
        for c, tr in zip(clips, s.tracks):
            assert c.min_time == 1.0
            assert not tr.armed

    def test_capture_too_narrow_raises(self):
        s = Session(bpm=120.0)
        s.add_track("a")
        s.set_track_input(0, "external_stereo", 1, armed=True)  # needs ch [2,3]
        rec = s.record_armed(RATE, at_beat=0.0)
        with pytest.raises(ValueError, match="capture block has 2"):
            rec.record_block(np.zeros((2, 64), np.float32))

    def test_no_armed_tracks_raises(self):
        s = Session(bpm=120.0)
        s.add_track("a")
        with pytest.raises(ValueError, match="no armed track"):
            s.record_armed(RATE)

    def test_cancel_leaves_session_untouched(self):
        s = Session(bpm=120.0)
        s.add_track("a")
        s.set_track_input(0, "external_mono", 0, armed=True)
        rec = s.record_armed(RATE, at_beat=0.0)
        rec.record_block(np.ones((1, 256), np.float32))
        stamp = s.edit_stamp()
        rec.cancel()
        assert s.edit_stamp() == stamp
        assert not s.tracks[0].clips

    def test_punch_in_with_live_preview_two_armed(self):
        """VERDICT r4 #6: >=2 armed tracks recording from one stream while
        a PreviewStream plays the same session; the finalize invalidates
        the preview (edit stamp) and both takes land bit-exactly."""
        from tests.test_carve import random_session
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.render.preview import PreviewStream

        s = random_session(19, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        a = s.add_track("rec-a")
        b = s.add_track("rec-b")
        ia, ib = s.tracks.index(a), s.tracks.index(b)
        s.set_track_input(ia, "external_stereo", 0, armed=True)
        s.set_track_input(ib, "external_mono", 1, armed=True)  # ch [1]
        ps = PreviewStream(s, RATE, buffer_size=512, lookahead_blocks=8)
        rec = s.record_armed(RATE, at_beat=0.5)
        rng = np.random.default_rng(3)
        blocks = []
        for _ in range(6):
            assert ps.next_block() is not None  # playback rolls
            blk = rng.standard_normal((2, 512)).astype(np.float32) * 0.3
            blocks.append(blk)
            rec.record_block(blk)
        clips = rec.finalize()
        full = np.concatenate(blocks, axis=1)
        np.testing.assert_array_equal(
            np.asarray(clips[0].audio.asset.sample.data), full)
        np.testing.assert_array_equal(
            np.asarray(clips[1].audio.asset.sample.data), full[1:2])
        # the preview notices the new clips on its next pull
        blk = ps.next_block()
        assert blk is not None and ps._stamp == s.edit_stamp()


class TestPersistence:
    def test_wb_round_trips_input_assignments(self, tmp_path):
        from whitebox_tpu.session.project import read_project, write_project

        s = Session(bpm=120.0)
        for i in range(4):
            s.add_track(f"t{i}")
        s.set_track_input(0, "external_stereo", 2, armed=True)
        s.set_track_input(1, "external_mono", 5, armed=False)
        s.set_track_input(2, "midi", 1, armed=True)
        p = tmp_path / "inputs.wb"
        write_project(s, p)
        r = read_project(p)
        assert r.tracks[0].input == TrackInput(TrackInputType.EXTERNAL_STEREO, 2)
        assert r.tracks[0].armed is True
        assert r.tracks[1].input == TrackInput(TrackInputType.EXTERNAL_MONO, 5)
        assert r.tracks[1].armed is False
        assert r.tracks[2].input == TrackInput(TrackInputType.MIDI, 1)
        assert r.tracks[3].input is None and r.tracks[3].armed is False
