"""Session edit-API tests: clip list invariants, overlap trim/split,
clip queries — semantics per engine.cpp:409-569 / track.cpp:112-216."""

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.session import Session
from whitebox_tpu.session.assets import SampleAsset
from whitebox_tpu.session.sample import Sample


@pytest.fixture
def session():
    return Session(bpm=120.0)


@pytest.fixture
def asset(session):
    s = Sample.from_planar(np.zeros((1, 48000), dtype=np.float32), 48000, AudioFormat.F32, name="t")
    return session.sample_table.add_sample(s, key="t")


def clip_spans(track):
    return [(c.min_time, c.max_time) for c in track.clips]


class TestAddClip:
    def test_append_and_ordering(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c1", 0.0, 4.0, asset=asset)
        session.add_audio_clip(tr, "c2", 8.0, 12.0, asset=asset)
        assert clip_spans(tr) == [(0.0, 4.0), (8.0, 12.0)]
        assert [c.id for c in tr.clips] == [0, 1]

    def test_insert_front(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c1", 8.0, 12.0, asset=asset)
        session.add_audio_clip(tr, "c2", 0.0, 4.0, asset=asset)
        assert clip_spans(tr) == [(0.0, 4.0), (8.0, 12.0)]

    def test_overlap_trims_right_edge(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c1", 0.0, 4.0, asset=asset)
        session.add_audio_clip(tr, "c2", 2.0, 6.0, asset=asset)
        # c1 trimmed to [0,2), c2 occupies [2,6)
        assert clip_spans(tr) == [(0.0, 2.0), (2.0, 6.0)]

    def test_overlap_trims_left_edge_and_shifts_content(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c1", 2.0, 6.0, asset=asset)
        session.add_audio_clip(tr, "c2", 0.0, 4.0, asset=asset)
        assert clip_spans(tr) == [(0.0, 4.0), (4.0, 6.0)]
        # trimmed c1 lost 2 beats of head: at 120bpm/48k that's 48000 samples
        trimmed = tr.clips[1]
        assert trimmed.name == "c1"
        assert trimmed.start_offset == 48000.0

    def test_full_cover_deletes(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "small", 1.0, 2.0, asset=asset)
        session.add_audio_clip(tr, "big", 0.0, 4.0, asset=asset)
        assert [c.name for c in tr.clips] == ["big"]

    def test_split(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "long", 0.0, 8.0, asset=asset)
        session.add_audio_clip(tr, "mid", 2.0, 4.0, asset=asset)
        assert clip_spans(tr) == [(0.0, 2.0), (2.0, 4.0), (4.0, 8.0)]
        tail = tr.clips[2]
        assert tail.name == "long"
        assert tail.start_offset == 4.0 * 0.5 * 48000  # 4 beats into content


class TestMoveResize:
    def test_move(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c", 0.0, 4.0, asset=asset)
        session.move_clip(tr, tr.clips[0], 2.0)
        assert clip_spans(tr) == [(2.0, 6.0)]
        assert tr.clips[0].internal_state_changed

    def test_move_clamped_at_zero(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c", 1.0, 3.0, asset=asset)
        session.move_clip(tr, tr.clips[0], -5.0)
        assert clip_spans(tr) == [(0.0, 2.0)]

    def test_resize_right(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c", 0.0, 4.0, asset=asset)
        session.resize_clip(tr, tr.clips[0], -1.0, 0.0, 0.25, left_side=False)
        assert clip_spans(tr) == [(0.0, 3.0)]

    def test_resize_left_adjusts_offset(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c", 0.0, 4.0, asset=asset)
        session.resize_clip(tr, tr.clips[0], 1.0, 4.0, 0.25, left_side=True)
        assert clip_spans(tr) == [(1.0, 4.0)]
        assert tr.clips[0].start_offset == 24000.0  # 1 beat @120bpm/48k

    def test_delete_region_splits(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c", 0.0, 8.0, asset=asset)
        session.delete_region(tr, 3.0, 5.0)
        assert clip_spans(tr) == [(0.0, 3.0), (5.0, 8.0)]


class TestQueries:
    def test_query_none_outside(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c", 2.0, 4.0, asset=asset)
        assert tr.query_clip_by_range(0.0, 1.0) is None
        assert tr.query_clip_by_range(5.0, 6.0) is None

    def test_query_hits(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c1", 0.0, 2.0, asset=asset)
        session.add_audio_clip(tr, "c2", 3.0, 5.0, asset=asset)
        q = tr.query_clip_by_range(1.0, 4.0)
        assert (q.first, q.last) == (0, 1)

    def test_find_next_clip(self, session, asset):
        tr = session.add_track("a")
        session.add_audio_clip(tr, "c1", 2.0, 4.0, asset=asset)
        assert tr.find_next_clip(0.0) == 0
        assert tr.find_next_clip(3.0) == 0
        assert tr.find_next_clip(5.0) is None


class TestSolo:
    def test_solo_mutes_others(self, session):
        a, b, c = session.add_track("a"), session.add_track("b"), session.add_track("c")
        session.solo_track(0)
        assert a.solo and not a.mute and b.mute and c.mute
        session.solo_track(0)  # un-solo restores
        assert not a.solo and not b.mute and not c.mute

    def test_solo_switches(self, session):
        a, b = session.add_track("a"), session.add_track("b")
        session.solo_track(0)
        session.solo_track(1)
        assert not a.solo and b.solo and a.mute and not b.mute


class TestRegionOps:
    def test_duplicate_region_across_tracks(self, session, asset):
        a = session.add_track("a")
        b = session.add_track("b")
        session.add_audio_clip(a, "c1", 0.0, 4.0, asset=asset, gain=0.7)
        session.move_or_duplicate_region(0, 1, 1.0, 3.0, dst_track_offset=1,
                                         dst_time_offset=0.0, duplicate=True)
        # source untouched; destination has the trimmed copy with shifted content
        assert clip_spans(a) == [(0.0, 4.0)]
        assert clip_spans(b) == [(1.0, 3.0)]
        assert b.clips[0].start_offset == 24000.0  # 1 beat @120bpm/48k
        assert b.clips[0].audio.gain == 0.7

    def test_move_region_in_time(self, session, asset):
        a = session.add_track("a")
        session.add_audio_clip(a, "c1", 0.0, 2.0, asset=asset)
        session.move_or_duplicate_region(0, 1, 0.0, 2.0, dst_time_offset=4.0)
        assert clip_spans(a) == [(4.0, 6.0)]

    def test_move_region_overwrites_destination(self, session, asset):
        a = session.add_track("a")
        session.add_audio_clip(a, "src", 0.0, 2.0, asset=asset)
        session.add_audio_clip(a, "dst", 4.0, 8.0, asset=asset)
        session.move_or_duplicate_region(0, 1, 0.0, 2.0, dst_time_offset=5.0)
        names = [(c.name, c.min_time, c.max_time) for c in a.clips]
        assert ("src", 5.0, 7.0) in names
        # dst trimmed/split around [5,7)
        assert ("dst", 4.0, 5.0) in names and ("dst", 7.0, 8.0) in names

    def test_shift_clips_content(self, session, asset):
        a = session.add_track("a")
        session.add_audio_clip(a, "c", 0.0, 2.0, asset=asset)
        session.shift_clips(a, 0.0, 2.0, -0.5)  # shift content later by 0.5 beat
        assert a.clips[0].start_offset == 12000.0

    def test_resize_clips_multi(self, session, asset):
        a = session.add_track("a")
        b = session.add_track("b")
        session.add_audio_clip(a, "c", 0.0, 4.0, asset=asset)
        session.add_audio_clip(b, "c", 0.0, 4.0, asset=asset)
        session.resize_clips([(0, 0), (1, 0)], -1.0)
        assert clip_spans(a) == [(0.0, 3.0)]
        assert clip_spans(b) == [(0.0, 3.0)]
