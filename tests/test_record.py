"""Streaming record ingestion (session/record.py) — the
audio_record.h:44-128 / engine.cpp:107-140 lifecycle: chunked bounded
growth, truncate-on-stop, asset registration, clip placement, and the
punch-in flow (recording while a PreviewStream plays)."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.session import RecordingTake, Session
from whitebox_tpu.session.record import RECORD_CHUNK_BYTES

RATE = 48000.0


def _blocks(rng, channels, sizes):
    return [rng.standard_normal((channels, n)).astype(np.float32) * 0.5
            for n in sizes]


class TestRecordingTake:
    def test_finalize_equals_concatenated_blocks(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE, at_beat=2.0)
        rng = np.random.default_rng(0)
        blocks = _blocks(rng, 2, [512] * 20 + [13, 999, 512, 7])
        for b in blocks:
            take.append(b)
        want = np.concatenate(blocks, axis=1)
        assert take.frames_written == want.shape[1]
        clip = take.finalize()
        assert clip is not None and clip.is_audio()
        got = clip.audio.asset.sample.data
        np.testing.assert_array_equal(got, want)  # bit-exact ingestion
        assert clip.min_time == 2.0

    def test_chunked_growth_is_bounded(self):
        """Appending never reallocates the take: the storage is a list of
        fixed 256 KiB chunks (engine.h:36), with at most one partial."""
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE, at_beat=0.0)
        chunk_frames = RECORD_CHUNK_BYTES // (4 * 2)
        rng = np.random.default_rng(1)
        for b in _blocks(rng, 2, [512] * 300):
            take.append(b)
        n = take.frames_written
        assert len(take._chunks) == -(-n // chunk_frames)
        for c in take._chunks:
            assert c.shape == (2, chunk_frames)

    def test_truncate_on_stop(self):
        """finalize() truncates to frames actually written, not chunk
        capacity (engine.cpp:126 resize)."""
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE, at_beat=0.0)
        take.append(np.ones((2, 100), np.float32))
        clip = take.finalize()
        assert clip.audio.asset.sample.count == 100

    def test_empty_take_returns_none(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE)
        assert take.finalize() is None
        assert len(tr.clips) == 0

    def test_cancel_leaves_session_untouched(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        stamp = s.edit_stamp()
        take = s.start_recording(tr, RATE)
        take.append(np.ones((2, 4096), np.float32))
        take.cancel()
        assert len(tr.clips) == 0 and s.edit_stamp() == stamp
        with pytest.raises(RuntimeError):
            take.append(np.ones((2, 1), np.float32))

    def test_channel_mismatch_rejected(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE, channels=2)
        with pytest.raises(ValueError, match="channels"):
            take.append(np.ones((3, 64), np.float32))

    def test_double_finalize_rejected(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE)
        take.append(np.ones((2, 64), np.float32))
        take.finalize()
        with pytest.raises(RuntimeError):
            take.finalize()

    def test_mono_take(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE, channels=1)
        take.append(np.arange(777, dtype=np.float32)[None] / 1000.0)
        clip = take.finalize()
        got = np.asarray(clip.audio.asset.sample.data)
        assert got.shape == (1, 777)

    def test_clip_length_respects_tempo_map(self):
        """The placed clip's beat length inverts the tempo map at the
        record position (clip_length_beats), like any other clip."""
        s = Session(bpm=120.0)
        s.set_tempo_point(0.0, 120.0)
        s.set_tempo_point(4.0, 60.0)
        tr = s.add_track("rec")
        take = s.start_recording(tr, RATE, at_beat=4.0)
        take.append(np.ones((2, int(RATE)), np.float32))  # 1s at 60 bpm = 1 beat
        clip = take.finalize()
        assert abs((clip.max_time - clip.min_time) - 1.0) < 1e-9


class TestPunchIn:
    def test_record_while_preview_plays(self):
        """The punch-in flow: a PreviewStream plays the session while a
        take ingests blocks; finalize registers the take mid-playback and
        the preview's edit-stamp invalidation picks the new clip up."""
        from whitebox_tpu.render.preview import PreviewStream

        s = random_session(5, rate=48000, bpm=120.0, n_tracks=2, n_clips=2)
        rec_track = s.add_track("rec", volume_db=0.0)
        ps = PreviewStream(s, RATE, buffer_size=256, lookahead_blocks=4)

        rng = np.random.default_rng(7)
        take = s.start_recording(rec_track, RATE, at_beat=0.0)
        played = []
        recorded = []
        for _ in range(24):  # interleave: play a block, record a block
            blk = ps.next_block()
            if blk is not None:
                played.append(np.asarray(blk))
            b = rng.standard_normal((2, 256)).astype(np.float32) * 0.25
            recorded.append(b)
            take.append(b)
        clip = take.finalize()
        want = np.concatenate(recorded, axis=1)
        np.testing.assert_array_equal(
            clip.audio.asset.sample.data, want)

        # the preview notices the finalized take (edit stamp changed) and
        # subsequent blocks include the recorded material
        blk = ps.next_block()
        assert blk is not None
        # re-render the same range offline: the punched-in session renders
        # with the take in place
        from whitebox_tpu.render.bounce import bounce

        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        assert np.isfinite(res.audio).all()
        n = min(res.audio.shape[1], want.shape[1])
        assert n > 0
