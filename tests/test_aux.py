"""Auxiliary subsystems: preview streaming, recording ingest, settings."""

import numpy as np

from whitebox_tpu.config import Settings
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.render.preview import PreviewStream
from whitebox_tpu.session import Session
from whitebox_tpu.session.sample import Sample


def make_session():
    s = Session(bpm=60.0)
    data = (np.arange(32768, dtype=np.float32) / 65536.0)[None]
    asset = s.sample_table.add_sample(Sample.from_planar(data, 32768, AudioFormat.F32), key="a")
    tr = s.add_track("t")
    s.add_audio_clip(tr, "c", 0.0, 0.9, asset=asset)
    return s


class TestPreview:
    def test_blocks_match_bounce(self):
        from whitebox_tpu.render.bounce import bounce

        s = make_session()
        full = bounce(s, 32768.0, buffer_size=256).audio
        ps = PreviewStream(s, 32768.0, buffer_size=256)
        blocks = list(ps)
        assert len(blocks) == -(-full.shape[1] // 256)
        joined = np.concatenate(blocks, axis=1)[:, : full.shape[1]]
        np.testing.assert_array_equal(joined, full)

    def test_seek(self):
        s = make_session()
        ps = PreviewStream(s, 32768.0, buffer_size=256)
        ps.seek(0.5)  # beat 0.5 @60bpm/32768 = frame 16384
        assert ps.position_frames == 16384
        b = ps.next_block()
        assert b.shape == (2, 256)


class TestRecording:
    def test_take_becomes_clip(self):
        s = Session(bpm=120.0)
        tr = s.add_track("rec")
        take = np.random.default_rng(0).standard_normal((2, 24000)).astype(np.float32) * 0.1
        clip = s.add_recorded_take(tr, take, 48000, at_beat=2.0)
        assert clip.is_audio()
        assert clip.min_time == 2.0
        assert clip.max_time == 2.0 + 24000 / 48000.0 / 0.5
        assert clip.audio.asset.sample.count == 24000


class TestSettings:
    def test_roundtrip(self, tmp_path):
        st = Settings(sample_rate=44100, engine="xla", user_dirs=["/tmp/samples"])
        p = st.save(tmp_path / "settings.json")
        back = Settings.load(p)
        assert back.sample_rate == 44100
        assert back.engine == "xla"
        assert back.user_dirs == ["/tmp/samples"]

    def test_missing_file_defaults(self, tmp_path):
        st = Settings.load(tmp_path / "nope.json")
        assert st.sample_rate == 48000 and st.buffer_size == 512

    def test_corrupt_file_defaults(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        assert Settings.load(p).sample_rate == 48000


class TestPreviewStreaming:
    """The preview renders bounded device windows, not the whole timeline."""

    def test_memory_bounded_by_lookahead(self):
        s = make_session()
        ps = PreviewStream(s, 32768.0, buffer_size=256, lookahead_blocks=4)
        assert ps.window_frames == 0  # nothing rendered before the first pull
        blocks = [ps.next_block() for _ in range(8)]
        assert all(b is not None for b in blocks)
        # the resident cache never exceeds the lookahead window
        assert ps.window_frames == 4 * 256
        assert ps.total_frames > 4 * 256 * 4  # session >> window

    def test_lookahead_governs_refetch_and_matches_bounce(self):
        from whitebox_tpu.render.bounce import bounce

        s = make_session()
        full = bounce(s, 32768.0, buffer_size=256).audio
        ps = PreviewStream(s, 32768.0, buffer_size=256, lookahead_blocks=3)
        joined = np.concatenate(list(ps), axis=1)[:, : full.shape[1]]
        np.testing.assert_array_equal(joined, full)

    def test_seek_invalidates_window(self):
        s = make_session()
        ps = PreviewStream(s, 32768.0, buffer_size=256, lookahead_blocks=4)
        ps.next_block()
        assert ps.window_frames > 0
        ps.seek(0.5)
        assert ps.window_frames == 0
        b = ps.next_block()
        assert b.shape == (2, 256)
        # the block served after the seek equals the bounce at that offset
        from whitebox_tpu.render.bounce import bounce

        full = bounce(s, 32768.0, buffer_size=256).audio
        np.testing.assert_array_equal(b, full[:, 16384 : 16384 + 256])

    def test_quality_interpolation_modes(self):
        # preview carries the same catmull / oversampled-sinc modes as bounce
        from tests.test_carve import random_session
        from whitebox_tpu.render.bounce import bounce

        s = random_session(71, rate=48000, bpm=120.0, n_tracks=2, n_clips=2,
                           speeds=(44100.0 / 48000.0,), src_rates=(44100,))
        for mode in ("catmull", "sinc"):
            # engine auto = the same oversampled-sinc / pallas-catmull forms
            # the preview uses (engine="xla" sinc is the direct 32-tap mode;
            # prerender=False pins bounce to the preview's oversample form —
            # the auto path upgrades to the exact/Taylor polyphase quality)
            full = bounce(s, 48000.0, buffer_size=512, interpolation=mode,
                          prerender=False).audio
            ps = PreviewStream(s, 48000.0, buffer_size=512, lookahead_blocks=8,
                               interpolation=mode)
            joined = np.concatenate(list(ps), axis=1)[:, : full.shape[1]]
            absd = np.abs(joined.astype(np.float64) - full.astype(np.float64))
            assert absd.max() < 3e-6, f"{mode}: {absd.max():.2e}"


class TestPreviewEditInvalidation:
    """Edits during playback re-carve from the current position — the
    offline refresh_voice / internal_state_changed (track.cpp:289-345)."""

    def test_edit_during_preview_matches_fresh_render(self):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.timeline.oracle import OracleRenderer

        s = make_session()
        ps = PreviewStream(s, 32768.0, buffer_size=256, lookahead_blocks=4)
        pre = [ps.next_block() for _ in range(6)]  # playing...
        # edit mid-playback: move the clip later and drop its gain
        s.tracks[0].clips[0].audio.gain = 0.5
        s.tracks[0].clips[0].min_time += 0.05
        s.tracks[0].clips[0].max_time += 0.05
        post = [ps.next_block() for _ in range(6)]
        # a fresh render of the EDITED session from the same position
        ref = OracleRenderer(s, 32768.0, buffer_size=256).render()
        start = 6 * 256
        joined = np.concatenate(post, axis=1)
        n = min(joined.shape[1], ref.shape[1] - start)
        np.testing.assert_array_equal(joined[:, :n], ref[:, start : start + n])

    def test_note_edit_changes_stamp(self):
        from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
        from whitebox_tpu.session.clip import Clip, ClipType, MidiClipData

        s = make_session()
        buf = MidiNoteBuffer([MidiNote(0.0, 0.25, key=60, velocity=0.5)])
        asset = s.midi_table.create_midi(buf)
        tr = s.add_track("keys")
        clip = Clip(id=0, type=ClipType.MIDI, min_time=0.0, max_time=0.5)
        clip.midi = MidiClipData(asset=asset)
        tr.clips.append(clip)
        s0 = s.edit_stamp()
        buf.add_note(MidiNote(0.25, 0.5, key=64, velocity=0.6))
        assert s.edit_stamp() != s0

    def test_param_and_lane_edits_change_stamp(self):
        from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation

        s = make_session()
        s0 = s.edit_stamp()
        s.tracks[0].volume_db = -6.0
        s1 = s.edit_stamp()
        assert s1 != s0
        s.tracks[0].automation = TrackAutomation(volume=AutomationLane().add(0.0, 1.0))
        s2 = s.edit_stamp()
        assert s2 != s1
        s.tracks[0].automation.volume.add(0.5, 0.2)  # point edit, same object
        assert s.edit_stamp() != s2
