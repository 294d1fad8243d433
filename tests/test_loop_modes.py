"""LOOP_STRAIGHT clip mode (extension; clip.h:21 enums it, upstream never
plays it). The carve tiles source passes; the oracle wraps its sampler —
both engines must agree, and the tiled audio must match a hand-built
expectation at speed==1."""

import numpy as np

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.session import Session
from whitebox_tpu.session.clip import ClipMode
from whitebox_tpu.session.project import read_project, write_project
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.carve import carve_session, render_segments_numpy
from whitebox_tpu.timeline.oracle import OracleRenderer

RATE = 32768.0


def _session(loop: bool, *, speed: float = 1.0, start_offset: float = 0.0, n: int = 3000):
    s = Session(bpm=60.0)  # 1 beat = 1 second = 32768 frames
    data = np.stack([
        np.linspace(0.1, 0.9, n, dtype=np.float32),
        np.linspace(-0.9, -0.1, n, dtype=np.float32),
    ])
    asset = s.sample_table.add_sample(Sample.from_planar(data, int(RATE), AudioFormat.F32), key="a")
    tr = s.add_track("t")
    s.add_audio_clip(tr, "c", 0.0, 0.5, start_offset=start_offset, asset=asset, speed=speed)
    clip = tr.clips[0]
    if loop:
        clip.audio.mode = ClipMode.LOOP_STRAIGHT
    return s


class TestLoopStraight:
    def test_speed1_tiles_exactly(self):
        n = 3000
        s = _session(True, n=n)
        out = OracleRenderer(s, RATE, buffer_size=256).render()
        src = np.stack([
            np.linspace(0.1, 0.9, n, dtype=np.float32),
            np.linspace(-0.9, -0.1, n, dtype=np.float32),
        ])
        # 0.5 beat @60bpm/32768 = frame 16384, but a stop landing exactly on
        # a block edge truncates to the previous edge ((uint64)%bs quirk) ->
        # playback stops at 16384 - 256 = 16128
        clip_frames = 16128
        expected = np.zeros_like(out)
        pos = 0
        while pos < clip_frames:
            m = min(n, clip_frames - pos)
            expected[:, pos : pos + m] = src[:, :m]
            pos += m
        np.testing.assert_array_equal(out[:, :clip_frames], expected[:, :clip_frames])
        # silence after the (quirk-truncated) clip end
        assert not out[:, clip_frames:].any()

    def test_one_shot_unchanged(self):
        n = 3000
        s = _session(False, n=n)
        out = OracleRenderer(s, RATE, buffer_size=256).render()
        assert out[:, : n].any()
        assert not out[:, n + 1 :].any()  # one pass only

    def test_carve_matches_oracle_speed1(self):
        s = _session(True)
        ref = OracleRenderer(s, RATE, buffer_size=256).render()
        table, pool = carve_session(s, RATE, buffer_size=256)
        got = render_segments_numpy(table, pool, s)
        m = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[:, :m], ref[:, :m])

    def test_carve_matches_oracle_resampled(self):
        for speed in (0.5, 44100.0 / 48000.0, 1.7):
            s = _session(True, speed=speed)
            ref = OracleRenderer(s, RATE, buffer_size=256).render()
            table, pool = carve_session(s, RATE, buffer_size=256)
            got = render_segments_numpy(table, pool, s)
            m = min(ref.shape[1], got.shape[1])
            np.testing.assert_allclose(got[:, :m], ref[:, :m], atol=3e-7,
                                       err_msg=f"speed={speed}")
            # loops actually happened: output extends well past one pass
            one_pass = int(3000 / speed)
            assert np.abs(ref[:, one_pass + 64 : 16384 - 64]).max() > 0.05

    def test_mid_clip_start_offset(self):
        s = _session(True, start_offset=1500.0)
        ref = OracleRenderer(s, RATE, buffer_size=256).render()
        table, pool = carve_session(s, RATE, buffer_size=256)
        got = render_segments_numpy(table, pool, s)
        m = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[:, :m], ref[:, :m])

    def test_mode_persists_in_project(self, tmp_path):
        from whitebox_tpu.io import wav

        # file-backed sample so the reader can relocate it
        n = 3000
        data = np.stack([
            np.linspace(0.1, 0.9, n, dtype=np.float32),
            np.linspace(-0.9, -0.1, n, dtype=np.float32),
        ])
        wav.write_wav(tmp_path / "src.wav", data, int(RATE), AudioFormat.F32)
        s = Session(bpm=60.0)
        tr = s.add_track("t")
        asset = s.sample_table.load_from_file(tmp_path / "src.wav")
        s.add_audio_clip(tr, "c", 0.0, 0.5, asset=asset)
        tr.clips[0].audio.mode = ClipMode.LOOP_STRAIGHT
        p = tmp_path / "loop.wb"
        write_project(s, p)
        s2 = read_project(p)
        assert s2.tracks[0].clips[0].audio.mode == ClipMode.LOOP_STRAIGHT
        out1 = OracleRenderer(s, RATE, buffer_size=256).render()
        out2 = OracleRenderer(s2, RATE, buffer_size=256).render()
        np.testing.assert_array_equal(out1, out2)
