"""LOOP_STRAIGHT clip mode (extension; clip.h:21 enums it, upstream never
plays it). The carve tiles source passes; the oracle wraps its sampler —
both engines must agree, and the tiled audio must match a hand-built
expectation at speed==1."""

import numpy as np
import pytest

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


def _mode_session(mode: ClipMode, *, speed: float = 1.0, start_offset: float = 0.0, n: int = 3000):
    s = _session(False, speed=speed, start_offset=start_offset, n=n)
    s.tracks[0].clips[0].audio.mode = mode
    return s


def _src(n=3000):
    return np.stack([
        np.linspace(0.1, 0.9, n, dtype=np.float32),
        np.linspace(-0.9, -0.1, n, dtype=np.float32),
    ])


class TestReverseModes:
    """ONE_SHOT_REVERSE / LOOP_REVERSE / LOOP_BIDIRECTIONAL (extensions —
    clip.h:21 enums them; upstream never plays any loop mode)."""

    def test_one_shot_reverse_speed1(self):
        n = 3000
        s = _mode_session(ClipMode.ONE_SHOT_REVERSE, n=n)
        out = OracleRenderer(s, RATE, buffer_size=256).render()
        src = _src(n)
        np.testing.assert_array_equal(out[:, :n], src[:, ::-1])
        assert not out[:, n:].any()  # one pass only

    def test_loop_reverse_speed1_tiles(self):
        n = 3000
        s = _mode_session(ClipMode.LOOP_REVERSE, n=n)
        out = OracleRenderer(s, RATE, buffer_size=256).render()
        src = _src(n)
        clip_frames = 16128  # block-edge stop truncation (see above)
        expected = np.zeros_like(out)
        pos = 0
        while pos < clip_frames:
            m = min(n, clip_frames - pos)
            expected[:, pos : pos + m] = src[:, ::-1][:, :m]
            pos += m
        np.testing.assert_array_equal(out[:, :clip_frames], expected[:, :clip_frames])
        assert not out[:, clip_frames:].any()

    def test_bidirectional_speed1_pingpongs(self):
        n = 3000
        s = _mode_session(ClipMode.LOOP_BIDIRECTIONAL, n=n)
        out = OracleRenderer(s, RATE, buffer_size=256).render()
        src = _src(n)
        clip_frames = 16128
        # passes: fwd [0..n-1], rev [n-2..0], fwd [1..n-1], rev [n-2..0], ...
        passes = [src]
        while sum(p.shape[1] for p in passes) < clip_frames:
            passes.append(src[:, ::-1][:, 1:])   # reverse, skip endpoint
            passes.append(src[:, 1:])            # forward, skip frame 0
        expected = np.concatenate(passes, axis=1)[:, :clip_frames]
        np.testing.assert_array_equal(out[:, :clip_frames], expected)

    def test_carve_matches_oracle_speed1_all_modes(self):
        for mode in (ClipMode.ONE_SHOT_REVERSE, ClipMode.LOOP_REVERSE, ClipMode.LOOP_BIDIRECTIONAL):
            for off in (0.0, 700.0):
                s = _mode_session(mode, start_offset=off)
                ref = OracleRenderer(s, RATE, buffer_size=256).render()
                table, pool = carve_session(s, RATE, buffer_size=256)
                got = render_segments_numpy(table, pool, s)
                m = min(ref.shape[1], got.shape[1])
                np.testing.assert_array_equal(got[:, :m], ref[:, :m],
                                              err_msg=f"mode={mode} off={off}")

    def test_carve_matches_oracle_resampled_all_modes(self):
        for mode in (ClipMode.ONE_SHOT_REVERSE, ClipMode.LOOP_REVERSE, ClipMode.LOOP_BIDIRECTIONAL):
            for speed in (0.5, 44100.0 / 48000.0, 1.7):
                s = _mode_session(mode, speed=speed)
                ref = OracleRenderer(s, RATE, buffer_size=256).render()
                table, pool = carve_session(s, RATE, buffer_size=256)
                got = render_segments_numpy(table, pool, s)
                m = min(ref.shape[1], got.shape[1])
                np.testing.assert_allclose(got[:, :m], ref[:, :m], atol=3e-7,
                                           err_msg=f"mode={mode} speed={speed}")

    def test_device_bounce_matches_oracle_speed1(self):
        from whitebox_tpu.render.bounce import bounce

        s = _mode_session(ClipMode.LOOP_BIDIRECTIONAL)
        ref = OracleRenderer(s, RATE, buffer_size=256).render()
        res = bounce(s, RATE, buffer_size=256)  # auto -> XLA (reverse rows)
        m = min(ref.shape[1], res.audio.shape[1])
        np.testing.assert_array_equal(res.audio[:, :m], ref[:, :m])

    def test_reverse_mode_persists_in_project(self, tmp_path):
        from whitebox_tpu.io import wav

        data = _src()
        wav.write_wav(tmp_path / "src.wav", data, int(RATE), AudioFormat.F32)
        s = Session(bpm=60.0)
        tr = s.add_track("t")
        asset = s.sample_table.load_from_file(tmp_path / "src.wav")
        s.add_audio_clip(tr, "c", 0.0, 0.5, asset=asset)
        tr.clips[0].audio.mode = ClipMode.LOOP_BIDIRECTIONAL
        p = tmp_path / "rev.wb"
        write_project(s, p)
        assert read_project(p).tracks[0].clips[0].audio.mode == ClipMode.LOOP_BIDIRECTIONAL


class TestLoopModesQualityInterp:
    @pytest.mark.slow
    def test_all_modes_render_under_all_interps(self):
        # reverse/loop rows ride the XLA fallback for quality modes; every
        # combination must render (no crash, finite audio, sane level)
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.clip import ClipMode
        from whitebox_tpu.session.sample import Sample

        rng = np.random.default_rng(5)
        x = (rng.standard_normal((1, 44100)) * 0.4).astype(np.float32)
        s = Session(bpm=120.0)
        a = s.sample_table.add_sample(Sample.from_planar(x, 44100, AudioFormat.F32), key="s")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 2.0, asset=a, speed=0.93)
        c = tr.clips[0]
        for mode in (ClipMode.ONE_SHOT_REVERSE, ClipMode.LOOP_REVERSE,
                     ClipMode.LOOP_BIDIRECTIONAL, ClipMode.LOOP_STRAIGHT):
            c.audio.mode = mode
            for interp in ("catmull", "sinc"):
                r = bounce(s, 48000.0, interpolation=interp)
                assert np.isfinite(r.audio).all(), (mode, interp)
                rms = float(np.sqrt(np.mean(r.audio.astype(np.float64) ** 2)))
                assert 0.05 < rms < 1.0, (mode, interp, rms)
