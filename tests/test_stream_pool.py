"""Chunked pool residency (render/stream_pool.py): HBM-exceeding sessions
render with a bounded device pool and match the resident path."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.render.stream_pool import bounce_streamed, plan_stream_windows
from whitebox_tpu.timeline.carve import carve_session

RATE = 48000.0


def _cap_for(pool, frac):
    return max(int(pool.data.nbytes * frac), 1 << 16)


class TestStreaming:
    def test_speed1_bit_exact_under_cap(self):
        """A cap far below the pool size still renders bit-exactly."""
        s = random_session(40, rate=48000, bpm=120.0, n_tracks=6, n_clips=2)
        table, pool = carve_session(s, RATE, buffer_size=512)
        cap = _cap_for(pool, 0.25)
        ref = bounce(s, RATE, engine="xla").audio
        got = bounce_streamed(s, RATE, max_pool_bytes=cap, window_frames=8192)
        n = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[:, :n], ref[:, :n])

    def test_pool_cap_respected(self):
        s = random_session(41, rate=48000, bpm=120.0, n_tracks=8, n_clips=2)
        table, pool = carve_session(s, RATE, buffer_size=512)
        cap = _cap_for(pool, 0.3)
        windows = plan_stream_windows(table, pool, 8192, 2, cap)
        assert len(windows) > 1
        assert all(w.pool_bytes <= cap for w in windows)
        # and the cap is a real constraint: the full pool would not fit
        assert pool.data.nbytes > cap

    def test_window_too_small_cap_raises(self):
        s = random_session(42, rate=48000, bpm=120.0, n_tracks=8, n_clips=2)
        table, pool = carve_session(s, RATE, buffer_size=512)
        with pytest.raises(ValueError, match="pool bytes"):
            plan_stream_windows(table, pool, 1 << 20, 2, 1 << 12)

    def test_resampled_matches_resident(self):
        s = random_session(43, rate=48000, bpm=120.0, n_tracks=4, n_clips=2,
                           speeds=(1.0, 0.5, 1.088435374149660), src_rates=(44100.0,))
        table, pool = carve_session(s, RATE, buffer_size=512)
        ref = bounce(s, RATE, engine="xla").audio
        got = bounce_streamed(s, RATE, max_pool_bytes=_cap_for(pool, 0.4),
                              window_frames=8192)
        n = min(ref.shape[1], got.shape[1])
        # window splits re-base closed-form phases by <= 1 f64 ulp
        np.testing.assert_allclose(got[:, :n], ref[:, :n], atol=3e-6)

    @pytest.mark.slow
    def test_effects_and_automation_match_resident(self):
        from whitebox_tpu.effects import Biquad, Compressor, EffectChain
        from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation

        s = random_session(44, rate=48000, bpm=120.0, n_tracks=3, n_clips=1)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 5000.0)])
        s.tracks[1].effects = EffectChain([Compressor(-20.0, 3.0)])
        s.tracks[1].automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(3.0, 0.4))
        table, pool = carve_session(s, RATE, buffer_size=512)
        ref = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        got = bounce_streamed(s, RATE, max_pool_bytes=_cap_for(pool, 0.5),
                              window_frames=8192)
        n = min(ref.shape[1], got.shape[1])
        scale = max(float(np.max(np.abs(ref))), 1e-6)
        assert np.max(np.abs(got[:, :n] - ref[:, :n])) / scale < 1e-4


class TestStreamedSinc:
    def test_sinc_streamed_matches_resident_prerender(self):
        """interpolation="sinc" under a pool cap rides the HOST prerender
        rewrite (exact polyphase; the ext content span-packs like any other
        source) and matches the resident Pallas sinc bounce."""
        from whitebox_tpu.session.clip import ClipMode
        from whitebox_tpu.timeline.prerender import plan_prerender

        s = random_session(44, rate=48000, bpm=120.0, n_tracks=3, n_clips=2,
                           speeds=(0.5, 2.0 ** (1.0 / 12.0)),
                           src_rates=(48000.0,))
        for c in s.tracks[0].clips:
            c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("carved fast-only")
        assert plan_prerender(table, pool, partial=True) is not None
        ref = bounce(s, RATE, interpolation="sinc", engine="pallas").audio
        got = bounce_streamed(s, RATE, interpolation="sinc",
                              max_pool_bytes=_cap_for(pool, 0.5),
                              window_frames=8192)
        n = min(ref.shape[1], got.shape[1])
        # device ext vs host ext render differ at f32 rounding; phases and
        # content are the same exact polyphase values
        np.testing.assert_allclose(got[:, :n], ref[:, :n], atol=4e-6)

    def test_sinc_streamed_cap_counts_ext(self):
        """The prerendered ext is span-packed under the same cap: windows
        exist and respect max_pool_bytes with resampled content."""
        from whitebox_tpu.timeline.prerender import resolve_sinc_host

        s = random_session(45, rate=48000, bpm=120.0, n_tracks=4, n_clips=2,
                           speeds=(147.0 / 160.0,), src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="blocks")
        t2, p2, interp = resolve_sinc_host(table, pool)
        if t2 is table:
            pytest.skip("carved fast-only")
        assert interp == "linear"
        cap = _cap_for(p2, 0.3)
        windows = plan_stream_windows(t2, p2, 8192, 2, cap)
        assert all(w.pool_bytes <= cap for w in windows)
