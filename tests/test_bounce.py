"""End-to-end bounce driver tests (CPU: XLA path + Pallas interpret mode)."""

import numpy as np

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.io import wav
from whitebox_tpu.ops.mix_pallas import render_timeline_pallas
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.timeline.carve import carve_session, render_segments_numpy
from whitebox_tpu.timeline.oracle import OracleRenderer


class TestBounce:
    def test_bounce_matches_oracle_and_writes_wav(self, tmp_path):
        s = random_session(1, rate=48000, bpm=120.0, n_tracks=4)
        oracle = OracleRenderer(s, 48000.0, buffer_size=512).render()
        p = tmp_path / "mix.wav"
        res = bounce(s, 48000.0, buffer_size=512, engine="xla", out_path=p)
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)
        back, info = wav.read_wav(p)
        assert info.format == AudioFormat.F32
        np.testing.assert_array_equal(back, res.audio)
        assert res.stats.rtf > 0

    def test_bounce_auto_falls_back_for_resampled(self):
        s = random_session(2, rate=48000, bpm=120.0, n_tracks=2, speeds=(1.5,))
        res = bounce(s, 48000.0, engine="auto")
        assert res.audio.shape[0] == 2  # rendered via XLA fallback

    def test_pallas_interpret_matches_reference(self):
        # interpret=True runs the Pallas kernel on CPU for parity checking
        s = random_session(3, rate=48000, bpm=133.7, n_tracks=3, n_clips=2)
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=1024, interpret=True)
        np.testing.assert_array_equal(out, ref)

    def test_pallas_interpret_i16_clamp(self):
        s = random_session(4, rate=48000, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.I16,), n_clips=1)
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=1024, interpret=True)
        np.testing.assert_array_equal(out, ref)


class TestPallasResampled:
    def _ulp_check(self, got, ref, max_ulps=2, abs_tol=2.4e-7):
        a = got.view(np.int32).astype(np.int64)
        b = ref.view(np.int32).astype(np.int64)
        ulps = np.abs(a - b)
        absd = np.abs(got.astype(np.float64) - ref.astype(np.float64))
        bad = (ulps > max_ulps) & (absd > abs_tol)
        assert not bad.any(), (
            f"{bad.sum()} samples exceed {max_ulps} ulp and {abs_tol} abs "
            f"(max ulp {ulps.max()}, max abs {absd.max()})"
        )

    def test_pallas_slow_path_matches_reference(self):
        s = random_session(21, rate=48000, bpm=120.0, n_tracks=3, n_clips=2,
                           speeds=(0.5, 1.0, 1.37), src_rates=(44100, 48000))
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=2048, interpret=True)
        self._ulp_check(out, ref)

    def test_pallas_pure_resample_session(self):
        s = random_session(22, rate=48000, bpm=97.3, n_tracks=2, n_clips=2, speeds=(0.91875,))
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        assert not table.fast.all()
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=1024, interpret=True)
        self._ulp_check(out, ref)

    def test_pallas_catmull_matches_reference(self):
        s = random_session(23, rate=48000, bpm=120.0, n_tracks=3, n_clips=2,
                           speeds=(0.5, 1.0, 1.37), src_rates=(44100, 48000))
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        ref = render_segments_numpy(table, pool, s, interp="catmull")
        out = render_timeline_pallas(table, pool, s, tile=2048, interpret=True, interp="catmull")
        self._ulp_check(out, ref)

    def test_pallas_catmull_keeps_fast_rows_bit_exact(self):
        # all-speed-1 session: catmull mode must not perturb the fast path
        s = random_session(24, rate=48000, bpm=120.0, n_tracks=3, n_clips=2)
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        assert table.fast.all()
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=1024, interpret=True, interp="catmull")
        np.testing.assert_array_equal(out, ref)

    def test_bounce_auto_uses_pallas_for_catmull(self):
        # the catmull bounce rides the pallas engine now (no XLA forcing)
        s = random_session(25, rate=48000, bpm=120.0, n_tracks=2, n_clips=2,
                           speeds=(44100.0 / 48000.0,), src_rates=(44100,))
        got = bounce(s, 48000.0, engine="auto", interpolation="catmull").audio
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        ref = render_segments_numpy(table, pool, s, interp="catmull")
        n = min(got.shape[1], ref.shape[1])
        absd = np.abs(got[:, :n].astype(np.float64) - ref[:, :n].astype(np.float64))
        assert absd.max() < 3e-6


class TestAutoTileBackoff:
    """build_plan(tile=None) starts at DEFAULT_TILE and halves on slot
    overflow instead of falling off to the XLA path."""

    def _dense_session(self):
        # one track, 12 short clips at distinct speeds inside the first
        # DEFAULT_TILE-frame window: runs cannot merge (speed changes), so
        # the (tile, track) cell needs 12 slots at 32768 but fits at <= 8
        # once the tile shrinks
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        rng = np.random.default_rng(42)
        s = Session(bpm=120.0)
        data = (rng.standard_normal((1, 4000)) * 0.3).astype(np.float32)
        asset = s.sample_table.add_sample(
            Sample.from_planar(data, 48000, AudioFormat.F32, name="d"), key="d")
        tr = s.add_track("t0")
        pos = 0.0
        for c in range(12):
            speed = 0.9 + 0.017 * c  # all distinct, all != 1.0
            s.add_audio_clip(tr, f"c{c}", pos, pos + 0.08,
                             start_offset=0.0, asset=asset, speed=speed)
            pos += 0.1  # 0.05 s gap: separate runs, all within ~1.2 s
        return s

    def test_backoff_resolves_overflow(self):
        import pytest as _pytest

        from whitebox_tpu.ops.mix_pallas import (
            DEFAULT_TILE, SlotOverflow, build_plan)

        s = self._dense_session()
        table, pool = carve_session(s, 48000.0, buffer_size=512,
                                    slow_emit="runs")
        with _pytest.raises(SlotOverflow):
            build_plan(table, pool, s, tile=DEFAULT_TILE)
        plan = build_plan(table, pool, s, tile=None)
        assert plan.tile < DEFAULT_TILE
        assert plan.ms.shape[2] <= 8  # K fits the default slot budget

    def test_backoff_plan_renders_parity(self):
        s = self._dense_session()
        table, pool = carve_session(s, 48000.0, buffer_size=512,
                                    slow_emit="runs")
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=None, interpret=True)
        n = min(out.shape[1], ref.shape[1])
        absd = np.abs(out[:, :n].astype(np.float64) - ref[:, :n].astype(np.float64))
        assert absd.max() < 2.4e-7
