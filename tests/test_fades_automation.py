"""Fades + sample-accurate automation (framework extensions over the
reference, which stores fades and edits envelopes but never plays them)."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.ops.automation import AutomationLane, CurveType, TrackAutomation
from whitebox_tpu.ops.mix_pallas import render_timeline_pallas
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.render.effects_pipeline import reference_finish_mix
from whitebox_tpu.session import Session
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.carve import (
    carve_session, render_segments_numpy, render_segments_per_track_numpy,
)
from whitebox_tpu.timeline.oracle import OracleRenderer

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def simple_session(fade_start=0.0, fade_end=0.0, frames=48000):
    s = Session(bpm=60.0)
    data = np.full((1, frames), 0.5, np.float32)
    asset = s.sample_table.add_sample(Sample.from_planar(data, 48000, AudioFormat.F32), key="a")
    tr = s.add_track("t")
    end_b = frames / 48000.0
    s.add_audio_clip(tr, "c", 0.0, end_b, asset=asset, fade_start=fade_start, fade_end=fade_end)
    return s, tr


class TestFades:
    def test_linear_fade_in_shape(self):
        # 0.5s fade-in at 60bpm = 0.5 beats -> 24000 frames
        s, _ = simple_session(fade_start=0.5)
        res = bounce(s, RATE, engine="xla")
        a = res.audio[0]
        assert a[0] == 0.0
        assert a[12000] == pytest.approx(0.25, abs=1e-4)  # halfway up at 0.5 amp
        assert a[30000] == np.float32(0.5)  # past the ramp: untouched

    def test_fade_out_reaches_zero(self):
        s, _ = simple_session(fade_end=0.25, frames=48000)
        res = bounce(s, RATE, engine="xla")
        a = res.audio[0]
        assert a[20000] == np.float32(0.5)
        assert abs(a[47999]) < 1e-4

    def test_no_fade_bit_parity(self):
        # fade plumbing must not disturb the parity path
        s = random_session(4, rate=48000, bpm=120.0, n_tracks=3)
        oracle = OracleRenderer(s, RATE, buffer_size=512).render()
        res = bounce(s, RATE, engine="xla")
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)

    def test_xla_matches_numpy_reference_with_fades(self):
        s = random_session(5, rate=48000, bpm=120.0, n_tracks=3, n_clips=2)
        for tr in s.tracks:
            for c in tr.clips:
                c.audio.fade_start = c.length * 0.2
                c.audio.fade_end = c.length * 0.3
        table, pool = carve_session(s, RATE, buffer_size=512)
        ref = render_segments_numpy(table, pool, s)
        res = bounce(s, RATE, engine="xla")
        np.testing.assert_array_equal(res.audio, ref)

    def test_pallas_interpret_matches_with_fades(self):
        s = random_session(6, rate=48000, bpm=120.0, n_tracks=2, n_clips=2)
        for tr in s.tracks:
            for c in tr.clips:
                c.audio.fade_start = c.length * 0.25
                c.audio.fade_end = c.length * 0.25
        table, pool = carve_session(s, RATE, buffer_size=512)
        ref = render_segments_numpy(table, pool, s)
        out = render_timeline_pallas(table, pool, s, tile=1024, interpret=True)
        np.testing.assert_array_equal(out, ref)

    def test_crossfade_sums_adjacent_clips(self):
        # adjacent clips with fade-out/fade-in form a linear crossfade
        s = Session(bpm=60.0)
        a = s.sample_table.add_sample(
            Sample.from_planar(np.full((1, 48000), 0.5, np.float32), 48000, AudioFormat.F32), key="a")
        b = s.sample_table.add_sample(
            Sample.from_planar(np.full((1, 48000), 0.5, np.float32), 48000, AudioFormat.F32), key="b")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c1", 0.0, 0.5, asset=a, fade_end=0.1)
        s.add_audio_clip(tr, "c2", 0.5, 1.0, asset=b, fade_start=0.0)
        res = bounce(s, RATE, engine="xla")
        # note: non-overlapping clips cannot overlap in time; the "crossfade"
        # is c1 ramping to 0 into c2 starting at full level
        assert res.audio[0, 23900] < 0.05
        assert res.audio[0, 24100] == np.float32(0.5)


class TestAutomation:
    @pytest.mark.slow
    def test_volume_ramp(self):
        s, tr = simple_session()
        lane = AutomationLane().add(0.0, 0.0).add(1.0, 1.0)  # 1 beat = 1s ramp
        tr.automation = TrackAutomation(volume=lane)
        res = bounce(s, RATE, engine="xla")
        a = res.audio[0]
        assert a[0] == 0.0
        assert a[24000] == pytest.approx(0.25 * float(tr.pan_coeffs[0]), abs=1e-3)

    def test_pan_sweep_moves_energy(self):
        s, tr = simple_session()
        tr.automation = TrackAutomation(pan=AutomationLane().add(0.0, -1.0).add(1.0, 1.0))
        res = bounce(s, RATE, engine="xla")
        l, r = res.audio
        assert rms(l[:4000]) > 10 * max(rms(r[:4000]), 1e-9)
        assert rms(r[44000:]) > 10 * max(rms(l[44000:]), 1e-9)

    def test_exp_ease_curve(self):
        s, tr = simple_session()
        lane = AutomationLane()
        lane.add(0.0, 0.0, CurveType.EXP_EASE, tension=0.9)
        lane.add(1.0, 1.0)
        tr.automation = TrackAutomation(volume=lane)
        res = bounce(s, RATE, engine="xla")
        mid = res.audio[0, 24000] / (0.5 * float(tr.pan_coeffs[0]))
        # ease2(0.5, 0.9): (0.5 - 0.45)/(0.9 - 0.9 + 1.0)... compute directly
        u = 0.5
        t = 0.9
        expected = (u - t * u) / (t - 2 * t * abs(u) + 1.0)
        assert mid == pytest.approx(expected, abs=1e-3)

    @pytest.mark.slow
    def test_matches_reference_pipeline(self):
        s = random_session(7, rate=48000, bpm=120.0, n_tracks=3, n_clips=2)
        s.tracks[0].automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(2.0, 0.2).add(4.0, 0.8),
            pan=AutomationLane().add(0.0, -0.5).add(3.0, 0.5),
        )
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_finish_mix(pt, s, RATE)
        scale = max(rms(ref), 1e-9)
        assert rms(res.audio - ref) / scale < 1e-5

    @pytest.mark.slow
    def test_non_automated_tracks_unaffected(self):
        # adding automation to one track must not change others' samples
        s = random_session(8, rate=48000, bpm=120.0, n_tracks=2, n_clips=1)
        base = bounce(s, RATE, engine="xla").audio
        s.tracks[0].automation = TrackAutomation(volume=AutomationLane().add(0.0, 0.0))
        muted0 = bounce(s, RATE, engine="xla").audio
        # track 0 silenced; remaining signal is exactly track 1's parity render
        s2 = random_session(8, rate=48000, bpm=120.0, n_tracks=2, n_clips=1)
        s2.tracks[0].mute = True
        only1 = bounce(s2, RATE, engine="xla").audio
        np.testing.assert_array_equal(muted0, only1)


class TestCurveTypes:
    @pytest.mark.parametrize("curve,tension,check", [
        (CurveType.HOLD, 0.0, lambda u, v: np.all(v == 0.0)),
        (CurveType.LINEAR, 0.0, lambda u, v: np.allclose(v, u, atol=1e-6)),
        (CurveType.EXP_SINGLE, 2.0, lambda u, v: v[50] < u[50]),   # convex for t>0
        (CurveType.EXP_ALT_SINGLE, 0.9, lambda u, v: v[50] < u[50]),
        (CurveType.POW_SINGLE, 1.0, lambda u, v: np.allclose(v, u**2, atol=1e-5)),
        (CurveType.STEP, 0.0, lambda u, v: np.all(v[:-1] == 0.0) and v[-1] == 1.0),
        (CurveType.EXP_DUAL, 2.0, lambda u, v: abs(v[50] - 0.5) < 1e-3),  # S-curve midpoint
        (CurveType.POW_DUAL, 1.0, lambda u, v: abs(v[50] - 0.5) < 1e-3),
    ])
    def test_curve_shapes(self, curve, tension, check):
        from whitebox_tpu.ops.automation import _apply_curve

        u = np.linspace(0.0, 1.0, 101, dtype=np.float32)
        v = _apply_curve(u, np.int32(int(curve)), np.float32(tension), np)
        assert v[0] == pytest.approx(0.0, abs=1e-6) or curve == CurveType.HOLD
        assert check(u, v), f"{curve} shape check failed"

    def test_device_matches_numpy_for_all_curves(self):
        import jax.numpy as jnp
        from whitebox_tpu.ops.automation import _apply_curve

        u = np.linspace(0.0, 1.0, 257, dtype=np.float32)
        for curve in CurveType:
            ref = _apply_curve(u, np.int32(int(curve)), np.float32(0.7), np)
            got = np.asarray(_apply_curve(jnp.asarray(u), jnp.int32(int(curve)), jnp.float32(0.7), jnp))
            np.testing.assert_allclose(got, ref, atol=2e-6, err_msg=str(curve))
