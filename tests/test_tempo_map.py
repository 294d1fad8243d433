"""TempoMap unit tests — exact closed-form beats<->seconds conversions."""

import numpy as np
import pytest

from whitebox_tpu.core.tempo import TempoMap, TempoPoint


class TestTempoMap:
    def test_constant_matches_scalar_beat_duration(self):
        m = TempoMap([TempoPoint(0.0, 120.0)])
        assert m.is_constant
        for b in [0.0, 1.0, 3.7, 128.0]:
            assert m.beats_to_seconds(b) == b * 0.5
            assert m.seconds_to_beats(b * 0.5) == b
        assert m.bpm_at(10.0) == 120.0

    def test_implicit_anchor_at_zero(self):
        m = TempoMap([TempoPoint(4.0, 90.0)])
        assert m.points[0].beat == 0.0 and m.points[0].bpm == 90.0

    def test_step_map_piecewise_seconds(self):
        # 120 bpm for 4 beats (2.0 s), then 60 bpm (1 s/beat)
        m = TempoMap([TempoPoint(0.0, 120.0), TempoPoint(4.0, 60.0)])
        assert not m.is_constant
        assert m.beats_to_seconds(4.0) == pytest.approx(2.0, abs=0)
        assert m.beats_to_seconds(6.0) == pytest.approx(4.0, abs=0)
        assert m.seconds_to_beats(4.0) == pytest.approx(6.0, abs=1e-12)
        assert m.bpm_at(3.999999) == 120.0
        assert m.bpm_at(4.0) == 60.0

    def test_linear_ramp_closed_form(self):
        # ramp 120 -> 60 over beats [0, 4): dt = (60/s) ln(v1/v0)
        m = TempoMap([TempoPoint(0.0, 120.0, "linear"), TempoPoint(4.0, 60.0)])
        s = (60.0 - 120.0) / 4.0
        expect = (60.0 / s) * np.log(60.0 / 120.0)
        assert m.beats_to_seconds(4.0) == pytest.approx(expect, rel=1e-15)
        # mid-ramp bpm is linear in beats
        assert m.bpm_at(2.0) == pytest.approx(90.0)
        # numerical cross-check against fine Riemann integration
        bs = np.linspace(0.0, 4.0, 400001)
        bpm = 120.0 + s * bs
        riemann = np.trapezoid(60.0 / bpm, bs)
        assert m.beats_to_seconds(4.0) == pytest.approx(riemann, rel=1e-9)

    def test_roundtrip_inverse(self):
        m = TempoMap([
            TempoPoint(0.0, 128.0, "linear"), TempoPoint(8.0, 90.0, "step"),
            TempoPoint(16.0, 140.0, "linear"), TempoPoint(24.0, 60.0),
        ])
        rng = np.random.default_rng(0)
        beats = rng.uniform(0.0, 40.0, 2000)
        rt = m.seconds_to_beats(m.beats_to_seconds(beats))
        np.testing.assert_allclose(rt, beats, rtol=0, atol=1e-9)
        # monotonic
        t = np.asarray(m.beats_to_seconds(np.sort(beats)))
        assert np.all(np.diff(t) > 0)

    def test_vectorized_equals_scalar(self):
        m = TempoMap([TempoPoint(0.0, 100.0, "linear"), TempoPoint(4.0, 50.0)])
        beats = np.array([0.0, 1.0, 3.999, 4.0, 9.5])
        vec = np.asarray(m.beats_to_seconds(beats))
        for k, b in enumerate(beats):
            assert vec[k] == float(m.beats_to_seconds(float(b)))

    def test_dedup_and_sort(self):
        m = TempoMap([TempoPoint(4.0, 80.0), TempoPoint(0.0, 120.0),
                      TempoPoint(4.0, 90.0)])
        assert [p.bpm for p in m.points] == [120.0, 90.0]

    def test_validation(self):
        with pytest.raises(ValueError):
            TempoPoint(0.0, 0.0)
        with pytest.raises(ValueError):
            TempoPoint(-1.0, 100.0)
        with pytest.raises(ValueError):
            TempoPoint(0.0, 120.0, "spline")
        with pytest.raises(ValueError):
            TempoMap([])

    def test_serialization_roundtrip(self):
        m = TempoMap([TempoPoint(0.0, 120.0, "linear"), TempoPoint(4.0, 60.0)])
        m2 = TempoMap.from_dict(m.as_dict())
        assert m2 == m
        assert m2.beats_to_seconds(4.0) == m.beats_to_seconds(4.0)

    def test_delta_samples(self):
        m = TempoMap([TempoPoint(0.0, 120.0), TempoPoint(4.0, 60.0)])
        assert m.delta_samples(0.0, 4.0, 48000.0) == pytest.approx(96000.0, abs=0)
        assert m.delta_samples(4.0, 6.0, 48000.0) == pytest.approx(96000.0, abs=0)


class TestRampTarget:
    def test_bpm_end_discontinuity(self):
        # ramp 110 -> 150 over [8, 16), then a sudden drop to 75
        m = TempoMap([TempoPoint(0.0, 110.0),
                      TempoPoint(8.0, 110.0, "linear", bpm_end=150.0),
                      TempoPoint(16.0, 75.0)])
        assert m.bpm_at(12.0) == pytest.approx(130.0)
        assert m.bpm_at(15.999999) == pytest.approx(150.0, abs=1e-4)
        assert m.bpm_at(16.0) == 75.0  # discontinuity
        # seconds stay continuous and exact: ramp segment integral
        s = (150.0 - 110.0) / 8.0
        expect = 8.0 * (60.0 / 110.0) + (60.0 / s) * np.log(150.0 / 110.0)
        assert m.beats_to_seconds(16.0) == pytest.approx(expect, rel=1e-15)
        # inverse round-trips through the discontinuity
        for b in [7.9, 8.0, 12.3, 15.99, 16.0, 18.5]:
            assert m.seconds_to_beats(m.beats_to_seconds(b)) == pytest.approx(b, abs=1e-9)

    def test_bpm_end_validation_and_serialization(self):
        with pytest.raises(ValueError):
            TempoPoint(0.0, 120.0, "step", bpm_end=100.0)
        with pytest.raises(ValueError):
            TempoPoint(0.0, 120.0, "linear", bpm_end=-1.0)
        m = TempoMap([TempoPoint(0.0, 100.0, "linear", bpm_end=200.0),
                      TempoPoint(4.0, 50.0)])
        m2 = TempoMap.from_dict(m.as_dict())
        assert m2 == m and m2.bpm_at(3.999) == pytest.approx(m.bpm_at(3.999))
        assert not m.is_constant
