"""Catmull-Rom interpolation mode — the resampler the reference starts but
never finishes (sampler.cpp:61-86 computes the 4 neighbors, writes nothing);
whitebox_tpu completes it as bounce(interpolation="catmull")."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.timeline.carve import carve_session, render_segments_numpy

RATE = 48000.0


def _resampled_session(seed, **kw):
    return random_session(seed, rate=44100, bpm=120.0, n_tracks=3, n_clips=2,
                          speeds=(0.5, 44100.0 / 48000.0, 1.25), **kw)


class TestCatmull:
    @pytest.mark.slow
    def test_device_matches_host_reference(self):
        s = _resampled_session(50)
        res = bounce(s, RATE, interpolation="catmull")
        table, pool = carve_session(s, RATE, buffer_size=512)
        ref = render_segments_numpy(table, pool, s, interp="catmull")
        # device phase is double-single (f32 pair); host phase exact f64
        np.testing.assert_allclose(res.audio[:, : ref.shape[1]], ref, atol=3e-6)

    def test_speed_one_stays_bit_exact(self):
        from whitebox_tpu.timeline.oracle import OracleRenderer

        s = random_session(51, rate=48000, bpm=120.0, n_tracks=2, n_clips=2)
        oracle = OracleRenderer(s, RATE, buffer_size=512).render()
        res = bounce(s, RATE, interpolation="catmull")
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)

    @pytest.mark.slow
    def test_beats_linear_on_smooth_signal(self):
        """Resampling a pure tone: cubic reconstruction error << linear's."""
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        src_rate = 44100
        dur = 1.0
        t = np.arange(int(src_rate * dur)) / src_rate
        f0 = 1000.0
        tone = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)

        s = Session(bpm=60.0)
        asset = s.sample_table.add_sample(
            Sample.from_planar(tone[None], src_rate, AudioFormat.F32), key="tone")
        tr = s.add_track("t", volume_db=0.0)
        s.add_audio_clip(tr, "c", 0.0, 0.9, asset=asset)

        lin = bounce(s, RATE, interpolation="linear").audio[0]
        cat = bounce(s, RATE, interpolation="catmull").audio[0]

        n = min(len(lin), int(0.85 * RATE))
        g = np.arange(n) / RATE
        pan = np.float32(np.sin(np.float32(0.25 * np.pi)) * np.sqrt(2.0))  # center pan coef
        ideal = 0.5 * np.sin(2 * np.pi * f0 * g) * pan
        sl = slice(100, n - 100)
        err_lin = np.sqrt(np.mean((lin[sl] - ideal[sl]) ** 2))
        err_cat = np.sqrt(np.mean((cat[sl] - ideal[sl]) ** 2))
        assert err_cat < err_lin / 5, f"catmull {err_cat:.2e} vs linear {err_lin:.2e}"
