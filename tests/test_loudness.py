"""EBU R128 / BS.1770-4 loudness (ops/loudness.py): K-weighting design,
compliance-style sine cases, gating, true peak, device==host, bounce/CLI
integration. The reference DAW has only instantaneous VU meters
(src/engine/vu_meter.h) — broadcast loudness is an extension.
"""

import math

import numpy as np
import pytest

from whitebox_tpu.ops.loudness import (
    LoudnessStats, k_weighting_coeffs, measure_loudness,
)

RATE = 48000.0


def sine(freq, seconds, amp_db, rate=RATE, C=2):
    n = int(seconds * rate)
    t = np.arange(n) / rate
    a = 10.0 ** (amp_db / 20.0)
    return np.broadcast_to(a * np.sin(2 * np.pi * freq * t), (C, n)).astype(np.float32).copy()


class TestKWeighting:
    def test_48k_spec_table(self):
        """BS.1770-4 tabulates the 48 kHz coefficients; the prototype
        de-normalization must reproduce them to ~1e-6."""
        shelf, hp = k_weighting_coeffs(48000.0)
        np.testing.assert_allclose(
            [shelf.b0, shelf.b1, shelf.b2, shelf.a1, shelf.a2],
            [1.53512485958697, -2.69169618940638, 1.19839281085285,
             -1.69065929318241, 0.73248077421585],
            atol=2e-6)
        np.testing.assert_allclose(
            [hp.b0, hp.b1, hp.b2, hp.a1, hp.a2],
            [1.0, -2.0, 1.0, -1.99004745483398, 0.99007225036621],
            atol=2e-5)

    def test_997hz_unity(self):
        """The -0.691 offset calibrates 997 Hz to ~0 LU error."""
        shelf, hp = k_weighting_coeffs(RATE)
        w = 2 * np.pi * 997.0 / RATE
        z = np.exp(-1j * w)
        H = ((shelf.b0 + shelf.b1 * z + shelf.b2 * z**2)
             / (1 + shelf.a1 * z + shelf.a2 * z**2)
             * (hp.b0 + hp.b1 * z + hp.b2 * z**2)
             / (1 + hp.a1 * z + hp.a2 * z**2))
        assert abs(20 * np.log10(abs(H)) - 0.691) < 0.05


class TestCompliance:
    @pytest.mark.parametrize("level", [-23.0, -33.0])
    def test_stereo_sine_reads_level(self, level):
        """997 Hz stereo sine at a dBFS amplitude reads that LUFS
        (channel sum +3 dB cancels the sine's -3 dB mean power)."""
        st = measure_loudness(sine(997.0, 4.0, level), RATE, device=False)
        assert abs(st.integrated_lufs - level) < 0.1, st
        assert abs(st.shortterm_max_lufs - level) < 0.1
        assert abs(st.momentary_max_lufs - level) < 0.1
        assert st.lra_lu < 0.2

    def test_absolute_gate_ignores_silence(self):
        """Appending silence must not drag the integrated value down
        (only the 3 boundary-straddling 400 ms blocks may contribute,
        bounding the shift at ~0.25 LU — an ungated mean would read -26)."""
        x = sine(997.0, 3.0, -23.0)
        pad = np.concatenate([x, np.zeros_like(x)], axis=1)
        a = measure_loudness(x, RATE, device=False).integrated_lufs
        b = measure_loudness(pad, RATE, device=False).integrated_lufs
        assert abs(a - b) < 0.3

    def test_relative_gate_ignores_quiet_tail(self):
        """A -60 dBFS tail passes the absolute gate but must be dropped by
        the -10 LU relative gate (same boundary-block bound as above)."""
        loud = sine(997.0, 3.0, -23.0)
        quiet = sine(997.0, 3.0, -60.0)
        both = np.concatenate([loud, quiet], axis=1)
        a = measure_loudness(loud, RATE, device=False).integrated_lufs
        b = measure_loudness(both, RATE, device=False).integrated_lufs
        assert abs(a - b) < 0.3
        assert b > -23.6  # an ungated / unrelatively-gated mean would be ~-26

    def test_true_peak_intersample(self):
        """+0 dBFS samples of a quarter-rate sine sampled off-peak hide an
        inter-sample peak ~+3 dB; 4x oversampling must reveal it."""
        n = int(RATE)
        t = np.arange(n)
        x = np.sin(2 * np.pi * (0.25 * t + 0.125)).astype(np.float32)[None, :]
        # sample peak is sin(pi/4)=0.707... scale so sample peak = 1.0
        x = x / np.max(np.abs(x))
        st = measure_loudness(np.broadcast_to(x, (2, n)).copy(), RATE, device=False)
        assert st.true_peak_dbtp > 2.5, st.true_peak_dbtp  # ~+3.01 dBTP

    def test_lra_two_levels(self):
        """10 s at -33 then 10 s at -23: LRA ~ 10 LU (Tech 3342 shape)."""
        x = np.concatenate([sine(997.0, 10.0, -33.0), sine(997.0, 10.0, -23.0)], axis=1)
        st = measure_loudness(x, RATE, device=False)
        assert 7.0 < st.lra_lu < 11.0, st.lra_lu


class TestDevicePath:
    def test_device_matches_host(self):
        rng = np.random.default_rng(0)
        x = (0.2 * rng.standard_normal((2, int(4 * RATE)))).astype(np.float32)
        # shape it a bit so the meter sees structure
        env = np.linspace(0.2, 1.0, x.shape[1], dtype=np.float32)
        x *= env
        a = measure_loudness(x, RATE, device=True)
        b = measure_loudness(x, RATE, device=False)
        assert abs(a.integrated_lufs - b.integrated_lufs) < 0.02
        assert abs(a.shortterm_max_lufs - b.shortterm_max_lufs) < 0.02
        assert abs(a.lra_lu - b.lra_lu) < 0.05
        assert abs(a.true_peak_dbtp - b.true_peak_dbtp) < 0.05

    def test_other_sample_rate(self):
        st44 = measure_loudness(sine(997.0, 4.0, -23.0, rate=44100.0), 44100.0, device=False)
        assert abs(st44.integrated_lufs + 23.0) < 0.1


class TestBounceIntegration:
    def test_bounce_loudness(self):
        from tests.test_carve import random_session
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.render.bounce import bounce

        s = random_session(31, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=2)
        res = bounce(s, RATE, engine="xla", loudness=True)
        lu = res.stats.loudness
        assert isinstance(lu, LoudnessStats)
        ref = measure_loudness(res.audio, RATE, device=False)
        assert abs(lu.integrated_lufs - ref.integrated_lufs) < 0.05
        d = lu.as_dict()
        assert set(d) == {"integrated_lufs", "momentary_max_lufs",
                          "shortterm_max_lufs", "lra_lu", "true_peak_dbtp"}
        # JSON-safe: finite floats, or None where the window never filled
        # (a <3 s render has no short-term blocks)
        assert all(v is None or isinstance(v, float) for v in d.values())
        assert d["integrated_lufs"] is not None


class TestNormalize:
    def test_lufs_normalize(self):
        from tests.test_carve import random_session
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.render.bounce import bounce

        s = random_session(37, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=2)
        res = bounce(s, RATE, engine="xla", loudness=True,
                     normalize=("lufs", -20.0))
        assert abs(res.stats.loudness.integrated_lufs + 20.0) < 0.2

    def test_peak_normalize(self):
        from tests.test_carve import random_session
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.render.bounce import bounce

        s = random_session(38, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=2)
        res = bounce(s, RATE, engine="xla", loudness=True,
                     normalize=("peak", -3.0))
        assert abs(res.stats.loudness.true_peak_dbtp + 3.0) < 0.15

    def test_silence_noop_and_bad_mode(self):
        import pytest as _pytest

        from whitebox_tpu.render.bounce import _finalize_output
        from whitebox_tpu.render.metrics import RenderStats

        st = RenderStats()
        silent = np.zeros((2, 48000), np.float32)
        out = _finalize_output(silent, st, RATE, False, ("lufs", -14.0))
        assert not out.any()
        with _pytest.raises(ValueError):
            _finalize_output(silent, st, RATE, False, ("bogus", -1.0))


class TestReviewRegressions:
    def test_true_peak_at_least_sample_peak(self):
        """BS.1770: true peak >= sample peak — an impulse landing ON a
        sample must not under-read through the between-sample phases."""
        x = np.zeros((2, 48000), np.float32)
        x[:, 24000] = 1.0
        for device in (False, True):
            st = measure_loudness(x, RATE, device=device)
            assert st.true_peak_dbtp >= -1e-6, (device, st.true_peak_dbtp)

    def test_as_dict_json_safe_on_silence(self):
        import json

        st = measure_loudness(np.zeros((2, 4800), np.float32), RATE, device=False)
        d = st.as_dict()
        s = json.dumps(d, allow_nan=False)  # raises on inf/nan
        assert json.loads(s)["integrated_lufs"] is None
