"""Windowed-sinc resampler: quality (SNR/alias rejection) + device parity."""

import numpy as np
import pytest

from whitebox_tpu.ops.resample import (
    design_sinc_bank, resample_audio, resample_reference,
)


def sine(freq, rate, n, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)).astype(np.float32)


def snr_db(y, rate, freq):
    # signal power at freq vs everything else (excluding DC + transition bins)
    n = len(y)
    w = np.hanning(n)
    S = np.abs(np.fft.rfft(y * w)) ** 2
    f = np.fft.rfftfreq(n, 1 / rate)
    sig = S[np.abs(f - freq) < 50].sum()
    noise = S[(np.abs(f - freq) >= 50) & (f > 20)].sum()
    return 10 * np.log10(sig / max(noise, 1e-30))


class TestBank:
    def test_dc_gain_unity(self):
        bank = design_sinc_bank(1.0)
        np.testing.assert_allclose(bank.sum(axis=1), 1.0, atol=1e-6)

    def test_phase0_dominant_tap(self):
        # phase 0: the on-sample tap dominates (0.91-cutoff sinc peak)
        bank = design_sinc_bank(1.0)
        k = int(np.argmax(np.abs(bank[0])))
        assert bank[0, k] > 0.85
        assert abs(bank[0]).argsort()[-1] == k


class TestQuality:
    def test_upsample_44k1_to_48k_snr(self):
        x = sine(1000.0, 44100, 44100)
        y = resample_audio(x[None], 44100, 48000)[0]
        # skip edge transients
        q = snr_db(y[2000:-2000], 48000, 1000.0)
        assert q > 80.0, f"sinc SNR {q:.1f} dB"

    def test_beats_linear(self):
        # high-frequency content: sinc should crush linear interpolation
        x = sine(15000.0, 44100, 44100)
        y = resample_audio(x[None], 44100, 48000)[0]
        q_sinc = snr_db(y[2000:-2000], 48000, 15000.0)

        ratio = 44100 / 48000
        n = np.arange(len(y))
        pos = n * ratio
        ix = np.floor(pos).astype(int)
        fx = (pos - ix).astype(np.float32)
        xp = np.pad(x, (0, 2))
        ylin = xp[ix] + fx * (xp[ix + 1] - xp[ix])
        q_lin = snr_db(ylin[2000:-2000], 48000, 15000.0)
        assert q_sinc > q_lin + 30, f"sinc {q_sinc:.1f} dB vs linear {q_lin:.1f} dB"

    def test_downsample_antialias(self):
        # a 30 kHz tone at 96k would alias to 18 kHz at 48k; the polyphase
        # decimation filter must reject it (tone sits at 0.625 of source
        # Nyquist, inside the 32-tap transition band -> ~-57 dB)
        x = sine(30000.0, 96000, 96000)
        y = resample_audio(x[None], 96000, 48000)[0]
        in_rms = np.sqrt(np.mean(x.astype(np.float64) ** 2))
        out_rms = np.sqrt(np.mean(y[2000:-2000].astype(np.float64) ** 2))
        rejection_db = 20 * np.log10(max(out_rms, 1e-30) / in_rms)
        assert rejection_db < -50, f"alias rejection only {rejection_db:.1f} dB"
        # deeper in the stopband (40 kHz -> would alias to 8 kHz): crushed
        x2 = sine(40000.0, 96000, 96000)
        y2 = resample_audio(x2[None], 96000, 48000)[0]
        r2 = 20 * np.log10(max(np.sqrt(np.mean(y2[2000:-2000].astype(np.float64) ** 2)), 1e-30) / in_rms)
        assert r2 < -75, f"stopband rejection only {r2:.1f} dB"

    def test_identity_ratio(self):
        x = sine(440.0, 48000, 8000)
        y = resample_audio(x[None], 48000, 48000)[0]
        # ratio 1, phase 0 everywhere: near-identity
        np.testing.assert_allclose(y[100:7900], x[100:7900], atol=1e-4)


class TestDeviceParity:
    def test_gather_device_matches_reference(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, 5000)) * 0.3).astype(np.float32)
        got = resample_audio(x, 44100, 48000, method="gather")
        ref = resample_reference(x, 44100, 48000)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=5e-6)

    def test_matmul_device_matches_reference(self):
        from whitebox_tpu.ops.resample import resample_matmul_reference

        rng = np.random.default_rng(1)
        x = (rng.standard_normal((2, 5000)) * 0.3).astype(np.float32)
        got = resample_audio(x, 44100, 48000, method="matmul")
        ref = resample_matmul_reference(x, 44100, 48000)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=5e-6)

    def test_matmul_slabbing_is_seamless(self):
        # tiny slabs vs one-shot: identical output (slab cut = row boundary)
        import numpy as _np

        import whitebox_tpu.ops.resample as rs

        rng = np.random.default_rng(2)
        x = (rng.standard_normal((1, 20000)) * 0.3).astype(np.float32)
        one = resample_audio(x, 44100, 48000, method="matmul")
        P, Q = rs._rationalize(44100 / 48000)
        slabbed = _np.asarray(
            rs._resample_matmul(x, P, Q, 32, 90.0, one.shape[1], q_slab=7))
        np.testing.assert_array_equal(slabbed, one)

    def test_matmul_tracks_gather_quality(self):
        # same design, exact phases vs 512-phase lerp: outputs agree closely
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((1, 8000)) * 0.3).astype(np.float32)
        a = resample_audio(x, 44100, 48000, method="matmul")
        b = resample_audio(x, 44100, 48000, method="gather")
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)

    def test_auto_picks_matmul_for_rational(self):
        from whitebox_tpu.ops.resample import _rationalize

        assert _rationalize(44100 / 48000) == (147, 160)
        assert _rationalize(48000 / 44100) == (160, 147)
        assert _rationalize(96000 / 48000) == (2, 1)
        assert _rationalize(1.000301) is None  # no exact small rational

    def test_irrational_ratio_falls_back(self):
        x = sine(440.0, 48000, 4000)[None]
        y = resample_audio(x, 48000, 48000 * 1.0003001, method="auto")
        assert y.shape[1] > 0  # gather path served it
        with pytest.raises(ValueError):
            resample_audio(x, 48000, 48000 * 1.0003001, method="matmul")


class TestOversampledSinc:
    """interpolation="sinc" on the Pallas path: sinc-upsampled pool +
    LS-optimal 6-tap reconstruction (timeline/oversample.py)."""

    def _tone_session(self, freq, src_rate, amp=0.5, dur=1.0):
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        t = np.arange(int(src_rate * dur)) / src_rate
        tone = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        s = Session(bpm=60.0)
        a = s.sample_table.add_sample(
            Sample.from_planar(tone[None], src_rate, AudioFormat.F32), key="tone")
        tr = s.add_track("t", volume_db=0.0)
        s.add_audio_clip(tr, "c", 0.0, 0.9, asset=a)
        return s

    @pytest.mark.slow
    def test_matches_direct_sinc_quality(self):
        from whitebox_tpu.render.bounce import bounce

        s = self._tone_session(15000.0, 44100)
        y = bounce(s, 48000.0, interpolation="sinc").audio[0]
        q = snr_db(y[4000:40000], 48000, 15000.0)
        assert q > 85.0, f"oversampled sinc SNR {q:.1f} dB"

    @pytest.mark.slow
    def test_antialiasing_on_decimation(self):
        # 30 kHz tone in a 96k sample -> speed 2 into 48k: linear aliases at
        # full level; the folded-cutoff upsampler must crush it
        from whitebox_tpu.render.bounce import bounce

        s = self._tone_session(30000.0, 96000)
        y = bounce(s, 48000.0, interpolation="sinc").audio[0]
        rms = np.sqrt(np.mean(y[4000:40000].astype(np.float64) ** 2))
        rej = 20 * np.log10(max(rms, 1e-30) / (0.5 / np.sqrt(2)))
        assert rej < -60, f"alias rejection only {rej:.1f} dB"

    def test_fast_rows_stay_bit_exact(self):
        from tests.test_carve import random_session
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.timeline.oracle import OracleRenderer

        s = random_session(31, rate=48000, bpm=120.0, n_tracks=3)  # all speed 1
        oracle = OracleRenderer(s, 48000.0, buffer_size=512).render()
        res = bounce(s, 48000.0, interpolation="sinc")
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)

    def test_pallas_matches_host_poly_reference(self):
        from tests.test_carve import random_session
        from whitebox_tpu.ops.mix_pallas import render_timeline_pallas
        from whitebox_tpu.ops.resample import design_poly_interp
        from whitebox_tpu.timeline.carve import carve_session, render_segments_numpy
        from whitebox_tpu.timeline.oversample import oversample_slow_rows

        s = random_session(32, rate=48000, bpm=120.0, n_tracks=3, n_clips=2,
                           speeds=(0.5, 1.0, 1.37), src_rates=(44100, 48000))
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        t2, p2 = oversample_slow_rows(table, pool)
        interp = ("poly", design_poly_interp(4))
        ref = render_segments_numpy(t2, p2, s, interp=interp)
        out = render_timeline_pallas(t2, p2, s, tile=2048, interpret=True, interp=interp)
        absd = np.abs(out.astype(np.float64) - ref.astype(np.float64))
        assert absd.max() < 3e-6, f"max abs {absd.max():.2e}"

    def test_oversample_rewrite_mechanics(self):
        from tests.test_carve import random_session
        from whitebox_tpu.timeline.carve import carve_session
        from whitebox_tpu.timeline.oversample import oversample_slow_rows

        s = random_session(33, rate=48000, bpm=120.0, n_tracks=2, n_clips=2,
                           speeds=(44100.0 / 48000.0, 1.0), src_rates=(44100, 48000))
        table, pool = carve_session(s, 48000.0, buffer_size=512)
        t2, p2 = oversample_slow_rows(table, pool, factor=4)
        fast = table.fast
        # fast rows untouched
        np.testing.assert_array_equal(t2.sample_id[fast], table.sample_id[fast])
        np.testing.assert_array_equal(t2.src_int[fast], table.src_int[fast])
        # slow rows: exact 4x phase/speed scaling onto fresh sample ids
        slow = ~fast
        assert (t2.sample_id[slow] >= pool.num_samples).all()
        np.testing.assert_allclose(t2.speed[slow], 4.0 * table.speed[slow], rtol=0)
        x_old = table.src_int[slow].astype(np.float64) + table.src_frac[slow]
        x_new = t2.src_int[slow].astype(np.float64) + t2.src_frac[slow]
        np.testing.assert_allclose(x_new, 4.0 * x_old, rtol=0, atol=1e-9)
        # new bases are lane-aligned and inside the grown pool
        nb = p2.channel_base[pool.num_samples:]
        assert (nb % 128 == 0).all()
        assert int(nb.max()) < p2.data.shape[0]


class TestMixSincMode:
    def test_sinc_mode_improves_clip_resampling(self):
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        # 15 kHz tone in a 44.1k sample played in a 48k session
        x = sine(15000.0, 44100, 44100)
        s = Session(bpm=60.0)
        asset = s.sample_table.add_sample(Sample.from_planar(x[None], 44100, AudioFormat.F32), key="a")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 0.9, asset=asset)

        lin = bounce(s, 48000.0, engine="xla").audio[0]
        snc = bounce(s, 48000.0, engine="xla", interpolation="sinc").audio[0]
        q_lin = snr_db(lin[4000:40000], 48000, 15000.0)
        q_snc = snr_db(snc[4000:40000], 48000, 15000.0)
        assert q_snc > q_lin + 25, f"sinc {q_snc:.1f} vs linear {q_lin:.1f} dB"

    def test_sinc_mode_keeps_fast_rows_bit_exact(self):
        from tests.test_carve import random_session
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.timeline.oracle import OracleRenderer

        s = random_session(12, rate=48000, bpm=120.0, n_tracks=3)  # all speed 1
        oracle = OracleRenderer(s, 48000.0, buffer_size=512).render()
        res = bounce(s, 48000.0, engine="xla", interpolation="sinc")
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)


class TestPolyInterpDesign:
    def test_dc_exactness(self):
        from whitebox_tpu.ops.resample import design_poly_interp, poly_interp_offsets

        C = np.asarray(design_poly_interp(4), np.float64)
        for t in (0.0, 0.25, 0.5, 0.9):
            w = sum(np.polyval(row[::-1], t) for row in C)
            assert abs(w - 1.0) < 1e-5, f"sum of tap weights at t={t}: {w}"
        assert list(poly_interp_offsets(tuple(map(tuple, C)))) == [-2, -1, 0, 1, 2, 3]

    def test_inband_snr_beats_catmull(self):
        # reconstruct a 0.34-of-source-Nyquist tone on a 4x grid at random
        # fractional positions: the LS design must beat Catmull-Rom by >30 dB
        from whitebox_tpu.ops.resample import design_poly_interp, poly_interp_offsets

        U, fnorm = 4, 0.34
        C = np.asarray(design_poly_interp(U), np.float64)
        ks = poly_interp_offsets(tuple(map(tuple, C)))
        Ccat = np.asarray([[0, -0.5, 1, -0.5], [1, 0, -2.5, 1.5],
                           [0, 0.5, 2, -1.5], [0, 0, -0.5, 0.5]], np.float64)

        rng = np.random.default_rng(0)
        pos = np.sort(rng.uniform(10, 30000, 20000))
        n0 = np.floor(pos).astype(int)
        fr = pos - n0
        x = lambda n: np.sin(2 * np.pi * fnorm * n / U)
        ref = np.sin(2 * np.pi * fnorm * pos / U)

        def snr(Cm, kset):
            out = np.zeros_like(pos)
            for row, k in zip(Cm, kset):
                out += np.polyval(row[::-1], fr) * x(n0 + k)
            return 10 * np.log10(np.mean(ref**2) / np.mean((out - ref) ** 2))

        q_opt = snr(C, ks)
        q_cat = snr(Ccat, [-1, 0, 1, 2])
        assert q_opt > 85.0, f"optimal 6-tap SNR {q_opt:.1f} dB"
        assert q_opt > q_cat + 30.0, f"{q_opt:.1f} vs catmull {q_cat:.1f} dB"
