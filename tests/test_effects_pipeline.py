"""Effects-enabled bounce: device pipeline vs the f64 sequential reference."""

import pytest
import numpy as np

from tests.test_carve import random_session
from whitebox_tpu.effects import Biquad, EffectChain, Gain, ParametricEQ
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.render.effects_pipeline import reference_finish_mix
from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def add_effects(s, master=True):
    s.tracks[0].effects = EffectChain([Biquad("lowpass", 2000.0), Gain(-3.0)])
    if len(s.tracks) > 1:
        s.tracks[1].effects = EffectChain(
            [ParametricEQ([("lowshelf", 120.0, 0.707, 4.0), ("peak", 1500.0, 1.2, -3.0)])]
        )
    if master:
        s.master_effects = EffectChain([Biquad("highpass", 30.0)])
    return s


class TestEffectsBounce:
    @pytest.mark.slow
    def test_xla_effects_matches_reference(self):
        s = add_effects(random_session(1, rate=48000, bpm=120.0, n_tracks=3, n_clips=2))
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)

        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_finish_mix(pt, s, RATE)

        assert res.audio.shape == ref.shape
        scale = max(rms(ref), 1e-6)
        err = rms(res.audio - ref) / scale
        assert err < 5e-5, f"relative rms err {err}"

    @pytest.mark.slow
    def test_chunk_size_invariance_with_state(self):
        s = add_effects(random_session(2, rate=48000, bpm=120.0, n_tracks=2, n_clips=2))
        a = bounce(s, RATE, engine="xla", chunk_frames=4096).audio
        b = bounce(s, RATE, engine="xla", chunk_frames=32768).audio
        # biquad state carries across chunks; results must agree closely
        np.testing.assert_allclose(a, b, atol=3e-5)

    def test_no_effects_still_bit_exact(self):
        # adding the effects plumbing must not disturb the parity path
        from whitebox_tpu.timeline.oracle import OracleRenderer

        s = random_session(3, rate=48000, bpm=120.0, n_tracks=3)
        oracle = OracleRenderer(s, RATE, buffer_size=512).render()
        res = bounce(s, RATE, engine="xla")
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)

    @pytest.mark.slow
    def test_track_chain_runs_pre_gain(self):
        # gain-only chain: chain(-6dB) then volume -> same as volume*(gain)
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample
        from whitebox_tpu.core.formats import AudioFormat

        s = Session(bpm=60.0)
        data = np.full((1, 2048), 0.5, np.float32)
        asset = s.sample_table.add_sample(Sample.from_planar(data, 48000, AudioFormat.F32), key="a")
        tr = s.add_track("t", volume_db=-6.0)
        s.add_audio_clip(tr, "c", 0.0, 2048 / 48000.0, asset=asset)
        tr.effects = EffectChain([Gain(-6.0)])
        res = bounce(s, RATE, engine="xla")
        g = np.float32(Gain(-6.0).gain_linear)
        expected = ((np.float32(0.5) * np.float32(1.0)) * g) * (tr.volume_linear * tr.pan_coeffs[0])
        np.testing.assert_allclose(res.audio[0, 100:1000], expected, atol=1e-7)


class TestFirMode:
    @pytest.mark.slow
    def test_fir_matches_reference(self):
        s = add_effects(random_session(10, rate=48000, bpm=120.0, n_tracks=3, n_clips=2))
        res = bounce(s, RATE, engine="pallas", effects_mode="fir")
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_finish_mix(pt, s, RATE)
        scale = max(rms(ref), 1e-9)
        err = rms(res.audio[:, : ref.shape[1]] - ref) / scale
        assert err < 2e-4, f"fir relative rms err {err}"

    @pytest.mark.slow
    def test_fir_matches_scan(self):
        s = add_effects(random_session(11, rate=48000, bpm=120.0, n_tracks=2, n_clips=2))
        a = bounce(s, RATE, engine="pallas", effects_mode="scan").audio
        b = bounce(s, RATE, engine="pallas", effects_mode="fir").audio
        np.testing.assert_allclose(a, b, atol=5e-4)


class TestMeters:
    """Level meters (vu_meter.h equivalent) — post chain+gain, pre sum."""

    @pytest.mark.slow
    def test_meters_match_reference(self):
        s = add_effects(random_session(12, rate=48000, bpm=120.0, n_tracks=3, n_clips=2))
        res = bounce(s, RATE, engine="pallas", meters=True)
        st = res.stats
        assert st.track_peak is not None and st.track_peak.shape[0] == 3
        # host reference: per-track post-chain post-gain buffers
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        from whitebox_tpu.render.effects_pipeline import _chains_of
        from whitebox_tpu.ops.biquad import biquad_sequential
        from whitebox_tpu.effects.eq import Biquad, ParametricEQ
        from whitebox_tpu.effects.gain import Gain

        chains, _ = _chains_of(s)
        F = res.audio.shape[1]
        for t, track in enumerate(s.tracks):
            buf = pt[t][:, :F].astype(np.float64)
            if chains[t] is not None:
                chains[t].prepare(RATE, 2)
                for e in chains[t].effects:
                    if isinstance(e, Biquad):
                        buf, _ = biquad_sequential(buf, e.coeffs)
                    elif isinstance(e, ParametricEQ):
                        for c in e.coeffs:
                            buf, _ = biquad_sequential(buf, c)
                    elif isinstance(e, Gain):
                        buf = buf * float(e.gain_linear)
            vol = np.float32(0.0) if track.mute else track.volume_linear
            pan = track.pan_coeffs
            for ch in range(2):
                y = buf[ch] * float(np.float32(vol * np.float32(pan[ch % 2])))
                assert abs(np.abs(y).max() - st.track_peak[t, ch]) < 2e-4
                assert abs(np.sqrt(np.mean(y**2)) - st.track_rms[t, ch]) < 2e-4
        # output meters describe the final mix
        np.testing.assert_allclose(st.output_peak, np.abs(res.audio).max(axis=1), atol=2e-4)
        np.testing.assert_allclose(
            st.output_rms, np.sqrt((res.audio.astype(np.float64) ** 2).mean(axis=1)), atol=2e-4)

    @pytest.mark.slow
    def test_meters_without_effects(self):
        s = random_session(13, rate=48000, bpm=120.0, n_tracks=2, n_clips=2)
        res = bounce(s, RATE, meters=True)
        st = res.stats
        assert st.track_peak.shape == (2, 2)
        # identity chains: output mix unchanged vs a plain bounce
        plain = bounce(s, RATE).audio
        np.testing.assert_array_equal(res.audio, plain)
