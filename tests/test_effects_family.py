"""The wide native effect family (dynamics / delays / reverb / shaping):
ops vs f64 sequential references, chunk-state exactness, serialization,
and the generic finishing pipeline end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.effects import (
    Biquad, Chorus, Compressor, ConvolutionReverb, Delay, EffectChain, Flanger,
    Gain, Limiter, NoiseGate, Saturator, StereoWidth,
)
from whitebox_tpu.ops import delay as dl
from whitebox_tpu.ops import dynamics as dyn

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _noise(C=2, F=4000, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((C, F)) * scale).astype(np.float32)


class TestDynamicsOps:
    def test_compressor_matches_reference(self):
        x = _noise(seed=1)
        p = dict(threshold_db=-18.0, ratio=4.0, knee_db=6.0,
                 attack=float(dyn.time_coef(0.005, RATE)),
                 release=float(dyn.time_coef(0.1, RATE)), makeup_db=2.0)
        pj = {k: jnp.float32(v) for k, v in p.items()}
        st = {"red": jnp.zeros(()), "att": jnp.zeros(()), "det": jnp.zeros(())}
        y, _ = dyn.compressor_process(x, pj, st)
        ref = dyn.compressor_ref(x, **p)
        assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_compressor_rms_detector(self):
        x = _noise(seed=2)
        det_avg = float(dyn.time_coef(0.03, RATE))
        p = dict(threshold_db=-20.0, ratio=8.0, knee_db=3.0,
                 attack=float(dyn.time_coef(0.002, RATE)),
                 release=float(dyn.time_coef(0.05, RATE)), makeup_db=0.0)
        pj = {k: jnp.float32(v) for k, v in p.items()}
        pj["det_avg"] = jnp.float32(det_avg)
        st = {"red": jnp.zeros(()), "att": jnp.zeros(()), "det": jnp.zeros(())}
        y, _ = dyn.compressor_process(x, pj, st, detector="rms")
        ref = dyn.compressor_ref(x, detector="rms", det_avg=det_avg, **p)
        assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 2e-5

    def test_compressor_chunked_equals_oneshot(self):
        x = _noise(seed=3)
        pj = {k: jnp.float32(v) for k, v in dict(
            threshold_db=-15.0, ratio=3.0, knee_db=6.0,
            attack=float(dyn.time_coef(0.01, RATE)),
            release=float(dyn.time_coef(0.2, RATE)), makeup_db=0.0).items()}
        st = {"red": jnp.zeros(()), "att": jnp.zeros(()), "det": jnp.zeros(())}
        y, _ = dyn.compressor_process(x, pj, st)
        st = {"red": jnp.zeros(()), "att": jnp.zeros(()), "det": jnp.zeros(())}
        chunks = []
        for s in range(0, x.shape[1], 777):
            yc, st = dyn.compressor_process(x[:, s : s + 777], pj, st)
            chunks.append(np.asarray(yc))
        np.testing.assert_allclose(np.concatenate(chunks, 1), np.asarray(y), atol=1e-6)

    def test_limiter_enforces_ceiling(self):
        x = _noise(seed=4, scale=1.5)
        L = 48
        p = {"ceiling_db": jnp.float32(-6.0),
             "attack": jnp.float32(dyn.time_coef(0.0005, RATE)),
             "release": jnp.float32(dyn.time_coef(0.05, RATE))}
        st = {"red": jnp.zeros(()), "att": jnp.zeros(()),
              "look": jnp.zeros((L,)), "xdelay": jnp.zeros((2, L))}
        y, _ = dyn.limiter_process(x, p, st, lookahead=L)
        ref = dyn.limiter_ref(x, ceiling_db=-6.0, attack=float(p["attack"]),
                              release=float(p["release"]), lookahead=L)
        assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 2e-5
        # lookahead + fast attack: very little overshoot over the ceiling
        assert np.max(np.abs(np.asarray(y))) < 10 ** (-6.0 / 20.0) * 1.6

    def test_gate_matches_reference(self):
        F = 4000
        x = _noise(seed=5) * np.concatenate(
            [np.ones(F // 2), np.zeros(F - F // 2)]
        )[None, :].astype(np.float32)
        p = {"threshold_db": jnp.float32(-20.0), "range_db": jnp.float32(60.0),
             "attack": jnp.float32(dyn.time_coef(0.002, RATE)),
             "release": jnp.float32(dyn.time_coef(0.08, RATE))}
        st = {"open": jnp.zeros(()), "att": jnp.zeros(())}
        y, _ = dyn.gate_process(x, p, st)
        ref = dyn.gate_ref(x, threshold_db=-20.0, range_db=60.0,
                           attack=float(p["attack"]), release=float(p["release"]))
        assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5
        # the gated tail is strongly attenuated relative to the open half
        assert rms(np.asarray(y)[:, -500:]) < 1e-3 * max(rms(np.asarray(y)[:, :500]), 1e-9)


class TestDelayOps:
    def test_comb_matches_reference(self):
        x = _noise(seed=6)
        D = 137
        w, _, _ = dl.comb_feedback(x, jnp.float32(0.6), jnp.zeros((2, D)), jnp.zeros((2, D)), D=D)
        np.testing.assert_allclose(np.asarray(w), dl.comb_feedback_ref(x, 0.6, D), atol=1e-6)

    def test_comb_chunked_equals_oneshot(self):
        x = _noise(seed=7)
        D = 250
        w, _, _ = dl.comb_feedback(x, jnp.float32(0.7), jnp.zeros((2, D)), jnp.zeros((2, D)), D=D)
        w0 = jnp.zeros((2, D))
        x0 = jnp.zeros((2, D))
        chunks = []
        for s in range(0, x.shape[1], 600):  # chunk < D and chunk > D both occur
            wc, w0, x0 = dl.comb_feedback(x[:, s : s + 600], jnp.float32(0.7), w0, x0, D=D)
            chunks.append(np.asarray(wc))
        np.testing.assert_allclose(np.concatenate(chunks, 1), np.asarray(w), atol=1e-6)

    def test_pingpong_matches_reference(self):
        x = _noise(seed=8)
        D = 97
        w, _, _ = dl.comb_feedback_pingpong(
            x, jnp.float32(0.55), jnp.zeros((2, D)), jnp.zeros((2, D)), D=D
        )
        np.testing.assert_allclose(np.asarray(w), dl.comb_pingpong_ref(x, 0.55, D), atol=1e-6)

    def test_pingpong_crosses_channels(self):
        # impulse on L only: first echo lands on R, second back on L
        F, D = 1000, 100
        x = np.zeros((2, F), np.float32)
        x[0, 0] = 1.0
        w, _, _ = dl.comb_feedback_pingpong(
            x, jnp.float32(0.5), jnp.zeros((2, D)), jnp.zeros((2, D)), D=D
        )
        w = np.asarray(w)
        assert w[0, D] == pytest.approx(1.0)  # x[0, 0] delayed (feedforward tap)
        assert w[1, 2 * D] == pytest.approx(0.5)  # first feedback echo crossed to R
        assert w[0, 3 * D] == pytest.approx(0.25)  # and back

    def test_lfo_phase_exact_at_long_offsets(self):
        """The digit-split phase evaluation stays within ~2e-5 cycles of the
        f64 LFO out to 2^31 frames (a plain f32 w*n broke at ~2^24)."""
        F = 2048
        for n0 in (0, 1 << 24, (1 << 28) + 12345, (1 << 31) - F - 1):
            for rate in (0.25, 0.8, 5.0):
                d = np.asarray(dl.lfo_delay_frames(
                    n0, F, rate_hz=rate, depth_frames=200.0, center_frames=300.0,
                    sample_rate=RATE))
                n = n0 + np.arange(F, dtype=np.float64)
                ref = 300.0 + 200.0 * np.sin(2.0 * np.pi * rate / RATE * n)
                # phase err ~2e-5 cycles -> delay err <= depth * 2*pi * 2e-5
                assert np.max(np.abs(d - ref)) < 0.05, (n0, rate)

    def test_modulated_tap_matches_reference(self):
        x = _noise(seed=9)
        F = x.shape[1]
        d = np.asarray(dl.lfo_delay_frames(0, F, rate_hz=1.5, depth_frames=20.0,
                                           center_frames=64.0, sample_rate=RATE))
        tap, _ = dl.modulated_tap(x, jnp.asarray(d), jnp.zeros((2, 128)), max_delay=128)
        np.testing.assert_allclose(np.asarray(tap), dl.modulated_tap_ref(x, d), atol=1e-6)

    def test_modulated_tap_chunked_exact(self):
        x = _noise(seed=10)
        F = x.shape[1]
        d = np.asarray(dl.lfo_delay_frames(0, F, rate_hz=0.8, depth_frames=30.0,
                                           center_frames=80.0, sample_rate=RATE))
        tap, _ = dl.modulated_tap(x, jnp.asarray(d), jnp.zeros((2, 128)), max_delay=128)
        xt = jnp.zeros((2, 128))
        chunks = []
        for s in range(0, F, 700):
            tc, xt = dl.modulated_tap(x[:, s : s + 700], jnp.asarray(d[s : s + 700]), xt, max_delay=128)
            chunks.append(np.asarray(tc))
        np.testing.assert_array_equal(np.concatenate(chunks, 1), np.asarray(tap))


class TestEffectClasses:
    """Base contract: chunked process() with carried state == one-shot."""

    CASES = [
        Compressor(-18.0, 4.0),
        Compressor(-24.0, 6.0, detector="rms"),
        Limiter(-3.0, lookahead_s=0.002),
        NoiseGate(-30.0),
        Delay(0.02, 0.5, wet=0.6),
        Delay(0.013, 0.4, mode="pingpong"),
        Chorus(rate_hz=1.2, voices=3),
        Flanger(),
        ConvolutionReverb(ir=np.exp(-np.arange(900) / 200.0).astype(np.float32) * 0.2),
        Saturator(9.0, mix=0.8),
        StereoWidth(1.4),
    ]

    @pytest.mark.parametrize("eff", CASES, ids=lambda e: f"{e.name}-{id(e) % 97}")
    def test_chunked_equals_oneshot(self, eff):
        x = _noise(seed=11)
        eff.prepare(RATE, 2)
        y, _ = eff.process(jnp.asarray(x), eff.init_state(2))
        st = eff.init_state(2)
        chunks = []
        for s in range(0, x.shape[1], 640):
            yc, st = eff.process(jnp.asarray(x[:, s : s + 640]), st)
            chunks.append(np.asarray(yc))
        np.testing.assert_allclose(np.concatenate(chunks, 1), np.asarray(y), atol=2e-6)

    def test_limiter_reports_latency(self):
        lim = Limiter(-1.0, lookahead_s=0.005).prepare(RATE, 2)
        assert lim.latency_frames() == int(round(0.005 * RATE))

    def test_saturator_normalized_peak(self):
        sat = Saturator(12.0, mix=1.0).prepare(RATE, 2)
        x = jnp.ones((2, 16), jnp.float32)
        y, _ = sat.process(x, None)
        np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)

    def test_width_zero_is_mono(self):
        w = StereoWidth(0.0).prepare(RATE, 2)
        x = jnp.asarray(_noise(seed=12))
        y, _ = w.process(x, None)
        np.testing.assert_allclose(np.asarray(y)[0], np.asarray(y)[1], atol=1e-7)


class TestSerialization:
    def test_roundtrip_all_types(self, tmp_path):
        from whitebox_tpu.session.project import read_project, write_project

        s = random_session(20, rate=48000, bpm=120.0, n_tracks=4, n_clips=1)
        ir = (np.exp(-np.arange(400) / 100.0) * 0.3).astype(np.float32)
        s.tracks[0].effects = EffectChain([
            Compressor(-17.5, 3.5, knee_db=4.0, attack_s=0.003, release_s=0.12,
                       makeup_db=1.5, detector="rms", rms_window_s=0.02),
            Delay(0.125, 0.45, wet=0.3, dry=0.9, mode="pingpong"),
        ])
        s.tracks[1].effects = EffectChain([
            Chorus(rate_hz=0.9, depth_s=0.003, center_s=0.012, voices=3, wet=0.4),
            Saturator(7.0, mix=0.6),
        ])
        s.tracks[2].effects = EffectChain([
            NoiseGate(-42.0, range_db=70.0, hysteresis_db=3.0),
            Flanger(rate_hz=0.3),
            StereoWidth(1.25),
        ])
        s.tracks[3].effects = EffectChain([ConvolutionReverb(ir, wet=0.25)])
        s.master_effects = EffectChain([
            ConvolutionReverb(None, wet=0.1, room_seconds=0.8, rt60_s=0.5, room_seed=3),
            Limiter(-0.5, attack_s=0.0008, release_s=0.04, lookahead_s=0.003),
        ])

        p = tmp_path / "fx.wb"
        write_project(s, p)
        s2 = read_project(p)

        from whitebox_tpu.session.project import _chain_to_doc

        for t in range(4):
            assert _chain_to_doc(s2.tracks[t].effects) == _chain_to_doc(s.tracks[t].effects)
        assert _chain_to_doc(s2.master_effects) == _chain_to_doc(s.master_effects)
        # the embedded custom IR round-trips bit-exactly
        ir2 = s2.tracks[3].effects.effects[0].ir_host
        np.testing.assert_array_equal(ir2, np.atleast_2d(ir))


def _fx_session(seed, n_tracks=6, n_clips=2):
    s = random_session(seed, rate=48000, bpm=120.0, n_tracks=n_tracks, n_clips=n_clips)
    ir = (np.exp(-np.arange(700) / 150.0) * 0.25).astype(np.float32)
    chains = [
        EffectChain([Compressor(-20.0, 4.0, attack_s=0.004, release_s=0.09)]),
        EffectChain([Delay(0.03, 0.5, wet=0.5)]),
        EffectChain([Saturator(8.0), Biquad("lowpass", 5000.0)]),
        EffectChain([ConvolutionReverb(ir, wet=0.35)]),
        EffectChain([NoiseGate(-36.0), Gain(-2.0)]),
        EffectChain([Delay(0.02, 0.4, mode="pingpong"), StereoWidth(1.3)]),
    ]
    for t, c in zip(s.tracks, chains):
        t.effects = c
    s.master_effects = EffectChain([Limiter(-1.0, lookahead_s=0.002)])
    return s


class TestGenericPipeline:
    @pytest.mark.slow
    def test_bounce_matches_host_reference(self):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.effects_generic import reference_generic_finish
        from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

        s = _fx_session(30)
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_generic_finish(pt, s, RATE)
        scale = max(rms(ref), 1e-6)
        err = rms(res.audio[:, : ref.shape[1]] - ref) / scale
        assert err < 5e-5, f"relative rms err {err}"

    @pytest.mark.slow
    def test_engines_agree(self):
        from whitebox_tpu.render.bounce import bounce

        s = _fx_session(31, n_tracks=4)
        a = bounce(s, RATE, engine="pallas").audio
        b = bounce(s, RATE, engine="xla", chunk_frames=1 << 16).audio
        np.testing.assert_allclose(a, b, atol=3e-5)

    @pytest.mark.slow
    def test_chunk_size_invariance(self):
        from whitebox_tpu.render.bounce import bounce

        s = _fx_session(32, n_tracks=3, n_clips=1)
        a = bounce(s, RATE, engine="xla", chunk_frames=4096).audio
        b = bounce(s, RATE, engine="xla", chunk_frames=32768).audio
        np.testing.assert_allclose(a, b, atol=3e-5)

    @pytest.mark.slow
    def test_meters_with_generic_chains(self):
        from whitebox_tpu.render.bounce import bounce

        s = _fx_session(33, n_tracks=3)
        res = bounce(s, RATE, engine="pallas", meters=True)
        st = res.stats
        assert st.track_peak is not None and st.track_peak.shape[0] == 3
        assert st.output_peak is not None
        assert np.all(st.track_peak >= 0) and np.all(st.track_rms <= st.track_peak + 1e-6)

    @pytest.mark.slow
    def test_stems_sum_to_premaster_mix(self):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.stems import render_stems

        s = _fx_session(34, n_tracks=4)
        s.master_effects = None  # stems exclude the master bus
        stems, names = render_stems(s, RATE)
        assert stems.shape[0] == 4 and len(names) == 4
        mix = bounce(s, RATE, engine="xla").audio
        summed = np.clip(stems.sum(axis=0), -1.0, 1.0)
        np.testing.assert_allclose(summed[:, : mix.shape[1]], mix, atol=5e-5)

    @pytest.mark.slow
    def test_preview_matches_bounce(self):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.preview import PreviewStream

        s = _fx_session(35, n_tracks=3, n_clips=1)
        mix = bounce(s, RATE, engine="xla", chunk_frames=512 * 16).audio
        ps = PreviewStream(s, RATE, buffer_size=512, lookahead_blocks=16)
        got = np.concatenate(list(ps), axis=1)[:, : mix.shape[1]]
        np.testing.assert_allclose(got, mix, atol=3e-5)

    def test_packable_sessions_unchanged(self):
        from whitebox_tpu.render.effects_generic import session_fx_packable

        s = random_session(36, rate=48000, bpm=120.0, n_tracks=2, n_clips=1)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 2000.0), Gain(-3.0)])
        assert session_fx_packable(s)
        s.tracks[1].effects = EffectChain([Compressor(-20.0, 2.0)])
        assert not session_fx_packable(s)


class TestGateHysteresis:
    def test_device_matches_ref_with_hysteresis(self):
        """The hysteresis ramp (gate_open_gain) must agree between the f32
        device scan and the f64 sequential reference — previously the ref
        silently ignored hysteresis_db."""
        import jax.numpy as jnp

        from whitebox_tpu.ops import dynamics as dyn

        rng = np.random.default_rng(7)
        # sweep straight through the hysteresis band around -40 dB
        n = 48000
        env = 10 ** (np.linspace(-60, -20, n) / 20.0)
        x = (env * rng.standard_normal(n) * 0.5).astype(np.float32)[None, :]
        p = {"threshold_db": jnp.float32(-40.0), "range_db": jnp.float32(80.0),
             "attack": jnp.float32(np.exp(-1 / (0.001 * 48000))),
             "release": jnp.float32(np.exp(-1 / (0.05 * 48000))),
             "hyst_db": jnp.float32(6.0)}
        state = {"open": jnp.zeros(()), "att": jnp.zeros(())}
        y, _ = dyn.gate_process(jnp.asarray(x), p, state)
        ref = dyn.gate_ref(x, threshold_db=-40.0, range_db=80.0,
                           attack=float(p["attack"]), release=float(p["release"]),
                           hysteresis_db=6.0)
        err = np.max(np.abs(np.asarray(y) - ref))
        assert err < 2e-5, err
        # and hysteresis genuinely changes the response
        ref0 = dyn.gate_ref(x, threshold_db=-40.0, range_db=80.0,
                            attack=float(p["attack"]), release=float(p["release"]))
        assert np.max(np.abs(ref - ref0)) > 1e-4
