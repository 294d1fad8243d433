"""Plugin-delay compensation (bounce(pdc=True)).

The reference has no PDC (its native path is lookahead-free; binary
plugins report latency via plugin_interface.h but nothing compensates).
Here a limiter's lookahead delays its track; PDC fetches each chain's
input ahead by that chain's latency so tracks sum timeline-aligned, and
absorbs master-chain latency by rendering further and trimming the head.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.effects import Biquad, EffectChain, Gain, Limiter
from whitebox_tpu.render.effects_generic import (
    fx_latencies, make_generic_finisher, prepare_generic_fx,
    reference_generic_finish, stage_latency_frames,
)

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _per_track(s):
    from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

    table, pool = carve_session(s, RATE, buffer_size=512)
    return render_segments_per_track_numpy(table, pool)


def _tg(s, C=2):
    return np.stack([
        np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                             * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
        for t in s.tracks])


class TestLatencyQueries:
    def test_chain_latency(self):
        c = EffectChain([Gain(-3.0), Limiter(-1.0, lookahead_s=0.005),
                         Limiter(-0.5, lookahead_s=0.002)]).prepare(RATE, 2)
        assert c.latency_frames() == int(round(0.005 * RATE)) + int(round(0.002 * RATE))
        assert EffectChain([Biquad("lowpass", 1000.0)]).prepare(RATE, 2).latency_frames() == 0

    def test_fx_latencies_from_stages(self):
        s = random_session(1, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        s.tracks[0].effects = EffectChain([Limiter(-1.0, lookahead_s=0.004)])
        s.master_effects = EffectChain([Limiter(-0.3, lookahead_s=0.002)])
        fx = prepare_generic_fx(s, RATE, 2)
        glat, mlat = fx_latencies(fx)
        L = int(round(0.004 * RATE))
        assert sorted(glat) == [L] and mlat == int(round(0.002 * RATE))
        for g, lat in zip(fx.groups, glat):
            assert stage_latency_frames(g.stages) == lat


class TestAlignment:
    def test_limited_track_aligns_with_dry(self):
        """An identical transient on a dry track and a limiter track must
        sum coherently under PDC (and smear without it)."""
        from whitebox_tpu.session import Session

        s = Session(bpm=120.0)
        rate = RATE
        click = np.zeros((1, int(rate)), np.float32)
        for k in range(4):
            click[0, 12000 * k + 600] = 0.5  # isolated unit transients
        from whitebox_tpu.session.sample import Sample

        a = s.sample_table.add_sample(
            Sample.from_planar(click, int(rate), AudioFormat.F32, name="click"),
            key="click")
        t0 = s.add_track("dry")
        t1 = s.add_track("lim")
        s.add_audio_clip(t0, "c0", 0.0, 2.0, asset=a)
        s.add_audio_clip(t1, "c1", 0.0, 2.0, asset=a)
        L = int(round(0.004 * rate))
        # high ceiling: the limiter passes the signal but still delays by L
        s.tracks[1].effects = EffectChain([Limiter(12.0, lookahead_s=0.004)])

        pt = _per_track(s)
        T, C, F = pt.shape
        fx = prepare_generic_fx(s, rate, C)
        tg = _tg(s, C)

        fin_off = make_generic_finisher(fx, T, C, chunk=4096, pdc=False)
        fin_on = make_generic_finisher(fx, T, C, chunk=4096, pdc=True)
        off = np.asarray(fin_off(jnp.asarray(pt), jnp.asarray(tg)))
        on = np.asarray(fin_on(jnp.asarray(pt), jnp.asarray(tg)))

        # uncompensated: two separate transients L apart (peak ~1x);
        # compensated: one coherent transient (peak ~2x)
        n = 600
        g0 = float(tg[0, 0])
        assert abs(float(on[0, n])) > 1.8 * 0.5 * g0
        assert abs(float(off[0, n])) < 1.2 * 0.5 * g0
        assert abs(float(off[0, n + L])) > 0.8 * 0.5 * g0  # the smeared copy

    def test_device_matches_reference_pdc(self):
        s = random_session(9, rate=RATE, bpm=120.0, n_tracks=4,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[0].effects = EffectChain([Limiter(-6.0, lookahead_s=0.003)])
        s.tracks[2].effects = EffectChain([Biquad("lowpass", 8000.0), Gain(-2.0)])
        s.master_effects = EffectChain([Limiter(-1.0, lookahead_s=0.002)])
        pt = _per_track(s)
        T, C, F = pt.shape
        fx = prepare_generic_fx(s, RATE, C)
        tg = _tg(s, C)
        fin = make_generic_finisher(fx, T, C, chunk=4096, pdc=True)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_generic_finish(pt, s, RATE, C, pdc=True)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"
        # and it differs from the uncompensated render
        ref0 = reference_generic_finish(pt, s, RATE, C, pdc=False)
        assert rms(ref - ref0) / max(rms(ref0), 1e-9) > 1e-4

    def test_zero_latency_session_pdc_noop(self):
        s = random_session(5, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[0].effects = EffectChain([Biquad("highpass", 200.0)])
        pt = _per_track(s)
        T, C, F = pt.shape
        fx = prepare_generic_fx(s, RATE, C)
        tg = _tg(s, C)
        a = np.asarray(make_generic_finisher(fx, T, C, chunk=4096, pdc=False)(
            jnp.asarray(pt), jnp.asarray(tg)))
        b = np.asarray(make_generic_finisher(fx, T, C, chunk=4096, pdc=True)(
            jnp.asarray(pt), jnp.asarray(tg)))
        np.testing.assert_array_equal(a, b)


class TestBouncePDC:
    def test_bounce_streaming_matches_reference(self):
        """The XLA streaming path (fetch-ahead re-renders + head trim) must
        match the f64 reference with PDC on."""
        from whitebox_tpu.render.bounce import bounce

        s = random_session(11, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[1].effects = EffectChain([Limiter(-8.0, lookahead_s=0.004)])
        s.master_effects = EffectChain([Limiter(-1.0, lookahead_s=0.002)])
        res = bounce(s, RATE, engine="xla", chunk_frames=8192, pdc=True)
        pt = _per_track(s)
        ref = reference_generic_finish(pt, s, RATE, 2, pdc=True)
        n = min(res.audio.shape[1], ref.shape[1])
        err = rms(res.audio[:, :n] - ref[:, :n]) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"

    @pytest.mark.slow
    def test_bounce_pallas_matches_xla_pdc(self):
        from whitebox_tpu.render.bounce import bounce

        s = random_session(11, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[1].effects = EffectChain([Limiter(-8.0, lookahead_s=0.004)])
        a = bounce(s, RATE, engine="xla", chunk_frames=8192, pdc=True).audio
        b = bounce(s, RATE, engine="pallas", chunk_frames=8192, pdc=True).audio
        n = min(a.shape[1], b.shape[1])
        assert np.max(np.abs(a[:, :n] - b[:, :n])) < 1e-6

    def test_routed_pdc_track_latency(self):
        from whitebox_tpu.render.routing import (
            make_routed_finisher, prepare_routed_fx, reference_routed_finish,
        )

        s = random_session(13, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.add_bus("grp")
        s.set_track_output(0, 0)
        s.tracks[1].effects = EffectChain([Limiter(-8.0, lookahead_s=0.003)])
        pt = _per_track(s)
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        tg = _tg(s, C)
        fin = make_routed_finisher(rfx, T, C, chunk=4096, pdc=True)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_routed_finish(pt, s, RATE, C, pdc=True)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"

    def test_routed_pdc_bus_latency_compensated(self):
        """A lookahead limiter ON A BUS is compensated by delay-to-align:
        device == f64 reference, and the latent bus path stays coherent
        with a parallel dry path carrying the same transient."""
        from whitebox_tpu.render.routing import (
            make_routed_finisher, prepare_routed_fx, reference_routed_finish,
        )
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        s = Session(bpm=120.0)
        click = np.zeros((1, 48000), np.float32)
        for k in range(3):
            click[0, 14000 * k + 900] = 0.5
        a = s.sample_table.add_sample(
            Sample.from_planar(click, 48000, AudioFormat.F32, name="c"), key="c")
        t0 = s.add_track("dry")
        t1 = s.add_track("bused")
        s.add_audio_clip(t0, "c0", 0.0, 2.0, asset=a)
        s.add_audio_clip(t1, "c1", 0.0, 2.0, asset=a)
        bus = s.add_bus("lim")
        L = int(round(0.004 * RATE))
        bus.effects = EffectChain([Limiter(12.0, lookahead_s=0.004)])  # pure delay
        s.set_track_output(1, 0)

        pt = _per_track(s)
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.ones((T, C), np.float32)
        on = np.asarray(make_routed_finisher(rfx, T, C, chunk=4096, pdc=True)(
            jnp.asarray(pt), jnp.asarray(tg)))
        off = np.asarray(make_routed_finisher(rfx, T, C, chunk=4096, pdc=False)(
            jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_routed_finish(pt, s, RATE, C, pdc=True)
        err = rms(on - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"
        # compensated: transients sum coherently (2x); uncompensated: smeared
        n = 900
        assert abs(float(on[0, n])) > 0.9
        assert abs(float(off[0, n])) < 0.6
        assert abs(float(off[0, n + L])) > 0.4

    def test_streaming_bus_latency_still_raises(self):
        """The XLA streaming path doesn't carry bus delay lines; it must
        fail loudly rather than render misaligned."""
        from whitebox_tpu.render.bounce import bounce

        s = random_session(17, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        b = s.add_bus("lim")
        b.effects = EffectChain([Limiter(-3.0, lookahead_s=0.002)])
        s.set_track_output(0, 0)
        with pytest.raises(ValueError, match="bus-chain latency"):
            bounce(s, RATE, engine="xla", pdc=True)
