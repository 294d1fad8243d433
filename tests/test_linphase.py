"""Linear-phase EQ (effects/eq.py LinearPhaseEQ): FIR design quality,
device==f64 reference, PDC alignment, serialization, sharded parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.effects import Biquad, EffectChain, LinearPhaseEQ, ParametricEQ
from whitebox_tpu.effects.eq import cascade_magnitude, design_linear_phase_fir
from whitebox_tpu.render.effects_generic import (
    make_generic_finisher, prepare_generic_fx, reference_generic_finish,
)

RATE = 48000.0
BANDS = [("lowshelf", 120.0, 0.707, 3.0), ("peak", 1200.0, 1.0, -4.0),
         ("highshelf", 8000.0, 0.707, 2.0)]


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


class TestFIRDesign:
    def test_magnitude_matches_cascade(self):
        """In-band magnitude of the FIR tracks the biquad cascade < 0.1 dB."""
        taps = 4095
        h = design_linear_phase_fir(BANDS, RATE, taps)
        nfft = 1 << 16
        H = np.abs(np.fft.rfft(h, nfft))
        freqs = np.arange(nfft // 2 + 1) * (RATE / nfft)
        target = cascade_magnitude(BANDS, freqs, RATE)
        band = (freqs > 40.0) & (freqs < 20000.0)
        err_db = 20 * np.log10(np.maximum(H[band], 1e-12) / np.maximum(target[band], 1e-12))
        assert np.max(np.abs(err_db)) < 0.1, f"max magnitude error {np.max(np.abs(err_db))} dB"

    def test_linear_phase_symmetry(self):
        """Type-I FIR: exactly symmetric -> constant group delay (taps-1)/2."""
        taps = 1023
        h = design_linear_phase_fir(BANDS, RATE, taps)
        np.testing.assert_allclose(h, h[::-1], atol=1e-15)

    def test_latency_query(self):
        e = LinearPhaseEQ(BANDS, taps=2047).prepare(RATE, 2)
        assert e.latency_frames() == 1023
        assert EffectChain([e]).latency_frames() == 1023

    def test_odd_taps_required(self):
        with pytest.raises(ValueError):
            LinearPhaseEQ(BANDS, taps=2048)


class TestRender:
    def test_device_matches_reference(self):
        s = random_session(21, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[0].effects = EffectChain([LinearPhaseEQ(BANDS, taps=1023)])
        s.tracks[1].effects = EffectChain([Biquad("lowpass", 9000.0)])
        pt = _per_track(s)
        T, C, F = pt.shape
        fx = prepare_generic_fx(s, RATE, C)
        tg = _tg(s, C)
        fin = make_generic_finisher(fx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_generic_finish(pt, s, RATE, C)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"

    def test_chunked_equals_oneshot(self):
        """Chunk carry through the FIR: chunk 2048 == one-shot."""
        rng = np.random.default_rng(0)
        x = (0.2 * rng.standard_normal((2, 8192))).astype(np.float32)
        e = LinearPhaseEQ(BANDS, taps=1023).prepare(RATE, 2)
        st = e.init_state(2)
        one, _ = e.process(jnp.asarray(x), st)
        st = e.init_state(2)
        pieces = []
        for k in range(0, 8192, 2048):
            y, st = e.process(jnp.asarray(x[:, k:k + 2048]), st)
            pieces.append(np.asarray(y))
        assert np.max(np.abs(np.concatenate(pieces, -1) - np.asarray(one))) < 1e-6

    def test_pdc_aligns_linphase_track(self):
        """Flat linear-phase EQ = pure delay; PDC brings it back in phase
        with a dry copy of the same signal."""
        s = random_session(23, rate=RATE, bpm=120.0, n_tracks=1,
                           formats=(AudioFormat.F32,), n_clips=2)
        pt1 = _per_track(s)
        pt = np.concatenate([pt1, pt1])  # [2, C, F] identical rows

        from whitebox_tpu.session.track import Track

        s.tracks.append(Track(name="lp"))
        taps = 511
        s.tracks[1].effects = EffectChain([LinearPhaseEQ([], taps=taps)])  # flat
        T, C, F = pt.shape
        fx = prepare_generic_fx(s, RATE, C)
        tg = np.ones((T, C), np.float32)
        on = np.asarray(make_generic_finisher(fx, T, C, chunk=4096, pdc=True)(
            jnp.asarray(pt), jnp.asarray(tg)))
        off = np.asarray(make_generic_finisher(fx, T, C, chunk=4096, pdc=False)(
            jnp.asarray(pt), jnp.asarray(tg)))
        # with PDC the two identical tracks sum coherently: 2x the single
        half = np.clip(pt[0].astype(np.float64) * 2.0, -1.0, 1.0)
        n = F - taps  # skip the tail the uncompensated render smears into
        err_on = rms(on[:, :n] - half[:, :n]) / max(rms(half[:, :n]), 1e-9)
        err_off = rms(off[:, :n] - half[:, :n]) / max(rms(half[:, :n]), 1e-9)
        assert err_on < 1e-3 and err_off > 50 * err_on

    def test_wb_roundtrip(self, tmp_path):
        from whitebox_tpu.io import wav
        from whitebox_tpu.session.project import read_project, write_project

        s = random_session(25, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        s.tracks[0].effects = EffectChain([LinearPhaseEQ(BANDS, taps=1535)])
        for k, a in s.sample_table.samples.items():
            p = tmp_path / f"{k}.wav"
            wav.write_wav(p, np.stack(a.sample.data), a.sample.sample_rate, AudioFormat.F32)
            a.sample.path = str(p)
        path = tmp_path / "lp.wb"
        write_project(s, path)
        s2 = read_project(path)
        e = s2.tracks[0].effects.effects[0]
        assert isinstance(e, LinearPhaseEQ) and e.taps == 1535
        assert [(t.value, f, q, g) for (t, f, q, g) in e.bands] == \
               [(t, f, q, g) for (t, f, q, g) in BANDS]


@pytest.mark.slow
class TestSharded:
    def test_sharded_matches_single_chip(self):
        import jax

        from whitebox_tpu.parallel.mesh import make_render_mesh
        from whitebox_tpu.parallel.render_sharded import bounce_sharded
        from whitebox_tpu.render.bounce import bounce

        assert len(jax.devices()) == 8
        s = random_session(27, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[0].effects = EffectChain([LinearPhaseEQ(BANDS, taps=1023)])
        single = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        mesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
        multi = bounce_sharded(s, RATE, mesh)
        n = min(single.shape[1], multi.shape[1])
        np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)
