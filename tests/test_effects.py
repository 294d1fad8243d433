"""Effects layer: biquad design/scan correctness, chain API, chunked-state
equivalence, batched chain packing."""

import numpy as np
import pytest

from whitebox_tpu.effects import Biquad, EffectChain, Gain, ParametricEQ
from whitebox_tpu.ops import biquad as bq

RATE = 48000.0


def sine(freq, n=8192, rate=RATE, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)).astype(np.float32)


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, dtype=np.float64) ** 2)))


class TestDesign:
    def test_lowpass_dc_unity(self):
        c = bq.design_biquad("lowpass", 1000.0, RATE)
        # H(z=1) = (b0+b1+b2)/(1+a1+a2) == 1 for LP
        assert (c.b0 + c.b1 + c.b2) / (1 + c.a1 + c.a2) == pytest.approx(1.0, abs=1e-12)

    def test_highpass_nyquist_unity(self):
        c = bq.design_biquad("highpass", 1000.0, RATE)
        assert (c.b0 - c.b1 + c.b2) / (1 - c.a1 + c.a2) == pytest.approx(1.0, abs=1e-9)

    def test_peak_gain_at_center(self):
        c = bq.design_biquad("peak", 2000.0, RATE, q=1.0, gain_db=6.0)
        w = 2 * np.pi * 2000.0 / RATE
        z = np.exp(1j * w)
        h = (c.b0 + c.b1 / z + c.b2 / z**2) / (1 + c.a1 / z + c.a2 / z**2)
        assert 20 * np.log10(abs(h)) == pytest.approx(6.0, abs=0.01)

    def test_stability(self):
        for t in bq.BiquadType:
            c = bq.design_biquad(t, 5000.0, RATE, q=2.0, gain_db=9.0)
            roots = np.roots([1.0, c.a1, c.a2])
            assert np.all(np.abs(roots) < 1.0)


class TestSequentialOracle:
    def test_lowpass_attenuates_high(self):
        c = bq.design_biquad("lowpass", 500.0, RATE)
        lo, _ = bq.biquad_sequential(sine(100.0)[None], c)
        hi, _ = bq.biquad_sequential(sine(10000.0)[None], c)
        assert rms(lo[0, 4000:]) > 0.9 * rms(sine(100.0))
        assert rms(hi[0, 4000:]) < 0.02 * rms(sine(10000.0))

    def test_state_continuity(self):
        c = bq.design_biquad("peak", 1000.0, RATE, gain_db=4.0)
        x = np.random.default_rng(0).standard_normal((2, 1000)).astype(np.float32)
        full, _ = bq.biquad_sequential(x, c)
        y1, st = bq.biquad_sequential(x[:, :400], c)
        y2, _ = bq.biquad_sequential(x[:, 400:], c, st)
        np.testing.assert_allclose(np.concatenate([y1, y2], axis=1), full, rtol=0, atol=0)


class TestScanParity:
    @pytest.mark.parametrize(
        "ftype,kw",
        [
            ("lowpass", {}),
            ("highpass", {"q": 1.2}),
            ("peak", {"gain_db": 6.0}),
            ("lowshelf", {"gain_db": -9.0}),
            ("notch", {"q": 4.0}),
        ],
    )
    def test_scan_matches_sequential(self, ftype, kw):
        import jax.numpy as jnp

        c = bq.design_biquad(ftype, 1500.0, RATE, **kw)
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((2, 16384)) * 0.3).astype(np.float32)
        ref, _ = bq.biquad_sequential(x, c)
        got, _ = bq.biquad_scan(jnp.asarray(x), c)
        scale = max(rms(ref), 1e-9)
        err = rms(np.asarray(got, dtype=np.float64) - ref) / scale
        assert err < 5e-5, f"relative rms error {err}"

    def test_scan_chunked_state_equivalence(self):
        import jax.numpy as jnp

        c = bq.design_biquad("peak", 800.0, RATE, gain_db=5.0)
        rng = np.random.default_rng(2)
        x = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
        full, _ = bq.biquad_scan(jnp.asarray(x), c)
        st = None
        parts = []
        for i in range(0, 4096, 512):
            y, st = bq.biquad_scan(jnp.asarray(x[:, i : i + 512]), c, st)
            parts.append(np.asarray(y))
        chunked = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(chunked, np.asarray(full), atol=2e-5)


class TestBatched:
    @pytest.mark.slow
    def test_batched_matches_individual(self):
        import jax.numpy as jnp

        cs = [
            bq.design_biquad("lowpass", 1000.0, RATE),
            bq.design_biquad("highpass", 200.0, RATE),
            bq.IDENTITY_COEFFS,
        ]
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((3, 2048)) * 0.3).astype(np.float32)
        ca = np.stack([bq.coeffs_device_arrays(c) for c in cs], axis=1)[:, :, None]  # [9, 3, 1]
        state = jnp.zeros((3, 2), dtype=jnp.float32)
        y, _ = bq.biquad_scan_batched(jnp.asarray(x), [jnp.asarray(ca[i]) for i in range(9)], state)
        for i, c in enumerate(cs):
            yi, _ = bq.biquad_scan(jnp.asarray(x[i : i + 1]), c)
            np.testing.assert_allclose(np.asarray(y[i]), np.asarray(yi[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(y[2]), x[2], atol=0)  # identity row

    def test_pack_chain_sections(self):
        chains = [
            EffectChain([Biquad("lowpass", 1000.0), Gain(-6.0)]).prepare(RATE),
            None,
            EffectChain([ParametricEQ([("lowshelf", 100.0, 0.707, 3.0), ("peak", 1000.0, 1.0, -2.0)])]).prepare(RATE),
        ]
        S, coeffs = bq.pack_chain_sections(chains, channels=2)
        assert S == 2
        assert coeffs.shape == (9, 2, 6, 1)
        # track 1 (rows 2,3) must be identity in both sections (b0==1, Bv==0)
        np.testing.assert_array_equal(coeffs[8, :, 2:4, 0], 1.0)
        np.testing.assert_array_equal(coeffs[4, :, 2:4, 0], 0.0)


class TestEffectAPI:
    def test_chain_process(self):
        import jax.numpy as jnp

        chain = EffectChain([Biquad("lowpass", 2000.0), Gain(-6.0)]).prepare(RATE, 2)
        x = jnp.asarray(np.stack([sine(100.0, 4096), sine(100.0, 4096)]))
        st = chain.init_state(2)
        y, st2 = chain.process(x, st)
        assert y.shape == x.shape
        g = float(Gain(-6.0).gain_linear)
        assert rms(y[0, 2000:]) == pytest.approx(rms(x[0]) * g, rel=0.05)

    def test_gain_exact(self):
        import jax.numpy as jnp

        g = Gain(-6.0).prepare(RATE)
        x = jnp.asarray(np.full((1, 16), 0.5, np.float32))
        y, _ = g.process(x, None)
        np.testing.assert_array_equal(np.asarray(y), np.float32(0.5) * g.gain_linear)
