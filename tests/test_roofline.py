"""Roofline cost model (render/roofline.py) + the lane-contiguous prefix
scan (ops/scan_util.py) it motivated.

The cost estimate runs BEFORE the finishing pipeline prepares its chains
(render/bounce.py computes stats.cost up front), so it must tolerate
effects whose ``static_config`` legitimately requires ``prepare`` — a
designed-room ConvolutionReverb's ir_len depends on the sample rate.
Regression: round-5 briefly crashed every reverb bounce here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.effects import (
    Biquad, Compressor, ConvolutionReverb, EffectChain, Gain,
)
from whitebox_tpu.ops.scan_util import hillis_scan

RATE = 48000.0


class TestHillisScan:
    """hillis_scan == lax.associative_scan (same math, contiguous-shift
    schedule) for the combines the framework actually runs."""

    def test_affine_6tuple_matches_associative_scan(self):
        # the eigenbasis biquad combine (ops/biquad.py _affine_compose)
        from whitebox_tpu.ops.biquad import _AFFINE_IDENTITY, _affine_compose

        rng = np.random.default_rng(5)
        C, F = 3, 257  # non-power-of-two frame count
        elems = tuple(
            jnp.asarray(rng.standard_normal((C, F)) * 0.3, jnp.float32)
            for _ in range(6))
        ours = hillis_scan(_affine_compose, elems, _AFFINE_IDENTITY)
        ref = jax.lax.associative_scan(_affine_compose, elems, axis=1)
        # same math, different FP association (Hillis vs Blelloch order)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_onepole_2tuple_matches_associative_scan(self):
        # the dynamics envelope combine: z[n] = a z[n-1] + b
        def comb(l, r):
            return (l[0] * r[0], l[1] * r[0] + r[1])

        rng = np.random.default_rng(6)
        a = jnp.asarray(rng.uniform(0.2, 0.999, (2, 300)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((2, 300)), jnp.float32)
        m1, b1 = hillis_scan(comb, (a, b), (1.0, 0.0))
        m2, b2 = jax.lax.associative_scan(comb, (a, b), axis=-1)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=2e-4, atol=1e-5)

    def test_length_one_and_identity(self):
        def comb(l, r):
            return (l[0] + r[0],)

        (out,) = hillis_scan(comb, (jnp.arange(1.0, 2.0),), (0.0,))
        np.testing.assert_allclose(np.asarray(out), [1.0])
        (csum,) = hillis_scan(comb, (jnp.ones((5,)),), (0.0,))
        np.testing.assert_allclose(np.asarray(csum), [1, 2, 3, 4, 5])


class TestCostEstimate:
    def test_sol_and_bound(self):
        from whitebox_tpu.render.roofline import CostEstimate

        est = CostEstimate()
        est.add("a", hbm_bytes=819e9)  # exactly one second of HBM
        assert est.bound() == "hbm"
        assert est.sol_seconds() == pytest.approx(1.0)
        est2 = CostEstimate()
        est2.add("m", mxu_flops=197e12)  # f32 => 6 bf16 passes
        assert est2.bound() == "mxu"
        assert est2.sol_seconds() == pytest.approx(6.0)
        assert est.utilization(2.0) == pytest.approx(0.5)

    def test_estimate_with_unprepared_chains(self):
        """estimate_bounce_cost must work on a session whose effects have
        never seen prepare() — including reverbs whose ir_len needs the
        sample rate (regression: AssertionError in static_config)."""
        from whitebox_tpu.render.roofline import estimate_bounce_cost
        from whitebox_tpu.timeline.carve import carve_session

        s = random_session(40, rate=48000, bpm=120.0, n_tracks=3, n_clips=1)
        ir = (np.exp(-np.arange(700) / 150.0) * 0.25).astype(np.float32)
        s.tracks[0].effects = EffectChain([ConvolutionReverb(ir, wet=0.3)])
        s.tracks[1].effects = EffectChain(
            [ConvolutionReverb(room_seconds=0.2, wet=0.2)])  # designed room
        s.tracks[2].effects = EffectChain(
            [Compressor(-20.0, 4.0), Biquad("lowpass", 4000.0), Gain(-1.0)])
        table, _pool = carve_session(s, RATE, buffer_size=512)
        est = estimate_bounce_cost(table, s, table.total_frames, 2)
        assert est.hbm_bytes > 0
        assert est.sol_seconds() > 0
        # both reverbs charge FFT flops (ir inferred without prepare)
        assert est.terms.get("fx.convreverb", (0, 0))[1] > 0

    def test_bounce_with_reverb_carries_cost(self):
        """End-to-end: a bounce through the generic pipeline records a
        roofline estimate on its stats (the original crash path)."""
        from whitebox_tpu.render.bounce import bounce

        s = random_session(41, rate=48000, bpm=120.0, n_tracks=2, n_clips=1)
        ir = (np.exp(-np.arange(300) / 80.0) * 0.25).astype(np.float32)
        s.tracks[0].effects = EffectChain([ConvolutionReverb(ir, wet=0.3)])
        res = bounce(s, RATE, engine="xla", chunk_frames=4096)
        assert res.stats.cost is not None
        assert res.stats.cost.hbm_bytes > 0
