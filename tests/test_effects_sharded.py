"""Frame-sharded effect chains on the 8-device CPU mesh: every effect
family's cross-shard state handoff must reproduce the single-chip one-shot
(SURVEY §5 sequence parallelism, extended from biquads to the whole
plugin-replacement surface)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from whitebox_tpu.effects import (
    Biquad, Chorus, Compressor, ConvolutionReverb, Delay, Flanger, Gain,
    Limiter, NoiseGate, ParametricEQ, Saturator, StereoWidth,
)
from whitebox_tpu.parallel.effects_sharded import chain_shard, stage_shard
from whitebox_tpu.parallel.mesh import make_render_mesh
from whitebox_tpu.render.effects_generic import _stage_kind, _stage_params

RATE = 48000.0
F = 16384  # 8 shards x 2048 local frames


@pytest.fixture(scope="module")
def fmesh():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    return make_render_mesh(tracks_parallel=1, frames_parallel=8)


def _noise(C=2, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((1, C, F)) * scale).astype(np.float32)


def _single(effs, x):
    """Single-chip one-shot reference through Effect.process."""
    y = jnp.asarray(x[0])
    for e in effs:
        e.prepare(RATE, x.shape[1])
        y, _ = e.process(y, e.init_state(x.shape[1]))
    return np.asarray(y)[None]


def _sharded(effs, x, fmesh):
    for e in effs:
        e.prepare(RATE, x.shape[1])
    stages = [_stage_kind(e) for e in effs]
    params = [
        {k: jnp.asarray(np.stack([v])) for k, v in _stage_params(e, kind).items()}
        for e, (kind, _) in zip(effs, stages)
    ]
    fp = fmesh.shape["frames"]

    def tile(xl, pl):
        return chain_shard(stages, pl, xl, "frames", fp, RATE)

    fn = shard_map(
        tile, mesh=fmesh,
        in_specs=(P(None, None, "frames"), [{k: P() for k in p} for p in params]),
        out_specs=P(None, None, "frames"),
    )
    return np.asarray(fn(jnp.asarray(x), params))


CASES = [
    ("compressor-peak", [Compressor(-18.0, 4.0, attack_s=0.004, release_s=0.08)]),
    ("compressor-rms", [Compressor(-22.0, 6.0, detector="rms")]),
    ("limiter-lookahead", [Limiter(-4.0, lookahead_s=0.002)]),
    ("gate", [NoiseGate(-26.0, release_s=0.05)]),
    ("delay-stereo", [Delay(1500 / RATE, 0.55, wet=0.5)]),
    ("delay-short", [Delay(600 / RATE, 0.7, wet=0.4)]),
    ("delay-pingpong", [Delay(1100 / RATE, 0.5, mode="pingpong")]),
    ("delay-negative-fb", [Delay(900 / RATE, -0.6, wet=0.5)]),
    ("chorus", [Chorus(rate_hz=1.1, voices=3)]),
    ("flanger", [Flanger()]),
    ("reverb-short", [ConvolutionReverb(np.exp(-np.arange(1200) / 300.0).astype(np.float32) * 0.2, wet=0.4)]),
    ("reverb-multihop", [ConvolutionReverb(np.exp(-np.arange(5000) / 900.0).astype(np.float32) * 0.15, wet=0.4)]),
    ("saturator", [Saturator(9.0, mix=0.7)]),
    ("width", [StereoWidth(1.5)]),
    ("gain+biquad", [Gain(-3.0), Biquad("lowpass", 3000.0)]),
    ("eq", [ParametricEQ([("lowshelf", 120.0, 0.707, 3.0), ("peak", 2000.0, 1.0, -2.0)])]),
    ("full-chain", [NoiseGate(-40.0), Compressor(-20.0, 3.0),
                    Delay(800 / RATE, 0.4, wet=0.3), Saturator(6.0, mix=0.5),
                    Biquad("highpass", 40.0)]),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,effs", CASES, ids=[c[0] for c in CASES])
def test_sharded_matches_single_chip(name, effs, fmesh):
    import zlib

    x = _noise(seed=zlib.crc32(name.encode()) % 1000)  # stable across runs
    ref = _single(effs, x)
    got = _sharded(effs, x, fmesh)
    scale = max(float(np.max(np.abs(ref))), 1e-6)
    err = np.max(np.abs(got - ref)) / scale
    # f32 accumulation-order noise between the shard and one-shot forms
    # (injection terms, concat-boundary lerps); the dedicated exactness
    # tests below pin the stronger per-family claims
    assert err < 5e-5, f"{name}: sharded vs single rel err {err:.2e}"


def test_chorus_sharded_is_exact(fmesh):
    # pure gathers + ppermuted dry tail: not just close — exact
    effs = [Chorus(rate_hz=0.7, voices=2)]
    x = _noise(seed=42)
    ref = _single(effs, x)
    got = _sharded(effs, x, fmesh)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_apply_chain_sharded_wrapper(fmesh):
    # the user-facing [C, F] master-bus entry point (also run by the driver's
    # multichip dryrun) matches the single-chip chain
    from whitebox_tpu.parallel.effects_sharded import apply_chain_sharded

    effs = [NoiseGate(-45.0), Compressor(-20.0, 3.0), Delay(700 / RATE, 0.5, wet=0.35)]
    x = _noise(seed=3)
    ref = _single(effs, x)
    got = np.asarray(apply_chain_sharded(
        [NoiseGate(-45.0), Compressor(-20.0, 3.0), Delay(700 / RATE, 0.5, wet=0.35)],
        jnp.asarray(x[0]), fmesh, RATE))[None]
    scale = max(float(np.max(np.abs(ref))), 1e-6)
    assert np.max(np.abs(got - ref)) / scale < 3e-5


def test_reverb_sharded_is_exact_vs_chunked(fmesh):
    # FIR spill-forward: equal to the chunked single-chip stream (both sum
    # the same overlap-add partials; one fp32 add order)
    eff = ConvolutionReverb(np.exp(-np.arange(3000) / 500.0).astype(np.float32) * 0.2, wet=0.5)
    x = _noise(seed=7)
    eff.prepare(RATE, 2)
    st = eff.init_state(2)
    chunks = []
    for s in range(0, F, F // 8):
        yc, st = eff.process(jnp.asarray(x[0, :, s : s + F // 8]), st)
        chunks.append(np.asarray(yc))
    ref = np.concatenate(chunks, -1)[None]
    got = _sharded([eff], x, fmesh)
    np.testing.assert_allclose(got, ref, atol=2e-6)
