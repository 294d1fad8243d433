"""XLA renderer parity vs the oracle (CPU backend; bit-exact for speed==1,
<=1 f32 ulp for resampled paths per the dsarith contract)."""

import numpy as np
import pytest

from tests.test_carve import check_parity, random_session  # reuse generators
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.ops.mix import render_timeline
from whitebox_tpu.timeline.carve import carve_session
from whitebox_tpu.timeline.oracle import OracleRenderer


def check_device_parity(session, rate, buffer_size, max_ulps=0, strict_order=True, chunk_frames=4096):
    oracle = OracleRenderer(session, rate, buffer_size=buffer_size).render()
    table, pool = carve_session(session, rate, buffer_size=buffer_size,
                                num_blocks=oracle.shape[1] // buffer_size)
    ours = render_timeline(table, pool, session, chunk_frames=chunk_frames, strict_order=strict_order)
    assert ours.shape == oracle.shape
    if max_ulps == 0:
        np.testing.assert_array_equal(ours, oracle)
    else:
        # Parity contract for resampled paths (ops.dsarith): per-sample
        # <= max_ulps, except interpolation-boundary flips (double-single
        # floor vs f64 floor disagree about the integer cell) where lerp
        # continuity bounds the error by ~2^-24 * |b - a| <= 2.4e-7 absolute.
        a = ours.view(np.int32).astype(np.int64)
        b = oracle.view(np.int32).astype(np.int64)
        ulps = np.abs(a - b)
        absdiff = np.abs(ours.astype(np.float64) - oracle.astype(np.float64))
        mism = (ulps > max_ulps) & (absdiff > 2.4e-7)
        assert not mism.any(), (
            f"{mism.sum()} samples exceed {max_ulps} ulp AND 2.4e-7 abs "
            f"(max ulp {ulps.max()}, max abs {absdiff.max()}); "
            f"first at {np.argwhere(mism)[:3]}"
        )


class TestDeviceMixParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_speed1_exact_grid_bitexact(self, seed):
        s = random_session(seed, rate=32768, bpm=60, n_tracks=4)
        check_device_parity(s, 32768.0, 256)

    @pytest.mark.parametrize("seed", [2, 3])
    def test_speed1_drift_grid_bitexact(self, seed):
        s = random_session(seed, rate=48000, bpm=123.4, n_tracks=5)
        check_device_parity(s, 48000.0, 512)

    def test_all_formats_bitexact(self):
        s = random_session(
            11, rate=48000, bpm=97.3, n_tracks=6,
            formats=(AudioFormat.F32, AudioFormat.I16, AudioFormat.I24, AudioFormat.I32),
        )
        check_device_parity(s, 48000.0, 512)

    @pytest.mark.parametrize("seed", [20, 21])
    def test_resampled_within_1ulp(self, seed):
        s = random_session(seed, rate=48000, bpm=120.0, n_tracks=4,
                           speeds=(0.5, 0.91875, 1.37, 2.0), src_rates=(44100, 48000, 96000))
        check_device_parity(s, 48000.0, 512, max_ulps=1)

    def test_128_tracks_bitexact(self):
        s = random_session(7, rate=48000, bpm=120.0, n_tracks=128, n_clips=1)
        check_device_parity(s, 48000.0, 512)

    def test_chunk_boundary_independence(self):
        s = random_session(5, rate=48000, bpm=120.0, n_tracks=3)
        oracle = OracleRenderer(s, 48000.0, buffer_size=512).render()
        table, pool = carve_session(s, 48000.0, buffer_size=512,
                                    num_blocks=oracle.shape[1] // 512)
        a = render_timeline(table, pool, s, chunk_frames=1024)
        b = render_timeline(table, pool, s, chunk_frames=8192)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, oracle)

    def test_relaxed_order_close(self):
        s = random_session(9, rate=48000, bpm=120.0, n_tracks=16)
        oracle = OracleRenderer(s, 48000.0, buffer_size=512).render()
        table, pool = carve_session(s, 48000.0, buffer_size=512,
                                    num_blocks=oracle.shape[1] // 512)
        ours = render_timeline(table, pool, s, strict_order=False)
        np.testing.assert_allclose(ours, oracle, atol=1e-6, rtol=1e-5)
