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


class TestPackDeviceTablesVectorized:
    """The packer is a vectorized scatter; verify bit-identity against a
    straightforward per-row loop oracle, and that host prep stays fast for
    resampled many-row tables."""

    def _loop_oracle(self, table, pool, session, channels=2):
        from whitebox_tpu.ops.dsarith import split_f64
        from whitebox_tpu.ops.mix import _I32_SENTINEL

        T = table.num_tracks
        counts = np.bincount(table.track, minlength=T)
        S = max(int(counts.max()) if counts.size else 1, 1)
        ref = {
            "dst_start": np.full((T, S), _I32_SENTINEL, np.int32),
            "length": np.zeros((T, S), np.int32),
            "src_base": np.zeros((T, S, channels), np.int32),
            "gain": np.zeros((T, S), np.float32),
            "fast": np.ones((T, S), bool),
            "clamp": np.zeros((T, S), bool),
        }
        fh, fl = split_f64(table.src_frac)
        ref["frac_hi"] = np.zeros((T, S), np.float32)
        pos = np.zeros(T, np.int64)
        for r in range(len(table)):
            t = int(table.track[r])
            i = int(pos[t]); pos[t] += 1
            ref["dst_start"][t, i] = table.dst_start[r]
            ref["length"][t, i] = table.length[r]
            sid = int(table.sample_id[r])
            ref["src_base"][t, i, :] = pool.channel_base[sid, :channels].astype(np.int64) + int(table.src_int[r])
            ref["frac_hi"][t, i] = fh[r]
            ref["gain"][t, i] = table.gain[r]
            ref["fast"][t, i] = table.fast[r]
            ref["clamp"][t, i] = table.clamp[r]
        return ref

    def test_matches_loop_oracle_resampled(self):
        from whitebox_tpu.ops.mix import pack_device_tables
        from whitebox_tpu.render.demo import make_demo_session
        from whitebox_tpu.timeline.carve import carve_session

        session = make_demo_session(n_tracks=12, duration_seconds=3.0, seed=3,
                                    clip_speeds=(1.0, 0.5, 44100.0 / 48000.0))
        table, pool = carve_session(session, 48000.0, buffer_size=256)
        assert len(table) > 100  # resampled slots emit per-block rows
        dev = pack_device_tables(table, pool, session)
        ref = self._loop_oracle(table, pool, session)
        np.testing.assert_array_equal(dev.dst_start, ref["dst_start"])
        np.testing.assert_array_equal(dev.length, ref["length"])
        np.testing.assert_array_equal(dev.src_base, ref["src_base"])
        np.testing.assert_array_equal(dev.frac_hi, ref["frac_hi"])
        np.testing.assert_array_equal(dev.gain, ref["gain"])
        np.testing.assert_array_equal(dev.fast, ref["fast"])
        np.testing.assert_array_equal(dev.clamp, ref["clamp"])

    def test_host_prep_fast_at_scale(self):
        import time

        from whitebox_tpu.ops.mix import pack_device_tables
        from whitebox_tpu.render.demo import make_demo_session
        from whitebox_tpu.timeline.carve import carve_session

        session = make_demo_session(n_tracks=128, duration_seconds=60.0, seed=5,
                                    clip_speeds=(44100.0 / 48000.0,))
        table, pool = carve_session(session, 48000.0, buffer_size=512)
        dt = float("inf")
        for _ in range(2):  # best-of-2 absorbs suite-load contention spikes
            t0 = time.perf_counter()
            pack_device_tables(table, pool, session)
            dt = min(dt, time.perf_counter() - t0)
        # ~0.14s standalone. A per-row Python loop regression would be 30s+
        # here, so a loose bound still guards the regression.
        assert dt < 5.0, f"pack took {dt:.3f}s for {len(table)} rows"


class TestMergeSlowRuns:
    """_merge_slow_runs phase-continuity tolerance scales with f64 spacing
    (a fixed 1e-6 epsilon was shape-dependent at high source offsets)."""

    def _table(self, x0s, L=512, speed=0.9188):
        from whitebox_tpu.timeline.carve import SegmentTable

        n = len(x0s)
        return SegmentTable(
            track=np.zeros(n, np.int32),
            dst_start=np.asarray([i * L for i in range(n)], np.int32),
            length=np.full(n, L, np.int32),
            sample_id=np.zeros(n, np.int32),
            src_int=np.asarray([int(np.floor(x)) for x in x0s], np.int32),
            src_frac=np.asarray([x - np.floor(x) for x in x0s], np.float64),
            speed=np.full(n, speed, np.float64),
            gain=np.ones(n, np.float32),
            fast=np.zeros(n, bool), clamp=np.zeros(n, bool),
            clip_id=np.zeros(n, np.int32),
            fin_start=np.full(n, -(1 << 30), np.int32), fin_inv=np.ones(n, np.float32),
            fout_end=np.full(n, 1 << 30, np.int32), fout_inv=np.ones(n, np.float32),
            num_tracks=1, total_frames=n * L, buffer_size=L,
        )

    def _seq_phases(self, x0, n, L=512, speed=0.9188):
        xs = []
        x = np.float64(x0)
        for _ in range(n):
            xs.append(float(x))
            x = x + L * speed
        return xs

    def test_extreme_offset_contiguous_merges(self):
        from whitebox_tpu.ops.mix_pallas import _merge_slow_runs

        # phase ~1.5e8 samples (a ~52-minute 48k source) — f64 spacing is
        # ~3e-8; sequential per-block accumulation must still merge
        runs = _merge_slow_runs(self._table(self._seq_phases(1.5e8 + 0.37, 6)))
        assert len(runs) == 1

    def test_extreme_offset_phase_jump_breaks(self):
        from whitebox_tpu.ops.mix_pallas import _merge_slow_runs

        xs = self._seq_phases(1.5e8 + 0.37, 6)
        xs[3] += 8e-7  # sub-1e-6 discontinuity: the old absolute epsilon
        # would have silently merged (a false phase continue); the jump
        # breaks continuity on both sides of row 3
        runs = _merge_slow_runs(self._table(xs))
        assert len(runs) == 3

    def test_low_offset_keeps_old_behavior(self):
        from whitebox_tpu.ops.mix_pallas import _merge_slow_runs

        runs = _merge_slow_runs(self._table(self._seq_phases(1000.25, 8)))
        assert len(runs) == 1
