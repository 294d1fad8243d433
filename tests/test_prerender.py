"""Sinc run pre-rendering (timeline/prerender.py): exact polyphase
resampling on the MXU + pure fast-path mix — the primary
``interpolation="sinc"`` path for rational rate ratios."""

import math

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy
from whitebox_tpu.timeline.prerender import (
    apply_prerender_device, apply_prerender_host, plan_prerender,
)

RATE = 48000.0
# 44.1k clips in a 48k session: speeds 147/160 (and x1.0884... = unity)
SPEEDS = (1.0, 0.5, 1.088435374149660)


def _session(seed, n_tracks=3, n_clips=2):
    return random_session(seed, rate=48000, bpm=120.0, n_tracks=n_tracks,
                          n_clips=n_clips, speeds=SPEEDS, src_rates=(44100.0,))


def _mix_reference(session, table2, pool2):
    pt = render_segments_per_track_numpy(table2, pool2)
    total = np.zeros((2, pt.shape[2]))
    for t, tr in enumerate(session.tracks):
        vol = np.float32(0.0) if tr.mute else tr.volume_linear
        pan = tr.pan_coeffs
        for ch in range(2):
            total[ch] += pt[t][ch] * float(np.float32(vol * np.float32(pan[ch % 2])))
    return np.clip(total, -1, 1).astype(np.float32)


class TestPlan:
    def test_rational_speeds_plan(self):
        s = _session(7)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        plan = plan_prerender(table, pool)
        assert plan is not None and len(plan.runs) >= 1
        from whitebox_tpu.timeline.prerender import _canonical_matrix

        for (kind, Pp, Qp, ratio_key, n_sub) in plan.groups:
            assert kind == "exact"
            assert n_sub >= 1 and (16 * Qp) % 128 == 0
            M, _ = _canonical_matrix(Pp, Qp, plan.taps, plan.atten_db, ratio_key)
            assert M.shape == (Qp, Pp + plan.taps)
        for p in plan.runs:
            assert 0 <= p.k0 < p.Qp

    def test_irrational_speed_rides_taylor(self):
        """Irrational speeds plan as Taylor-corrected groups (Q a multiple
        of 128, bounded drift) instead of falling off to the oversample
        path — the round-3 fallback cliff closed at the planner."""
        s = random_session(8, rate=48000, bpm=120.0, n_tracks=1, n_clips=1,
                           speeds=(0.9183746519,), src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("session carved fast-only")
        plan = plan_prerender(table, pool)
        assert plan is not None and plan.uncovered_rows is None
        assert all(g[0] == "taylor" for g in plan.groups)
        from whitebox_tpu.timeline.prerender import _TAYLOR_EBUDGET

        for p in plan.runs:
            assert p.taylor and p.Qp % 128 == 0
            assert abs(p.e0) + p.L * abs(p.eps) <= _TAYLOR_EBUDGET + 1e-9

    def test_pathological_near_simple_speed_falls_back(self):
        """A speed a hair off a simple fraction (3/4 + 1e-9): the CF
        convergent is the simple fraction itself, whose achievable anchor
        grid (1/q_hat) is too coarse for the Taylor budget — the planner
        must reject it rather than render out-of-budget phases."""
        s = random_session(8, rate=48000, bpm=120.0, n_tracks=1, n_clips=1,
                           speeds=(0.7500000001,), src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("session carved fast-only")
        assert plan_prerender(table, pool) is None
        plan = plan_prerender(table, pool, partial=True)
        assert plan is None or plan.uncovered_rows is not None

    def test_all_fast_returns_none(self):
        s = random_session(9, rate=48000, bpm=120.0, n_tracks=1, n_clips=1)
        table, pool = carve_session(s, RATE, buffer_size=512)
        assert plan_prerender(table, pool) is None


class TestNumerics:
    def test_host_matches_per_frame_sinc_definition(self):
        """The banded matmul equals the direct per-frame Kaiser-sinc
        evaluation at the exact rational phases."""
        from whitebox_tpu.ops.mix_pallas import _merge_slow_runs
        from whitebox_tpu.ops.resample import _design_rows

        s = _session(10, n_tracks=2, n_clips=1)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        plan = plan_prerender(table, pool)
        assert plan is not None
        t2, p2 = apply_prerender_host(table, pool, plan)
        runs_raw = _merge_slow_runs(table)
        half = plan.taps // 2
        # match plan runs back to raw runs by (track, dst) — plan.runs is
        # group-major, runs_raw is table order
        raw_of = {(r["trk"], r["d0"]): r for r in runs_raw}
        err = 0.0
        for r in plan.runs[:2]:
            rr = raw_of[(r.trk, r.d0)]
            base = int(pool.channel_base[r.sid, 0])
            out_base = int(p2.channel_base[r.new_sid, 0]) + r.k0
            for k in range(0, min(r.L, 1200)):
                x = rr["x0"] + k * rr["speed"]
                ix = math.floor(x)
                rows = _design_rows(np.array([x - ix]), rr["speed"], plan.taps, 90.0)[0]
                w = pool.data[base + ix - half + 1 : base + ix - half + 1 + plan.taps]
                err = max(err, abs(float(w.astype(np.float64) @ rows) - p2.data[out_base + k]))
        assert err < 5e-7, err

    def test_device_matches_host(self):
        s = _session(11)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        plan = plan_prerender(table, pool)
        t2, p2 = apply_prerender_host(table, pool, plan)
        t2d, p2d, pool2d = apply_prerender_device(table, pool, plan)
        np.testing.assert_array_equal(p2.channel_base, p2d.channel_base)
        flat = np.asarray(pool2d).reshape(-1)
        assert np.max(np.abs(flat[: p2.data.shape[0]] - p2.data)) < 1e-6

    def test_bounce_sinc_matches_reference(self):
        from whitebox_tpu.render.bounce import bounce

        s = _session(12)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        plan = plan_prerender(table, pool)
        assert plan is not None
        t2, p2 = apply_prerender_host(table, pool, plan)
        ref = _mix_reference(s, t2, p2)
        res = bounce(s, RATE, interpolation="sinc", engine="pallas")
        n = min(ref.shape[1], res.audio.shape[1])
        assert np.max(np.abs(res.audio[:, :n] - ref[:, :n])) < 3e-6

    def test_fast_rows_stay_bit_exact(self):
        """speed==1 clips in a sinc session render exactly as in linear
        mode (prerender only touches slow rows)."""
        from whitebox_tpu.render.bounce import bounce

        s = _session(13, n_tracks=2, n_clips=1)
        a = bounce(s, RATE, interpolation="sinc", engine="pallas").audio
        b = bounce(s, RATE, interpolation="linear", engine="pallas").audio
        table, _ = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        # frames covered only by fast rows must be bit-identical
        n = min(a.shape[1], b.shape[1])
        fastmask = np.ones(n, bool)
        for i in range(len(table)):
            if not table.fast[i]:
                lo = int(table.dst_start[i])
                hi = min(lo + int(table.length[i]), n)
                fastmask[lo:hi] = False
        assert np.array_equal(a[:, :n][:, fastmask], b[:, :n][:, fastmask])

    def test_sine_snr(self):
        """A 1 kHz sine at 44.1k played into a 48k session via prerender:
        >= 90 dB SNR against the ideal resampled sine (the poly path's
        documented floor was ~93 dB; exact polyphase should match or beat)."""
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.io import wav
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session import Session

        import tempfile, os

        rate_src = 44100
        n = rate_src * 2
        t = np.arange(n) / rate_src
        x = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
        with tempfile.TemporaryDirectory() as d:
            pth = os.path.join(d, "sine.wav")
            wav.write_wav(pth, x[None], rate_src, AudioFormat.F32)
            s = Session(bpm=120.0)
            a = s.sample_table.load_from_file(pth)
            tr = s.add_track("s", volume_db=0.0)
            s.add_audio_clip(tr, "c", 0.0, 3.5, asset=a)
            res = bounce(s, 48000.0, interpolation="sinc", engine="pallas")
        out = res.audio[0]
        m = np.arange(out.shape[0]) / 48000.0
        ideal = 0.5 * np.sin(2 * np.pi * 1000.0 * m)
        lo, hi = 2000, int(1.7 * 48000)  # steady-state interior
        noise = out[lo:hi] - ideal[lo:hi]
        snr = 10 * np.log10(np.mean(ideal[lo:hi] ** 2) / max(np.mean(noise ** 2), 1e-30))
        assert snr > 90.0, f"SNR {snr:.1f} dB"

    def test_reverse_runs_ride_prerender(self):
        """Reverse runs plan as mirrored forward ramps: the rewrite row
        reads the rendered buffer backward (speed -1.0, src_int at the
        last valid output) and the buffer holds the exact per-frame sinc
        values of the REVERSE phase ramp."""
        from whitebox_tpu.ops.mix_pallas import _merge_slow_runs
        from whitebox_tpu.ops.resample import _design_rows
        from whitebox_tpu.session.clip import ClipMode

        s = _session(14, n_tracks=1, n_clips=1)
        for c in s.tracks[0].clips:
            c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all() or not (table.speed[~table.fast] < 0).any():
            pytest.skip("carve emitted no reverse runs")
        plan = plan_prerender(table, pool)
        assert plan is not None and any(p.rev for p in plan.runs)
        t2, p2 = apply_prerender_host(table, pool, plan)
        # rewritten reverse rows read backward at exact integer phases
        new = t2.sample_id >= pool.num_samples
        assert (t2.speed[new & (t2.speed < 0)] == -1.0).all()
        assert (t2.src_frac[new] == 0.0).all()
        # buffer values == direct per-frame Kaiser-sinc at the reverse ramp
        runs_raw = _merge_slow_runs(table)
        raw_of = {(r["trk"], r["d0"]): r for r in runs_raw}
        half = plan.taps // 2
        checked = 0
        for p in plan.runs:
            if not p.rev or (p.trk, p.d0) not in raw_of:
                continue  # taylor sub-segments shift d0; exact runs match
            rr = raw_of[(p.trk, p.d0)]
            base = int(pool.channel_base[p.sid, 0])
            out_base = int(p2.channel_base[p.new_sid, 0])
            err = 0.0
            for j in range(0, min(p.L, 600)):
                x = rr["x0"] + j * rr["speed"]  # reverse ramp (speed < 0)
                ix = math.floor(x)
                rows = _design_rows(np.array([x - ix]), abs(rr["speed"]),
                                    plan.taps, 90.0)[0]
                w = pool.data[base + ix - half + 1 : base + ix - half + 1 + plan.taps]
                got = p2.data[out_base + (p.k0 + p.L - 1) - j]  # backward read
                err = max(err, abs(float(w.astype(np.float64) @ rows) - got))
            assert err < 5e-7, err
            checked += 1
        assert checked >= 1

    def test_reverse_bounce_matches_host_mirror(self):
        """End-to-end: a bidirectional sinc bounce equals the host mix of
        the rewritten table (device reverse slow path == host mirror)."""
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session.clip import ClipMode

        s = _session(15, n_tracks=2, n_clips=2)
        for c in s.tracks[0].clips:
            c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all() or not (table.speed[~table.fast] < 0).any():
            pytest.skip("carve emitted no reverse runs")
        plan = plan_prerender(table, pool)
        assert plan is not None
        t2, p2 = apply_prerender_host(table, pool, plan)
        ref = _mix_reference(s, t2, p2)
        res = bounce(s, RATE, interpolation="sinc", engine="pallas")
        n = min(ref.shape[1], res.audio.shape[1])
        assert np.max(np.abs(res.audio[:, :n] - ref[:, :n])) < 3e-6


class TestPartialPlan:
    """plan_prerender(partial=True): rational runs ride the exact path,
    the residue (irrational/off-grid/reverse) stays slow for the
    oversample fallback — closes the round-3 all-or-nothing cliff."""

    IRR = 2.0 ** (1.0 / 12.0)  # a semitone: the musically central irrational

    def _mixed_session(self, seed=21, n_tracks=4):
        return random_session(seed, rate=48000, bpm=120.0, n_tracks=n_tracks,
                              n_clips=2, speeds=(0.5, self.IRR),
                              src_rates=(48000.0,))

    def test_full_coverage_equals_default(self):
        s = _session(20)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        full = plan_prerender(table, pool)
        part = plan_prerender(table, pool, partial=True)
        assert full is not None and part is not None
        assert part.uncovered_rows is None
        assert len(part.runs) == len(full.runs)

    def test_mixed_exact_and_taylor_full_coverage(self):
        """Rational runs group "exact", irrational runs group "taylor" —
        ONE plan covers the whole session (no oversample residue)."""
        s = self._mixed_session(seed=22)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("carved fast-only")
        has_rational = (table.speed[~table.fast] == 0.5).any()
        has_irr = (table.speed[~table.fast] == self.IRR).any()
        if not (has_rational and has_irr):
            pytest.skip("seed produced a one-sided session")
        plan = plan_prerender(table, pool, partial=True)
        assert plan is not None and plan.uncovered_rows is None
        kinds = {g[0] for g in plan.groups}
        assert kinds == {"exact", "taylor"}

    def test_partial_rewrite_keeps_residue_slow(self):
        """A genuinely uncoverable speed (near-simple fraction: anchor grid
        beyond budget) stays slow in the rewrite and rides the oversample
        fallback; coverable runs in the SAME session still prerender."""
        from whitebox_tpu.timeline.oversample import oversample_slow_rows

        BAD = 0.7500000001
        s = random_session(22, rate=48000, bpm=120.0, n_tracks=4, n_clips=2,
                           speeds=(0.5, BAD), src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        slow = ~table.fast
        if not ((table.speed[slow] == 0.5).any() and (table.speed[slow] == BAD).any()):
            pytest.skip("seed produced a one-sided session")
        plan = plan_prerender(table, pool, partial=True)
        assert plan is not None and plan.uncovered_rows is not None
        unc = np.zeros(len(table), bool)
        unc[plan.uncovered_rows] = True
        np.testing.assert_array_equal(unc[slow], table.speed[slow] == BAD)
        t1, p1 = oversample_slow_rows(table, pool, rows=plan.uncovered_rows)
        t2, p2 = apply_prerender_host(t1, p1, plan)
        # residue rows survive as slow rows at U*speed; covered became fast
        slow2 = ~t2.fast
        assert slow2.sum() == len(plan.uncovered_rows)
        U = 4.0
        np.testing.assert_allclose(np.unique(t2.speed[slow2]), U * BAD)

    def test_mixed_bounce_sine_snr_both_paths(self):
        """A mixed session: one sine clip at a rational speed (rides the
        exact polyphase path) and one at a semitone irrational (rides the
        Taylor-corrected prerender). Each must reconstruct its ideal
        resampled sine at high SNR in ONE bounce — the composition the
        round-3 all-or-nothing plan couldn't express."""
        import os
        import tempfile

        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.io import wav
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session import Session

        rate = 48000
        n = rate * 2
        t = np.arange(n) / rate
        x = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
        with tempfile.TemporaryDirectory() as d:
            pth = os.path.join(d, "sine.wav")
            wav.write_wav(pth, x[None], rate, AudioFormat.F32)
            s = Session(bpm=120.0)
            a = s.sample_table.load_from_file(pth)
            tr0 = s.add_track("rational", volume_db=0.0, pan=-1.0)
            tr1 = s.add_track("irrational", volume_db=0.0, pan=1.0)
            s.add_audio_clip(tr0, "r", 0.0, 6.0, asset=a, speed=0.5)
            s.add_audio_clip(tr1, "i", 0.0, 3.0, asset=a, speed=self.IRR)

            table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
            plan = plan_prerender(table, pool, partial=True)
            assert plan is not None and plan.uncovered_rows is None
            res = bounce(s, RATE, interpolation="sinc", engine="pallas")

        out = np.asarray(res.audio)
        m = np.arange(out.shape[1]) / RATE
        # hard-pan isolates the tracks; the -3 dB law scales the hard side
        # by sqrt(2). speed scales the sine's rendered frequency.
        amp = 0.5 * float(np.sqrt(2.0))
        lo, hi = 2000, int(1.5 * RATE)
        for ch, speed, floor_db in ((0, 0.5, 90.0), (1, self.IRR, 90.0)):
            ideal = amp * np.sin(2 * np.pi * 1000.0 * speed * m)
            noise = out[ch, lo:hi] - ideal[lo:hi]
            snr = 10 * np.log10(np.mean(ideal[lo:hi] ** 2)
                                / max(np.mean(noise**2), 1e-30))
            assert snr > floor_db, f"ch{ch} speed {speed}: SNR {snr:.1f} dB"

    def test_mixed_bidirectional_renders(self):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session.clip import ClipMode

        s = self._mixed_session(seed=24, n_tracks=2)
        for c in s.tracks[0].clips:
            c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
        res = bounce(s, RATE, interpolation="sinc")
        assert np.isfinite(res.audio).all()


def _long_clip_session(speed, beats=8.0, freq=1000.0):
    """One long noise-free sine clip at ``speed`` (drives segmentation)."""
    import numpy as np

    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.session import Session
    from whitebox_tpu.session.sample import Sample

    rate = 48000
    n = int(rate * 6)
    t = np.arange(n) / rate
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    s = Session(bpm=120.0)
    a = s.sample_table.add_sample(
        Sample.from_planar(x[None], rate, AudioFormat.F32, name="sine"),
        key="mem:sine")
    tr = s.add_track("t", volume_db=0.0)
    s.add_audio_clip(tr, "c", 0.0, beats, asset=a, speed=speed)
    return s


class TestTaylor:
    """Taylor-corrected prerender (irrational / off-grid phase ramps):
    CF-convergent rational ramp + in-einsum derivative correction."""

    def test_host_matches_per_frame_sinc_definition(self):
        """The corrected block-banded matmul equals the direct per-frame
        Kaiser-sinc evaluation at the TRUE irrational positions to the
        Taylor residual (~1e-5 worst case; typically f32 rounding)."""
        import math

        from whitebox_tpu.ops.mix_pallas import _merge_slow_runs
        from whitebox_tpu.ops.resample import _design_rows

        sp = 0.9183746519
        s = random_session(8, rate=48000, bpm=120.0, n_tracks=1, n_clips=1,
                           speeds=(sp,), src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("carved fast-only")
        plan = plan_prerender(table, pool)
        assert plan is not None
        t2, p2 = apply_prerender_host(table, pool, plan, f64=True)
        raws = sorted(_merge_slow_runs(table), key=lambda r: (r["trk"], r["d0"]))

        def find_raw(trk, d0):
            for r in raws:
                if r["trk"] == trk and r["d0"] <= d0 < r["end"]:
                    return r
            raise AssertionError("segment without parent run")

        half = plan.taps // 2
        err = 0.0
        checked = 0
        for r in plan.runs[:4]:
            rr = find_raw(r.trk, r.d0)
            off = r.d0 - rr["d0"]
            base = int(pool.channel_base[r.sid, 0])
            out_base = int(p2.channel_base[r.new_sid, 0]) + r.k0
            for k in range(0, min(r.L, 2000), 7):
                x = rr["x0"] + (off + k) * rr["speed"]
                ix = math.floor(x)
                rows = _design_rows(np.array([x - ix]), rr["speed"],
                                    plan.taps, 90.0)[0]
                w = pool.data[base + ix - half + 1 : base + ix - half + 1 + plan.taps]
                d = abs(float(w.astype(np.float64) @ rows) - p2.data[out_base + k])
                err = max(err, d)
                checked += 1
        assert checked > 100
        assert err < 2e-5, err

    def test_long_run_segments_and_reanchors(self):
        """A speed whose convergent drift exceeds the budget over the clip
        length must split into re-anchored segments, each within budget,
        tiling the destination contiguously."""
        from whitebox_tpu.timeline.prerender import _TAYLOR_EBUDGET

        golden = 1.6180339887498949
        s = _long_clip_session(golden, beats=8.0)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("carved fast-only")
        plan = plan_prerender(table, pool)
        assert plan is not None
        segs = sorted((p.d0, p.L) for p in plan.runs)
        for (d0a, La), (d0b, _)in zip(segs, segs[1:]):
            assert d0a + La == d0b  # contiguous tiling
        for p in plan.runs:
            assert abs(p.e0) + p.L * abs(p.eps) <= _TAYLOR_EBUDGET + 1e-9

    def test_offgrid_rational_phase_rides_taylor(self):
        """A rational speed whose start phase is off the 1/Q grid (x0*Q
        non-integer) plans as a Taylor group with eps == 0 — pure e0
        correction, no segmentation."""
        from dataclasses import replace as dreplace

        s = _long_clip_session(147.0 / 160.0, beats=2.0)
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        assert not table.fast.all()
        # shift every slow row's phase uniformly off the grid (keeps the
        # run's per-block phase continuity intact)
        frac = table.src_frac.copy()
        frac[~table.fast] += 0.3333
        table = dreplace(table, src_frac=frac)
        plan = plan_prerender(table, pool)
        assert plan is not None
        assert any(p.taylor for p in plan.runs)
        for p in plan.runs:
            if p.taylor:
                assert p.eps == 0.0 and abs(p.e0) <= 0.5 / (p.Qp // math_gcd(p.Pp, p.Qp)) + 1e-9

    def test_device_matches_host_mixed(self):
        """Mixed exact+taylor plan: device ext == host ext (f32)."""
        s = random_session(11, rate=48000, bpm=120.0, n_tracks=2, n_clips=2,
                           speeds=(2.0 ** (1.0 / 12.0), 147.0 / 160.0),
                           src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("carved fast-only")
        plan = plan_prerender(table, pool)
        assert plan is not None
        t2, p2 = apply_prerender_host(table, pool, plan)
        t2d, p2d, pool2d = apply_prerender_device(table, pool, plan)
        np.testing.assert_array_equal(p2.channel_base, p2d.channel_base)
        flat = np.asarray(pool2d).reshape(-1)
        assert np.max(np.abs(flat[: p2.data.shape[0]] - p2.data)) < 1e-6

    def test_device_slab_chunked_matches_unchunked(self, monkeypatch):
        """Big groups render in bounded lax.scan slabs (OOM guard); slab
        boundaries and sub-run padding must not change a single sample.
        Forces chunking by shrinking the slab budget (both branches:
        exact-rational AND taylor)."""
        import whitebox_tpu.timeline.prerender as pr

        s = random_session(13, rate=48000, bpm=120.0, n_tracks=3, n_clips=3,
                           speeds=(2.0 ** (1.0 / 12.0), 147.0 / 160.0,
                                   1.6180339887498949),
                           src_rates=(48000.0,))
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        if table.fast.all():
            pytest.skip("carved fast-only")
        plan = plan_prerender(table, pool)
        assert plan is not None
        kinds = {g[0] for g in plan.groups}
        assert "taylor" in kinds, "session must exercise the taylor branch"
        _, _, full = apply_prerender_device(table, pool, plan)
        ref = np.asarray(full)
        monkeypatch.setattr(pr, "_EXT_SLAB_BYTES", 1 << 16)  # force many slabs
        pr._render_ext_fn = None  # drop the jitted unchunked program
        try:
            _, _, chunked = apply_prerender_device(table, pool, plan)
            np.testing.assert_array_equal(np.asarray(chunked), ref)
        finally:
            pr._render_ext_fn = None  # don't leak the tiny-slab program


def math_gcd(a, b):
    import math

    return math.gcd(a, b)
