"""Hand-scheduled Pallas TPU mix kernel — the speed-of-light fast path.

One ``pallas_call`` renders the WHOLE timeline: grid = (frame_tiles,
tracks), the output tile [C, TILE] stays resident in VMEM while the track
axis iterates (ordered accumulation == the engine's sequential track sum,
engine.cpp:1616), and the hard clip applies on the last track iteration.

Per grid cell, up to K segment "slots" (host-precompiled per (tile, track))
each issue one contiguous DMA per channel from the sample pool — segments
read contiguous source spans at speed 1, so the inner loop is
DMA + clamp + two multiplies + masked accumulate: pure HBM-bandwidth work,
no gathers. Covers speed==1.0 rows (the engine's fast path,
sampler.cpp:106-158 — the dominant case); resampled rows render via
ops.mix's XLA path (render.bounce picks automatically).

Why not XLA for this: the gather formulation measured ~20M gathers/s on a
v5e (0.8x realtime at 128 tracks); this kernel replaces 67M gathers per
chunk with ~2 DMA streams per active (tile, track).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whitebox_tpu.session.session import Session
from whitebox_tpu.timeline.carve import SegmentTable
from whitebox_tpu.timeline.pool import MAX_TILE_FRAMES, SamplePool

DEFAULT_TILE = 32768  # largest window: fewer/bigger DMAs (73->42 ms at 128trk/60s)
MIN_TILE = 1024       # slot-overflow backoff floor (build_plan tile=None)
DEFAULT_K = 8


@dataclass
class PallasMixPlan:
    """Host-precompiled per-(tile, track) slot metadata."""

    row_al: np.ndarray  # [n_tiles, T, K, C] i32 1024-aligned window start / 128 (rows)
    delta: np.ndarray  # [n_tiles, T, K, C] i32 residual shift in [0, 1024)
    ms: np.ndarray  # [n_tiles, T, K] i32 mask start (tile-relative)
    me: np.ndarray  # [n_tiles, T, K] i32 mask end; 0 == inactive slot
    gain: np.ndarray  # [n_tiles, T, K] f32
    clampf: np.ndarray  # [n_tiles, T, K] i32 (1 = clamp normalize)
    fin_start: np.ndarray  # [n_tiles, T, K] i32 fade-in ramp start, tile-relative
    fin_inv: np.ndarray  # [n_tiles, T, K] f32
    fout_end: np.ndarray  # [n_tiles, T, K] i32 fade-out ramp end, tile-relative
    fout_inv: np.ndarray  # [n_tiles, T, K] f32
    # resampled (slow) slots: ds phase at the slot's dst start (ms)
    is_slow: np.ndarray  # [n_tiles, T, K] i32
    sqhi: np.ndarray  # [n_tiles, T, K] i32 window rows touched (rel. to delta>>7)
    sfrac_hi: np.ndarray  # [n_tiles, T, K] f32
    sfrac_lo: np.ndarray  # [n_tiles, T, K] f32
    sspeed_hi: np.ndarray  # [n_tiles, T, K] f32
    sspeed_lo: np.ndarray  # [n_tiles, T, K] f32
    track_gain: np.ndarray  # [T, C] f32
    n_tiles: int
    tile: int
    num_tracks: int
    channels: int
    total_frames: int


class SlowRowsPresent(ValueError):
    """Raised when resampled rows cannot be planned (kept for API compat;
    the kernel now handles resampled slots natively)."""


class SlotOverflow(ValueError):
    """A (tile, track) cell needs more than max_slots segment slots."""


def _merge_slow_runs_soa(table: SegmentTable):
    """Group consecutive per-block resampled rows into maximal runs.

    Rows of one clip are per engine block with exact accumulated offsets;
    a run re-bases the phase at each tile with the f64 closed form
    o0 + (g - dst0)*speed (deviation from the per-block accumulation is a
    few f64 ulps — within the documented resampling contract). Vectorized:
    run breaks at any change of track/sample/speed/gain/fades, a dst gap,
    or a phase discontinuity.

    Returns a dict of per-run column arrays (struct-of-arrays — both
    consumers, build_plan and plan_prerender, are themselves vectorized),
    or None when the table has no slow rows.
    """
    idx = np.nonzero(~table.fast)[0]
    if idx.size == 0:
        return None
    trk = table.track[idx]
    d0 = table.dst_start[idx].astype(np.int64)
    ln = table.length[idx].astype(np.int64)
    sid = table.sample_id[idx]
    x0 = table.src_int[idx].astype(np.float64) + table.src_frac[idx]
    sp = table.speed[idx]
    gn = table.gain[idx]
    fis = table.fin_start[idx]
    fii = table.fin_inv[idx]
    foe = table.fout_end[idx]
    foi = table.fout_inv[idx]

    brk = np.ones(idx.size, dtype=bool)
    if idx.size > 1:
        # phase-continuity tolerance scales with the f64 spacing at the
        # phase magnitude (per-block accumulation rounds a few ulps per
        # block): a fixed absolute epsilon would go shape-dependent at
        # high source offsets (phase ~1e8 has ulp 1.5e-8) and falsely
        # break for very long samples where spacing exceeds it
        x1 = x0[:-1] + ln[:-1] * sp[:-1]
        tol = np.maximum(16.0 * np.spacing(np.maximum(np.abs(x1), np.abs(x0[1:]))), 1e-9)
        cont = (
            (trk[1:] == trk[:-1]) & (sid[1:] == sid[:-1]) & (sp[1:] == sp[:-1])
            & (gn[1:] == gn[:-1]) & (fis[1:] == fis[:-1]) & (fii[1:] == fii[:-1])
            & (foe[1:] == foe[:-1]) & (foi[1:] == foi[:-1])
            & (d0[1:] == d0[:-1] + ln[:-1])
            & (np.abs(x1 - x0[1:]) < tol)
        )
        brk[1:] = ~cont
    starts = np.nonzero(brk)[0]
    ends = np.append(starts[1:], idx.size) - 1
    return {
        "trk": trk[starts].astype(np.int64), "d0": d0[starts],
        "end": d0[ends] + ln[ends], "sid": sid[starts].astype(np.int64),
        "x0": x0[starts], "speed": sp[starts], "gain": gn[starts],
        "fis": fis[starts].astype(np.int64), "fii": fii[starts],
        "foe": foe[starts].astype(np.int64), "foi": foi[starts],
        # original-table row bounds of each run (the slow rows in
        # [row_lo, row_hi] are exactly the run's rows — idx is sorted, so
        # partial prerender can map uncovered runs back to the slow rows
        # it must leave in the table)
        "row_lo": idx[starts], "row_hi": idx[ends],
    }


def _merge_slow_runs(table: SegmentTable):
    """List-of-dicts view of :func:`_merge_slow_runs_soa` (tests/debug)."""
    soa = _merge_slow_runs_soa(table)
    if soa is None:
        return []
    keys = list(soa)
    cols = [soa[k].tolist() for k in keys]
    return [dict(zip(keys, vals)) for vals in zip(*cols)]


def build_plan(
    table: SegmentTable,
    pool: SamplePool,
    session: Session,
    channels: int = 2,
    tile: int | None = None,
    max_slots: int = DEFAULT_K,
) -> PallasMixPlan:
    if tile is None:
        # auto: start at the largest window (fewer, bigger DMAs) and halve
        # on slot overflow — clip-dense sessions land on a smaller tile
        # instead of falling off to the XLA path
        t = DEFAULT_TILE
        while True:
            try:
                return build_plan(table, pool, session, channels, t, max_slots)
            except SlotOverflow:
                if t // 2 < MIN_TILE:
                    raise
                t //= 2
    if tile > MAX_TILE_FRAMES or tile % 128:
        raise ValueError(f"tile must be a multiple of 128 and <= {MAX_TILE_FRAMES}")

    T = table.num_tracks
    n_tiles = -(-table.total_frames // tile)
    R = tile // 128
    # max in-window source index: ixl+3+delta must stay inside (R+16)*128
    # (delta <= 1027 after the w-4 rebase; +3 = the widest poly far tap)
    span_limit = (R + 16) * 128 - 1024 - 10

    fast_mask = table.fast if len(table) else np.zeros(0, dtype=bool)
    any_slow = bool((~fast_mask).any()) if len(table) else False

    # ---- slow slots: merged runs split per tile and per span limit,
    #      expanded vectorized (runs -> tile segments -> max_len sub-slots) ----
    slow = None
    if any_slow:
        soa = _merge_slow_runs_soa(table)
        trk_r, d0_r, end_r, sid_r = soa["trk"], soa["d0"], soa["end"], soa["sid"]
        x0_r, sp_r, gn_r = soa["x0"], soa["speed"], soa["gain"]
        fis_r, fii_r, foe_r, foi_r = soa["fis"], soa["fii"], soa["foe"], soa["foi"]
        # reverse rows (negative speed — LOOP_REVERSE / BIDIRECTIONAL) span
        # the same source width per output frame; bound by |speed|
        maxlen_r = np.maximum(((span_limit - 2) / np.abs(sp_r)).astype(np.int64), 1)

        def _expand(starts, reps):
            tot = int(reps.sum())
            parent = np.repeat(np.arange(starts.shape[0]), reps)
            offs = np.arange(tot) - np.repeat(np.cumsum(reps) - reps, reps)
            return parent, offs

        t0_r = d0_r // tile
        t1_r = (end_r - 1) // tile
        seg_parent, seg_off = _expand(t0_r, t1_r - t0_r + 1)
        ti_s = t0_r[seg_parent] + seg_off
        gs_s = np.maximum(d0_r[seg_parent], ti_s * tile)
        ge_s = np.minimum(end_r[seg_parent], (ti_s + 1) * tile)
        nsub = -(-(ge_s - gs_s) // maxlen_r[seg_parent])
        sub_parent, sub_off = _expand(gs_s, nsub)
        run_of = seg_parent[sub_parent]
        g = gs_s[sub_parent] + sub_off * maxlen_r[run_of]
        ge = np.minimum(g + maxlen_r[run_of], ge_s[sub_parent])
        ti_v = ti_s[sub_parent]

        x_at = x0_r[run_of] + (g - d0_r[run_of]) * sp_r[run_of]
        src_i = np.floor(x_at)
        frac_v = x_at - src_i
        slow = {
            "ti": ti_v, "trk": trk_r[run_of], "ms": (g - ti_v * tile).astype(np.int64),
            "me": (ge - ti_v * tile).astype(np.int64), "sid": sid_r[run_of],
            "src_i": src_i.astype(np.int64), "frac": frac_v, "speed": sp_r[run_of],
            "gain": gn_r[run_of], "fis": fis_r[run_of], "fii": fii_r[run_of],
            "foe": foe_r[run_of], "foi": foi_r[run_of],
        }

    # ---- count slots per (tile, track) to size K ----
    counts = np.zeros((n_tiles, T), dtype=np.int64)
    if fast_mask.any():
        fr = np.nonzero(fast_mask)[0]
        t0s = table.dst_start[fr] // tile
        t1s = (table.dst_start[fr] + table.length[fr] - 1) // tile
        reps = (t1s - t0s + 1).astype(np.int64)
        rows_exp = np.repeat(fr, reps)
        offs = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
        tiles_exp = t0s[np.searchsorted(fr, rows_exp)] + offs
        np.add.at(counts, (tiles_exp, table.track[rows_exp]), 1)
    if slow is not None:
        np.add.at(counts, (slow["ti"], slow["trk"]), 1)
    K = max(int(counts.max()) if counts.size else 1, 1)
    if K > max_slots:
        raise SlotOverflow(f"needs {K} slots per (tile, track), max {max_slots}; lower tile size")

    # ---- native fast path for the fast-row expansion ----
    from whitebox_tpu.io import native as _native
    from whitebox_tpu.ops.dsarith import split_f64

    def _track_gain():
        tg = np.zeros((T, channels), dtype=np.float32)
        for t, track in enumerate(session.tracks):
            vol = np.float32(0.0) if track.mute else track.volume_linear
            pan = track.pan_coeffs
            for ch in range(channels):
                tg[t, ch] = vol * np.float32(pan[ch % 2])
        return tg

    nat = None
    if len(table) and not any_slow:
        nat = _native.build_mix_plan(table, pool, channels, tile, n_tiles, T, K)
    if nat is not None:
        row_al, delta, ms, me, gain, clampf, fin_start, fin_inv, fout_end, fout_inv = nat
        zl = np.zeros((n_tiles, T, K), dtype=np.int32)
        zf = np.zeros((n_tiles, T, K), dtype=np.float32)
        return PallasMixPlan(
            row_al=row_al, delta=delta, ms=ms, me=me, gain=gain, clampf=clampf,
            fin_start=fin_start, fin_inv=fin_inv, fout_end=fout_end, fout_inv=fout_inv,
            is_slow=zl, sqhi=zl.copy(), sfrac_hi=zf, sfrac_lo=zf.copy(),
            sspeed_hi=np.ones_like(zf), sspeed_lo=zf.copy(),
            track_gain=_track_gain(),
            n_tiles=n_tiles, tile=tile, num_tracks=T, channels=channels,
            total_frames=table.total_frames,
        )

    row_al = np.zeros((n_tiles, T, K, channels), dtype=np.int32)
    delta = np.zeros((n_tiles, T, K, channels), dtype=np.int32)
    ms = np.zeros((n_tiles, T, K), dtype=np.int32)
    me = np.zeros((n_tiles, T, K), dtype=np.int32)
    gain = np.zeros((n_tiles, T, K), dtype=np.float32)
    clampf = np.zeros((n_tiles, T, K), dtype=np.int32)
    fin_start = np.full((n_tiles, T, K), -(1 << 30), dtype=np.int32)
    fin_inv = np.ones((n_tiles, T, K), dtype=np.float32)
    fout_end = np.full((n_tiles, T, K), 1 << 30, dtype=np.int32)
    fout_inv = np.ones((n_tiles, T, K), dtype=np.float32)
    is_slow = np.zeros((n_tiles, T, K), dtype=np.int32)
    sqhi = np.zeros((n_tiles, T, K), dtype=np.int32)
    sfrac_hi = np.zeros((n_tiles, T, K), dtype=np.float32)
    sfrac_lo = np.zeros((n_tiles, T, K), dtype=np.float32)
    sspeed_hi = np.ones((n_tiles, T, K), dtype=np.float32)
    sspeed_lo = np.zeros((n_tiles, T, K), dtype=np.float32)
    cursor = np.zeros((n_tiles, T), dtype=np.int32)

    def _fill_window(ti, trk, k, sid, src_i, dst_anchor):
        """w[ch] = channel_base + src_i + dst_anchor; store aligned + delta."""
        for ch in range(channels):
            w = int(pool.channel_base[sid, ch]) + src_i + dst_anchor
            w_al = (w // 1024) * 1024
            row_al[ti, trk, k, ch] = w_al // 128
            delta[ti, trk, k, ch] = w - w_al

    for r in range(len(table)):
        if not table.fast[r]:
            continue
        trk = int(table.track[r])
        dst0 = int(table.dst_start[r])
        dend = dst0 + int(table.length[r])
        sid = int(table.sample_id[r])
        t0 = dst0 // tile
        t1 = (dend - 1) // tile
        for ti in range(t0, t1 + 1):
            g0 = ti * tile
            k = int(cursor[ti, trk])
            cursor[ti, trk] += 1
            _fill_window(ti, trk, k, sid, int(table.src_int[r]), g0 - dst0)
            ms[ti, trk, k] = max(dst0, g0) - g0
            me[ti, trk, k] = min(dend, g0 + tile) - g0
            gain[ti, trk, k] = table.gain[r]
            clampf[ti, trk, k] = 1 if table.clamp[r] else 0
            fin_start[ti, trk, k] = max(int(table.fin_start[r]) - g0, -(1 << 30))
            fin_inv[ti, trk, k] = table.fin_inv[r]
            fout_end[ti, trk, k] = min(int(table.fout_end[r]) - g0, 1 << 30)
            fout_inv[ti, trk, k] = table.fout_inv[r]

    if slow is not None:
        ti_v, trk_v = slow["ti"], slow["trk"]
        # slot index: fast cursor base + rank within each (tile, track)
        key = ti_v * T + trk_v
        order = np.argsort(key, kind="stable")
        ks = key[order]
        # rank within each (tile, track) group (stable sort keeps slot order)
        rank_sorted = np.arange(ks.shape[0]) - np.searchsorted(ks, ks, side="left")
        rank = np.empty(ks.shape[0], dtype=np.int64)
        rank[order] = rank_sorted
        k_v = cursor[ti_v, trk_v].astype(np.int64) + rank

        g0_v = ti_v * tile
        span_v = np.ceil(slow["frac"] + (slow["me"] - slow["ms"]) * np.abs(slow["speed"])).astype(np.int64) + 2
        fh, fl = split_f64(slow["frac"])
        sh, sl = split_f64(slow["speed"])

        idx = (ti_v, trk_v, k_v)
        ms[idx] = slow["ms"]
        me[idx] = slow["me"]
        gain[idx] = slow["gain"]
        clampf[idx] = 0  # the linear resample path never clamps
        is_slow[idx] = 1
        sqhi[idx] = span_v // 128 + 2
        sfrac_hi[idx] = fh
        sfrac_lo[idx] = fl
        sspeed_hi[idx] = sh
        sspeed_lo[idx] = sl
        fin_start[idx] = np.maximum(slow["fis"] - g0_v, -(1 << 30))
        fin_inv[idx] = slow["fii"]
        fout_end[idx] = np.minimum(slow["foe"] - g0_v, 1 << 30)
        fout_inv[idx] = slow["foi"]
        # reverse slots advance toward LOWER source indices: align the DMA
        # window at the slot's *lowest* touched position (the phase at the
        # last output frame) so in-window indices m = ixl + delta stay >= 0;
        # forward slots keep disp == 0
        disp_v = np.where(
            slow["speed"] < 0.0,
            np.floor((slow["me"] - slow["ms"] - 1).astype(np.float64) * slow["speed"]),
            0.0,
        ).astype(np.int64)
        for ch in range(channels):
            w = pool.channel_base[slow["sid"], ch].astype(np.int64) + slow["src_i"]
            # rebase the window four samples early so every early
            # interpolation tap (catmull m-1, poly m-2) is in-window
            # (delta in [4, 1027] forward, [span+4, span+1027] reverse; the
            # pool's lead guard keeps w-4 >= 0); transparent to linear
            w_al = ((w + disp_v - 4) // 1024) * 1024
            row_al[ti_v, trk_v, k_v, ch] = w_al // 128
            delta[ti_v, trk_v, k_v, ch] = w - w_al

    return PallasMixPlan(
        row_al=row_al, delta=delta, ms=ms, me=me, gain=gain, clampf=clampf,
        fin_start=fin_start, fin_inv=fin_inv, fout_end=fout_end, fout_inv=fout_inv,
        is_slow=is_slow, sqhi=sqhi, sfrac_hi=sfrac_hi, sfrac_lo=sfrac_lo,
        sspeed_hi=sspeed_hi, sspeed_lo=sspeed_lo,
        track_gain=_track_gain(),
        n_tiles=n_tiles, tile=tile, num_tracks=T, channels=channels,
        total_frames=table.total_frames,
    )


def _lane_eval_kernel(xs_ref, ys_ref, cv_ref, tn_ref, g, simple: bool):
    """In-kernel mirror of ops.automation.eval_lane_device: static sweep
    over the lane's breakpoints with elementwise selects on [R, 128].

    ``simple``: every point in the whole lane table is LINEAR (trace-time
    fact) — skips the transcendental curve family entirely."""
    from whitebox_tpu.ops.automation import _SENTINEL, _apply_curve

    P = xs_ref.shape[-1]
    val = jnp.full(g.shape, ys_ref[0, 0, 0], dtype=jnp.float32)
    for i in range(P - 1):
        x0 = xs_ref[0, 0, i]
        x1 = xs_ref[0, 0, i + 1]
        span = jnp.maximum(x1 - x0, 1)
        u = jnp.clip((g - x0).astype(jnp.float32) / span.astype(jnp.float32), 0.0, 1.0)
        u = jnp.where(x1 == _SENTINEL, jnp.float32(0.0), u)  # hold after last point
        if not simple:
            u = _apply_curve(u, cv_ref[0, 0, i], tn_ref[0, 0, i], jnp)
        seg = ys_ref[0, 0, i] + u * (ys_ref[0, 0, i + 1] - ys_ref[0, 0, i])
        val = jnp.where(g >= x0, seg, val)
    return val


def _mix_kernel(K: int, C: int, TILE: int, per_track: bool, interp: str, has_auto, row_al_ref, delta_ref, ms_ref, me_ref, gain_ref, clampf_ref, fis_ref, fii_ref, foe_ref, foi_ref, slow_ref, sqhi_ref, sfh_ref, sfl_ref, ssh_ref, ssl_ref, tg_ref, *rest):
    if has_auto:
        (vxs_ref, vys_ref, vcv_ref, vtn_ref, pxs_ref, pys_ref, pcv_ref, ptn_ref,
         mute_ref, use_ref, pool_ref, out_ref, scratch, sv_ref, sems) = rest
        simple_v, simple_p = has_auto[1], has_auto[2]
    else:
        pool_ref, out_ref, scratch, sv_ref, sems = rest
    t = pl.program_id(1)
    n_tracks = pl.num_programs(1)
    R = TILE // 128  # output rows; scratch windows carry 8 extra rows (1024 elts)

    # kick off all active DMAs first, then compute — overlap DMA with VPU work
    for k in range(K):
        active = me_ref[0, 0, 0, k] > ms_ref[0, 0, 0, k]
        for ch in range(C):
            @pl.when(active)
            def _():
                start_row = pl.multiple_of(row_al_ref[0, 0, k, ch], 8)
                pltpu.make_async_copy(
                    pool_ref.at[pl.ds(start_row, R + 16)],
                    scratch.at[k, ch],
                    sems.at[k, ch],
                ).start()

    if per_track:
        out_ref[:] = jnp.zeros_like(out_ref)
    else:
        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    pos = row_i * 128 + lane_i
    lane_big = jax.lax.broadcasted_iota(jnp.int32, (R + 16, 128), 1)

    # per-frame automation gains, evaluated IN-KERNEL per (tile, track):
    # automation-only sessions stay on the fused single-pass mix instead of
    # materializing [T, C, F] per-track buffers for a finisher (2 extra
    # HBM streams). Math mirrors effects_pipeline._frame_gains exactly.
    if has_auto and not per_track:
        posg = pl.program_id(0) * TILE + pos  # global frame index [R, 128]
        vol = _lane_eval_kernel(vxs_ref, vys_ref, vcv_ref, vtn_ref, posg, simple_v)
        panv = _lane_eval_kernel(pxs_ref, pys_ref, pcv_ref, ptn_ref, posg, simple_p)
        use = use_ref[0, 0, 0] == 1
        sqrt2 = jnp.float32(np.sqrt(2.0))
        halfpi = jnp.float32(0.5 * np.pi)
        px = 0.5 * (panv + 1.0)
        gvec = []
        for ch in range(C):
            arg = (1.0 - px) if ch % 2 == 0 else px
            coef = (jnp.sin(halfpi * arg) * sqrt2).astype(jnp.float32)
            ga = (vol * coef) * mute_ref[0, 0, 0]
            gvec.append(jnp.where(use, ga, tg_ref[0, 0, ch]))

    for k in range(K):
        active = me_ref[0, 0, 0, k] > ms_ref[0, 0, 0, k]
        for ch in range(C):
            @pl.when(active)
            def _():
                start_row = pl.multiple_of(row_al_ref[0, 0, k, ch], 8)
                pltpu.make_async_copy(
                    pool_ref.at[pl.ds(start_row, R + 16)],
                    scratch.at[k, ch],
                    sems.at[k, ch],
                ).wait()
                delta = delta_ref[0, 0, k, ch]
                win = scratch[k, ch]  # [R+10, 128]
                is_slow = slow_ref[0, 0, 0, k] == 1

                def fast_value():
                    # shift the aligned window by delta = 128*q + r:
                    # y[p] = window[p + delta] via dynamic sublane+lane rotates
                    q = delta >> 7
                    r = delta & 127
                    n_rows = R + 16
                    rows_q = pltpu.roll(win, (n_rows - q) % n_rows, axis=0)
                    rows_q1 = pltpu.roll(win, (n_rows - q - 1) % n_rows, axis=0)
                    a1 = pltpu.roll(rows_q, (128 - r) % 128, axis=1)
                    a2 = pltpu.roll(rows_q1, (128 - r) % 128, axis=1)
                    v = jnp.where(lane_big < 128 - r, a1, a2)[:R, :]
                    clamped = jnp.minimum(jnp.maximum(v, -1.0), 1.0)
                    return jnp.where(clampf_ref[0, 0, 0, k] == 1, clamped, v)

                def slow_value():
                    # resampled slot: ds phase + per-lane window gather, one
                    # GROUP of 8 output rows at a time. The source index is
                    # monotone in the output position, so a group only
                    # touches ~8*speed+2 consecutive window rows (dynamic
                    # fori bounds from the group-edge phases) and each
                    # gather is a natively-tiled [8,128] in-row shuffle —
                    # ~8x less shuffle work than sweeping the whole window
                    # against [R,128] per chunk.
                    from whitebox_tpu.ops.dsarith import phase_eval

                    G = min(16, R)  # group must fit the tile (tests use tiny tiles)
                    ms_k = ms_ref[0, 0, 0, k]
                    me_k = me_ref[0, 0, 0, k]
                    fh = sfh_ref[0, 0, 0, k]
                    fl = sfl_ref[0, 0, 0, k]
                    sh = ssh_ref[0, 0, 0, k]
                    sl = ssl_ref[0, 0, 0, k]
                    pos_g = (
                        jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0) * 128
                        + jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
                    )

                    # interpolation mode -> tap offsets (trace-time static)
                    if isinstance(interp, tuple) and interp and interp[0] == "poly":
                        coeffs = interp[1]
                        taps = [int(kk) - (len(coeffs) // 2 - 1) for kk in range(len(coeffs))]
                    elif interp == "catmull":
                        taps = [-1, 0, 1, 2]
                    else:
                        taps = [0, 1]
                    lo_tap, hi_tap = -min(taps), max(taps)

                    def group_body(gi, carry):
                        base = gi * (G * 128)
                        j = jnp.maximum(base + pos_g - ms_k, 0)
                        ixl, fx = phase_eval(j, fh, fl, sh, sl)
                        m = ixl + delta
                        # scalar chunk bounds from the group-edge phases
                        # (min/max: reverse slots descend, forward ascend)
                        ix0, _ = phase_eval(jnp.maximum(base - ms_k, 0), fh, fl, sh, sl)
                        ixe, _ = phase_eval(jnp.maximum(base + G * 128 - 1 - ms_k, 0), fh, fl, sh, sl)
                        lo_ix = jnp.minimum(ix0, ixe)
                        hi_ix = jnp.maximum(ix0, ixe)
                        q0 = jnp.clip((lo_ix - lo_tap + delta) >> 7, 0, R + 15)
                        q1 = jnp.clip(((hi_ix + hi_tap + delta) >> 7) + 1, q0 + 1, R + 16)
                        qs = [(m + kk) >> 7 for kk in taps]
                        rs = [(m + kk) & 127 for kk in taps]

                        def chunk_body(wq, accs):
                            wrow = jnp.broadcast_to(scratch[k, ch, pl.ds(wq, 1), :], (G, 128))
                            return tuple(
                                jnp.where(q == wq, jnp.take_along_axis(wrow, rr, axis=1), acc)
                                for q, rr, acc in zip(qs, rs, accs)
                            )

                        zero = jnp.zeros((G, 128), jnp.float32)
                        vals = jax.lax.fori_loop(q0, q1, chunk_body, (zero,) * len(taps))
                        if isinstance(interp, tuple):
                            res = jnp.zeros((G, 128), jnp.float32)
                            for krow, v in zip(coeffs, vals):
                                wk = jnp.float32(krow[-1])
                                for mm in range(len(krow) - 2, -1, -1):
                                    wk = wk * fx + jnp.float32(krow[mm])
                                res = res + wk * v
                            sv_ref[pl.ds(gi * G, G), :] = res
                        elif interp == "catmull":
                            pm1, a, b, p2 = vals
                            # uniform Catmull-Rom, same op order as ops/mix.py
                            c1 = 0.5 * (b - pm1)
                            c2 = pm1 - 2.5 * a + 2.0 * b - 0.5 * p2
                            c3 = 0.5 * (p2 - pm1) + 1.5 * (a - b)
                            sv_ref[pl.ds(gi * G, G), :] = a + fx * (c1 + fx * (c2 + fx * c3))
                        else:
                            a, b = vals
                            sv_ref[pl.ds(gi * G, G), :] = a + fx * (b - a)  # sampler.cpp:55
                        return carry

                    g_lo = ms_k // (G * 128)
                    g_hi = (me_k + G * 128 - 1) // (G * 128)
                    g_hi = jnp.where(is_slow, g_hi, g_lo)  # fast slots: no groups
                    jax.lax.fori_loop(g_lo, g_hi, group_body, 0)
                    return sv_ref[:]

                v = jnp.where(is_slow, slow_value(), fast_value())
                mask = (pos >= ms_ref[0, 0, 0, k]) & (pos < me_ref[0, 0, 0, k])
                # clip fade envelope (no-fade rows use +-2^30 anchors: env==1)
                env = jnp.clip((pos - fis_ref[0, 0, 0, k]).astype(jnp.float32) * fii_ref[0, 0, 0, k], 0.0, 1.0)
                env = env * jnp.clip((foe_ref[0, 0, 0, k] - pos).astype(jnp.float32) * foi_ref[0, 0, 0, k], 0.0, 1.0)
                scaled = (v * gain_ref[0, 0, 0, k]) * env
                if not per_track:
                    # track volume*pan folds in here; per-track outputs leave
                    # it to the effects pipeline (chains run pre-gain,
                    # track.cpp:648-662 ordering)
                    if has_auto:
                        scaled = scaled * gvec[ch]
                    else:
                        scaled = scaled * tg_ref[0, 0, ch]
                contrib = jnp.where(mask, scaled, 0.0)
                if per_track:
                    out_ref[0, ch] += contrib  # block [1, C, R, 128]
                else:
                    out_ref[ch] += contrib  # block [C, R, 128]

    if not per_track:
        @pl.when(t == n_tracks - 1)
        def _():
            o = out_ref[:]
            o = jnp.where(o > 1.0, jnp.float32(1.0), o)
            out_ref[:] = jnp.where(o < -1.0, jnp.float32(-1.0), o)


@functools.partial(jax.jit, static_argnames=("n_tiles", "num_tracks", "K", "C", "TILE", "interpret", "per_track", "interp", "has_auto"))
def _mix_call(pool2d, row_al, delta, ms, me, gain, clampf, fis, fii, foe, foi, slow, sqhi, sfh, sfl, ssh, ssl, tg, *auto, n_tiles, num_tracks, K, C, TILE, interpret=False, per_track=False, interp="linear", has_auto=False):
    kernel = functools.partial(_mix_kernel, K, C, TILE, per_track, interp, has_auto)
    grid = (n_tiles, num_tracks)
    R = TILE // 128
    if per_track:
        out_specs = pl.BlockSpec((1, C, R, 128), lambda i, t: (t, 0, i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((num_tracks, C, n_tiles * R, 128), jnp.float32)
    else:
        out_specs = pl.BlockSpec((C, R, 128), lambda i, t: (0, i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, n_tiles * R, 128), jnp.float32)
    auto_specs = []
    if has_auto:
        # lane breakpoint tables [T, 1, P] (+ [T, 1, 1] flags), one track
        # row per grid cell in SMEM (trailing block dims must equal the
        # array dims for the TPU lowering)
        for a in auto[:8]:
            Pn = a.shape[-1]
            auto_specs.append(pl.BlockSpec((1, 1, Pn), lambda i, t: (t, 0, 0),
                                           memory_space=pltpu.SMEM))
        auto_specs += [pl.BlockSpec((1, 1, 1), lambda i, t: (t, 0, 0),
                                    memory_space=pltpu.SMEM)
                       for _ in auto[8:]]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, K, C), lambda i, t: (i, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K, C), lambda i, t: (i, t, 0, 0), memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((1, 1, 1, K), lambda i, t: (i, t, 0, 0), memory_space=pltpu.SMEM)
            for _ in range(14)
        ] + [
            pl.BlockSpec((1, 1, C), lambda i, t: (t, 0, 0), memory_space=pltpu.SMEM),
        ] + auto_specs + [
            pl.BlockSpec(memory_space=pl.ANY),  # pool stays in HBM
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K, C, R + 16, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),  # slow-slot per-row results
            pltpu.SemaphoreType.DMA((K, C)),
        ],
        interpret=interpret,
    )(row_al, delta, ms, me, gain, clampf, fis, fii, foe, foi, slow, sqhi, sfh, sfl, ssh, ssl, tg, *auto, pool2d)


class PallasMixRenderer:
    """Holds device-resident tables; call to render (one pallas_call)."""

    def __init__(self, table: SegmentTable, pool: SamplePool, session: Session,
                 channels: int = 2, tile: int | None = None, interpret: bool = False,
                 plan: PallasMixPlan | None = None, interp: str = "linear",
                 pool_device=None, auto_tables=None) -> None:
        # Mosaic only compiles on TPU; CPU (tests / virtual meshes) interprets
        interpret = interpret or jax.default_backend() == "cpu"
        self.plan = plan or build_plan(table, pool, session, channels=channels, tile=tile)
        p = self.plan
        nt, T, K = p.ms.shape
        if pool_device is None:
            # one batched device_put: per-array transfers pay full
            # round-trip latency each on relayed/remote devices
            pool2d = pool.data
            if pool2d.shape[0] % 128:
                pool2d = np.pad(pool2d, (0, 128 - pool2d.shape[0] % 128))
            pool2d = pool2d.reshape(-1, 128)
        else:
            # repeated renders of one session: samples stay device-resident
            pool2d = pool_device
        self._args = jax.device_put((
            pool2d,
            p.row_al, p.delta,
            p.ms.reshape(nt, T, 1, K), p.me.reshape(nt, T, 1, K),
            p.gain.reshape(nt, T, 1, K), p.clampf.reshape(nt, T, 1, K),
            p.fin_start.reshape(nt, T, 1, K), p.fin_inv.reshape(nt, T, 1, K),
            p.fout_end.reshape(nt, T, 1, K), p.fout_inv.reshape(nt, T, 1, K),
            p.is_slow.reshape(nt, T, 1, K), p.sqhi.reshape(nt, T, 1, K),
            p.sfrac_hi.reshape(nt, T, 1, K), p.sfrac_lo.reshape(nt, T, 1, K),
            p.sspeed_hi.reshape(nt, T, 1, K), p.sspeed_lo.reshape(nt, T, 1, K),
            p.track_gain.reshape(p.num_tracks, 1, p.channels),
        ))
        poly_ok = isinstance(interp, tuple) and len(interp) == 2 and interp[0] == "poly"
        if interp not in ("linear", "catmull") and not poly_ok:
            raise ValueError(
                f"pallas mix interp must be linear, catmull, or ('poly', coeffs); got {interp!r}")
        has_auto = False
        if auto_tables is not None:
            # volume/pan lane breakpoint tables (effects_pipeline.
            # prepare_automation_tables_host format — HOST numpy: the
            # trace-time `simple` flags below read the curve tables, and a
            # readback of device-resident lanes stalls on the axon relay)
            # for IN-KERNEL per-frame gain evaluation — automation-only
            # sessions render in the one fused pass (render_device)
            # instead of per-track + finisher
            from whitebox_tpu.ops.automation import CurveType

            volh, panh, mute, use = auto_tables
            r3 = lambda a: np.ascontiguousarray(
                np.asarray(a).reshape(a.shape[0], 1, -1))
            lanes = (r3(volh["xs"]), r3(volh["ys"]), r3(volh["cv"]), r3(volh["tn"]),
                     r3(panh["xs"]), r3(panh["ys"]), r3(panh["cv"]), r3(panh["tn"]),
                     r3(np.asarray(mute, np.float32)),
                     r3(np.asarray(use, np.int32)))
            self._args = self._args + tuple(jax.device_put(jnp.asarray(a)) for a in lanes)
            from whitebox_tpu.ops.automation import _SENTINEL

            def simple(lane):
                # slot i's curve only evaluates when a segment [i, i+1)
                # exists — padded/terminal slots never interpolate
                cv, xs = np.asarray(lane["cv"]), np.asarray(lane["xs"])
                seg = xs[:, 1:] != _SENTINEL
                return bool((~seg | (cv[:, :-1] == int(CurveType.LINEAR))).all())

            has_auto = (True, simple(volh), simple(panh))
        self._kw = dict(n_tiles=p.n_tiles, num_tracks=p.num_tracks, K=K,
                        C=p.channels, TILE=p.tile, interpret=interpret, interp=interp,
                        has_auto=has_auto)
        self.pool_device = self._args[0]

    def render_device(self):
        """Full render, output stays on device: [C, n_tiles*R, 128] f32."""
        return _mix_call(*self._args, **self._kw)

    def render_device_per_track(self):
        """Per-track pre-gain buffers on device: [T, C, n_tiles*R, 128] f32.

        Track volume/pan is NOT applied (effect chains run pre-gain); use
        render.effects_pipeline to finish the mix.
        """
        return _mix_call(*self._args, **self._kw, per_track=True)

    def render_device_looped(self, n: int = 16):
        """ONE dispatch, ``n`` back-to-back kernel executions (summed).

        Measurement fence for fast renders: a single headline mix runs in
        ~the dispatch round-trip of a relay-attached chip, so a one-shot
        fence can't resolve its device window. The slot-gain table is
        scaled by a RUNTIME ones-vector indexed by the loop counter, so
        XLA can neither CSE the iterations nor hoist the kernel out of
        the ``fori_loop``; with scale==1 every iteration computes the
        exact render. Device window per render = (t - dispatch) / n.
        """
        kw = self._kw

        @jax.jit
        def run(scale, *a):
            sh = jax.eval_shape(lambda *x: _mix_call(*x, **kw), *a)

            def body(i, acc):
                g = a[5] * scale[i]
                out = _mix_call(*a[:5], g, *a[6:], **kw)
                return acc + out

            return jax.lax.fori_loop(
                0, scale.shape[0], body,
                jnp.zeros(sh.shape, sh.dtype))

        scale = jnp.ones((n,), jnp.float32)
        return run(scale, *self._args)

    def render(self) -> np.ndarray:
        out = np.asarray(self.render_device())
        return out.reshape(self.plan.channels, -1)[:, : self.plan.total_frames]


def render_timeline_pallas(
    table: SegmentTable,
    pool: SamplePool,
    session: Session,
    channels: int = 2,
    tile: int | None = None,
    interpret: bool = False,
    plan: PallasMixPlan | None = None,
    interp: str = "linear",
) -> np.ndarray:
    """Render the full carved timeline with the Pallas kernel -> [C, F] np.f32.

    ``interp`` applies to resampled (slow) rows: "linear" (reference parity)
    or "catmull" (4-point Catmull-Rom, two extra in-window taps per frame).
    """
    r = PallasMixRenderer(table, pool, session, channels=channels, tile=tile,
                          interpret=interpret, plan=plan, interp=interp)
    return r.render()
