"""The timeline mix as an XLA program over ``[tracks, channels, frames]``.

Fuses the engine's whole per-block pipeline — event lookup, sample fetch
with linear interpolation (sampler.cpp:34-59,106-158), clip gain, track
volume·pan (track.cpp:728-733), ordered track sum (engine.cpp:1616) and the
hard clip (engine.cpp:1627) — into one jitted chunk renderer driven by the
carve's segment tables.

Parity: with ``strict_order=True`` (default) tracks are summed in index
order via ``lax.scan``, matching the engine's sequential adds bit-for-bit.
``strict_order=False`` lets XLA tree-reduce (faster at very high track
counts, associativity documented as relaxed).

This is the portable XLA formulation (gather-based); the hand-scheduled
Pallas kernel in ops.mix_pallas accelerates the dominant speed==1 path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.ops.dsarith import phase_eval, split_f64
from whitebox_tpu.session.session import Session
from whitebox_tpu.timeline.carve import SegmentTable
from whitebox_tpu.timeline.pool import SamplePool

_I32_SENTINEL = np.int32(2**31 - 1)


@dataclass
class DeviceTables:
    """Segment tables padded per track for the device: all [T, S] (+[T,S,C])."""

    dst_start: np.ndarray  # [T, S] i32, padded with INT32_MAX (sorted per track)
    length: np.ndarray  # [T, S] i32 (0 padding)
    src_base: np.ndarray  # [T, S, C] i32: channel_base + src_int
    frac_hi: np.ndarray  # [T, S] f32
    frac_lo: np.ndarray  # [T, S] f32
    speed_hi: np.ndarray  # [T, S] f32
    speed_lo: np.ndarray  # [T, S] f32
    gain: np.ndarray  # [T, S] f32
    fast: np.ndarray  # [T, S] bool
    clamp: np.ndarray  # [T, S] bool
    fin_start: np.ndarray  # [T, S] i32 fade-in ramp start (global frame)
    fin_inv: np.ndarray  # [T, S] f32
    fout_end: np.ndarray  # [T, S] i32 fade-out ramp end
    fout_inv: np.ndarray  # [T, S] f32
    track_gain: np.ndarray  # [T, C] f32 (volume * pan per channel)
    total_frames: int
    num_tracks: int
    channels: int

    def as_jax(self):
        return {
            "dst_start": jnp.asarray(self.dst_start),
            "length": jnp.asarray(self.length),
            "src_base": jnp.asarray(self.src_base),
            "frac_hi": jnp.asarray(self.frac_hi),
            "frac_lo": jnp.asarray(self.frac_lo),
            "speed_hi": jnp.asarray(self.speed_hi),
            "speed_lo": jnp.asarray(self.speed_lo),
            "gain": jnp.asarray(self.gain),
            "fast": jnp.asarray(self.fast),
            "clamp": jnp.asarray(self.clamp),
            "fin_start": jnp.asarray(self.fin_start),
            "fin_inv": jnp.asarray(self.fin_inv),
            "fout_end": jnp.asarray(self.fout_end),
            "fout_inv": jnp.asarray(self.fout_inv),
            "track_gain": jnp.asarray(self.track_gain),
        }


def pack_device_tables(
    table: SegmentTable, pool: SamplePool, session: Session, channels: int = 2, pad_tracks_to: int | None = None
) -> DeviceTables:
    T = table.num_tracks if pad_tracks_to is None else max(pad_tracks_to, table.num_tracks)
    counts = np.bincount(table.track, minlength=T) if len(table) else np.zeros(T, dtype=np.int64)
    S = max(int(counts.max()) if counts.size else 1, 1)

    dst_start = np.full((T, S), _I32_SENTINEL, dtype=np.int32)
    length = np.zeros((T, S), dtype=np.int32)
    src_base = np.zeros((T, S, channels), dtype=np.int32)
    frac_hi = np.zeros((T, S), dtype=np.float32)
    frac_lo = np.zeros((T, S), dtype=np.float32)
    speed_hi = np.ones((T, S), dtype=np.float32)
    speed_lo = np.zeros((T, S), dtype=np.float32)
    gain = np.zeros((T, S), dtype=np.float32)
    fast = np.ones((T, S), dtype=bool)
    clamp = np.zeros((T, S), dtype=bool)
    fin_start = np.full((T, S), -(1 << 30), dtype=np.int32)
    fin_inv = np.ones((T, S), dtype=np.float32)
    fout_end = np.full((T, S), 1 << 30, dtype=np.int32)
    fout_inv = np.ones((T, S), dtype=np.float32)

    if len(table):
        fh, fl = split_f64(table.src_frac)
        sh, sl = split_f64(table.speed)
        # Rows are emitted sorted by (track, dst_start); resampled sessions
        # produce one row per block (~700k rows for 60s @ 128 tracks), so this
        # must be a vectorized scatter, not a Python loop. Slot index = rank
        # within track: row position minus the track's first-row offset.
        trk = table.track.astype(np.int64)
        if trk.size > 1 and np.any(np.diff(trk) < 0):
            order = np.argsort(trk, kind="stable")  # defensive; normally a no-op
        else:
            order = np.arange(trk.size)
        t_idx = trk[order]
        row_offset = np.zeros(T + 1, dtype=np.int64)
        np.cumsum(np.bincount(t_idx, minlength=T), out=row_offset[1:])
        slot = np.arange(t_idx.size) - row_offset[t_idx]

        dst_start[t_idx, slot] = table.dst_start[order]
        length[t_idx, slot] = table.length[order]
        sid = table.sample_id[order].astype(np.int64)
        src_base[t_idx, slot, :] = (
            pool.channel_base[sid][:, :channels].astype(np.int64) + table.src_int[order][:, None]
        ).astype(np.int64)
        frac_hi[t_idx, slot] = fh[order]
        frac_lo[t_idx, slot] = fl[order]
        speed_hi[t_idx, slot] = sh[order]
        speed_lo[t_idx, slot] = sl[order]
        gain[t_idx, slot] = table.gain[order]
        fast[t_idx, slot] = table.fast[order]
        clamp[t_idx, slot] = table.clamp[order]
        fin_start[t_idx, slot] = table.fin_start[order]
        fin_inv[t_idx, slot] = table.fin_inv[order]
        fout_end[t_idx, slot] = table.fout_end[order]
        fout_inv[t_idx, slot] = table.fout_inv[order]

    track_gain = np.zeros((T, channels), dtype=np.float32)
    for t, track in enumerate(session.tracks):
        vol = np.float32(0.0) if track.mute else track.volume_linear
        pan = track.pan_coeffs
        for ch in range(channels):
            track_gain[t, ch] = vol * np.float32(pan[ch % 2])

    return DeviceTables(
        dst_start=dst_start, length=length, src_base=src_base,
        frac_hi=frac_hi, frac_lo=frac_lo, speed_hi=speed_hi, speed_lo=speed_lo,
        gain=gain, fast=fast, clamp=clamp,
        fin_start=fin_start, fin_inv=fin_inv, fout_end=fout_end, fout_inv=fout_inv,
        track_gain=track_gain,
        total_frames=table.total_frames, num_tracks=T, channels=channels,
    )


def _bisect_right(a, v):
    """Branchless binary search: index of first a[i] > v (a sorted, [S]; v [F]).

    jnp.searchsorted lowers poorly on TPU for vmapped lookups (can
    materialize [F, S] comparisons -> OOM at session scale); this is
    ceil(log2(S+1)) rounds of [F]-sized gathers instead.
    """
    S = a.shape[0]
    lo = jnp.zeros(v.shape, dtype=jnp.int32)
    hi = jnp.full(v.shape, S, dtype=jnp.int32)
    steps = max(int(np.ceil(np.log2(S + 1))), 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        pred = a[jnp.clip(mid, 0, S - 1)] <= v
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def _track_contrib(pool, g, dst_start, length, src_base, frac_hi, frac_lo, speed_hi, speed_lo, gain, fast, clamp,
                   fin_start, fin_inv, fout_end, fout_inv, sinc_bank=None, interp: str = "linear"):
    """Per-track contribution for global frames ``g`` [F] -> [C, F] f32.

    ``sinc_bank`` (optional [phases+1, taps] f32): windowed-sinc taps for
    resampled rows instead of the engine's linear interpolation (fast rows
    are untouched either way — bit parity holds).

    ``interp="catmull"`` selects 4-point Catmull-Rom for resampled rows —
    the mode the reference *starts* (sample_catmull_rom computes all four
    neighbors, sampler.cpp:61-86) but never finishes (the function writes
    nothing); this completes it with the standard uniform Catmull-Rom
    polynomial over those same four points.
    """
    idx = _bisect_right(dst_start, g) - 1
    idx_c = jnp.clip(idx, 0, dst_start.shape[0] - 1)

    ds0 = dst_start[idx_c]
    ln = length[idx_c]
    valid = (idx >= 0) & (g >= ds0) & (g < ds0 + ln)

    j = (g - ds0).astype(jnp.int32)
    j = jnp.where(valid, j, 0)

    row_fast = fast[idx_c]
    row_clamp = clamp[idx_c]
    row_gain = gain[idx_c]

    # clip fade envelope (linear ramps; identity rows use +-2^30 anchors so
    # env == 1 exactly and bit-parity is preserved)
    env = jnp.clip((g - fin_start[idx_c]).astype(jnp.float32) * fin_inv[idx_c], 0.0, 1.0)
    env = env * jnp.clip((fout_end[idx_c] - g).astype(jnp.float32) * fout_inv[idx_c], 0.0, 1.0)

    ixl, fx = phase_eval(j, frac_hi[idx_c], frac_lo[idx_c], speed_hi[idx_c], speed_lo[idx_c])
    ixl = jnp.where(row_fast, j, ixl)
    fx = jnp.where(row_fast, jnp.float32(0.0), fx)

    # Channels unrolled so every intermediate is a flat [F] vector — a
    # trailing channels dim of 2 would tile-pad 64x on TPU (8,128) layout.
    limit = pool.shape[0] - 2
    clamp_row = row_fast & row_clamp
    if sinc_bank is not None:
        phases = sinc_bank.shape[0] - 1
        taps = sinc_bank.shape[1]
        half = taps // 2
        pf = fx * phases
        p0 = jnp.clip(pf.astype(jnp.int32), 0, phases - 1)
        pl = pf - p0.astype(jnp.float32)
    outs = []
    for ch in range(src_base.shape[1]):
        src = jnp.clip(src_base[idx_c, ch] + ixl, 0, limit)
        a = pool[src]
        a_eff = jnp.where(clamp_row, jnp.clip(a, jnp.float32(-1.0), jnp.float32(1.0)), a)
        if sinc_bank is None and isinstance(interp, tuple) and interp and interp[0] == "poly":
            # LS-optimal polynomial taps over an oversampled pool
            # (ops/resample.design_poly_interp; timeline/oversample.py)
            coeffs = interp[1]
            k0 = -(len(coeffs) // 2 - 1)
            acc = jnp.zeros_like(a)
            for ki, krow in enumerate(coeffs):
                wk = jnp.float32(krow[-1])
                for mm in range(len(krow) - 2, -1, -1):
                    wk = wk * fx + jnp.float32(krow[mm])
                acc = acc + wk * pool[jnp.clip(src + (k0 + ki), 0, limit)]
            s = jnp.where(row_fast, a_eff, acc)
        elif sinc_bank is None and interp == "catmull":
            pm1 = pool[jnp.clip(src - 1, 0, limit)]
            b = pool[src + 1]
            p2 = pool[jnp.clip(src + 2, 0, limit)]
            # uniform Catmull-Rom over (p[-1], p[0], p[1], p[2])
            c1 = 0.5 * (b - pm1)
            c2 = pm1 - 2.5 * a + 2.0 * b - 0.5 * p2
            c3 = 0.5 * (p2 - pm1) + 1.5 * (a - b)
            cr = a + fx * (c1 + fx * (c2 + fx * c3))
            s = jnp.where(row_fast, a_eff, cr)
        elif sinc_bank is None:
            b = pool[src + 1]
            s = jnp.where(row_fast, a_eff, a + fx * (b - a))
        else:
            acc = jnp.zeros_like(a)
            for k in range(taps):
                w = sinc_bank[p0, k] + pl * (sinc_bank[p0 + 1, k] - sinc_bank[p0, k])
                acc = acc + w * pool[jnp.clip(src + (k - half + 1), 0, limit)]
            s = jnp.where(row_fast, a_eff, acc)
        outs.append(jnp.where(valid, (s * row_gain) * env, jnp.float32(0.0)))
    return jnp.stack(outs)  # [C, F]


@functools.partial(jax.jit, static_argnames=("frames", "strict_order", "interp"))
def render_chunk(pool, tables, chunk_start, frames: int, strict_order: bool = True, sinc_bank=None,
                 interp: str = "linear"):
    """Render ``frames`` output frames starting at ``chunk_start`` -> [C, F]."""
    g = chunk_start + jnp.arange(frames, dtype=jnp.int32)

    contribs = jax.vmap(
        lambda d, l, sb, fh, fl, sh, sl, gn, fs, cl, f0, f1, f2, f3: _track_contrib(
            pool, g, d, l, sb, fh, fl, sh, sl, gn, fs, cl, f0, f1, f2, f3, sinc_bank, interp
        )
    )(
        tables["dst_start"], tables["length"], tables["src_base"],
        tables["frac_hi"], tables["frac_lo"], tables["speed_hi"], tables["speed_lo"],
        tables["gain"], tables["fast"], tables["clamp"],
        tables["fin_start"], tables["fin_inv"], tables["fout_end"], tables["fout_inv"],
    )  # [T, C, F]

    scaled = contribs * tables["track_gain"][:, :, None]  # track volume*pan

    if strict_order:
        def body(carry, x):
            return carry + x, None

        total, _ = jax.lax.scan(body, jnp.zeros(scaled.shape[1:], dtype=jnp.float32), scaled)
    else:
        total = jnp.sum(scaled, axis=0)

    # hard clip (engine.cpp:1627-1636)
    total = jnp.where(total > 1.0, jnp.float32(1.0), total)
    total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
    return total


@functools.partial(jax.jit, static_argnames=("frames", "interp"))
def render_chunk_per_track(pool, tables, chunk_start, frames: int, sinc_bank=None, interp: str = "linear"):
    """Per-track pre-gain contributions [T, C, F] (for the effects pipeline)."""
    g = chunk_start + jnp.arange(frames, dtype=jnp.int32)
    return jax.vmap(
        lambda d, l, sb, fh, fl, sh, sl, gn, fs, cl, f0, f1, f2, f3: _track_contrib(
            pool, g, d, l, sb, fh, fl, sh, sl, gn, fs, cl, f0, f1, f2, f3, sinc_bank, interp
        )
    )(
        tables["dst_start"], tables["length"], tables["src_base"],
        tables["frac_hi"], tables["frac_lo"], tables["speed_hi"], tables["speed_lo"],
        tables["gain"], tables["fast"], tables["clamp"],
        tables["fin_start"], tables["fin_inv"], tables["fout_end"], tables["fout_inv"],
    )


def render_timeline(
    table: SegmentTable,
    pool: SamplePool,
    session: Session,
    channels: int = 2,
    chunk_frames: int = 1 << 16,
    strict_order: bool = True,
) -> np.ndarray:
    """Render the full carved timeline chunk by chunk -> [C, total] np.f32."""
    dev = pack_device_tables(table, pool, session, channels=channels)
    jt = dev.as_jax()
    pool_dev = jnp.asarray(pool.data)

    F = dev.total_frames
    out = np.empty((channels, F), dtype=np.float32)
    for start in range(0, F, chunk_frames):
        n = min(chunk_frames, F - start)
        chunk = render_chunk(pool_dev, jt, jnp.int32(start), frames=chunk_frames, strict_order=strict_order)
        out[:, start : start + n] = np.asarray(chunk)[:, :n]
    return out
