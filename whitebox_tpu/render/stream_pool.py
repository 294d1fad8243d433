"""HBM-exceeding sessions: offline bounce with chunked pool residency.

The resident paths upload the whole sample pool once (timeline/pool.py) —
an hour-scale multitrack recording project with many distinct takes can
exceed device memory. This module streams instead, at timeline scale
(SURVEY §7 hard part (e); the reference streams per-clip from heap,
sampler.cpp:88):

- the timeline splits into fixed windows (multiples of the engine block
  and the effects PARAM_BLOCK);
- per window, only the source SPANS its rows actually read are packed
  into a bounded sub-pool (span bases are remapped via channel_base, so
  rows keep their global src offsets — no row rewriting beyond the
  window filter);
- sub-pools and segment tables pad to common shapes, so every window
  reuses ONE compiled program; ``device_put`` of window j+1 overlaps the
  render of window j (async dispatch);
- effect/automation state threads across windows with the same exact
  chunk-state machinery the resident XLA path uses, so streamed output
  matches the resident render.

The streamed render rides the XLA gather path: a pool that exceeds HBM is
by definition transfer-bound, so the Pallas kernel's DMA advantage is not
the constraint; correctness + bounded footprint are.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.session.session import Session
from whitebox_tpu.timeline.carve import SegmentTable
from whitebox_tpu.timeline.pool import SamplePool

_SPAN_PAD = 48  # interp taps (sinc half=16, poly/catmull) + clamp guards
_ALIGN = 128


@dataclass
class _Window:
    start: int           # global frame
    frames: int
    row_idx: np.ndarray  # rows overlapping the window
    spans: list          # [(sid, ch, lo, hi, local_base)]
    pool_bytes: int


def _row_src_bounds(table: SegmentTable, idx: np.ndarray, w0: int, w1: int):
    """Source index range each row reads inside [w0, w1) (f64, inclusive)."""
    dst = table.dst_start[idx].astype(np.int64)
    ln = table.length[idx].astype(np.int64)
    sp = table.speed[idx]
    x0 = table.src_int[idx].astype(np.float64) + table.src_frac[idx]
    j0 = np.maximum(w0 - dst, 0)
    j1 = np.minimum(np.minimum(w1, dst + ln) - dst - 1, ln - 1)
    a = x0 + j0 * sp
    b = x0 + j1 * sp
    lo = np.floor(np.minimum(a, b)) - _SPAN_PAD
    hi = np.ceil(np.maximum(a, b)) + _SPAN_PAD
    return lo.astype(np.int64), hi.astype(np.int64)


def plan_stream_windows(table: SegmentTable, pool: SamplePool, window_frames: int,
                        channels: int, max_pool_bytes: int):
    """Partition the timeline; per window compute the touched source spans
    and the bounded sub-pool layout. Raises if one window alone exceeds
    the cap (lower window_frames)."""
    total = table.total_frames
    windows: list[_Window] = []
    n_win = max(-(-total // window_frames), 1)
    dst = table.dst_start.astype(np.int64)
    dend = dst + table.length.astype(np.int64)
    for w in range(n_win):
        w0 = w * window_frames
        w1 = min(w0 + window_frames, total)
        idx = np.nonzero((dst < w1) & (dend > w0))[0]
        spans: dict[tuple[int, int], list[int]] = {}
        if idx.size:
            lo, hi = _row_src_bounds(table, idx, w0, w1)
            sids = table.sample_id[idx]
            for i in range(idx.size):
                sid = int(sids[i])
                for ch in range(channels):
                    key = (sid, int(pool.channel_base[sid, ch]))
                    if key in spans:
                        spans[key][0] = min(spans[key][0], int(lo[i]))
                        spans[key][1] = max(spans[key][1], int(hi[i]))
                    else:
                        spans[key] = [int(lo[i]), int(hi[i])]
        # layout: [guard][span0][span1]...[guard]
        off = _ALIGN  # small lead guard for clamped reads
        entries = []
        for (sid, base), (lo_s, hi_s) in sorted(spans.items()):
            lo_s = max(lo_s, -_SPAN_PAD)
            n = max(hi_s - lo_s + 1, 0)
            n += (-n) % _ALIGN
            entries.append((sid, base, lo_s, n, off))
            off += n
        off += _ALIGN  # tail guard
        pool_bytes = off * 4
        if pool_bytes > max_pool_bytes:
            raise ValueError(
                f"window {w} needs {pool_bytes} pool bytes > cap {max_pool_bytes}; "
                f"lower window_frames (currently {window_frames})"
            )
        windows.append(_Window(start=w0, frames=w1 - w0, row_idx=idx,
                               spans=entries, pool_bytes=pool_bytes))
    return windows


def _window_pool(pool: SamplePool, win: _Window, pool_elems: int, channels: int):
    """Materialize the window's sub-pool [pool_elems] f32 + remapped
    channel_base (rows keep their global src offsets)."""
    data = np.zeros(pool_elems, dtype=np.float32)
    cb = pool.channel_base.copy()
    base_of: dict[tuple[int, int], int] = {}
    for (sid, base, lo_s, n, off) in win.spans:
        src_lo = base + lo_s
        src_hi = src_lo + n
        s0 = max(src_lo, 0)
        s1 = min(src_hi, pool.data.shape[0])
        if s1 > s0:
            data[off + (s0 - src_lo) : off + (s1 - src_lo)] = pool.data[s0:s1]
        base_of[(sid, base)] = off - lo_s  # so base' + src == local position
    for (sid, base), newb in base_of.items():
        for ch in range(channels):
            if int(pool.channel_base[sid, ch]) == base:
                cb[sid, ch] = newb
    return data, cb


def _sub_table(table: SegmentTable, idx: np.ndarray) -> SegmentTable:
    fields = ("track", "dst_start", "length", "sample_id", "src_int", "src_frac",
              "speed", "gain", "fast", "clamp", "clip_id",
              "fin_start", "fin_inv", "fout_end", "fout_inv")
    return SegmentTable(
        **{f: getattr(table, f)[idx] for f in fields},
        num_tracks=table.num_tracks, total_frames=table.total_frames,
        buffer_size=table.buffer_size,
    )


def bounce_streamed(
    session: Session,
    sample_rate: float = 48000.0,
    *,
    max_pool_bytes: int = 1 << 30,
    window_frames: int = 1 << 17,
    buffer_size: int = 512,
    channels: int = 2,
    interpolation: str = "linear",
) -> np.ndarray:
    """Offline bounce with bounded device pool residency -> [C, F] f32.

    Device footprint per step: two sub-pools (current + prefetched next,
    each <= max_pool_bytes) + one window of per-track buffers. Output
    matches ``bounce(engine="xla")`` (bit-exact for speed-1 material;
    resampled rows inside the documented contract; the window split
    re-bases closed-form phases by <= 1 f64 ulp)."""
    from whitebox_tpu.ops.automation import session_has_automation
    from whitebox_tpu.ops.mix import pack_device_tables, render_chunk, render_chunk_per_track
    from whitebox_tpu.render.bounce import _add_synth, _prepare_synth_tables, _session_has_midi
    from whitebox_tpu.render.effects_pipeline import session_has_effects
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.oversample import resolve_interpolation

    assert window_frames % 512 == 0, "windows must stay PARAM_BLOCK-aligned"
    table, pool = carve_session(session, sample_rate, buffer_size=buffer_size,
                                out_channels=channels, slow_emit="blocks")
    if interpolation == "sinc":
        # exact-polyphase quality under the pool cap: the host prerender
        # rewrite is SMALLER than the 4x oversampled copies (ext ~= output
        # length) and the windows span-pack it like any other content
        from whitebox_tpu.timeline.prerender import resolve_sinc_host

        table, pool, interp = resolve_sinc_host(table, pool)
    else:
        table, pool, interp = resolve_interpolation(table, pool, interpolation)
    windows = plan_stream_windows(table, pool, window_frames, channels, max_pool_bytes)
    pool_elems = max(-(-max_pool_bytes // 4), _ALIGN * 2)
    pool_elems += (-pool_elems) % _ALIGN

    # common shapes across windows -> one compiled program
    S_max = 1
    for w in windows:
        if w.row_idx.size:
            S_max = max(S_max, int(np.bincount(table.track[w.row_idx],
                                               minlength=table.num_tracks).max()))
    T = max(table.num_tracks, 1)

    has_midi = _session_has_midi(session)
    from whitebox_tpu.session.bus import session_has_routing

    routed = session_has_routing(session)
    has_fx = session_has_effects(session) or session_has_automation(session) or has_midi or routed
    F = table.total_frames
    out = np.empty((channels, F), dtype=np.float32)

    states = mstates = gstep = auto = tg = None
    synth_tables = {}
    packable = True
    if has_fx:
        from whitebox_tpu.render.effects_generic import session_fx_packable
        from whitebox_tpu.render.effects_pipeline import (
            finish_mix_chunk, init_effect_states, prepare_automation_tables,
            prepare_effect_tables,
        )

        packable = session_fx_packable(session) and not routed
        auto = prepare_automation_tables(session, sample_rate)
        synth_tables = (
            _prepare_synth_tables(session, sample_rate, buffer_size,
                                  max(F // buffer_size, 1))
            if has_midi else {}
        )
        if routed:
            from whitebox_tpu.render.routing import (
                init_routed_states, make_routed_chunk_fn, prepare_routed_fx,
                routed_auto_chunk_frames,
            )

            rfx = prepare_routed_fx(session, sample_rate, channels)
            wchunk = min(routed_auto_chunk_frames(rfx, window_frames), window_frames)
            assert window_frames % wchunk == 0, \
                "window must be a multiple of the generic chunk"
            rstep = make_routed_chunk_fn(rfx, T, channels, chunk=wchunk)
            rstates = init_routed_states(rfx, channels)
        elif packable:
            (S_fx, coeffs), (Sm, mcoeffs) = prepare_effect_tables(session, sample_rate, channels)
            states, mstates = init_effect_states(T, channels, S_fx, Sm)
        else:
            from whitebox_tpu.render.effects_generic import (
                auto_chunk_frames, init_generic_states, make_generic_chunk_fn, prepare_generic_fx,
            )

            gfx = prepare_generic_fx(session, sample_rate, channels)
            wchunk = min(auto_chunk_frames(gfx, window_frames), window_frames)
            assert window_frames % wchunk == 0, \
                "window must be a multiple of the generic chunk"
            gstep = make_generic_chunk_fn(gfx, T, channels, chunk=wchunk)
            states, mstates = init_generic_states(gfx, channels)

    def dev_window(win: _Window):
        data, cb = _window_pool(pool, win, pool_elems, channels)
        sub = _sub_table(table, win.row_idx)
        wpool = replace(pool, data=data, channel_base=cb)
        dev = pack_device_tables(sub, wpool, session, channels=channels)
        # pad slots to the common S_max so every window shares one program
        jt = {}
        for k, v in dev.as_jax().items():
            if v.ndim >= 2 and v.shape[0] == T and v.shape[1] < S_max and k != "track_gain":
                padw = [(0, 0)] * v.ndim
                padw[1] = (0, S_max - v.shape[1])
                v = jnp.pad(v, padw, constant_values=(2**31 - 1) if k == "dst_start" else 0)
            jt[k] = v
        return jax.device_put(jt), jax.device_put(jnp.asarray(data)), dev

    nxt = dev_window(windows[0])
    for i, win in enumerate(windows):
        jt, pdev, dev0 = nxt
        if i + 1 < len(windows):
            nxt = dev_window(windows[i + 1])  # prefetch overlaps the render
        w0 = win.start
        if tg is None:
            tg = jnp.asarray(dev0.track_gain)
        if has_fx:
            pt = render_chunk_per_track(pdev, jt, jnp.int32(w0), frames=window_frames,
                                        interp=interp)
            if synth_tables:
                pt = _add_synth(pt, synth_tables, w0, window_frames)
            if routed:
                pieces = []
                for off in range(0, window_frames, wchunk):
                    piece, rstates = rstep(
                        pt[:, :, off : off + wchunk], rstates,
                        jnp.int32(w0 + off), tg, auto)
                    pieces.append(piece)
                chunk = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]
            elif packable:
                from whitebox_tpu.render.effects_pipeline import finish_mix_chunk

                chunk, states, mstates = finish_mix_chunk(
                    pt, coeffs, mcoeffs, tg, states, mstates, jnp.int32(w0), auto,
                    T=T, C=channels, S=S_fx, Sm=Sm,
                )
            else:
                pieces = []
                for off in range(0, window_frames, wchunk):
                    piece, states, mstates = gstep(
                        pt[:, :, off : off + wchunk], states, mstates,
                        jnp.int32(w0 + off), tg, auto)
                    pieces.append(piece)
                chunk = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]
        else:
            chunk = render_chunk(pdev, jt, jnp.int32(w0), frames=window_frames,
                                 strict_order=True, interp=interp)
        n = win.frames
        out[:, w0 : w0 + n] = np.asarray(chunk)[:, :n]
    return out
