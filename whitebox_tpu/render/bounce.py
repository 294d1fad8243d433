"""Offline bounce: session -> mixed stereo audio (and WAV export).

The end-to-end slice: carve the timeline (host, exact f64), pack device
tables, stream chunked jitted renders off the device, optionally encode WAV
with the engine's format converters. This is the capability the reference
stubs (SURVEY §2.9), built to the engine's exact mix semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.log import get_logger
from whitebox_tpu.ops.mix import pack_device_tables, render_chunk
from whitebox_tpu.render.metrics import RenderStats, Stopwatch

_log = get_logger("bounce")
from whitebox_tpu.session.session import Session
from whitebox_tpu.timeline.carve import carve_session


def _session_has_midi(session) -> bool:
    return any(c.is_midi() and c.midi is not None and c.midi.asset is not None
               for t in session.tracks for c in t.clips)


def _prepare_synth_tables(session, sample_rate, buffer_size, num_blocks):
    """Per-track device slot tables for the built-in synth (midi.synth)."""
    from whitebox_tpu.midi.synth import build_slot_segments, pack_slot_tables
    from whitebox_tpu.midi.voice import carve_midi_events

    events = carve_midi_events(session, sample_rate, buffer_size, num_blocks)
    out = {}
    for t, evs in events.items():
        ns, segs = build_slot_segments(evs)
        if segs is None:
            continue
        tables = pack_slot_tables(segs, sample_rate, ns)
        out[t] = {k: jnp.asarray(v) for k, v in tables.items()}
    return out


def _add_synth(per_track, synth_tables, chunk_start, frames):
    from whitebox_tpu.midi.synth import render_synth_chunk

    for t, tables in synth_tables.items():
        sy = render_synth_chunk(tables, jnp.int32(chunk_start), frames=frames)
        per_track = per_track.at[t].add(sy[None, :])
    return per_track


def _finalize_output(out: np.ndarray, stats, sample_rate: float,
                     loudness: bool, normalize) -> np.ndarray:
    """Optional output normalization + loudness measurement (extension —
    the reference's export dialog stubs both).

    ``normalize``: None, ("peak", target_dbtp) — scale so the 4x-oversampled
    TRUE peak hits the target — or ("lufs", target_lufs) — scale so
    integrated loudness hits the target (delivery-spec normalization, e.g.
    -14 LUFS streaming). Gain is applied then hard-clipped to ±1 (the
    engine's output ceiling); stats.loudness measures the FINAL audio."""
    if normalize is not None:
        from whitebox_tpu.ops.loudness import measure_loudness

        mode, target = normalize
        pre = measure_loudness(out, sample_rate)
        if mode == "peak":
            gain = 10.0 ** ((float(target) - pre.true_peak_dbtp) / 20.0)
        elif mode == "lufs":
            if not np.isfinite(pre.integrated_lufs):
                gain = 1.0  # silence: nothing to normalize
            else:
                gain = 10.0 ** ((float(target) - pre.integrated_lufs) / 20.0)
        else:
            raise ValueError(f"normalize mode {mode!r} (want 'peak' or 'lufs')")
        out = np.clip(out * np.float32(gain), -1.0, 1.0)
    if loudness:
        from whitebox_tpu.ops.loudness import measure_loudness

        stats.loudness = measure_loudness(out, sample_rate)
    return out


def _write_audio(out_path, out: np.ndarray, sample_rate: int, out_format: AudioFormat,
                 dither: str | None = None, encode=None) -> None:
    """WAV by default; .mp3/.ogg/.flac route through the native codec
    runtime (compressed export — extends the reference's export stub).
    ``encode`` is an io.codec.EncodeOptions with the reference's export
    properties (bitrate modes / VBR quality / FLAC level / metadata tags,
    export_prop.h:14-45); ignored for WAV/AIFF."""
    p = str(out_path).lower()
    if p.endswith((".mp3", ".ogg", ".oga", ".flac")):
        from whitebox_tpu.io.codec import write_compressed

        write_compressed(out_path, out, int(sample_rate), options=encode)
        return
    from whitebox_tpu.io.wav import write_wav

    write_wav(out_path, out, int(sample_rate), out_format, dither=dither)


@dataclass
class BounceResult:
    audio: np.ndarray  # [channels, frames] f32
    stats: RenderStats

    @property
    def frames(self) -> int:
        return self.audio.shape[1]


def bounce(
    session: Session,
    sample_rate: float = 48000.0,
    *,
    buffer_size: int = 512,
    channels: int = 2,
    chunk_frames: int = 1 << 17,
    num_blocks: int | None = None,
    trim_frames: int | None = None,
    tail_seconds: float = 0.0,
    strict_order: bool = True,
    engine: str = "auto",
    interpolation: str = "linear",
    effects_mode: str = "scan",
    routed_chunk: int | None = None,
    prerender: bool | None = None,
    meters: bool = False,
    pdc: bool = False,
    loudness: bool = False,
    normalize: tuple | None = None,
    out_path=None,
    out_format: AudioFormat = AudioFormat.F32,
    out_dither: str | None = None,
    out_encode=None,
) -> BounceResult:
    """Render the whole session timeline at once.

    ``buffer_size`` is the *emulated* engine block size — it defines event
    carving semantics (and the reference's boundary quirks), not the device
    schedule; the device renders ``chunk_frames`` frames per dispatch.

    ``routed_chunk``: explicit scan chunk length for the routed finisher
    (effects_mode="routed"); None = compile-cost-weighted auto sizing
    (routing.routed_auto_chunk_frames). Larger chunks cut scan overhead at
    the price of compile time — the auto cap is conservative for CPU
    backends; TPU benchmarks may profitably request 1<<14..1<<15.

    ``prerender``: None (auto) lets ``interpolation="sinc"`` pre-render
    resampled runs via the exact/Taylor polyphase path; False forces the
    oversampled-pool + poly-tap form (the PreviewStream approximation —
    useful to reproduce exactly what a streaming preview plays).

    ``engine``: "pallas" (fused TPU kernel — handles both copy and
    linear-resampled segments in-kernel), "xla" (portable gather path), or
    "auto" (pallas unless sinc interpolation or slot overflow forces xla).
    Both are bit-parity paths per the carve contract.

    ``interpolation``: "linear" (reference parity, sampler.cpp:34),
    "catmull" (4-point Catmull-Rom — completes the mode the reference
    leaves unfinished at sampler.cpp:61-86; runs natively in the Pallas
    kernel), or "sinc" (anti-aliased high-quality mode: the source pool is
    sinc-upsampled 4x with exact-phase filters and reconstructed with the
    Pallas Catmull path — see timeline/oversample.py; ``engine="xla"``
    selects the direct per-frame 32-tap formulation instead). speed==1
    rows stay bit-exact in every mode.

    ``effects_mode``: "scan" (eigenbasis associative scan, ~1e-7 accuracy)
    or "fir" (chains collapsed to impulse responses, overlap-save FFT —
    several times faster at high track counts, ~-120 dB truncation).
    Sessions whose chains contain the wider effect family (dynamics,
    delays, reverb, shaping) finish through the generic pipeline
    automatically regardless of this flag.

    ``meters``: also compute per-track and output level meters
    (vu_meter.h equivalent; see RenderStats.track_peak). Meters need the
    post-chain per-track signal, so this forces the scan effects path.

    ``pdc``: plugin-delay compensation — chains with processing latency
    (limiter lookahead) get their input fetched that many frames ahead so
    every track sums timeline-aligned, and master-chain latency is
    absorbed by rendering further and trimming the head. Off by default:
    the uncompensated render reproduces each effect's own delay semantics
    (the per-effect reference behavior). The reference DAW has no PDC —
    this is an extension (only its lookahead-free native path needed none).

    ``out_dither``: dither mode for integer WAV export (None keeps the
    reference's plain truncation; "tpdf" / "tpdf-hp" add ±1 LSB TPDF noise
    before quantization — see core.buffers.tpdf_dither).

    ``normalize``: ("lufs", target) or ("peak", target_dbtp) output
    normalization — see _finalize_output.

    ``tail_seconds``: render this far past the last clip edge so effect
    decay (delay feedback, reverb, release envelopes) rings out instead of
    being cut at the timeline end. Ignored when ``num_blocks`` is given.
    """
    from whitebox_tpu.session.bus import session_has_routing

    if num_blocks is None and tail_seconds > 0.0:
        from whitebox_tpu.timeline.transport import BlockTransport

        tr_ = BlockTransport(float(sample_rate), int(buffer_size),
                             session.beat_duration, session.playhead_start,
                             tempo_map=getattr(session, "tempo_map", None))
        num_blocks = (max(tr_.blocks_for_beats(session.end_time()), 1)
                      + int(np.ceil(float(tail_seconds) * sample_rate / buffer_size)))

    if meters:
        effects_mode = "scan"  # fir's spectral sum never materializes per-track audio
    has_routing = session_has_routing(session)
    if has_routing:
        # buses/groups/sends replace the flat ordered track sum: the routed
        # finisher (render/routing.py) hosts every chain via the generic
        # stage machinery + the routing matmul
        effects_mode = "routed"
    stats = RenderStats(channels=channels, sample_rate=float(sample_rate), tracks=len(session.tracks))
    watch = Stopwatch()

    # Pallas-bound renders carve resampled passes as closed-form runs (the
    # plan's run merge evaluates exactly that; ~100x fewer rows to pack at
    # 128-track resampled scale). engine="xla" keeps the per-block rows
    # that bit-mirror the C++ sampler's sequential f64 accumulation.
    table, pool = carve_session(
        session, sample_rate, buffer_size=buffer_size, num_blocks=num_blocks, out_channels=channels,
        slow_emit="blocks" if engine == "xla" else "runs",
    )
    _log.debug("carved %d segment rows, %d frames, %d tracks",
               len(table), table.total_frames, table.num_tracks)

    sinc_bank = None
    interp = "linear"
    pre_pool_dev = None
    _pplan = None  # kept for the roofline cost estimate below
    if (interpolation == "sinc" and engine in ("auto", "pallas") and len(table)
            and not table.fast.all() and prerender is not False):
        # primary sinc path: pre-render every resampled run with the exact
        # polyphase matmul (MXU) into a speed-1 pool extension, then mix on
        # the pure fast path (timeline/prerender.py). Falls back to the
        # oversampled-pool form for non-rational/off-grid/reverse runs.
        from whitebox_tpu.timeline.prerender import resolve_sinc_pallas

        table, pool, interp, pre_pool_dev, _pplan = resolve_sinc_pallas(table, pool)
    elif interpolation == "sinc" and engine == "xla" and len(table) and not table.fast.all():
        # direct 32-tap windowed sinc (per-frame gathers; the slowest but
        # most literal definition — kept for comparison). abs: reverse rows
        # advance at -|speed| but alias just the same — the anti-alias
        # cutoff follows the fastest |speed|
        from whitebox_tpu.ops.resample import design_sinc_bank

        slow = ~table.fast
        max_ratio = float(np.max(np.abs(table.speed[slow])))
        sinc_bank = jnp.asarray(design_sinc_bank(max(max_ratio, 1.0)))
    else:
        # shared dispatch: "catmull" runs natively in the Pallas kernel
        # (completing the mode sampler.cpp:61-86 abandons); "sinc" becomes
        # exact-phase matmul upsampling of the source pool + LS-optimal
        # 6-tap reconstruction (timeline/oversample.py) — sinc-class
        # quality at slow-path speed instead of taps gathers per frame.
        # speed==1 rows stay bit-exact in every mode.
        from whitebox_tpu.timeline.oversample import (
            device_pool_cached, resolve_interpolation,
        )

        pool0 = pool
        table, pool, interp = resolve_interpolation(table, pool, interpolation)
        if pool is not pool0 and engine in ("auto", "pallas"):
            # the 4x oversampled pool is byte-identical render to render:
            # keep it device-resident instead of re-uploading ~4x the
            # session's samples every bounce (VERDICT r4 #8)
            pre_pool_dev = device_pool_cached(pool)

    # roofline accounting (render/roofline.py): the minimum HBM/MXU spend
    # this render requires; stats.roofline_fraction compares device time
    # against the v5e speed-of-light.
    from whitebox_tpu.render.roofline import estimate_bounce_cost, prerender_cost

    stats.cost = estimate_bounce_cost(table, session, table.total_frames, channels)
    if _pplan is not None:
        for name, (b, f) in prerender_cost(_pplan, channels).terms.items():
            stats.cost.add(name, b, f)

    if engine in ("auto", "pallas"):
        from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, SlowRowsPresent, build_plan

        if sinc_bank is not None:
            plan = None  # direct-form sinc lives in the XLA renderer
        else:
            try:
                # oversampled rows advance U-times faster -> shorter
                # sub-slots -> more slots per (tile, track); allow more
                max_slots = 16 if isinstance(interp, tuple) else 8
                plan = build_plan(table, pool, session, channels=channels,
                                  max_slots=max_slots)
            except (SlowRowsPresent, ValueError):
                if engine == "pallas":
                    raise
                plan = None  # slot overflow: use the XLA path

        if plan is not None:
            from whitebox_tpu.render.effects_pipeline import (
                finish_mix, prepare_automation_tables, prepare_effect_tables, session_has_effects,
            )
            from whitebox_tpu.ops.automation import session_has_automation

            has_midi = _session_has_midi(session)
            has_fx = (session_has_effects(session) or session_has_automation(session)
                      or has_midi or meters or has_routing)
            if has_fx and len(session.tracks) * channels * plan.n_tiles * plan.tile * 4 > 6 << 30:
                plan = None  # per-track buffers would blow HBM; chunked XLA path
        if plan is not None:
            from whitebox_tpu.render.effects_generic import session_fx_packable
            from whitebox_tpu.render.effects_pipeline import prepare_automation_tables_host

            auto_tables = None
            if has_fx and not (session_has_effects(session) or has_midi
                               or meters or has_routing):
                # automation-only session: evaluate the volume/pan lanes
                # IN the mix kernel (per-frame, the _frame_gains math) and
                # keep the fused single-pass render — the per-track +
                # finisher detour costs two extra [T, C, F] HBM streams
                # (config 2 ran at 1/4 of the plain-mix RTF because of it).
                # HOST tables: the renderer reads them at trace time
                auto_tables = prepare_automation_tables_host(session, sample_rate)
                has_fx = False
            renderer = PallasMixRenderer(table, pool, session, channels=channels, plan=plan,
                                         interp=interp, pool_device=pre_pool_dev,
                                         auto_tables=auto_tables)
            if has_fx:
                if not session_fx_packable(session) and effects_mode != "routed":
                    # nonlinear / long-memory chains (dynamics, delays,
                    # reverb...) finish through the generic pipeline
                    effects_mode = "generic"
                if effects_mode == "scan":  # fir/generic never touch the scan tables
                    (S, coeffs), (Sm, mcoeffs) = prepare_effect_tables(session, sample_rate, channels)
                auto = prepare_automation_tables(session, sample_rate)
                tg = jnp.asarray(plan.track_gain)
                F_pad = plan.n_tiles * plan.tile
                synth_tables = (
                    _prepare_synth_tables(session, sample_rate, buffer_size, plan.total_frames // buffer_size)
                    if has_midi else {}
                )
                stats.carve_seconds = watch.lap()

                if effects_mode == "fir":
                    from whitebox_tpu.render.effects_fir import prepare_fir_finish

                    fir_finish = prepare_fir_finish(session, sample_rate, tg, auto, channels)
                    stats.carve_seconds += watch.lap()  # host IR prep

                    def run_fx():
                        pt = renderer.render_device_per_track()
                        T = plan.num_tracks
                        ptr = pt.reshape(T, channels, F_pad)
                        if synth_tables:
                            ptr = _add_synth(ptr, synth_tables, 0, F_pad)
                        return fir_finish(ptr)
                elif effects_mode == "routed":
                    from whitebox_tpu.render.routing import make_routed_finisher, prepare_routed_fx

                    rfx = prepare_routed_fx(session, sample_rate, channels)
                    routed_finish = make_routed_finisher(
                        rfx, plan.num_tracks, channels, chunk=routed_chunk,
                        with_meters=meters, valid_frames=plan.total_frames, pdc=pdc,
                    )
                    stats.carve_seconds += watch.lap()

                    def run_fx():
                        pt = renderer.render_device_per_track()
                        T = plan.num_tracks
                        ptr = pt.reshape(T, channels, F_pad)
                        if synth_tables:
                            ptr = _add_synth(ptr, synth_tables, 0, F_pad)
                        return routed_finish(ptr, tg, auto)
                elif effects_mode == "generic":
                    from whitebox_tpu.render.effects_generic import make_generic_finisher, prepare_generic_fx

                    fx = prepare_generic_fx(session, sample_rate, channels)
                    gen_finish = make_generic_finisher(
                        fx, plan.num_tracks, channels,
                        with_meters=meters, valid_frames=plan.total_frames, pdc=pdc,
                    )
                    stats.carve_seconds += watch.lap()

                    def run_fx():
                        pt = renderer.render_device_per_track()
                        T = plan.num_tracks
                        ptr = pt.reshape(T, channels, F_pad)
                        if synth_tables:
                            ptr = _add_synth(ptr, synth_tables, 0, F_pad)
                        return gen_finish(ptr, tg, auto)
                else:
                    def run_fx():
                        pt = renderer.render_device_per_track()
                        T = plan.num_tracks
                        ptr = pt.reshape(T, channels, F_pad)
                        if synth_tables:
                            ptr = _add_synth(ptr, synth_tables, 0, F_pad)
                        return finish_mix(ptr, coeffs, mcoeffs, tg, auto, T=T, C=channels, S=S, Sm=Sm,
                                          with_meters=meters, valid_frames=plan.total_frames)

                def _force(r):
                    float((r[0] if meters else r).sum())

                _force(run_fx())  # warm-up compile (forced execution)
                stats.compile_seconds = watch.lap()
                res = run_fx()
                _force(res)
                stats.device_seconds = watch.lap()
                out_dev = res[0] if meters else res
                out = np.asarray(out_dev)[:, : plan.total_frames]
                if meters:
                    tp, trms, op, orms = res[1]
                    stats.track_peak = np.asarray(tp)[: len(session.tracks)]
                    stats.track_rms = np.asarray(trms)[: len(session.tracks)]
                    stats.output_peak = np.asarray(op)
                    stats.output_rms = np.asarray(orms)
                stats.readback_seconds = watch.lap()
            else:
                stats.carve_seconds = watch.lap()
                # warm-up compile; the scalar fetch forces execution (plain
                # block_until_ready is a no-op under async PJRT relays)
                float(renderer.render_device().sum())
                stats.compile_seconds = watch.lap()
                out_dev = renderer.render_device()
                float(out_dev.sum())  # force completion; scalar fetch only
                stats.device_seconds = watch.lap()
                out = np.asarray(out_dev).reshape(channels, -1)[:, : plan.total_frames]
                stats.readback_seconds = watch.lap()
            if trim_frames is not None:
                out = out[:, :trim_frames]
            stats.frames = out.shape[1]
            stats.wall_seconds = stats.carve_seconds + stats.device_seconds
            out = _finalize_output(out, stats, sample_rate, loudness, normalize)
            if out_path is not None:
                _write_audio(out_path, out, int(sample_rate), out_format, dither=out_dither, encode=out_encode)
            return BounceResult(audio=out, stats=stats)

    from whitebox_tpu.ops.automation import session_has_automation
    from whitebox_tpu.render.effects_pipeline import session_has_effects

    if engine != "xla" and len(table) and (not table.fast.all() or pre_pool_dev is not None):
        # auto->xla fallback: the table was carved with slow_emit="runs"
        # (closed-form resampled rows) for the Pallas plan; the XLA gather
        # path's bit-parity contract needs the blockwise sequentially-
        # rounded phases, so re-carve (slow_emit only affects slow rows).
        # A sinc-prerendered table also re-resolves here: its pool
        # extension lives on device only.
        table, pool = carve_session(
            session, sample_rate, buffer_size=buffer_size, num_blocks=num_blocks,
            out_channels=channels, slow_emit="blocks",
        )
        pre_pool_dev = None
        if sinc_bank is None and interpolation != "linear":
            from whitebox_tpu.timeline.oversample import resolve_interpolation

            table, pool, interp = resolve_interpolation(table, pool, interpolation)
    dev = pack_device_tables(table, pool, session, channels=channels)
    stats.carve_seconds = watch.lap()

    jt = jax.device_put(dev.as_jax())
    pool_dev = jax.device_put(jnp.asarray(pool.data))

    F = dev.total_frames
    chunk_frames = min(chunk_frames, max(F, 1))
    out = np.empty((channels, F), dtype=np.float32)

    if (session_has_effects(session) or session_has_automation(session)
            or _session_has_midi(session) or meters or has_routing):
        from whitebox_tpu.ops.mix import render_chunk_per_track
        from whitebox_tpu.render.effects_generic import session_fx_packable
        from whitebox_tpu.render.effects_pipeline import (
            finish_mix_chunk, init_effect_states, prepare_automation_tables, prepare_effect_tables,
        )

        auto = prepare_automation_tables(session, sample_rate)
        tg = jnp.asarray(dev.track_gain)
        T = dev.num_tracks
        synth_tables = (
            _prepare_synth_tables(session, sample_rate, buffer_size, F // buffer_size)
            if _session_has_midi(session) else {}
        )

        # PDC fetch-ahead (streaming form): rows in groups with chain
        # latency are re-rendered ``lat`` frames ahead, so chains emit
        # timeline-aligned output; master latency trims the head below.
        # Each latency class renders through a ROW-SUBSET of the packed
        # tables (every leaf is per-track), so the extra pass costs only
        # the affected tracks, not the full session width.
        pdc_rows: list = []  # [(lat, rows, jt_subset, {row_pos: synth})]
        mlat = 0

        def _pdc_setup(fx):
            nonlocal mlat
            from whitebox_tpu.render.effects_generic import fx_latencies

            glat, mlat = fx_latencies(fx)
            by_lat: dict = {}
            for g, lat in zip(fx.groups, glat):
                if lat > 0:
                    by_lat.setdefault(lat, []).extend(np.asarray(g.track_idx).tolist())
            for lat, rows in by_lat.items():
                rows_np = np.asarray(sorted(rows))
                jt_sub = {k: v[jnp.asarray(rows_np)] for k, v in jt.items()}
                synth_sub = {pos: synth_tables[t] for pos, t in enumerate(rows_np)
                             if t in synth_tables}
                pdc_rows.append((lat, jnp.asarray(rows_np), jt_sub, synth_sub))

        def _render_pt(start):
            pt = render_chunk_per_track(pool_dev, jt, jnp.int32(start), frames=chunk_frames, sinc_bank=sinc_bank, interp=interp)
            if synth_tables:
                pt = _add_synth(pt, synth_tables, start, chunk_frames)
            for lat, rows, jt_sub, synth_sub in pdc_rows:
                ahead = render_chunk_per_track(pool_dev, jt_sub, jnp.int32(start + lat), frames=chunk_frames, sinc_bank=sinc_bank, interp=interp)
                if synth_sub:
                    ahead = _add_synth(ahead, synth_sub, start + lat, chunk_frames)
                pt = pt.at[rows].set(ahead)
            return pt

        if has_routing:
            from whitebox_tpu.render.effects_generic import stage_latency_frames
            from whitebox_tpu.render.routing import (
                init_routed_states, make_routed_chunk_fn, prepare_routed_fx,
                routed_auto_chunk_frames,
            )

            rfx = prepare_routed_fx(session, sample_rate, channels)
            if pdc:
                if any(stage_latency_frames(g.stages) > 0 for g in rfx.bus_groups):
                    raise ValueError(
                        "the streaming (XLA) path does not carry bus-chain "
                        "latency delay lines; render with engine='auto'/'pallas' "
                        "(the routed finisher compensates bus latency), or move "
                        "lookahead limiters to tracks or the master")
                _pdc_setup(rfx.fx)
            chunk_frames = routed_auto_chunk_frames(rfx, chunk_frames)
            rstep = make_routed_chunk_fn(rfx, T, channels, chunk=chunk_frames,
                                         with_meters=meters)
            rstates = init_routed_states(rfx, channels)
            # adapt to the (states, mstates) threading below: carry the
            # routed state triple in `states`, mstates unused
            states, mstates = rstates, ()

            def fx_chunk(start, states, mstates):
                pt = _render_pt(start)
                res = rstep(pt, states, jnp.int32(start), tg, auto)
                if meters:
                    return res[0], res[1], (), res[2]
                return res[0], res[1], ()
        elif not session_fx_packable(session):
            from whitebox_tpu.render.effects_generic import (
                auto_chunk_frames, init_generic_states, make_generic_chunk_fn, prepare_generic_fx,
            )

            gfx = prepare_generic_fx(session, sample_rate, channels)
            if pdc:
                _pdc_setup(gfx)
            # heavy chains compile superlinearly with chunk length — cap it
            # (more dispatches beats a >9-minute trace; see auto_chunk_frames)
            chunk_frames = auto_chunk_frames(gfx, chunk_frames)
            gstep = make_generic_chunk_fn(gfx, T, channels, chunk=chunk_frames, with_meters=meters)
            states, mstates = init_generic_states(gfx, channels)

            def fx_chunk(start, states, mstates):
                pt = _render_pt(start)
                return gstep(pt, states, mstates, jnp.int32(start), tg, auto)
        else:
            (S, coeffs), (Sm, mcoeffs) = prepare_effect_tables(session, sample_rate, channels)
            states, mstates = init_effect_states(T, channels, S, Sm)

            def fx_chunk(start, states, mstates):
                pt = render_chunk_per_track(pool_dev, jt, jnp.int32(start), frames=chunk_frames, sinc_bank=sinc_bank, interp=interp)
                if synth_tables:
                    pt = _add_synth(pt, synth_tables, start, chunk_frames)
                return finish_mix_chunk(pt, coeffs, mcoeffs, tg, states, mstates, jnp.int32(start), auto,
                                        T=T, C=channels, S=S, Sm=Sm, with_meters=meters)

        _ = fx_chunk(0, states, mstates)  # warm-up compile
        stats.compile_seconds = watch.lap()
        device_chunks = []
        meter_chunks = []
        F_loop = F + mlat  # master latency: render further, trim the head
        buf = out if mlat == 0 else np.empty((channels, F_loop), dtype=np.float32)
        for start in range(0, F_loop, chunk_frames):
            res = fx_chunk(start, states, mstates)
            chunk, states, mstates = res[0], res[1], res[2]
            if meters:
                meter_chunks.append((min(chunk_frames, F_loop - start), res[3]))
            device_chunks.append((start, chunk))
        float(device_chunks[-1][1].sum())  # all dispatched; force completion
        stats.device_seconds = watch.lap()
        for start, chunk in device_chunks:
            n = min(chunk_frames, F_loop - start)
            buf[:, start : start + n] = np.asarray(chunk)[:, :n]
        if mlat:
            out[:, :] = buf[:, mlat : mlat + F]
        if meters:
            # aggregate chunk partials; final (ragged) chunk is rendered at
            # full chunk_frames, so weight sumsq by the rendered length and
            # accept the tail's extra silence (zero) frames
            Tn = len(session.tracks)
            tp = np.max([np.asarray(m[0]) for _, m in meter_chunks], axis=0)[:Tn]
            tsq = np.sum([np.asarray(m[1]) for _, m in meter_chunks], axis=0)[:Tn]
            op = np.max([np.asarray(m[2]) for _, m in meter_chunks], axis=0)
            osq = np.sum([np.asarray(m[3]) for _, m in meter_chunks], axis=0)
            stats.track_peak, stats.track_rms = tp, np.sqrt(tsq / max(F, 1))
            stats.output_peak, stats.output_rms = op, np.sqrt(osq / max(F, 1))
        stats.readback_seconds = watch.lap()
    else:
        # warm-up compile (excluded from the device-time metric)
        render_chunk(pool_dev, jt, jnp.int32(0), frames=chunk_frames, strict_order=strict_order, sinc_bank=sinc_bank, interp=interp).block_until_ready()
        stats.compile_seconds = watch.lap()

        device_chunks = []
        for start in range(0, F, chunk_frames):
            device_chunks.append(
                (start, render_chunk(pool_dev, jt, jnp.int32(start), frames=chunk_frames, strict_order=strict_order, sinc_bank=sinc_bank, interp=interp))
            )
        float(device_chunks[-1][1].sum())  # force completion; scalar fetch only
        stats.device_seconds = watch.lap()
        for start, chunk in device_chunks:
            n = min(chunk_frames, F - start)
            out[:, start : start + n] = np.asarray(chunk)[:, :n]
        stats.readback_seconds = watch.lap()

    if trim_frames is not None:
        out = out[:, :trim_frames]
    stats.frames = out.shape[1]
    stats.wall_seconds = stats.carve_seconds + stats.device_seconds

    out = _finalize_output(out, stats, sample_rate, loudness, normalize)

    if out_path is not None:
        _write_audio(out_path, out, int(sample_rate), out_format, dither=out_dither, encode=out_encode)

    return BounceResult(audio=out, stats=stats)
