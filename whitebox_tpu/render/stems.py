"""Stems export: render every track separately, post chain + volume/pan.

A standard DAW deliverable the reference's (stubbed) export dialog never
reaches: each track's signal exactly as it would enter the master sum
(track.cpp:728-733 processing position), so the stems sum back to the
pre-master mix. The device applies the packed chain cascade + per-frame
gains chunk-by-chunk with exact state carry, mirroring
render.effects_pipeline.finish_mix minus the sum/master/clip stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.render.effects_pipeline import _frame_gains
from whitebox_tpu.session.session import Session


@functools.partial(jax.jit, static_argnames=("T", "C", "S", "chunk"))
def stems_finish(per_track, coeffs, track_gain, auto=None, *, T, C, S, chunk=1 << 16):
    """per_track [T, C, F] -> post-chain post-gain stems [T, C, F]."""
    from whitebox_tpu.ops.biquad import biquad_scan_batched

    F = per_track.shape[-1]
    n_chunks = -(-F // chunk)
    Fp = n_chunks * chunk
    x = jnp.pad(per_track.reshape(T * C, F), ((0, 0), (0, Fp - F)))

    def body(states, i):
        xc = jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=1)
        new_states = []
        for s in range(S):
            xc, ns = biquad_scan_batched(xc, [coeffs[j, s] for j in range(9)], states[s])
            new_states.append(ns)
        g = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        gains = _frame_gains(auto, track_gain, g, T, C)
        return new_states, xc.reshape(T, C, chunk) * gains

    init = [jnp.zeros((T * C, 2), jnp.float32) for _ in range(S)]
    _, ys = jax.lax.scan(body, init, jnp.arange(n_chunks))
    # ys [n_chunks, T, C, chunk] -> [T, C, F]
    return ys.transpose(1, 2, 0, 3).reshape(T, C, Fp)[:, :, :F]


def _render_per_track(session: Session, sample_rate: float, buffer_size: int,
                      channels: int, interpolation: str):
    """Shared per-track render preamble for the stems exporters: carve,
    interpolation resolve, Pallas-plan render with XLA-gather fallback,
    synth overlay, constant fader gains. Returns
    ``(per_track [T, C, >=F], track_gain [T, C], total_frames)``."""
    from whitebox_tpu.ops.mix import pack_device_tables, render_chunk_per_track
    from whitebox_tpu.render.bounce import _add_synth, _prepare_synth_tables, _session_has_midi
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.oversample import resolve_interpolation

    table, pool = carve_session(session, sample_rate, buffer_size=buffer_size,
                                out_channels=channels, slow_emit="runs")
    pre_pool_dev = None
    if interpolation == "sinc" and len(table) and not table.fast.all():
        # same quality form as bounce: exact/Taylor polyphase prerender
        # with the oversample kernel path for the residue
        from whitebox_tpu.timeline.prerender import resolve_sinc_pallas

        table, pool, interp, pre_pool_dev, _ = resolve_sinc_pallas(table, pool)
    else:
        table, pool, interp = resolve_interpolation(table, pool, interpolation)
    T = len(session.tracks)
    total = table.total_frames

    try:
        from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan

        plan = build_plan(table, pool, session, channels=channels,
                          max_slots=16 if isinstance(interp, tuple) else 8)
        renderer = PallasMixRenderer(table, pool, session, channels=channels, plan=plan,
                                     interp=interp, pool_device=pre_pool_dev)
        F_pad = plan.n_tiles * plan.tile
        per_track = renderer.render_device_per_track().reshape(plan.num_tracks, channels, F_pad)
        per_track = per_track[:T]
    except Exception:
        dev = pack_device_tables(table, pool, session, channels=channels)
        jt = jax.device_put(dev.as_jax())
        # the prerendered pool extension lives device-side only
        pool_dev = (pre_pool_dev.reshape(-1) if pre_pool_dev is not None
                    else jax.device_put(jnp.asarray(pool.data)))
        per_track = render_chunk_per_track(pool_dev, jt, jnp.int32(0),
                                           frames=max(total, 1), interp=interp)[:T]

    if _session_has_midi(session):
        synth = _prepare_synth_tables(session, sample_rate, buffer_size, max(total // buffer_size, 1))
        if synth:
            per_track = _add_synth(per_track, synth, 0, per_track.shape[-1])

    track_gain = jnp.asarray(
        np.stack([
            [np.float32((np.float32(0.0) if t.mute else t.volume_linear) * np.float32(t.pan_coeffs[c % 2]))
             for c in range(channels)]
            for t in session.tracks
        ])
    )
    return per_track, track_gain, total


def render_stems(
    session: Session,
    sample_rate: float = 48000.0,
    *,
    buffer_size: int = 512,
    channels: int = 2,
    interpolation: str = "linear",
) -> tuple[np.ndarray, list[str]]:
    """Render all tracks to stems [T, C, F] (+ track names).

    ``interpolation`` matches bounce: "linear" | "catmull" | "sinc" (the
    oversampled-pool form).

    Resampled rows carve as closed-form runs here (for the Pallas plan);
    if the plan fails and the XLA gather fallback renders them, phases are
    the closed-form values rather than the blockwise sequentially-rounded
    ones — inside the documented 2.4e-7 resampling contract, but not
    bit-parity with ``bounce(engine="xla")``. speed==1 stems are always
    bit-exact."""
    from whitebox_tpu.render.effects_pipeline import prepare_automation_tables, prepare_effect_tables

    T = len(session.tracks)
    per_track, track_gain, total = _render_per_track(
        session, sample_rate, buffer_size, channels, interpolation)
    auto = prepare_automation_tables(session, sample_rate)
    from whitebox_tpu.render.effects_generic import session_fx_packable

    if session_fx_packable(session):
        (S, coeffs), _ = prepare_effect_tables(session, sample_rate, channels)
        stems = stems_finish(per_track, coeffs, track_gain, auto, T=T, C=channels, S=S)
    else:
        from whitebox_tpu.render.effects_generic import make_generic_stems_finisher, prepare_generic_fx

        gfx = prepare_generic_fx(session, sample_rate, channels)
        stems = make_generic_stems_finisher(gfx, T, channels)(per_track, track_gain, auto)
    names = [t.name or f"track{i}" for i, t in enumerate(session.tracks)]
    return np.asarray(stems)[:, :, :total], names


def render_bus_stems(
    session: Session,
    sample_rate: float = 48000.0,
    *,
    buffer_size: int = 512,
    channels: int = 2,
    interpolation: str = "linear",
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Bus-stem export (stem-delivery workflows): returns
    ``(direct [C, F], bus_out [B, C, F], bus_names)`` — the PRE-MASTER
    routed components. ``direct`` is the master-direct track sum,
    ``bus_out`` each bus post-chain/post-fader (sends, sidechain keys, and
    bus automation all applied); ``direct + bus_out.sum(0)`` through the
    master chain reproduces the full mix. Requires a session with routing
    (session/bus.py)."""
    from whitebox_tpu.render.effects_pipeline import prepare_automation_tables
    from whitebox_tpu.render.routing import make_routed_stems_finisher, prepare_routed_fx
    from whitebox_tpu.session.bus import session_has_routing

    if not session_has_routing(session):
        raise ValueError("render_bus_stems needs a session with buses/sends "
                         "(use render_stems for per-track stems)")
    T = len(session.tracks)
    per_track, track_gain, total = _render_per_track(
        session, sample_rate, buffer_size, channels, interpolation)
    auto = prepare_automation_tables(session, sample_rate)
    rfx = prepare_routed_fx(session, sample_rate, channels)
    direct, bus = make_routed_stems_finisher(rfx, T, channels)(per_track, track_gain, auto)
    names = [b.name or f"bus{i}" for i, b in enumerate(session.buses)]
    return np.asarray(direct)[:, :total], np.asarray(bus)[:, :, :total], names
