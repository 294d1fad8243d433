"""Effects-enabled mix finishing: per-track buffers -> chains -> gains ->
ordered sum -> master chain -> hard clip.

Processing order mirrors the engine: each track's chain runs on the track
buffer *before* volume/pan (track.cpp:600,648-662); the master-bus chain (a
framework extension) runs after the track sum and before the hard clip
(engine.cpp:1627).

All per-track chains are packed into one batched biquad cascade
(ops.biquad.pack_chain_sections) and evaluated chunk-by-chunk inside a
single jitted lax.scan with exact state carry, so one dispatch finishes the
whole timeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.ops.automation import eval_lane_device, pan_coef_f32
from whitebox_tpu.ops.biquad import biquad_scan_batched, pack_chain_sections
from whitebox_tpu.session.session import Session


def _chains_of(session: Session):
    from whitebox_tpu.effects.base import EffectChain

    chains = []
    for t in session.tracks:
        if t.effects:
            chains.append(t.effects if isinstance(t.effects, EffectChain) else EffectChain(list(t.effects)))
        else:
            chains.append(None)
    master = None
    if session.master_effects:
        from whitebox_tpu.effects.base import EffectChain as EC

        master = session.master_effects if isinstance(session.master_effects, EC) else EC(list(session.master_effects))
    return chains, master


def session_has_effects(session: Session) -> bool:
    return bool(session.master_effects) or any(t.effects for t in session.tracks)


def prepare_effect_tables(session: Session, sample_rate: float, channels: int = 2):
    """Pack (and prepare) all chains -> device coefficient arrays."""
    chains, master = _chains_of(session)
    for c in chains:
        if c is not None:
            c.prepare(sample_rate, channels)
    S, coeffs = pack_chain_sections(chains, channels)
    if master is not None:
        master.prepare(sample_rate, channels)
        Sm, mcoeffs = pack_chain_sections([master], channels)
    else:
        Sm, mcoeffs = 1, pack_chain_sections([None], channels)[1]
    return (S, jnp.asarray(coeffs)), (Sm, jnp.asarray(mcoeffs))


def _frame_gains(auto, track_gain, g, T, C):
    """Per-frame track gains [T, C, F]: automation lanes where present,
    constant fader gains elsewhere (bit-parity for non-automated tracks)."""
    if auto is None:
        F = g.shape[0]
        return jnp.broadcast_to(track_gain[:, :, None], (T, C, F))
    vol_t, pan_t, mute, use_auto = auto
    vol = jax.vmap(lambda xs, ys, cv, tn: eval_lane_device(xs, ys, cv, tn, g))(
        vol_t["xs"], vol_t["ys"], vol_t["cv"], vol_t["tn"]
    )  # [T, F]
    panv = jax.vmap(lambda xs, ys, cv, tn: eval_lane_device(xs, ys, cv, tn, g))(
        pan_t["xs"], pan_t["ys"], pan_t["cv"], pan_t["tn"]
    )
    chans = []
    for ch in range(C):
        gain_ch = (vol * pan_coef_f32(panv, ch)) * mute[:, None]
        const = jnp.broadcast_to(track_gain[:, ch : ch + 1], gain_ch.shape)
        chans.append(jnp.where(use_auto[:, None], gain_ch, const))
    return jnp.stack(chans, axis=1)  # [T, C, F]


@functools.partial(jax.jit, static_argnames=("T", "C", "S", "Sm", "chunk", "with_meters", "valid_frames"))
def finish_mix(per_track, coeffs, mcoeffs, track_gain, auto=None, *, T, C, S, Sm, chunk=1 << 16,
               with_meters=False, valid_frames=None):
    """per_track [T, C, F] f32 -> mixed [C, F] f32 (chains+gains+sum+master+clip).

    With ``with_meters``, also returns level meters computed where the
    engine feeds its VU meters — post chain + volume/pan, pre track sum
    (track.cpp:728-733): (track_peak [T,C], track_rms [T,C],
    output_peak [C], output_rms [C]); output meters are post-master,
    post-clip."""
    F = per_track.shape[-1]
    Fv = F if valid_frames is None else int(valid_frames)  # audio frames for meter masks
    n_chunks = -(-F // chunk)
    Fp = n_chunks * chunk
    x = jnp.pad(per_track.reshape(T * C, F), ((0, 0), (0, Fp - F)))

    def body(carry, i):
        states, mstates = carry
        xc = jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=1)
        new_states = []
        for s in range(S):
            xc, ns = biquad_scan_batched(xc, [coeffs[j, s] for j in range(9)], states[s])
            new_states.append(ns)
        g = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        gains = _frame_gains(auto, track_gain, g, T, C)
        y = xc.reshape(T, C, chunk) * gains

        def add(acc, row):
            return acc + row, None

        total, _ = jax.lax.scan(add, jnp.zeros((C, chunk), jnp.float32), y)

        new_mstates = []
        for s in range(Sm):
            total, ns = biquad_scan_batched(total, [mcoeffs[j, s] for j in range(9)], mstates[s])
            new_mstates.append(ns)

        total = jnp.where(total > 1.0, jnp.float32(1.0), total)
        total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
        if with_meters:
            # mask the pad tail: chain ring-out past frame Fv isn't audio
            valid = (g < Fv)[None, None, :]
            ym = jnp.where(valid, y, 0.0)
            tm = jnp.where(valid[0], total, 0.0)
            meters = (
                jnp.max(jnp.abs(ym), axis=-1),  # [T, C] chunk peak
                jnp.sum(jnp.square(ym), axis=-1),  # [T, C] chunk sum-sq
                jnp.max(jnp.abs(tm), axis=-1),  # [C]
                jnp.sum(jnp.square(tm), axis=-1),  # [C]
            )
            return (new_states, new_mstates), (total, meters)
        return (new_states, new_mstates), total

    init = (
        [jnp.zeros((T * C, 2), jnp.float32) for _ in range(S)],
        [jnp.zeros((C, 2), jnp.float32) for _ in range(Sm)],
    )
    _, outs = jax.lax.scan(body, init, jnp.arange(n_chunks))
    if with_meters:
        outs, (pk, sq, opk, osq) = outs
        mixed = outs.transpose(1, 0, 2).reshape(C, Fp)[:, :F]
        denom = jnp.float32(max(Fv, 1))
        meters = (
            jnp.max(pk, axis=0),
            jnp.sqrt(jnp.sum(sq, axis=0) / denom),
            jnp.max(opk, axis=0),
            jnp.sqrt(jnp.sum(osq, axis=0) / denom),
        )
        return mixed, meters
    # outs [n_chunks, C, chunk] -> [C, F]
    return outs.transpose(1, 0, 2).reshape(C, Fp)[:, :F]


def reference_finish_mix(per_track: np.ndarray, session: Session, sample_rate: float, channels: int = 2) -> np.ndarray:
    """Host-side f64-biquad reference for the effects pipeline (test oracle)."""
    from whitebox_tpu.ops.biquad import biquad_sequential
    from whitebox_tpu.effects.eq import Biquad, ParametricEQ
    from whitebox_tpu.effects.gain import Gain

    chains, master = _chains_of(session)

    def run_chain(chain, x):
        if chain is None:
            return x
        chain.prepare(sample_rate, channels)
        for e in chain.effects:
            if isinstance(e, Biquad):
                x, _ = biquad_sequential(x, e.coeffs)
            elif isinstance(e, ParametricEQ):
                for c in e.coeffs:
                    x, _ = biquad_sequential(x, c)
            elif isinstance(e, Gain):
                x = x * float(e.gain_linear)
            else:
                raise TypeError(e)
        return x

    from whitebox_tpu.ops.automation import eval_lane_numpy, pack_session_automation, session_has_automation

    T, C, F = per_track.shape
    g = np.arange(F, dtype=np.int64)
    auto_tables = None
    if session_has_automation(session):
        auto_tables = pack_session_automation(session, sample_rate)

    total = np.zeros((C, F), dtype=np.float64)
    for t, track in enumerate(session.tracks):
        buf = run_chain(chains[t], per_track[t].astype(np.float64))
        if track.automation is not None and track.automation.has_track_lanes() and auto_tables is not None:
            vol_t, pan_t, mute = auto_tables
            volv = eval_lane_numpy(vol_t["xs"][t], vol_t["ys"][t], vol_t["cv"][t], vol_t["tn"][t], g)
            panv = eval_lane_numpy(pan_t["xs"][t], pan_t["ys"][t], pan_t["cv"][t], pan_t["tn"][t], g)
            for ch in range(C):
                coef = (np.sin(np.float32(0.5 * np.pi) * ((1.0 - 0.5 * (panv + 1.0)) if ch == 0 else 0.5 * (panv + 1.0)).astype(np.float32)) * np.float32(np.sqrt(2.0))).astype(np.float32)
                gain = (volv * coef) * mute[t]
                total[ch] += np.asarray(buf)[ch] * gain.astype(np.float64)
        else:
            vol = np.float32(0.0) if track.mute else track.volume_linear
            pan = track.pan_coeffs
            for ch in range(C):
                total[ch] += np.asarray(buf)[ch] * float(np.float32(vol * np.float32(pan[ch % 2])))
    total = run_chain(master, total) if master is not None else total
    return np.clip(total, -1.0, 1.0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("T", "C", "S", "Sm", "with_meters"))
def finish_mix_chunk(pt_chunk, coeffs, mcoeffs, track_gain, states, mstates, chunk_start=0, auto=None, *, T, C, S, Sm,
                     with_meters=False):
    """Single-chunk finishing step with explicit state in/out (for drivers
    that stream per-track buffers chunk by chunk, e.g. the XLA gather path).
    ``with_meters`` appends (track_peak, track_sumsq, out_peak, out_sumsq)
    chunk partials for host-side aggregation."""
    Fc = pt_chunk.shape[-1]
    xc = pt_chunk.reshape(T * C, Fc)
    new_states = []
    for s in range(S):
        xc, ns = biquad_scan_batched(xc, [coeffs[j, s] for j in range(9)], states[s])
        new_states.append(ns)
    g = chunk_start + jnp.arange(Fc, dtype=jnp.int32)
    gains = _frame_gains(auto, track_gain, g, T, C)
    y = xc.reshape(T, C, Fc) * gains

    def add(acc, row):
        return acc + row, None

    total, _ = jax.lax.scan(add, jnp.zeros((C, Fc), jnp.float32), y)
    new_mstates = []
    for s in range(Sm):
        total, ns = biquad_scan_batched(total, [mcoeffs[j, s] for j in range(9)], mstates[s])
        new_mstates.append(ns)
    total = jnp.where(total > 1.0, jnp.float32(1.0), total)
    total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
    if with_meters:
        meters = (
            jnp.max(jnp.abs(y), axis=-1),
            jnp.sum(jnp.square(y), axis=-1),
            jnp.max(jnp.abs(total), axis=-1),
            jnp.sum(jnp.square(total), axis=-1),
        )
        return total, new_states, new_mstates, meters
    return total, new_states, new_mstates


def init_effect_states(T: int, C: int, S: int, Sm: int):
    return (
        [jnp.zeros((T * C, 2), jnp.float32) for _ in range(S)],
        [jnp.zeros((C, 2), jnp.float32) for _ in range(Sm)],
    )


def prepare_automation_tables_host(session: Session, sample_rate: float):
    """Host-side (numpy) twin of :func:`prepare_automation_tables` for the
    in-kernel automation path: `PallasMixRenderer(auto_tables=...)` must
    receive HOST arrays — it derives trace-time flags from the tables, and
    a device->host readback of an already-uploaded lane stalls for minutes
    on the axon relay (the params-as-jit-args rule, see CLAUDE.md)."""
    from whitebox_tpu.ops.automation import pack_session_automation, session_has_automation

    if not session_has_automation(session):
        return None
    vol, pan, mute = pack_session_automation(session, sample_rate)
    use = np.array([t.automation is not None and t.automation.has_track_lanes()
                    for t in session.tracks], dtype=bool)
    return (vol, pan, mute, use)


def prepare_automation_tables(session: Session, sample_rate: float):
    """Pack session automation lanes for the device (None if no lanes)."""
    from whitebox_tpu.ops.automation import pack_session_automation, session_has_automation

    if not session_has_automation(session):
        return None
    vol, pan, mute = pack_session_automation(session, sample_rate)
    # only volume/pan lanes switch a track to the per-frame gain path;
    # tracks that automate *effect* params only keep the bit-parity
    # constant-fader gains
    use_auto = jnp.asarray(
        np.array([t.automation is not None and t.automation.has_track_lanes()
                  for t in session.tracks], dtype=bool)
    )
    volj = {k: jnp.asarray(v) for k, v in vol.items()}
    panj = {k: jnp.asarray(v) for k, v in pan.items()}
    return (volj, panj, jnp.asarray(mute), use_auto)
