"""Generic effects finishing — heterogeneous (nonlinear / long-memory)
per-track chains.

The packed-biquad pipeline (render/effects_pipeline.py) and the spectral
FIR pipeline (render/effects_fir.py) only apply to LTI chains (Gain /
Biquad / ParametricEQ). Sessions using the wider native effect family —
dynamics, delays, chorus/flanger, convolution reverb, waveshaping — finish
here instead:

- tracks are grouped by *chain signature* (the sequence of effect kinds +
  static configs); each group's per-effect parameters are stacked into
  [B]-leading arrays so one traced program processes all B tracks of the
  group at once (the batched replacement for "one plugin instance per
  track");
- the whole timeline streams through a single jitted ``lax.scan`` over
  frame chunks; every effect carries exact chunk-boundary state (the
  property all ops/dynamics + ops/delay primitives guarantee), so the
  chunked stream equals a one-shot render;
- gains / ordered track sum / master chain / hard clip / meters mirror
  finish_mix exactly (track.cpp:728-733 feed points, engine.cpp:1627 clip).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.ops.biquad import biquad_scan_batched, coeffs_device_arrays
from whitebox_tpu.render.effects_pipeline import _chains_of, _frame_gains
from whitebox_tpu.session.session import Session

_PACKABLE = ("gain", "biquad", "eq")


def _stage_kind(e) -> tuple[str, tuple]:
    """(kind, static-config) of one effect — the grouping signature entry."""
    from whitebox_tpu.effects.eq import Biquad, ParametricEQ
    from whitebox_tpu.effects.gain import Gain

    if isinstance(e, Gain):
        return "gain", ()
    if isinstance(e, Biquad):
        return "biquad", ()
    if isinstance(e, ParametricEQ):
        return "eq", (len(e.bands),)
    return e.name, tuple(e.static_config())


def chain_is_packable(chain) -> bool:
    """True if every effect reduces to biquad sections (LTI fast paths)."""
    from whitebox_tpu.effects.base import EffectChain

    if chain is None:
        return True
    effs = chain.effects if isinstance(chain, EffectChain) else list(chain)
    return all(_stage_kind(e)[0] in _PACKABLE for e in effs)


def session_fx_packable(session: Session) -> bool:
    chains, master = _chains_of(session)
    return all(chain_is_packable(c) for c in chains) and chain_is_packable(master)


def _stage_params(e, kind: str) -> dict[str, np.ndarray]:
    """Per-effect parameter arrays (stacked later across the group)."""
    from whitebox_tpu.effects.gain import Gain

    if kind == "gain":
        return {"g": np.float32(e.gain_linear)}
    if kind == "biquad":
        assert e.coeffs is not None, "effect not prepared"
        return {"pa": coeffs_device_arrays(e.coeffs)}  # [9]
    if kind == "eq":
        assert e.coeffs, "effect not prepared"
        return {"pa": np.stack([coeffs_device_arrays(c) for c in e.coeffs])}  # [nb, 9]
    p = {k: np.asarray(v, np.float32) for k, v in e.param_arrays().items()}
    if kind == "convreverb":
        p["ir"] = np.asarray(e._ir, np.float32)  # [C, L]
    return p


@dataclass
class _Group:
    track_idx: np.ndarray  # [B] row indices into per_track
    stages: list  # [(kind, static, params {name: jnp [B, ...]})]


@dataclass
class GenericFX:
    """Prepared generic-effects program for one session."""

    groups: list = field(default_factory=list)  # track groups
    master: _Group | None = None  # B == 1 group over the mixed bus
    sample_rate: float = 48000.0
    channels: int = 2


def _chain_stages(chain) -> list:
    from whitebox_tpu.effects.base import EffectChain

    effs = chain.effects if isinstance(chain, EffectChain) else list(chain)
    return [(e, *_stage_kind(e)) for e in effs]


def prepare_generic_fx(session: Session, sample_rate: float, channels: int = 2) -> GenericFX:
    chains, master = _chains_of(session)
    for c in chains:
        if c is not None:
            c.prepare(sample_rate, channels)
    fx = GenericFX(sample_rate=float(sample_rate), channels=channels)

    by_sig: dict[tuple, list[int]] = {}
    for t, c in enumerate(chains):
        if c is None or len(_chain_stages(c)) == 0:
            continue
        sig = tuple((k, s) for (_, k, s) in _chain_stages(c))
        by_sig.setdefault(sig, []).append(t)

    for sig, tracks in by_sig.items():
        stages = []
        for pos, (kind, static) in enumerate(sig):
            stacked: dict[str, list] = {}
            for t in tracks:
                e = _chain_stages(chains[t])[pos][0]
                for k, v in _stage_params(e, kind).items():
                    stacked.setdefault(k, []).append(v)
            params = {k: np.stack(v) for k, v in stacked.items()}  # host numpy
            stages.append((kind, static, params))
        fx.groups.append(_Group(np.asarray(tracks, np.int64), stages))

    if master is not None and len(_chain_stages(master)) > 0:
        master.prepare(sample_rate, channels)
        stages = []
        for e, kind, static in _chain_stages(master):
            params = {k: np.stack([v]) for k, v in _stage_params(e, kind).items()}
            stages.append((kind, static, params))
        fx.master = _Group(np.asarray([0], np.int64), stages)
    return fx


def device_params(fx: GenericFX):
    """Params pytrees mirroring fx.groups / fx.master stage lists.

    Parameters travel as *jit arguments*, never closure constants: captured
    device arrays would be embedded as MLIR constants, which forces a
    device->host readback that remote-relay backends (axon) can't serve —
    and would recompile on every parameter change anyway."""
    gp = [[{k: jnp.asarray(v) for k, v in params.items()} for (_, _, params) in g.stages]
          for g in fx.groups]
    mp = ([{k: jnp.asarray(v) for k, v in params.items()} for (_, _, params) in fx.master.stages]
          if fx.master is not None else [])
    return gp, mp


def _with_ir_ffts(fx: GenericFX, gparams, mparams, chunk: int):
    """TRACED: add each conv-reverb stage's IR spectrum at the chunk's FFT
    size ("ir_f"), computed once per call — scan bodies don't get
    loop-invariant code motion, so this must happen outside the scan."""

    def xform(stages, plist):
        out = []
        for (kind, static, _), params in zip(stages, plist):
            if kind == "convreverb":
                (L,) = static
                params = dict(params, ir_f=_conv_ir_f(params, L, chunk))
            out.append(params)
        return out

    gp = [xform(g.stages, pl) for g, pl in zip(fx.groups, gparams)]
    mp = xform(fx.master.stages, mparams) if fx.master is not None else mparams
    return gp, mp


# ---------------------------------------------------------------------------
# stage execution (x [B, C, Fc])
# ---------------------------------------------------------------------------


def _init_stage_state(kind: str, static: tuple, params, B: int, C: int):
    z = lambda *s: jnp.zeros(s, jnp.float32)
    if kind in ("gain", "saturator", "width"):
        return ()
    if kind == "biquad":
        return z(B * C, 2)
    if kind == "eq":
        (nb,) = static
        return [z(B * C, 2) for _ in range(nb)]
    if kind == "compressor":
        return {"red": z(B), "att": z(B), "det": z(B)}
    if kind == "limiter":
        (L,) = static
        return {"red": z(B), "att": z(B), "look": z(B, L), "xdelay": z(B, C, L)}
    if kind == "gate":
        return {"open": z(B), "att": z(B)}
    if kind == "delay":
        mode, D = static
        return {"w": z(B, C, D), "x": z(B, C, D)}
    if kind in ("chorus", "flanger"):
        voices, MT = static
        return {"xtail": z(B, C, MT)}
    if kind == "convreverb":
        (L,) = static
        return {"carry": z(B, C, L - 1)}
    raise ValueError(f"unknown effect kind {kind!r}")


def _conv_ir_f(params, ir_len: int, Fc: int):
    from whitebox_tpu.effects.reverb import _next_pow2

    nfft = _next_pow2(Fc + ir_len - 1)
    return jnp.fft.rfft(params["ir"], nfft, axis=-1)  # [B, C, K]


def _apply_stage(kind: str, static: tuple, params, x, state, n0, sample_rate: float):
    """x [B, C, Fc] -> (y, new_state). ``n0``: absolute start frame (traced)."""
    B, C, Fc = x.shape
    col = lambda a: a[:, None]  # [B] -> [B, 1] (broadcast against [B, F])
    if kind == "gain":
        return x * params["g"][:, None, None], state
    if kind == "biquad":
        arrs = [jnp.repeat(params["pa"][:, j : j + 1], C, axis=0) for j in range(9)]
        y, ns = biquad_scan_batched(x.reshape(B * C, Fc), arrs, state)
        return y.reshape(B, C, Fc), ns
    if kind == "eq":
        (nb,) = static
        y = x.reshape(B * C, Fc)
        new_states = []
        for b in range(nb):
            arrs = [jnp.repeat(params["pa"][:, b, j : j + 1], C, axis=0) for j in range(9)]
            y, ns = biquad_scan_batched(y, arrs, state[b])
            new_states.append(ns)
        return y.reshape(B, C, Fc), new_states
    if kind == "compressor":
        from whitebox_tpu.ops.dynamics import compressor_process

        (detector,) = static
        p = {k: col(v) for k, v in params.items()}
        return compressor_process(x, p, state, detector=detector)
    if kind == "limiter":
        from whitebox_tpu.ops.dynamics import limiter_process

        (L,) = static
        p = {k: col(v) for k, v in params.items()}
        return limiter_process(x, p, state, lookahead=L)
    if kind == "gate":
        from whitebox_tpu.ops.dynamics import gate_process

        p = {k: col(v) for k, v in params.items()}
        return gate_process(x, p, state)
    if kind == "delay":
        from whitebox_tpu.ops.delay import comb_feedback, comb_feedback_pingpong

        mode, D = static
        fb = params["feedback"][:, None, None, None]  # broadcast vs [B, *, *, D]
        if mode == "pingpong" and C == 2:
            w, wl, xl = comb_feedback_pingpong(x, fb, state["w"], state["x"], D=D)
        else:
            w, wl, xl = comb_feedback(x, fb, state["w"], state["x"], D=D)
        y = params["dry"][:, None, None] * x + params["wet"][:, None, None] * w
        return y, {"w": wl, "x": xl}
    if kind in ("chorus", "flanger"):
        from whitebox_tpu.ops.delay import lfo_delay_frames, modulated_tap

        voices, MT = static
        two_pi = 2.0 * np.pi
        acc = jnp.zeros_like(x)
        new_tail = state["xtail"]
        for v in range(voices):
            phases = jnp.asarray(
                [two_pi * v / voices + c * (0.5 * np.pi) for c in range(C)], jnp.float32
            )[:, None]
            d = lfo_delay_frames(
                n0, Fc, rate_hz=params["rate_hz"][:, None, None],
                depth_frames=params["depth"][:, None, None],
                center_frames=params["center"][:, None, None],
                sample_rate=sample_rate, phase=phases,
            )
            tap, new_tail = modulated_tap(x, d, state["xtail"], max_delay=MT)
            acc = acc + tap
        wet = params["wet"][:, None, None] / float(voices)
        return params["dry"][:, None, None] * x + wet * acc, {"xtail": new_tail}
    if kind == "convreverb":
        from whitebox_tpu.effects.reverb import fft_convolve_chunk

        (L,) = static
        ir_f = params["ir_f"] if "ir_f" in params else _conv_ir_f(params, L, Fc)
        wetsig, carry = fft_convolve_chunk(x, ir_f, L, state["carry"])
        y = params["dry"][:, None, None] * x + params["wet"][:, None, None] * wetsig
        return y, {"carry": carry}
    if kind == "saturator":
        shaped = jnp.tanh(params["drive"][:, None, None] * x) * params["norm"][:, None, None]
        m = params["mix"][:, None, None]
        return m * shaped + (1.0 - m) * x, state
    if kind == "width":
        if C != 2:
            return x, state
        mid = 0.5 * (x[:, 0, :] + x[:, 1, :])
        side = 0.5 * (x[:, 0, :] - x[:, 1, :]) * params["width"][:, None]
        return jnp.stack([mid + side, mid - side], axis=1), state
    raise ValueError(f"unknown effect kind {kind!r}")


def _apply_group(group: _Group, plist, x, states, n0, sample_rate: float):
    new_states = []
    for (kind, static, _), params, st in zip(group.stages, plist, states):
        x, ns = _apply_stage(kind, static, params, x, st, n0, sample_rate)
        new_states.append(ns)
    return x, new_states


def init_generic_states(fx: GenericFX, C: int):
    g_states = [
        [
            _init_stage_state(kind, static, params, len(g.track_idx), C)
            for (kind, static, params) in g.stages
        ]
        for g in fx.groups
    ]
    m_states = (
        [
            _init_stage_state(kind, static, params, 1, C)
            for (kind, static, params) in fx.master.stages
        ]
        if fx.master is not None
        else []
    )
    return g_states, m_states


def _chunk_step(fx: GenericFX, xc, g_states, m_states, gparams, mparams, start,
                track_gain, auto, T: int, C: int, with_meters: bool, Fv):
    """Process one [T, C, chunk] slice: chains -> gains -> ordered sum ->
    master -> clip (+ meter partials). Returns (total, new_g, new_m, meters)."""
    sample_rate = fx.sample_rate
    chunk = xc.shape[-1]
    new_g = []
    for g, pl, sts in zip(fx.groups, gparams, g_states):
        xg = xc[g.track_idx]  # static fancy index == gather
        yg, ns = _apply_group(g, pl, xg, sts, start, sample_rate)
        xc = xc.at[g.track_idx].set(yg)
        new_g.append(ns)
    gidx = start + jnp.arange(chunk, dtype=jnp.int32)
    gains = _frame_gains(auto, track_gain, gidx, T, C)
    y = xc * gains

    def add(acc, row):
        return acc + row, None

    total, _ = jax.lax.scan(add, jnp.zeros((C, chunk), jnp.float32), y)

    new_m = m_states
    if fx.master is not None:
        tm, new_m = _apply_group(fx.master, mparams, total[None], m_states, start, sample_rate)
        total = tm[0]
    total = jnp.where(total > 1.0, jnp.float32(1.0), total)
    total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
    meters = None
    if with_meters:
        if Fv is not None:  # mask the pad tail: ring-out past Fv isn't audio
            valid = (gidx < Fv)[None, None, :]
            ym = jnp.where(valid, y, 0.0)
            tmm = jnp.where(valid[0], total, 0.0)
        else:
            ym, tmm = y, total
        meters = (
            jnp.max(jnp.abs(ym), axis=-1),
            jnp.sum(jnp.square(ym), axis=-1),
            jnp.max(jnp.abs(tmm), axis=-1),
            jnp.sum(jnp.square(tmm), axis=-1),
        )
    return total, new_g, new_m, meters


def make_generic_chunk_fn(fx: GenericFX, T: int, C: int, *, chunk: int,
                          with_meters: bool = False):
    """Streaming form: fn(pt_chunk [T, C, chunk], g_states, m_states,
    start, track_gain, auto) -> (total, new_g, new_m[, meters]) for drivers
    that pull chunks (the XLA gather path). States thread across calls
    exactly. IR spectra are computed once on device and handed back in as
    jit arguments across calls."""
    gp0, mp0 = device_params(fx)
    gp, mp = jax.jit(lambda a, b: _with_ir_ffts(fx, a, b, chunk))(gp0, mp0)

    @jax.jit
    def step(pt_chunk, g_states, m_states, start, track_gain, gparams, mparams, auto=None):
        total, ng, nm, meters = _chunk_step(
            fx, pt_chunk, g_states, m_states, gparams, mparams, start, track_gain, auto,
            T, C, with_meters, None
        )
        if with_meters:
            return total, ng, nm, meters
        return total, ng, nm

    def call(pt_chunk, g_states, m_states, start, track_gain, auto=None):
        return step(pt_chunk, g_states, m_states, start, track_gain, gp, mp, auto)

    return call


def make_generic_stems_finisher(fx: GenericFX, T: int, C: int, *, chunk: int = 1 << 16):
    """Stems form: fn(per_track [T, C, F], track_gain, auto) -> [T, C, F]
    post-chain post-gain (the track.cpp:728-733 feed point) — generic-chain
    counterpart of render/stems.stems_finish."""
    sample_rate = fx.sample_rate
    gp0, mp0 = device_params(fx)

    def finish(per_track, track_gain, gparams, auto=None):
        F = per_track.shape[-1]
        n_chunks = -(-F // chunk)
        Fp = n_chunks * chunk
        xall = jnp.pad(per_track, ((0, 0), (0, 0), (0, Fp - F)))
        gparams, _ = _with_ir_ffts(fx, gparams, [], chunk)
        init, _ = init_generic_states(fx, C)

        def body(g_states, i):
            start = i * chunk
            xc = jax.lax.dynamic_slice_in_dim(xall, start, chunk, axis=2)
            new_g = []
            for g, pl, sts in zip(fx.groups, gparams, g_states):
                yg, ns = _apply_group(g, pl, xc[g.track_idx], sts, start, sample_rate)
                xc = xc.at[g.track_idx].set(yg)
                new_g.append(ns)
            gidx = start + jnp.arange(chunk, dtype=jnp.int32)
            gains = _frame_gains(auto, track_gain, gidx, T, C)
            return new_g, xc * gains

        _, ys = jax.lax.scan(body, init, jnp.arange(n_chunks))
        return ys.transpose(1, 2, 0, 3).reshape(T, C, Fp)[:, :, :F]

    jfinish = jax.jit(finish)
    return lambda per_track, track_gain, auto=None: jfinish(per_track, track_gain, gp0, auto)


def make_generic_finisher(fx: GenericFX, T: int, C: int, *, chunk: int = 1 << 16,
                          with_meters: bool = False, valid_frames: int | None = None):
    """Build fn(per_track [T, C, F], track_gain, auto) -> mixed [C, F]
    (or (mixed, meters)). One jitted lax.scan over frame chunks."""
    gp0, mp0 = device_params(fx)

    def finish(per_track, track_gain, gparams, mparams, auto=None):
        F = per_track.shape[-1]
        Fv = F if valid_frames is None else int(valid_frames)
        n_chunks = -(-F // chunk)
        Fp = n_chunks * chunk
        xall = jnp.pad(per_track, ((0, 0), (0, 0), (0, Fp - F)))
        gparams, mparams = _with_ir_ffts(fx, gparams, mparams, chunk)
        init = init_generic_states(fx, C)

        def body(carry, i):
            g_states, m_states = carry
            start = i * chunk
            xc = jax.lax.dynamic_slice_in_dim(xall, start, chunk, axis=2)
            total, new_g, new_m, meters = _chunk_step(
                fx, xc, g_states, m_states, gparams, mparams, start, track_gain, auto,
                T, C, with_meters, Fv
            )
            if with_meters:
                return (new_g, new_m), (total, meters)
            return (new_g, new_m), total

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
        return outs.transpose(1, 0, 2).reshape(C, Fp)[:, :F]

    jfinish = jax.jit(finish)
    return lambda per_track, track_gain, auto=None: jfinish(per_track, track_gain, gp0, mp0, auto)


# ---------------------------------------------------------------------------
# host-side f64 reference (test oracle)
# ---------------------------------------------------------------------------


def reference_generic_finish(per_track: np.ndarray, session: Session, sample_rate: float,
                             channels: int = 2) -> np.ndarray:
    """Sequential host reference: per-effect f64 reference models, f64
    gains/sum, hard clip. Mirrors reference_finish_mix but supports the
    full effect family."""
    from whitebox_tpu.ops import delay as dl
    from whitebox_tpu.ops import dynamics as dyn
    from whitebox_tpu.ops.biquad import biquad_sequential

    chains, master = _chains_of(session)

    def run_chain(chain, x):
        from whitebox_tpu.effects.base import EffectChain
        from whitebox_tpu.effects.delay import Chorus, Delay
        from whitebox_tpu.effects.dynamics import Compressor, Limiter, NoiseGate
        from whitebox_tpu.effects.eq import Biquad, ParametricEQ
        from whitebox_tpu.effects.gain import Gain
        from whitebox_tpu.effects.reverb import ConvolutionReverb
        from whitebox_tpu.effects.shape import Saturator, StereoWidth

        if chain is None:
            return x
        chain.prepare(sample_rate, channels)
        effs = chain.effects if isinstance(chain, EffectChain) else list(chain)
        for e in effs:
            if isinstance(e, Gain):
                x = x * float(e.gain_linear)
            elif isinstance(e, Biquad):
                x, _ = biquad_sequential(x, e.coeffs)
            elif isinstance(e, ParametricEQ):
                for c in e.coeffs:
                    x, _ = biquad_sequential(x, c)
            elif isinstance(e, Compressor):
                p = e.param_arrays()
                x = dyn.compressor_ref(x, threshold_db=p["threshold_db"], ratio=p["ratio"],
                                       knee_db=p["knee_db"], attack=p["attack"], release=p["release"],
                                       makeup_db=p["makeup_db"], detector=e.detector, det_avg=p["det_avg"])
            elif isinstance(e, Limiter):
                p = e.param_arrays()
                x = dyn.limiter_ref(x, ceiling_db=p["ceiling_db"], attack=p["attack"],
                                    release=p["release"], lookahead=e.lookahead)
            elif isinstance(e, NoiseGate):
                p = e.param_arrays()
                x = dyn.gate_ref(x, threshold_db=p["threshold_db"], range_db=p["range_db"],
                                 attack=p["attack"], release=p["release"])
            elif isinstance(e, Delay):
                if e.mode == "pingpong" and x.shape[0] == 2:
                    w = dl.comb_pingpong_ref(x, e.feedback, e.D)
                else:
                    w = dl.comb_feedback_ref(x, e.feedback, e.D)
                x = e.dry * x + e.wet * w
            elif isinstance(e, Chorus):  # covers Flanger
                fs = sample_rate
                F = x.shape[-1]
                acc = np.zeros_like(x)
                for v in range(e.voices):
                    taps = []
                    for c in range(x.shape[0]):
                        ph = 2.0 * np.pi * v / e.voices + c * 0.5 * np.pi
                        n = np.arange(F, dtype=np.float64)
                        d = e.center_s * fs + e.depth_s * fs * np.sin(
                            2.0 * np.pi * e.rate_hz / fs * n + ph
                        )
                        taps.append(dl.modulated_tap_ref(x[c], d.astype(np.float32).astype(np.float64)))
                    acc += np.stack(taps)
                x = e.dry * x + (e.wet / e.voices) * acc
            elif isinstance(e, ConvolutionReverb):
                ir = np.asarray(e._ir, np.float64)
                wet = np.stack([np.convolve(x[c], ir[c % ir.shape[0]])[: x.shape[-1]]
                                for c in range(x.shape[0])])
                x = e.dry * x + e.wet * wet
            elif isinstance(e, Saturator):
                p = e.param_arrays()
                shaped = np.tanh(p["drive"] * x) * p["norm"]
                x = p["mix"] * shaped + (1.0 - p["mix"]) * x
            elif isinstance(e, StereoWidth):
                if x.shape[0] == 2:
                    mid = 0.5 * (x[0] + x[1])
                    side = 0.5 * (x[0] - x[1]) * e.width
                    x = np.stack([mid + side, mid - side])
            else:
                raise TypeError(e)
        return x

    from whitebox_tpu.ops.automation import eval_lane_numpy, pack_session_automation, session_has_automation

    T, C, F = per_track.shape
    processed = np.stack([
        run_chain(chains[t], per_track[t].astype(np.float64)) for t in range(T)
    ])

    g = np.arange(F, dtype=np.int64)
    auto_tables = pack_session_automation(session, sample_rate) if session_has_automation(session) else None

    # gains + ordered sum (f64), master chain, clip — mirror reference_finish_mix
    total = np.zeros((C, F), dtype=np.float64)
    for t, track in enumerate(session.tracks):
        if track.automation is not None and auto_tables is not None:
            vol_t, pan_t, mute = auto_tables
            volv = eval_lane_numpy(vol_t["xs"][t], vol_t["ys"][t], vol_t["cv"][t], vol_t["tn"][t], g)
            panv = eval_lane_numpy(pan_t["xs"][t], pan_t["ys"][t], pan_t["cv"][t], pan_t["tn"][t], g)
            for ch in range(C):
                coef = (np.sin(np.float32(0.5 * np.pi) * ((1.0 - 0.5 * (panv + 1.0)) if ch == 0 else 0.5 * (panv + 1.0)).astype(np.float32)) * np.float32(np.sqrt(2.0))).astype(np.float32)
                gain = (volv * coef) * mute[t]
                total[ch] += processed[t][ch] * gain.astype(np.float64)
        else:
            vol = np.float32(0.0) if track.mute else track.volume_linear
            pan = track.pan_coeffs
            for ch in range(C):
                total[ch] += processed[t][ch] * float(np.float32(vol * np.float32(pan[ch % 2])))
    total = run_chain(master, total) if master is not None else total
    return np.clip(total, -1.0, 1.0).astype(np.float32)
