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

#: raw automatable parameter names per effect kind — the native-effects
#: analogue of a VST3 plugin's parameter list (plugin_interface.h:77-90).
#: Elementwise params evaluate per *frame* (finer than the reference's
#: block-rate queues); biquad/EQ design params evaluate per 512-frame
#: param block (ops.biquad.PARAM_BLOCK — the reference's buffer size) and
#: recompute coefficients on device. EQ band params are "b{i}.{name}".
AUTOMATABLE: dict[str, frozenset] = {
    "gain": frozenset({"gain_db"}),
    "biquad": frozenset({"freq_hz", "q", "gain_db"}),
    "compressor": frozenset({"threshold_db", "ratio", "knee_db", "makeup_db",
                             "attack_s", "release_s"}),
    "limiter": frozenset({"ceiling_db", "attack_s", "release_s"}),
    "gate": frozenset({"threshold_db", "range_db", "attack_s", "release_s"}),
    "delay": frozenset({"wet", "dry"}),
    "chorus": frozenset({"wet", "dry"}),
    "flanger": frozenset({"wet", "dry"}),
    "convreverb": frozenset({"wet", "dry"}),
    "saturator": frozenset({"drive_db", "mix"}),
    "width": frozenset({"width"}),
}


def automatable_params(kind: str, static: tuple = ()) -> frozenset:
    """Raw automatable names for one effect kind ("eq" expands per band)."""
    if kind == "eq":
        (nb,) = static[:1]
        return frozenset(f"b{i}.{n}" for i in range(nb) for n in ("freq_hz", "q", "gain_db"))
    if kind in AUTOMATABLE:
        return AUTOMATABLE[kind]
    from whitebox_tpu.effects.registry import lookup_effect

    cls = lookup_effect(kind)  # registered user effects opt in via a class attr
    return frozenset(getattr(cls, "automatable", ()) or ()) if cls else frozenset()


def _auto_default(e, kind: str, name: str) -> float:
    """The effect's current (static) value of an automatable raw param."""
    if kind == "eq":
        band, field_ = name.split(".", 1)
        t, f, q, g = e.bands[int(band[1:])]
        return {"freq_hz": f, "q": q, "gain_db": g}[field_]
    return float(getattr(e, name))


def _slot_auto_names(track_auto: dict, pos: int, kind: str, static: tuple, e) -> tuple:
    """Sorted automated raw-param names of chain slot ``pos`` (validated)."""
    names = sorted(p for (s, p) in track_auto.keys() if s == pos)
    if not names:
        return ()
    allowed = automatable_params(kind, static)
    bad = [n for n in names if n not in allowed]
    if bad:
        raise ValueError(
            f"effect {kind!r} (slot {pos}) has no automatable param(s) {bad}; "
            f"automatable: {sorted(allowed)}"
        )
    return tuple(names)


def _kind_of(e) -> str:
    """Stage kind alone — safe on UNPREPARED effects (``static_config``
    may legitimately need ``prepare()``'s sample rate, e.g. a designed-
    room ConvolutionReverb's ir_len). Predicates that run before the
    pipeline prepares its chains must use this, not ``_stage_kind``."""
    from whitebox_tpu.effects.eq import Biquad, ParametricEQ
    from whitebox_tpu.effects.gain import Gain

    if isinstance(e, Gain):
        return "gain"
    if isinstance(e, Biquad):
        return "biquad"
    if isinstance(e, ParametricEQ):
        return "eq"
    return e.name


def _stage_kind(e) -> tuple[str, tuple]:
    """(kind, static-config) of one effect — the grouping signature entry.
    Requires prepared effects (static_config may depend on sample rate)."""
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
    """True if every effect reduces to biquad sections (LTI fast paths).
    Runs pre-prepare, so it must not touch static configs."""
    from whitebox_tpu.effects.base import EffectChain

    if chain is None:
        return True
    effs = chain.effects if isinstance(chain, EffectChain) else list(chain)
    return all(_kind_of(e) in _PACKABLE for e in effs)


def session_fx_packable(session: Session) -> bool:
    from whitebox_tpu.ops.automation import session_has_effect_automation

    if session_has_effect_automation(session):
        return False  # timed effect params run in the generic TV pipeline
    chains, master = _chains_of(session)
    return all(chain_is_packable(c) for c in chains) and chain_is_packable(master)


def _stage_params(e, kind: str, auto: tuple = ()) -> dict[str, np.ndarray]:
    """Per-effect parameter arrays (stacked later across the group).

    With ``auto`` (automated raw-param names), biquad/EQ stages pack raw
    design values instead of precomputed coefficients — the device
    redesigns per param block (design_biquad_device)."""
    from whitebox_tpu.effects.gain import Gain

    if kind == "gain":
        return {"g": np.float32(e.gain_linear)}
    if kind == "biquad":
        if auto:
            return {"freq": np.float32(e.freq_hz), "q": np.float32(e.q),
                    "gain_db": np.float32(e.gain_db)}
        assert e.coeffs is not None, "effect not prepared"
        return {"pa": coeffs_device_arrays(e.coeffs)}  # [9]
    if kind == "eq":
        if auto:
            return {
                "freq": np.asarray([b[1] for b in e.bands], np.float32),
                "q": np.asarray([b[2] for b in e.bands], np.float32),
                "gain_db": np.asarray([b[3] for b in e.bands], np.float32),
            }
        assert e.coeffs, "effect not prepared"
        return {"pa": np.stack([coeffs_device_arrays(c) for c in e.coeffs])}  # [nb, 9]
    p = {k: np.asarray(v, np.float32) for k, v in e.param_arrays().items()}
    if kind in ("convreverb", "linphase"):
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


def _stage_sig_entry(e, kind: str, static: tuple, names: tuple):
    """Grouping-signature entry; TV biquad/EQ stages carry their filter
    types in ``static`` (the device redesign needs them)."""
    if names and kind == "biquad":
        static = (e.ftype.value,)
    elif names and kind == "eq":
        static = (static[0], tuple(b[0].value for b in e.bands))
    return kind, static, names


def _pack_stage_auto(session, chains, tracks, pos, kind, names, sample_rate, auto_of):
    """Lane tables {name: {xs,ys,cv,tn} [B, P]} for one automated stage."""
    from whitebox_tpu.ops.automation import pack_lane_tables

    tables = {}
    for name in names:
        lanes, defaults = [], []
        for t in tracks:
            e = _chain_stages(chains[t])[pos][0]
            lanes.append(auto_of(t).get((pos, name)))
            defaults.append(_auto_default(e, kind, name))
        tables[name] = pack_lane_tables(lanes, defaults, sample_rate, session.time_base)
    return tables


def _group_stages(session, chains, sig, tracks, sample_rate, auto_of):
    stages = []
    for pos, (kind, static, names) in enumerate(sig):
        stacked: dict[str, list] = {}
        for t in tracks:
            e = _chain_stages(chains[t])[pos][0]
            for k, v in _stage_params(e, kind, auto=names).items():
                stacked.setdefault(k, []).append(v)
        params = {k: np.stack(v) for k, v in stacked.items()}  # host numpy
        if names:
            params["auto"] = _pack_stage_auto(
                session, chains, tracks, pos, kind, names, sample_rate, auto_of
            )
        stages.append((kind, static, params))
    return stages


def prepare_generic_fx(session: Session, sample_rate: float, channels: int = 2) -> GenericFX:
    chains, master = _chains_of(session)
    for c in chains:
        if c is not None:
            c.prepare(sample_rate, channels)
    fx = GenericFX(sample_rate=float(sample_rate), channels=channels)

    def track_lanes(t: int) -> dict:
        a = session.tracks[t].automation
        return a.effects if (a is not None and a.effects) else {}

    by_sig: dict[tuple, list[int]] = {}
    for t, c in enumerate(chains):
        stages_t = _chain_stages(c) if c is not None else []
        eff_lanes = track_lanes(t)
        bad = [s for (s, _) in eff_lanes.keys() if s >= len(stages_t)]
        if bad:
            raise ValueError(
                f"track {t} automates effect slot(s) {sorted(set(bad))} but its "
                f"chain has {len(stages_t)} effect(s)"
            )
        if not stages_t:
            continue
        sig = tuple(
            _stage_sig_entry(e, kind, static,
                             _slot_auto_names(eff_lanes, pos, kind, static, e))
            for pos, (e, kind, static) in enumerate(stages_t)
        )
        by_sig.setdefault(sig, []).append(t)

    for sig, tracks in by_sig.items():
        stages = _group_stages(session, chains, sig, tracks, sample_rate, track_lanes)
        fx.groups.append(_Group(np.asarray(tracks, np.int64), stages))

    if master is not None and len(_chain_stages(master)) > 0:
        master.prepare(sample_rate, channels)
        mlanes = dict(getattr(session, "master_automation", {}) or {})
        mstages = _chain_stages(master)
        bad = [s for (s, _) in mlanes.keys() if s >= len(mstages)]
        if bad:
            raise ValueError(
                f"master automation targets slot(s) {sorted(set(bad))} but the "
                f"master chain has {len(mstages)} effect(s)"
            )
        sig = tuple(
            _stage_sig_entry(e, kind, static,
                             _slot_auto_names(mlanes, pos, kind, static, e))
            for pos, (e, kind, static) in enumerate(mstages)
        )
        stages = _group_stages(session, [master], sig, [0], sample_rate, lambda _t: mlanes)
        fx.master = _Group(np.asarray([0], np.int64), stages)
    return fx


def device_params(fx: GenericFX):
    """Params pytrees mirroring fx.groups / fx.master stage lists.

    Parameters travel as *jit arguments*, never closure constants: captured
    device arrays would be embedded as MLIR constants, which forces a
    device->host readback that remote-relay backends (axon) can't serve —
    and would recompile on every parameter change anyway."""
    def dev(params):
        out = {}
        for k, v in params.items():
            if k == "auto":  # nested lane tables {name: {xs,ys,cv,tn}}
                out[k] = {n: {kk: jnp.asarray(t) for kk, t in tab.items()}
                          for n, tab in v.items()}
            else:
                out[k] = jnp.asarray(v)
        return out

    gp = [[dev(params) for (_, _, params) in g.stages] for g in fx.groups]
    mp = ([dev(params) for (_, _, params) in fx.master.stages]
          if fx.master is not None else [])
    return gp, mp


def _with_ir_ffts(fx: GenericFX, gparams, mparams, chunk: int):
    """TRACED: add each conv-reverb stage's IR spectrum at the chunk's FFT
    size ("ir_f"), computed once per call — scan bodies don't get
    loop-invariant code motion, so this must happen outside the scan."""

    def xform(stages, plist):
        out = []
        for (kind, static, _), params in zip(stages, plist):
            if kind in ("convreverb", "linphase"):
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
        nb = static[0]
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
    if kind in ("convreverb", "linphase"):
        (L,) = static
        return {"carry": z(B, C, L - 1)}
    cls = _registered_stage_cls(kind)
    if cls is not None:
        return cls.stage_init_state(static, params, B, C)
    raise ValueError(f"unknown effect kind {kind!r}")


def _registered_stage_cls(kind: str):
    """Registered user-effect class implementing the stage protocol, or
    None (see effects/registry.py — the plughost extensibility hook)."""
    from whitebox_tpu.effects.registry import UnknownEffect, lookup_effect

    if kind == UnknownEffect.name:  # unregistered persisted effect: bypass
        return UnknownEffect
    cls = lookup_effect(kind)
    if cls is None:
        return None
    if not (callable(getattr(cls, "stage_init_state", None))
            and callable(getattr(cls, "stage_apply", None))):
        raise ValueError(
            f"registered effect {kind!r} ({cls.__name__}) lacks the stage "
            f"protocol (stage_init_state/stage_apply classmethods) required "
            f"for batched pipelines; render it via Effect.process or add them"
        )
    return cls


def _conv_ir_f(params, ir_len: int, Fc: int):
    from whitebox_tpu.effects.reverb import _next_pow2

    nfft = _next_pow2(Fc + ir_len - 1)
    return jnp.fft.rfft(params["ir"], nfft, axis=-1)  # [B, C, K]


_LN10_20 = float(np.log(10.0) / 20.0)


def _db_to_lin_dev(db):
    """f32 device dB->linear with the engine's -72 dB silence floor
    (automation evaluates in f32; the bit-exact powf path is only for the
    static fader values)."""
    return jnp.where(db > -72.0, jnp.exp(jnp.float32(_LN10_20) * db), jnp.float32(0.0))


def _time_coef_dev(t_s, sample_rate: float):
    """Device mirror of ops.dynamics.time_coef: exp(-1/(t*fs)), 0 at t<=0."""
    return jnp.where(
        t_s <= 0.0, jnp.float32(0.0),
        jnp.exp(-1.0 / jnp.maximum(t_s * jnp.float32(sample_rate), 1e-12)),
    )


def _eval_stage_lanes(kind: str, params, n0, Fc: int):
    """Evaluate a stage's automation lane tables at this chunk's frames.

    Elementwise params -> per-frame values [B, Fc]; biquad/EQ design
    params -> per-param-block values [B, K] at block-start frames."""
    from whitebox_tpu.ops.automation import eval_lanes_device

    auto_tab = params.get("auto")
    if not auto_tab:
        return {}
    if kind in ("biquad", "eq"):
        from whitebox_tpu.ops.biquad import PARAM_BLOCK

        g = n0 + jnp.arange(max(Fc // PARAM_BLOCK, 1), dtype=jnp.int32) * PARAM_BLOCK
    else:
        g = n0 + jnp.arange(Fc, dtype=jnp.int32)
    return {name: eval_lanes_device(tab, g) for name, tab in auto_tab.items()}


def _tv_biquad_rows(ftype, freq, q, gain_db, x2, state, sample_rate: float, C: int):
    """TV biquad over rows: freq/q/gain_db [B, K]; x2 [B*C, F] (row b*C+c);
    state [B*C, 2] z coords."""
    from whitebox_tpu.ops.biquad import (
        BiquadType, biquad_scan_blocked_tv, design_biquad_device, tv_section_params,
    )

    d = design_biquad_device(BiquadType(ftype), freq, q, gain_db, sample_rate)
    p9, P, Pinv, aux = tv_section_params(d)
    rep = lambda a: jnp.repeat(a, C, axis=0)  # [B, K, ...] -> [B*C, K, ...]
    F = x2.shape[-1]
    K = freq.shape[-1]
    PBv = -(-F // K)
    pad = K * PBv - F
    if pad:  # safety net only: framework chunk sizes are 512-multiples
        x2 = jnp.pad(x2, ((0, 0), (0, pad)))
    y, z = biquad_scan_blocked_tv(
        x2, [rep(p) for p in p9], rep(P), rep(Pinv), state, PB=PBv,
        aux={k: rep(v) for k, v in aux.items()},
    )
    return (y[:, :F] if pad else y), z


def _tv_vals(lanes, params, lane_name: str, raw_key: str, K: int, band: int | None = None):
    """[B, K] design values: the lane where automated, else the base value."""
    v = lanes.get(lane_name)
    if v is not None:
        return v
    base = params[raw_key] if band is None else params[raw_key][:, band]
    return jnp.broadcast_to(base[:, None], (base.shape[0], K))


def _apply_stage(kind: str, static: tuple, params, x, state, n0, sample_rate: float,
                 key=None):
    """x [B, C, Fc] -> (y, new_state). ``n0``: absolute start frame (traced).

    Stages with an "auto" entry in ``params`` (timed effect-param lanes —
    the param_changes.h analogue) evaluate their lanes here: elementwise
    params per frame, biquad/EQ coefficients per 512-frame param block.
    ``key`` [B, C, Fc]: external sidechain detector signal, consumed by
    compressor/gate stages whose static config flags sidechain=True
    (delivered by the routed pipelines from sidechain sends)."""
    B, C, Fc = x.shape
    col = lambda a: a[:, None]  # [B] -> [B, 1] (broadcast against [B, F])
    lanes = _eval_stage_lanes(kind, params, n0, Fc)

    def mix_coef(name):  # wet/dry/mix lane [B,1,Fc] or static [B,1,1]
        return lanes[name][:, None, :] if name in lanes else params[name][:, None, None]

    if kind == "gain":
        if "gain_db" in lanes:
            return x * _db_to_lin_dev(lanes["gain_db"])[:, None, :], state
        return x * params["g"][:, None, None], state
    if kind == "biquad":
        if static:  # TV form: static == (ftype_value,)
            K = lanes[next(iter(lanes))].shape[-1] if lanes else Fc // 512
            freq = _tv_vals(lanes, params, "freq_hz", "freq", K)
            qv = _tv_vals(lanes, params, "q", "q", K)
            gv = _tv_vals(lanes, params, "gain_db", "gain_db", K)
            y, ns = _tv_biquad_rows(static[0], freq, qv, gv, x.reshape(B * C, Fc),
                                    state, sample_rate, C)
            return y.reshape(B, C, Fc), ns
        arrs = [jnp.repeat(params["pa"][:, j : j + 1], C, axis=0) for j in range(9)]
        y, ns = biquad_scan_batched(x.reshape(B * C, Fc), arrs, state)
        return y.reshape(B, C, Fc), ns
    if kind == "eq":
        nb = static[0]
        y = x.reshape(B * C, Fc)
        new_states = []
        if len(static) > 1 and isinstance(static[1], tuple):  # TV form
            ftypes = static[1]
            K = lanes[next(iter(lanes))].shape[-1]
            for b in range(nb):
                freq = _tv_vals(lanes, params, f"b{b}.freq_hz", "freq", K, band=b)
                qv = _tv_vals(lanes, params, f"b{b}.q", "q", K, band=b)
                gv = _tv_vals(lanes, params, f"b{b}.gain_db", "gain_db", K, band=b)
                y, ns = _tv_biquad_rows(ftypes[b], freq, qv, gv, y, state[b],
                                        sample_rate, C)
                new_states.append(ns)
            return y.reshape(B, C, Fc), new_states
        for b in range(nb):
            arrs = [jnp.repeat(params["pa"][:, b, j : j + 1], C, axis=0) for j in range(9)]
            y, ns = biquad_scan_batched(y, arrs, state[b])
            new_states.append(ns)
        return y.reshape(B, C, Fc), new_states
    if kind in ("compressor", "limiter", "gate"):
        p = {k: col(v) for k, v in params.items() if k != "auto"}
        for nm in ("threshold_db", "ratio", "knee_db", "makeup_db", "ceiling_db", "range_db"):
            if nm in lanes:
                p[nm] = lanes[nm]
        if "attack_s" in lanes:
            p["attack"] = _time_coef_dev(lanes["attack_s"], sample_rate)
        if "release_s" in lanes:
            p["release"] = _time_coef_dev(lanes["release_s"], sample_rate)
        if key is None:
            key = jnp.zeros_like(x)  # sidechain with nothing routed hears silence
        if kind == "compressor":
            from whitebox_tpu.ops.dynamics import compressor_process

            detector, sc = static
            return compressor_process(x, p, state, detector=detector,
                                      key=key if sc else None)
        if kind == "limiter":
            from whitebox_tpu.ops.dynamics import limiter_process

            (L,) = static
            return limiter_process(x, p, state, lookahead=L)
        from whitebox_tpu.ops.dynamics import gate_process

        (sc,) = static
        return gate_process(x, p, state, key=key if sc else None)
    if kind == "delay":
        from whitebox_tpu.ops.delay import comb_feedback, comb_feedback_pingpong

        mode, D = static
        fb = params["feedback"][:, None, None, None]  # broadcast vs [B, *, *, D]
        if mode == "pingpong" and C == 2:
            w, wl, xl = comb_feedback_pingpong(x, fb, state["w"], state["x"], D=D)
        else:
            w, wl, xl = comb_feedback(x, fb, state["w"], state["x"], D=D)
        y = mix_coef("dry") * x + mix_coef("wet") * w
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
                n0, Fc,
                depth_frames=params["depth"][:, None, None],
                center_frames=params["center"][:, None, None],
                phase=phases,
                rate_splits=params["rate_splits"][:, None, None, :],
            )
            tap, new_tail = modulated_tap(x, d, state["xtail"], max_delay=MT)
            acc = acc + tap
        wet = mix_coef("wet") / float(voices)
        return mix_coef("dry") * x + wet * acc, {"xtail": new_tail}
    if kind == "convreverb":
        from whitebox_tpu.effects.reverb import fft_convolve_chunk

        (L,) = static
        ir_f = params["ir_f"] if "ir_f" in params else _conv_ir_f(params, L, Fc)
        wetsig, carry = fft_convolve_chunk(x, ir_f, L, state["carry"])
        y = mix_coef("dry") * x + mix_coef("wet") * wetsig
        return y, {"carry": carry}
    if kind == "linphase":
        from whitebox_tpu.effects.reverb import fft_convolve_chunk

        (L,) = static
        ir_f = params["ir_f"] if "ir_f" in params else _conv_ir_f(params, L, Fc)
        y, carry = fft_convolve_chunk(x, ir_f, L, state["carry"])
        return y, {"carry": carry}
    if kind == "saturator":
        if "drive_db" in lanes:
            drive = jnp.exp(jnp.float32(_LN10_20) * lanes["drive_db"])[:, None, :]
            norm = 1.0 / jnp.tanh(drive)
        else:
            drive = params["drive"][:, None, None]
            norm = params["norm"][:, None, None]
        shaped = jnp.tanh(drive * x) * norm
        m = mix_coef("mix")
        return m * shaped + (1.0 - m) * x, state
    if kind == "width":
        if C != 2:
            return x, state
        w = lanes["width"] if "width" in lanes else params["width"][:, None]
        mid = 0.5 * (x[:, 0, :] + x[:, 1, :])
        side = 0.5 * (x[:, 0, :] - x[:, 1, :]) * w
        return jnp.stack([mid + side, mid - side], axis=1), state
    cls = _registered_stage_cls(kind)
    if cls is not None:
        return cls.stage_apply(static, params, x, state, n0, sample_rate,
                               key=key, lanes=lanes)
    raise ValueError(f"unknown effect kind {kind!r}")


def _apply_group(group: _Group, plist, x, states, n0, sample_rate: float, key=None):
    new_states = []
    for (kind, static, _), params, st in zip(group.stages, plist, states):
        x, ns = _apply_stage(kind, static, params, x, st, n0, sample_rate, key=key)
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


#: per-stage-kind compile-cost weights: the scan-heavy kinds (log-depth
#: associative scans whose XLA programs grow with chunk length) dominate
#: compile time; memoryless kinds are ~free.
_COMPILE_WEIGHT = {
    "gain": 0, "saturator": 0, "width": 0,
    "biquad": 1, "eq": 1, "convreverb": 1, "linphase": 1,
    "delay": 2, "chorus": 2, "flanger": 2,
    "compressor": 4, "limiter": 5, "gate": 4,
}

PARAM_BLOCK_MIN = 512  # chunks stay PARAM_BLOCK-aligned for TV stages


def auto_chunk_frames(fx: GenericFX, requested: int = 1 << 16) -> int:
    """Chunk length for the generic scan, bounded by chain compile cost.

    A compressor chain traced at 1<<17 frames compiles pathologically
    (>9 min on CPU — the associative-scan program grows superlinearly with
    chunk length), while small chunks only add lax.scan iterations *inside
    the same jitted program* (no extra dispatches). So: weigh the session's
    stages and shrink the chunk as cost grows. Closes the
    init-once/process-many contract (plugin_interface.h:142) without
    per-session folklore."""
    cost = 0
    groups = list(fx.groups) + ([fx.master] if fx.master is not None else [])
    for g in groups:
        for (kind, static, params) in g.stages:
            w = _COMPILE_WEIGHT.get(kind, 3)
            if "auto" in params:
                w += 1  # lane evaluation + TV redesign add program size
            cost += w
    if cost <= 2:
        cap = 1 << 16
    elif cost <= 10:
        cap = 1 << 14
    else:
        # heavy tier: measured on v5e (benchmarks/routed_chunk_sweep.py,
        # config 6 routed sidechain: 8192 -> 189x, 16384 -> 228x,
        # 32768 -> 191x RT) — TPU wants 16k chunks; CPU keeps 8k (the
        # same chain traced at 16k+ compiles minutes-slow on test hosts)
        cap = 1 << 13 if jax.default_backend() == "cpu" else 1 << 14
    return max(min(requested, cap), PARAM_BLOCK_MIN)


def stage_latency_frames(stages) -> int:
    """Chain processing latency from the stage list: limiter lookahead
    (static[0]) + linear-phase EQ group delay ((taps-1)/2); all other
    native stages are zero-latency (plugin_interface latency query,
    aggregated per chain)."""
    lat = 0
    for (kind, static, _) in stages:
        if kind == "limiter":
            lat += int(static[0])
        elif kind == "linphase":
            lat += (int(static[0]) - 1) // 2
    return lat


def fx_latencies(fx: GenericFX) -> tuple[list[int], int]:
    """(per-group chain latency, master-chain latency) in frames. Chains
    grouped by signature share static configs, so latency is uniform
    within a group."""
    glat = [stage_latency_frames(g.stages) for g in fx.groups]
    mlat = stage_latency_frames(fx.master.stages) if fx.master is not None else 0
    return glat, mlat


def _pdc_preshift(fx: GenericFX, xall, glat: list[int]):
    """Advance each group's rows by that chain's latency (PDC fetch-ahead):
    a causal stateful chain fed input advanced by L emits output aligned to
    timeline time. Pure row shift with zero fill — one op outside the scan."""
    for g, lat in zip(fx.groups, glat):
        if lat > 0:
            rows = xall[g.track_idx]
            shifted = jnp.pad(rows[:, :, lat:], ((0, 0), (0, 0), (0, lat)))
            xall = xall.at[g.track_idx].set(shifted)
    return xall


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


def make_generic_stems_finisher(fx: GenericFX, T: int, C: int, *, chunk: int | None = None):
    """Stems form: fn(per_track [T, C, F], track_gain, auto) -> [T, C, F]
    post-chain post-gain (the track.cpp:728-733 feed point) — generic-chain
    counterpart of render/stems.stems_finish."""
    if chunk is None:
        chunk = auto_chunk_frames(fx)
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


def make_generic_finisher(fx: GenericFX, T: int, C: int, *, chunk: int | None = None,
                          with_meters: bool = False, valid_frames: int | None = None,
                          pdc: bool = False):
    """Build fn(per_track [T, C, F], track_gain, auto) -> mixed [C, F]
    (or (mixed, meters)). One jitted lax.scan over frame chunks; ``chunk``
    defaults to the compile-cost-bounded auto_chunk_frames.

    ``pdc=True`` enables latency compensation: each chain's input rows are
    advanced by that chain's latency (limiter lookahead) so all tracks sum
    timeline-aligned, and master-chain latency is absorbed by rendering
    that much further and trimming the head. Default off — the
    uncompensated path reproduces the effect family's delay semantics the
    per-effect references use."""
    if chunk is None:
        chunk = auto_chunk_frames(fx)
    glat, mlat = fx_latencies(fx) if pdc else ([0] * len(fx.groups), 0)
    gp0, mp0 = device_params(fx)

    def finish(per_track, track_gain, gparams, mparams, auto=None):
        F = per_track.shape[-1]
        Fv = F if valid_frames is None else int(valid_frames)
        n_chunks = -(-(F + mlat) // chunk)
        Fp = n_chunks * chunk
        xall = jnp.pad(per_track, ((0, 0), (0, 0), (0, Fp - F)))
        if pdc:
            xall = _pdc_preshift(fx, xall, glat)
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
            mixed = outs.transpose(1, 0, 2).reshape(C, Fp)[:, mlat:mlat + F]
            denom = jnp.float32(max(Fv, 1))
            meters = (
                jnp.max(pk, axis=0),
                jnp.sqrt(jnp.sum(sq, axis=0) / denom),
                jnp.max(opk, axis=0),
                jnp.sqrt(jnp.sum(osq, axis=0) / denom),
            )
            return mixed, meters
        return outs.transpose(1, 0, 2).reshape(C, Fp)[:, mlat:mlat + F]

    jfinish = jax.jit(finish)
    return lambda per_track, track_gain, auto=None: jfinish(per_track, track_gain, gp0, mp0, auto)


# ---------------------------------------------------------------------------
# host-side f64 reference (test oracle)
# ---------------------------------------------------------------------------


def _ref_lane_values(lane, default: float, g: np.ndarray, sample_rate: float,
                     time_base) -> np.ndarray:
    """Host lane evaluation at frames ``g`` -> f64 values (f32 lane eval,
    widened — mirroring the device's f32 lane evaluation)."""
    from whitebox_tpu.ops.automation import eval_lane_numpy, lane_frame_table

    P = max(len(lane.points), 1) if lane is not None else 1
    xs, ys, cv, tn = lane_frame_table(lane, sample_rate, time_base, P, float(default))
    return eval_lane_numpy(xs, ys, cv, tn, g).astype(np.float64)


def _ref_db_to_lin(db: np.ndarray) -> np.ndarray:
    """f64 dB->linear with the -72 dB silence floor (automation spec)."""
    return np.where(np.asarray(db) > -72.0, 10.0 ** (np.asarray(db, np.float64) / 20.0), 0.0)


def _ref_time_coef(t_s: np.ndarray, sample_rate: float) -> np.ndarray:
    t = np.asarray(t_s, np.float64)
    with np.errstate(divide="ignore"):
        return np.where(t <= 0.0, 0.0, np.exp(-1.0 / np.maximum(t * sample_rate, 1e-12)))


def reference_run_chain(chain, x, eff_lanes, sample_rate, channels, bd, key=None):
    """f64 sequential reference for one effect chain on x [C, F]
    (extracted from reference_generic_finish so routed-bus references
    can reuse it; supports the full family + timed effect-param lanes).
    ``key`` [C, F]: sidechain detector signal for sidechain-flagged
    dynamics stages (silence when None).
    """
    from whitebox_tpu.ops import delay as dl
    from whitebox_tpu.ops import dynamics as dyn
    from whitebox_tpu.ops.biquad import PARAM_BLOCK, biquad_sequential, biquad_sequential_tv

    from whitebox_tpu.effects.base import EffectChain
    from whitebox_tpu.effects.delay import Chorus, Delay
    from whitebox_tpu.effects.dynamics import Compressor, Limiter, NoiseGate
    from whitebox_tpu.effects.eq import Biquad, LinearPhaseEQ, ParametricEQ
    from whitebox_tpu.effects.gain import Gain
    from whitebox_tpu.effects.reverb import ConvolutionReverb
    from whitebox_tpu.effects.shape import Saturator, StereoWidth

    if chain is None:
        return x
    chain.prepare(sample_rate, channels)
    effs = chain.effects if isinstance(chain, EffectChain) else list(chain)
    F = x.shape[-1]
    gf = np.arange(F, dtype=np.int64)
    K = max(F // PARAM_BLOCK, 1)
    gk = np.arange(K, dtype=np.int64) * PARAM_BLOCK

    def lane_vals(pos, name, default, g=None):
        lane = (eff_lanes or {}).get((pos, name))
        if lane is None:
            return None
        return _ref_lane_values(lane, default, gf if g is None else g, sample_rate, bd)

    def lane_or(pos, name, default, g=None):
        v = lane_vals(pos, name, default, g)
        return default if v is None else v

    def coeff_lane(pos, name, default):
        return np.broadcast_to(
            np.asarray(lane_or(pos, name, float(default), gk), np.float64), (K,)
        )

    for pos, e in enumerate(effs):
        slot_auto = any(s == pos for (s, _) in (eff_lanes or {}).keys())
        if isinstance(e, Gain):
            v = lane_vals(pos, "gain_db", e.gain_db)
            x = x * (_ref_db_to_lin(v) if v is not None else float(e.gain_linear))
        elif isinstance(e, Biquad):
            if slot_auto:
                x, _ = biquad_sequential_tv(
                    x, e.ftype, coeff_lane(pos, "freq_hz", e.freq_hz),
                    coeff_lane(pos, "q", e.q), coeff_lane(pos, "gain_db", e.gain_db),
                    sample_rate, PARAM_BLOCK,
                )
            else:
                x, _ = biquad_sequential(x, e.coeffs)
        elif isinstance(e, ParametricEQ):
            if slot_auto:
                for b, (t, f, q, g_) in enumerate(e.bands):
                    x, _ = biquad_sequential_tv(
                        x, t, coeff_lane(pos, f"b{b}.freq_hz", f),
                        coeff_lane(pos, f"b{b}.q", q),
                        coeff_lane(pos, f"b{b}.gain_db", g_),
                        sample_rate, PARAM_BLOCK,
                    )
            else:
                for c in e.coeffs:
                    x, _ = biquad_sequential(x, c)
        elif isinstance(e, LinearPhaseEQ):
            # causal linear FIR (the device overlap-save path trimmed to F)
            ir = np.asarray(e._ir, np.float64)
            x = np.stack([np.convolve(x[c], ir[c % ir.shape[0]])[: x.shape[-1]]
                          for c in range(x.shape[0])])
        elif isinstance(e, Compressor):
            p = e.param_arrays()
            av = lane_vals(pos, "attack_s", e.attack_s)
            rv = lane_vals(pos, "release_s", e.release_s)
            x = dyn.compressor_ref(
                x,
                threshold_db=lane_or(pos, "threshold_db", p["threshold_db"]),
                ratio=lane_or(pos, "ratio", p["ratio"]),
                knee_db=lane_or(pos, "knee_db", p["knee_db"]),
                attack=p["attack"] if av is None else _ref_time_coef(av, sample_rate),
                release=p["release"] if rv is None else _ref_time_coef(rv, sample_rate),
                makeup_db=lane_or(pos, "makeup_db", p["makeup_db"]),
                detector=e.detector, det_avg=p["det_avg"],
                key=(np.zeros_like(x) if key is None else key) if e.sidechain else None,
            )
        elif isinstance(e, Limiter):
            p = e.param_arrays()
            av = lane_vals(pos, "attack_s", e.attack_s)
            rv = lane_vals(pos, "release_s", e.release_s)
            x = dyn.limiter_ref(
                x, ceiling_db=lane_or(pos, "ceiling_db", p["ceiling_db"]),
                attack=p["attack"] if av is None else _ref_time_coef(av, sample_rate),
                release=p["release"] if rv is None else _ref_time_coef(rv, sample_rate),
                lookahead=e.lookahead,
            )
        elif isinstance(e, NoiseGate):
            p = e.param_arrays()
            av = lane_vals(pos, "attack_s", e.attack_s)
            rv = lane_vals(pos, "release_s", e.release_s)
            x = dyn.gate_ref(
                x, threshold_db=lane_or(pos, "threshold_db", p["threshold_db"]),
                range_db=lane_or(pos, "range_db", p["range_db"]),
                attack=p["attack"] if av is None else _ref_time_coef(av, sample_rate),
                release=p["release"] if rv is None else _ref_time_coef(rv, sample_rate),
                hysteresis_db=p.get("hyst_db", 0.0),
                key=(np.zeros_like(x) if key is None else key) if e.sidechain else None,
            )
        elif isinstance(e, Delay):
            if e.mode == "pingpong" and x.shape[0] == 2:
                w = dl.comb_pingpong_ref(x, e.feedback, e.D)
            else:
                w = dl.comb_feedback_ref(x, e.feedback, e.D)
            x = lane_or(pos, "dry", e.dry) * x + lane_or(pos, "wet", e.wet) * w
        elif isinstance(e, Chorus):  # covers Flanger
            fs = sample_rate
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
            x = lane_or(pos, "dry", e.dry) * x + (lane_or(pos, "wet", e.wet) / e.voices) * acc
        elif isinstance(e, ConvolutionReverb):
            ir = np.asarray(e._ir, np.float64)
            wet = np.stack([np.convolve(x[c], ir[c % ir.shape[0]])[: x.shape[-1]]
                            for c in range(x.shape[0])])
            x = lane_or(pos, "dry", e.dry) * x + lane_or(pos, "wet", e.wet) * wet
        elif isinstance(e, Saturator):
            p = e.param_arrays()
            dv = lane_vals(pos, "drive_db", e.drive_db)
            if dv is not None:
                drive = 10.0 ** (dv / 20.0)
                norm = 1.0 / np.tanh(drive)
            else:
                drive, norm = p["drive"], p["norm"]
            m = lane_or(pos, "mix", p["mix"])
            shaped = np.tanh(drive * x) * norm
            x = m * shaped + (1.0 - m) * x
        elif isinstance(e, StereoWidth):
            if x.shape[0] == 2:
                mid = 0.5 * (x[0] + x[1])
                side = 0.5 * (x[0] - x[1]) * lane_or(pos, "width", e.width)
                x = np.stack([mid + side, mid - side])
        else:
            from whitebox_tpu.effects.registry import UnknownEffect, type_name_of

            if isinstance(e, UnknownEffect):
                pass  # unregistered persisted effect: bypass (see registry.py)
            elif callable(getattr(e, "reference_process", None)):
                # registered user effect's own f64 host reference; automated
                # params hand over per-frame lane values {name: [F]}
                ref_lanes = {}
                for name in getattr(type(e), "automatable", ()) or ():
                    v = lane_vals(pos, name, float(getattr(e, name)))
                    if v is not None:
                        ref_lanes[name] = np.asarray(v, np.float64)
                x = np.asarray(
                    e.reference_process(np.asarray(x, np.float64),
                                        lanes=ref_lanes or None),
                    np.float64,
                )
            elif type_name_of(type(e)) is not None:
                # fall back to the effect's own process() as its reference
                import jax.numpy as jnp

                y, _ = e.process(jnp.asarray(x, jnp.float32),
                                 e.init_state(x.shape[0]))
                x = np.asarray(y, np.float64)
            else:
                raise TypeError(e)
    return x


def reference_generic_finish(per_track: np.ndarray, session: Session, sample_rate: float,
                             channels: int = 2, pdc: bool = False) -> np.ndarray:
    """Sequential host reference: per-effect f64 reference models, f64
    gains/sum, hard clip. Mirrors reference_finish_mix but supports the
    full effect family, including timed effect-param lanes (per-frame for
    elementwise params; per-PARAM_BLOCK coefficient redesign for
    biquad/EQ, TDF2 state carried across changes).

    ``pdc=True`` mirrors the device PDC: each track's chain input is
    advanced by that chain's latency; master latency is absorbed by
    extending the mix and trimming the head."""
    from whitebox_tpu.ops import delay as dl
    from whitebox_tpu.ops import dynamics as dyn
    from whitebox_tpu.ops.biquad import PARAM_BLOCK, biquad_sequential, biquad_sequential_tv

    chains, master = _chains_of(session)
    bd = session.time_base

    def run_chain(chain, x, eff_lanes=None):
        return reference_run_chain(chain, x, eff_lanes, sample_rate, channels, bd)

    from whitebox_tpu.ops.automation import eval_lane_numpy, pack_session_automation, session_has_automation

    T, C, F = per_track.shape

    def track_lanes(t):
        a = session.tracks[t].automation
        return a.effects if (a is not None and a.effects) else None

    def chain_input(t):
        x = per_track[t].astype(np.float64)
        if pdc and chains[t] is not None:
            chains[t].prepare(sample_rate, channels)
            lat = chains[t].latency_frames()
            if lat > 0:  # PDC fetch-ahead: advance the chain input by lat
                x = np.pad(x[:, lat:], ((0, 0), (0, lat)))
        return x

    processed = np.stack([
        run_chain(chains[t], chain_input(t), track_lanes(t)) for t in range(T)
    ])

    g = np.arange(F, dtype=np.int64)
    auto_tables = pack_session_automation(session, sample_rate) if session_has_automation(session) else None

    # gains + ordered sum (f64), master chain, clip — mirror reference_finish_mix
    # (tracks with *only* effect lanes keep the bit-parity constant gains)
    total = np.zeros((C, F), dtype=np.float64)
    for t, track in enumerate(session.tracks):
        if track.automation is not None and track.automation.has_track_lanes() and auto_tables is not None:
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
    mlanes = dict(getattr(session, "master_automation", {}) or {}) or None
    if master is not None:
        mlat = 0
        if pdc:
            master.prepare(sample_rate, channels)
            mlat = master.latency_frames()
        if mlat > 0:  # absorb master latency: render further, trim the head
            total = np.pad(total, ((0, 0), (0, mlat)))
            total = run_chain(master, total, mlanes)[:, mlat:]
        else:
            total = run_chain(master, total, mlanes)
    return np.clip(total, -1.0, 1.0).astype(np.float32)
