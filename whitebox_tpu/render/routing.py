"""Routed mix finishing: buses, track groups, and sends on device.

Extends the generic finishing pipeline (render/effects_generic.py) with the
bus routing model of session/bus.py — the mixer surface the reference lacks
(SURVEY §2.9 "no master-bus effects/sends/groups"; engine.cpp:1600-1617
sums the flat track list straight into one output):

    track chains -> gains -> ROUTING -> bus chains -> bus gains -> master

The routing step is two small matrices applied on the MXU per chunk
(``r_post [1+B, T]`` over the post-fader signals, ``r_pre [B, T]`` over the
post-chain/pre-fader taps; Precision.HIGHEST — the TPU's default bf16
matmul floors audio at ~-60 dB). Bus chains reuse the generic stage
machinery (grouped by signature, stacked params, explicit state), so every
effect in the family can sit on a bus, with exact chunk-boundary state.

Sessions without routing never enter this module: ``bounce`` keeps the
bit-parity ordered-sum paths. Routed sessions trade the ordered track sum
for the routing matmul (f32, deterministic) and are validated against the
f64 host ground truth ``reference_routed_finish``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.render.effects_generic import (
    GenericFX,
    _Group,
    _apply_group,
    _chain_stages,
    _group_stages,
    _stage_sig_entry,
    auto_chunk_frames,
    device_params,
    init_generic_states,
    prepare_generic_fx,
    reference_run_chain,
)
from whitebox_tpu.render.effects_pipeline import _frame_gains
from whitebox_tpu.session.bus import build_routing_matrices, session_has_routing
from whitebox_tpu.session.session import Session

__all__ = [
    "RoutedFX",
    "prepare_routed_fx",
    "make_routed_finisher",
    "make_routed_chunk_fn",
    "init_routed_states",
    "reference_routed_finish",
    "routed_auto_chunk_frames",
    "session_has_routing",
]


@dataclass
class RoutedFX:
    """Prepared routed-finishing program: generic fx + bus groups + matrices."""

    fx: GenericFX
    bus_groups: list = field(default_factory=list)  # _Group over bus indices
    r_post: np.ndarray | None = None  # [1+B, T] f32
    r_pre: np.ndarray | None = None  # [B, T] f32
    bus_gain: np.ndarray | None = None  # [B, C] f32
    k_post: np.ndarray | None = None  # [B, T] f32 sidechain key sends
    k_pre: np.ndarray | None = None  # [B, T] f32
    num_buses: int = 0
    #: packed per-bus fader lanes (pack_bus_automation) or None — same
    #: (vol, pan, mute, use_auto) layout _frame_gains consumes for tracks
    bus_auto: object = None

    @property
    def has_key(self) -> bool:
        """True when any sidechain send exists (key einsum is needed)."""
        return bool((self.k_post is not None and self.k_post.any())
                    or (self.k_pre is not None and self.k_pre.any()))


def pack_bus_automation(session: Session, sample_rate: float):
    """Per-bus fader lanes -> the (vol, pan, mute, use_auto) jnp tuple
    ``_frame_gains`` consumes (None when no bus has fader lanes). Mirrors
    ops.automation.pack_session_automation over ``session.buses``."""
    from whitebox_tpu.ops.automation import lane_frame_table

    buses = getattr(session, "buses", [])
    lanes_of = lambda b: getattr(b, "automation", None)
    if not any(lanes_of(b) is not None and lanes_of(b).has_track_lanes() for b in buses):
        return None
    bd = session.time_base
    P = 1
    for b in buses:
        a = lanes_of(b)
        if a is not None:
            for lane in (a.volume, a.pan):
                if lane is not None:
                    P = max(P, len(lane.points))
    vol = {k: [] for k in ("xs", "ys", "cv", "tn")}
    pan = {k: [] for k in ("xs", "ys", "cv", "tn")}
    for b in buses:
        a = lanes_of(b)
        vl = a.volume if a is not None else None
        pl = a.pan if a is not None else None
        vx, vy, vc, vt = lane_frame_table(vl, sample_rate, bd, P, float(b.volume_linear))
        px, py, pc, pt_ = lane_frame_table(pl, sample_rate, bd, P, float(b.pan))
        for k, v in zip(("xs", "ys", "cv", "tn"), (vx, vy, vc, vt)):
            vol[k].append(v)
        for k, v in zip(("xs", "ys", "cv", "tn"), (px, py, pc, pt_)):
            pan[k].append(v)
    mute = np.array([0.0 if b.mute else 1.0 for b in buses], np.float32)
    use_auto = np.array([lanes_of(b) is not None and lanes_of(b).has_track_lanes()
                         for b in buses], bool)
    volj = {k: jnp.asarray(np.stack(v)) for k, v in vol.items()}
    panj = {k: jnp.asarray(np.stack(v)) for k, v in pan.items()}
    return (volj, panj, jnp.asarray(mute), jnp.asarray(use_auto))


def routed_auto_chunk_frames(rfx: RoutedFX, requested: int = 1 << 16) -> int:
    """auto_chunk_frames over the FULL routed program — track groups AND
    bus groups AND master. Weighing only rfx.fx would let a scan-heavy bus
    chain (e.g. a ducking compressor) blow the compile budget."""
    whole = GenericFX(groups=list(rfx.fx.groups) + list(rfx.bus_groups),
                      master=rfx.fx.master,
                      sample_rate=rfx.fx.sample_rate, channels=rfx.fx.channels)
    return auto_chunk_frames(whole, requested)


def _bus_chains_of(session: Session):
    from whitebox_tpu.effects.base import EffectChain

    chains = []
    for b in session.buses:
        if b.effects:
            chains.append(b.effects if isinstance(b.effects, EffectChain) else EffectChain(list(b.effects)))
        else:
            chains.append(None)
    return chains


def prepare_routed_fx(session: Session, sample_rate: float, channels: int = 2) -> RoutedFX:
    from whitebox_tpu.render.effects_generic import _slot_auto_names

    fx = prepare_generic_fx(session, sample_rate, channels)
    bus_chains = _bus_chains_of(session)
    for c in bus_chains:
        if c is not None:
            c.prepare(sample_rate, channels)

    def bus_lanes(b: int) -> dict:
        a = getattr(session.buses[b], "automation", None)
        return a.effects if (a is not None and a.effects) else {}

    by_sig: dict[tuple, list[int]] = {}
    for b, c in enumerate(bus_chains):
        stages_b = _chain_stages(c) if c is not None else []
        eff_lanes = bus_lanes(b)
        bad = [s for (s, _) in eff_lanes.keys() if s >= len(stages_b)]
        if bad:
            raise ValueError(
                f"bus {b} automates effect slot(s) {sorted(set(bad))} but its "
                f"chain has {len(stages_b)} effect(s)")
        if not stages_b:
            continue
        sig = tuple(_stage_sig_entry(e, kind, static,
                                     _slot_auto_names(eff_lanes, pos, kind, static, e))
                    for pos, (e, kind, static) in enumerate(stages_b))
        by_sig.setdefault(sig, []).append(b)
    bus_groups = [
        _Group(np.asarray(buses, np.int64),
               _group_stages(session, bus_chains, sig, buses, sample_rate, bus_lanes))
        for sig, buses in by_sig.items()
    ]
    m = build_routing_matrices(session, channels)
    return RoutedFX(fx=fx, bus_groups=bus_groups, r_post=m.r_post, r_pre=m.r_pre,
                    bus_gain=m.bus_gain, k_post=m.k_post, k_pre=m.k_pre,
                    num_buses=len(session.buses),
                    bus_auto=pack_bus_automation(session, sample_rate))


def routed_device_params(rfx: RoutedFX):
    """(gparams, bparams, mparams) + routing constants as jnp arrays."""
    gp, mp = device_params(rfx.fx)
    bfx = GenericFX(groups=rfx.bus_groups, master=None,
                    sample_rate=rfx.fx.sample_rate, channels=rfx.fx.channels)
    bp, _ = device_params(bfx)
    routing = (jnp.asarray(rfx.r_post), jnp.asarray(rfx.r_pre), jnp.asarray(rfx.bus_gain),
               jnp.asarray(rfx.k_post), jnp.asarray(rfx.k_pre))
    return gp, bp, mp, routing


def init_routed_states(rfx: RoutedFX, C: int):
    g_states, m_states = init_generic_states(rfx.fx, C)
    bfx = GenericFX(groups=rfx.bus_groups, master=None,
                    sample_rate=rfx.fx.sample_rate, channels=rfx.fx.channels)
    b_states, _ = init_generic_states(bfx, C)
    return g_states, b_states, m_states


def _with_ir_ffts_routed(rfx: RoutedFX, gparams, bparams, mparams, chunk: int):
    from whitebox_tpu.render.effects_generic import _with_ir_ffts

    gp, mp = _with_ir_ffts(rfx.fx, gparams, mparams, chunk)
    bfx = GenericFX(groups=rfx.bus_groups, master=None,
                    sample_rate=rfx.fx.sample_rate, channels=rfx.fx.channels)
    bp, _ = _with_ir_ffts(bfx, bparams, [], chunk)
    return gp, bp, mp


def _routed_chunk_step(rfx: RoutedFX, xc, states, params, routing, start,
                       track_gain, auto, T: int, C: int, with_meters: bool, Fv,
                       bauto=None, emit_parts: bool = False, bus_pdc=None):
    """One [T, C, chunk] slice: track chains -> gains -> routing matmul ->
    bus chains -> bus gains -> master chain -> clip."""
    fx = rfx.fx
    sample_rate = fx.sample_rate
    chunk = xc.shape[-1]
    g_states, b_states, m_states = states
    dstates = None
    if bus_pdc is not None:  # delay-line carries ride with the bus states
        b_states, dstates = b_states
    gparams, bparams, mparams = params
    r_post, r_pre, bus_gain, k_post, k_pre = routing

    new_g = []
    for g, pl, sts in zip(fx.groups, gparams, g_states):
        yg, ns = _apply_group(g, pl, xc[g.track_idx], sts, start, sample_rate)
        xc = xc.at[g.track_idx].set(yg)
        new_g.append(ns)
    gidx = start + jnp.arange(chunk, dtype=jnp.int32)
    gains = _frame_gains(auto, track_gain, gidx, T, C)
    y = xc * gains  # post-fader [T, C, chunk]; xc is the pre-fader tap

    # routing matmul: [1+B, T] x [T, C*chunk] (HIGHEST: default bf16 matmul
    # precision floors audio at ~-60 dB)
    hp = jax.lax.Precision.HIGHEST
    routed = jnp.einsum("bt,tcf->bcf", r_post, y, precision=hp,
                        preferred_element_type=jnp.float32)
    direct = routed[0]
    B = rfx.num_buses
    if B:
        bus_in = routed[1:] + jnp.einsum("bt,tcf->bcf", r_pre, xc, precision=hp,
                                         preferred_element_type=jnp.float32)
        key_in = None
        if rfx.has_key:
            # sidechain KEY inputs per bus [B, C, chunk] — same matmul form
            key_in = (jnp.einsum("bt,tcf->bcf", k_post, y, precision=hp,
                                 preferred_element_type=jnp.float32)
                      + jnp.einsum("bt,tcf->bcf", k_pre, xc, precision=hp,
                                   preferred_element_type=jnp.float32))
        new_b = []
        for g, pl, sts in zip(rfx.bus_groups, bparams, b_states):
            yb, ns = _apply_group(g, pl, bus_in[g.track_idx], sts, start, sample_rate,
                                  key=None if key_in is None else key_in[g.track_idx])
            bus_in = bus_in.at[g.track_idx].set(yb)
            new_b.append(ns)
        # per-frame bus fader (lanes where present, constants elsewhere —
        # _frame_gains is generic over the leading axis)
        bus_out = bus_in * _frame_gains(bauto, bus_gain, gidx, B, C)
        if emit_parts:  # bus-stem export: pre-master components
            return (direct, bus_out), (new_g, new_b, m_states), None
        if bus_pdc is not None:
            # bus-chain latency compensation: delay every master input to
            # the max bus latency BL (direct by BL, bus b by BL - lat_b),
            # so all paths align; the finisher trims BL from the head.
            # Delay = concat(carry, x) + keep-tail, the limiter's xdelay
            # pattern, with static per-row lengths.
            BL, dbs = bus_pdc
            new_d = dict(dstates)
            if BL > 0:
                seq = jnp.concatenate([dstates["direct"], direct], axis=-1)
                direct = seq[:, :chunk]
                new_d["direct"] = seq[:, chunk:]
            rows = []
            for b in range(B):
                row = bus_out[b]
                if dbs[b] > 0:
                    seq = jnp.concatenate([dstates[f"bus{b}"], row], axis=-1)
                    row = seq[:, :chunk]
                    new_d[f"bus{b}"] = seq[:, chunk:]
                rows.append(row)
            bus_out = jnp.stack(rows) if rows else bus_out
            total = direct + jnp.sum(bus_out, axis=0)
            new_b = (new_b, new_d)
        else:
            total = direct + jnp.sum(bus_out, axis=0)
    else:
        new_b = b_states
        total = direct
        if emit_parts:
            return (direct, jnp.zeros((0, C, chunk), jnp.float32)), \
                (new_g, new_b, m_states), None

    new_m = m_states
    if fx.master is not None:
        tm, new_m = _apply_group(fx.master, mparams, total[None], m_states, start, sample_rate)
        total = tm[0]
    total = jnp.where(total > 1.0, jnp.float32(1.0), total)
    total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
    meters = None
    if with_meters:
        if Fv is not None:
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
    return total, (new_g, new_b, new_m), meters


def make_routed_finisher(rfx: RoutedFX, T: int, C: int, *, chunk: int | None = None,
                         with_meters: bool = False, valid_frames: int | None = None,
                         pdc: bool = False):
    """fn(per_track [T, C, F], track_gain, auto) -> mixed [C, F]
    (or (mixed, meters)) — one jitted lax.scan over frame chunks.

    ``pdc=True``: track-chain latency compensated by input fetch-ahead;
    bus-chain latency by delaying every master input to the max bus
    latency (bus inputs are produced in-step, so fetch-ahead can't apply —
    the delay-to-align + head-trim form is exact instead); master latency
    by head trim (see make_generic_finisher)."""
    from whitebox_tpu.render.effects_generic import (
        _pdc_preshift, fx_latencies, stage_latency_frames,
    )

    if chunk is None:
        chunk = routed_auto_chunk_frames(rfx)
    glat, mlat = fx_latencies(rfx.fx) if pdc else ([0] * len(rfx.fx.groups), 0)
    B = rfx.num_buses
    blat = np.zeros(B, np.int64)
    if pdc:
        for g in rfx.bus_groups:
            lat = stage_latency_frames(g.stages)
            for b in np.asarray(g.track_idx):
                blat[int(b)] = lat
    BL = int(blat.max()) if (pdc and B) else 0
    dbs = tuple(int(BL - blat[b]) for b in range(B))
    bus_pdc = (BL, dbs) if (pdc and BL > 0) else None
    shift = mlat + BL  # total output head trim
    gp0, bp0, mp0, routing0 = routed_device_params(rfx)

    def finish(per_track, track_gain, gparams, bparams, mparams, routing, auto=None,
               bauto=None):
        F = per_track.shape[-1]
        Fv = F if valid_frames is None else int(valid_frames)
        n_chunks = -(-(F + shift) // chunk)
        Fp = n_chunks * chunk
        xall = jnp.pad(per_track, ((0, 0), (0, 0), (0, Fp - F)))
        if pdc:
            xall = _pdc_preshift(rfx.fx, xall, glat)
        gparams, bparams, mparams = _with_ir_ffts_routed(rfx, gparams, bparams, mparams, chunk)
        g0, b0, m0 = init_routed_states(rfx, C)
        if bus_pdc is not None:
            d0 = {"direct": jnp.zeros((C, BL), jnp.float32)}
            for b in range(B):
                if dbs[b] > 0:
                    d0[f"bus{b}"] = jnp.zeros((C, dbs[b]), jnp.float32)
            init = (g0, (b0, d0), m0)
        else:
            init = (g0, b0, m0)

        def body(carry, i):
            start = i * chunk
            xc = jax.lax.dynamic_slice_in_dim(xall, start, chunk, axis=2)
            total, new_states, meters = _routed_chunk_step(
                rfx, xc, carry, (gparams, bparams, mparams), routing, start,
                track_gain, auto, T, C, with_meters, Fv, bauto=bauto,
                bus_pdc=bus_pdc,
            )
            if with_meters:
                return new_states, (total, meters)
            return new_states, total

        _, outs = jax.lax.scan(body, init, jnp.arange(n_chunks))
        if with_meters:
            outs, (pk, sq, opk, osq) = outs
            mixed = outs.transpose(1, 0, 2).reshape(C, Fp)[:, shift:shift + F]
            denom = jnp.float32(max(Fv, 1))
            meters = (
                jnp.max(pk, axis=0),
                jnp.sqrt(jnp.sum(sq, axis=0) / denom),
                jnp.max(opk, axis=0),
                jnp.sqrt(jnp.sum(osq, axis=0) / denom),
            )
            return mixed, meters
        return outs.transpose(1, 0, 2).reshape(C, Fp)[:, shift:shift + F]

    jfinish = jax.jit(finish)
    return lambda per_track, track_gain, auto=None: jfinish(
        per_track, track_gain, gp0, bp0, mp0, routing0, auto, rfx.bus_auto)


def make_routed_chunk_fn(rfx: RoutedFX, T: int, C: int, *, chunk: int,
                         with_meters: bool = False):
    """Streaming form: fn(pt_chunk, states, start, track_gain, auto) ->
    (total, new_states[, meters]); states = init_routed_states(rfx, C)."""
    gp0, bp0, mp0, routing0 = routed_device_params(rfx)
    gp, bp, mp = jax.jit(lambda a, b, c: _with_ir_ffts_routed(rfx, a, b, c, chunk))(gp0, bp0, mp0)

    @jax.jit
    def step(pt_chunk, states, start, track_gain, gparams, bparams, mparams, routing,
             auto=None, bauto=None):
        total, new_states, meters = _routed_chunk_step(
            rfx, pt_chunk, states, (gparams, bparams, mparams), routing, start,
            track_gain, auto, T, C, with_meters, None, bauto=bauto,
        )
        if with_meters:
            return total, new_states, meters
        return total, new_states

    def call(pt_chunk, states, start, track_gain, auto=None):
        return step(pt_chunk, states, start, track_gain, gp, bp, mp, routing0, auto,
                    rfx.bus_auto)

    return call


def make_routed_stems_finisher(rfx: RoutedFX, T: int, C: int, *,
                               chunk: int | None = None):
    """fn(per_track [T, C, F], track_gain, auto) -> (direct [C, F],
    bus_out [B, C, F]) — the PRE-MASTER routed components for bus-stem
    export (stem-delivery workflows): ``direct`` is the master-direct track
    sum, ``bus_out`` each bus post-chain/post-fader. direct + sum(bus_out)
    then master chain == the full mix."""
    if chunk is None:
        chunk = routed_auto_chunk_frames(rfx)
    gp0, bp0, mp0, routing0 = routed_device_params(rfx)

    def finish(per_track, track_gain, gparams, bparams, mparams, routing, auto=None,
               bauto=None):
        F = per_track.shape[-1]
        n_chunks = -(-F // chunk)
        Fp = n_chunks * chunk
        xall = jnp.pad(per_track, ((0, 0), (0, 0), (0, Fp - F)))
        gparams, bparams, mparams = _with_ir_ffts_routed(rfx, gparams, bparams, mparams, chunk)
        init = init_routed_states(rfx, C)

        def body(carry, i):
            start = i * chunk
            xc = jax.lax.dynamic_slice_in_dim(xall, start, chunk, axis=2)
            parts, new_states, _ = _routed_chunk_step(
                rfx, xc, carry, (gparams, bparams, mparams), routing, start,
                track_gain, auto, T, C, False, None, bauto=bauto, emit_parts=True,
            )
            return new_states, parts

        _, (direct, bus) = jax.lax.scan(body, init, jnp.arange(n_chunks))
        direct = direct.transpose(1, 0, 2).reshape(C, Fp)[:, :F]
        B = bus.shape[1]
        bus = bus.transpose(1, 2, 0, 3).reshape(B, C, Fp)[:, :, :F]
        return direct, bus

    jfinish = jax.jit(finish)
    return lambda per_track, track_gain, auto=None: jfinish(
        per_track, track_gain, gp0, bp0, mp0, routing0, auto, rfx.bus_auto)


# ---------------------------------------------------------------------------
# host-side f64 reference (test oracle)
# ---------------------------------------------------------------------------


def _ref_track_gains(session: Session, t: int, C: int, g: np.ndarray, auto_tables):
    """Per-channel f64 gain arrays (or scalars) mirroring
    reference_generic_finish's fader math exactly."""
    from whitebox_tpu.ops.automation import eval_lane_numpy

    track = session.tracks[t]
    if track.automation is not None and track.automation.has_track_lanes() and auto_tables is not None:
        vol_t, pan_t, mute = auto_tables
        volv = eval_lane_numpy(vol_t["xs"][t], vol_t["ys"][t], vol_t["cv"][t], vol_t["tn"][t], g)
        panv = eval_lane_numpy(pan_t["xs"][t], pan_t["ys"][t], pan_t["cv"][t], pan_t["tn"][t], g)
        out = []
        for ch in range(C):
            coef = (np.sin(np.float32(0.5 * np.pi)
                           * ((1.0 - 0.5 * (panv + 1.0)) if ch == 0 else 0.5 * (panv + 1.0)).astype(np.float32))
                    * np.float32(np.sqrt(2.0))).astype(np.float32)
            out.append(((volv * coef) * mute[t]).astype(np.float64))
        return out
    vol = np.float32(0.0) if track.mute else track.volume_linear
    pan = track.pan_coeffs
    return [float(np.float32(vol * np.float32(pan[ch % 2]))) for ch in range(C)]


def _ref_bus_gains(bus, C: int, g: np.ndarray, sample_rate: float, bd: float):
    """Per-channel f64 bus fader gains (arrays when lanes exist, scalars
    otherwise), mirroring _frame_gains' f32 math exactly."""
    a = getattr(bus, "automation", None)
    if a is None or not a.has_track_lanes():
        bg = bus.gain(C)
        return [float(bg[ch]) for ch in range(C)]
    from whitebox_tpu.ops.automation import eval_lane_numpy, lane_frame_table

    P = max(len(a.volume.points) if a.volume is not None else 1,
            len(a.pan.points) if a.pan is not None else 1, 1)
    vx, vy, vc, vt = lane_frame_table(a.volume, sample_rate, bd, P, float(bus.volume_linear))
    px, py, pc, pt_ = lane_frame_table(a.pan, sample_rate, bd, P, float(bus.pan))
    volv = eval_lane_numpy(vx, vy, vc, vt, g)
    panv = eval_lane_numpy(px, py, pc, pt_, g)
    mute = np.float32(0.0 if bus.mute else 1.0)
    out = []
    for ch in range(C):
        coef = (np.sin(np.float32(0.5 * np.pi)
                       * ((1.0 - 0.5 * (panv + 1.0)) if ch == 0 else 0.5 * (panv + 1.0)).astype(np.float32))
                * np.float32(np.sqrt(2.0))).astype(np.float32)
        out.append(((volv * coef) * mute).astype(np.float64))
    return out


def reference_routed_finish(per_track: np.ndarray, session: Session,
                            sample_rate: float, channels: int = 2,
                            pdc: bool = False) -> np.ndarray:
    """Sequential f64 host ground truth for the routed pipeline: per-effect
    reference models, f64 gains/routing/sums, hard clip. ``pdc`` mirrors
    the device PDC (track-chain fetch-ahead + master head trim)."""
    from whitebox_tpu.ops.automation import pack_session_automation, session_has_automation

    from whitebox_tpu.render.effects_generic import _chains_of

    chains, master = _chains_of(session)
    bus_chains = _bus_chains_of(session)
    bd = session.time_base
    T, C, F = per_track.shape
    g = np.arange(F, dtype=np.int64)
    auto_tables = pack_session_automation(session, sample_rate) if session_has_automation(session) else None

    def track_lanes(t):
        a = session.tracks[t].automation
        return a.effects if (a is not None and a.effects) else None

    def chain_input(t):
        x = per_track[t].astype(np.float64)
        if pdc and chains[t] is not None:
            chains[t].prepare(sample_rate, channels)
            lat = chains[t].latency_frames()
            if lat > 0:
                x = np.pad(x[:, lat:], ((0, 0), (0, lat)))
        return x

    blat_ref = np.zeros(len(bus_chains), np.int64)
    if pdc:
        for bi, c in enumerate(bus_chains):
            if c is not None:
                blat_ref[bi] = c.prepare(sample_rate, channels).latency_frames()
    BL_ref = int(blat_ref.max()) if (pdc and len(bus_chains)) else 0

    pre = np.stack([
        reference_run_chain(chains[t], chain_input(t), track_lanes(t),
                            sample_rate, channels, bd)
        for t in range(T)
    ])
    post = np.empty_like(pre)
    for t in range(T):
        gains = _ref_track_gains(session, t, C, g, auto_tables)
        for ch in range(C):
            post[t, ch] = pre[t, ch] * gains[ch]

    m = build_routing_matrices(session, channels)
    r_post, r_pre = m.r_post, m.r_pre
    B = len(session.buses)
    direct = np.einsum("t,tcf->cf", r_post[0].astype(np.float64), post)
    # bus-latency PDC mirrors the device exactly: every master input is
    # DELAYED to the max bus latency BL (direct by BL, bus b by BL-lat_b),
    # the master chain runs over the extended stream, and BL trims off the
    # head with the master latency below
    total = np.zeros((C, F + BL_ref), np.float64)
    total[:, BL_ref:] += direct
    for b in range(B):
        bus_in = (np.einsum("t,tcf->cf", r_post[1 + b].astype(np.float64), post)
                  + np.einsum("t,tcf->cf", r_pre[b].astype(np.float64), pre))
        key = None
        if m.k_post[b].any() or m.k_pre[b].any():
            key = (np.einsum("t,tcf->cf", m.k_post[b].astype(np.float64), post)
                   + np.einsum("t,tcf->cf", m.k_pre[b].astype(np.float64), pre))
        ab = getattr(session.buses[b], "automation", None)
        blanes = ab.effects if (ab is not None and ab.effects) else None
        bus_out = reference_run_chain(bus_chains[b], bus_in, blanes, sample_rate, channels, bd,
                                      key=key)
        bg = _ref_bus_gains(session.buses[b], C, g, sample_rate, bd)
        d_b = BL_ref - int(blat_ref[b])
        for ch in range(C):
            total[ch, d_b:d_b + F] += bus_out[ch] * bg[ch]
    mlanes = dict(getattr(session, "master_automation", {}) or {}) or None
    if master is not None:
        mlat = 0
        if pdc:
            master.prepare(sample_rate, channels)
            mlat = master.latency_frames()
        if mlat > 0:
            total = np.pad(total, ((0, 0), (0, mlat)))
        total = reference_run_chain(master, total, mlanes, sample_rate, channels, bd)
        total = total[:, BL_ref + mlat:]
    else:
        total = total[:, BL_ref:] if BL_ref else total
    return np.clip(total, -1.0, 1.0).astype(np.float32)
