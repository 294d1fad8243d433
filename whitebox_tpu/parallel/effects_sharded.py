"""Frame-sharded effect chains: the full native effect family with exact
cross-shard state handoff (SURVEY §5 "sequence parallelism").

Every effect in effects/ carries chunk-boundary state; this module turns
that property into multi-chip frame parallelism inside ``shard_map``: each
shard processes its local frames from a zero state, shards exchange tiny
summaries, and each shard folds its predecessors' summaries into an exact
incoming state which it injects through the scan's cumulative transition —
the same recipe parallel/biquad_sharded.py uses for IIR filters, extended
per effect family:

- one-pole smoothers: affine summaries (a^F, y_last) + linear injection.
- max-decay peak detectors: max-plus summaries (rho^F, e_last); injection
  is max(e_local, rho^(n+1) * z_in) — the max-plus analogue.
- feedback combs (delay): the shard-to-shard map of the D-tap tail is a
  scaled permutation A (closed form from F_local, D, fb — every shard has
  the same F_local); predecessors fold via z <- A z + b_j, then the local
  comb injects z exactly like a chunk carry. Ping-pong folds the channel
  swap's parity into A.
- modulated taps (chorus/flanger) and lookahead limiting: the carry is a
  bounded dry/level tail — one ``ppermute`` from the previous shard.
- convolution reverb: pure FIR — each shard convolves locally and its
  spill tail hops forward ceil((L-1)/F_local) shards via ``ppermute``.

Accuracy contract matches biquad_sharded: equal to the single-chip one-shot
up to f32 rounding of the injection terms (~1e-6; collectives carry
summaries, not audio). All collectives are O(summary), not O(frames).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from whitebox_tpu.ops.dynamics import (
    _LOG10_20, compressor_reduction_db, gate_open_gain, limiter_reduction_db,
    maxdecay_scan_t, onepole_scan_t, _level_db, _window_max,
)


def _prev_tail(tail, axis_name: str, fp: int, hops: int = 1):
    """The tail from ``hops`` shards back along the frames axis (zeros flow
    into the first shards — stream start)."""
    perm = [(i, i + hops) for i in range(fp - hops)]
    return jax.lax.ppermute(tail, axis_name, perm)


def _affine_fold(m_all, v_all, idx, fp):
    """Incoming state for shard ``idx``: fold z <- m_j*z + v_j over j < idx."""

    def fold(j, z):
        return jnp.where(j < idx, m_all[j] * z + v_all[j], z)

    return jax.lax.fori_loop(0, fp, fold, jnp.zeros_like(v_all[0]))


def onepole_shard(x, a, axis_name: str, fp: int):
    """Frame-sharded one-pole smoother y[n] = a*y[n-1] + (1-a)*x[n]."""
    y0, y_last, m = onepole_scan_t(x, a, jnp.zeros(x.shape[:-1], jnp.float32))
    m_all = jax.lax.all_gather(m[..., -1], axis_name)
    v_all = jax.lax.all_gather(y_last, axis_name)
    idx = jax.lax.axis_index(axis_name)
    z_in = _affine_fold(m_all, v_all, idx, fp)
    return y0 + m * z_in[..., None]


def maxdecay_shard(v, rho, axis_name: str, fp: int):
    """Frame-sharded peak detector e[n] = max(v[n], rho*e[n-1])."""
    e0, e_last, dd = maxdecay_scan_t(v, rho, jnp.zeros(v.shape[:-1], jnp.float32))
    d_all = jax.lax.all_gather(dd[..., -1], axis_name)
    e_all = jax.lax.all_gather(e_last, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def fold(j, z):  # max-plus affine: z <- max(d_j * z, e_j)
        return jnp.where(j < idx, jnp.maximum(d_all[j] * z, e_all[j]), z)

    z_in = jax.lax.fori_loop(0, fp, fold, jnp.zeros_like(e_all[0]))
    return jnp.maximum(e0, dd * z_in[..., None])


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------


def compressor_shard(x, params, axis_name: str, fp: int, detector: str = "peak",
                     key=None):
    """x_local [B, C, F_local] -> compressed local frames (exact handoff).

    ``key``: external sidechain detector shard (same layout as x)."""
    det_src = x if key is None else key
    if detector == "rms":
        p = jnp.mean(jnp.square(det_src), axis=-2)
        avg = onepole_shard(p, params.get("det_avg", 0.0), axis_name, fp)
        lvl = jnp.sqrt(jnp.maximum(avg, 0.0))
    else:
        lvl = jnp.max(jnp.abs(det_src), axis=-2)
    r_db = compressor_reduction_db(_level_db(lvl), params["threshold_db"], params["ratio"], params["knee_db"])
    held = maxdecay_shard(r_db, params["release"], axis_name, fp)
    smooth = onepole_shard(held, params["attack"], axis_name, fp)
    gain = jnp.exp((params["makeup_db"] - smooth) / _LOG10_20)
    return x * gain[..., None, :]


def limiter_shard(x, params, axis_name: str, fp: int, lookahead: int = 0):
    lvl = jnp.max(jnp.abs(x), axis=-2)
    r_db = limiter_reduction_db(_level_db(lvl), params["ceiling_db"])
    xd = x
    if lookahead > 0:
        assert x.shape[-1] >= lookahead, "shard must be at least the lookahead long"
        look = _prev_tail(r_db[..., -lookahead:], axis_name, fp)
        seq = jnp.concatenate([look, r_db], axis=-1)
        r_db = _window_max(seq, lookahead + 1)[..., : x.shape[-1]]
        xtail = _prev_tail(x[..., -lookahead:], axis_name, fp)
        xd = jnp.concatenate([xtail, x], axis=-1)[..., : x.shape[-1]]
    held = maxdecay_shard(r_db, params["release"], axis_name, fp)
    smooth = onepole_shard(held, params["attack"], axis_name, fp)
    return xd * jnp.exp(-smooth / _LOG10_20)[..., None, :]


def gate_shard(x, params, axis_name: str, fp: int, key=None):
    lvl = jnp.max(jnp.abs(x if key is None else key), axis=-2)
    tgt = gate_open_gain(_level_db(lvl), params["threshold_db"], params["range_db"],
                         params.get("hyst_db", 0.0))
    floor = jnp.exp(-jnp.abs(params["range_db"]) / _LOG10_20)
    held = jnp.maximum(maxdecay_shard(tgt, params["release"], axis_name, fp), floor)
    smooth = onepole_shard(held, params["attack"], axis_name, fp)
    return x * smooth[..., None, :]


# ---------------------------------------------------------------------------
# delay family
# ---------------------------------------------------------------------------


def _comb_tail_map(F_local: int, D: int):
    """The shard-to-shard map of the comb's D-tap tail: after F_local frames,
    tail_out[m] = fb^k(m) * tail_in[src(m)] (channel-swapped k times for
    ping-pong). Closed form — static numpy arrays."""
    m = np.arange(D)
    src = (F_local + m) % D
    k = (F_local - D + m) // D + 1
    return src.astype(np.int32), k.astype(np.float32), (k % 2).astype(bool)


def delay_shard(x, params, axis_name: str, fp: int, D: int, mode: str = "stereo"):
    """Frame-sharded feedback comb delay (stereo or ping-pong)."""
    from whitebox_tpu.ops.delay import comb_feedback, comb_feedback_pingpong

    B, C, F_local = x.shape
    assert F_local >= D, "shard must be at least the delay length long"
    fb4 = params["feedback"][:, None, None, None]
    fb3 = params["feedback"][:, None, None]
    x0 = _prev_tail(x[..., -D:], axis_name, fp)
    zero_w = jnp.zeros((B, C, D), jnp.float32)
    pingpong = mode == "pingpong" and C == 2
    comb = comb_feedback_pingpong if pingpong else comb_feedback

    # local wet from zero tail: its out-tail is the shard's b_j summary
    _, b_j, _ = comb(x, fb4, zero_w, x0, D=D)
    b_all = jax.lax.all_gather(b_j, axis_name)  # [fp, B, C, D]

    src, k, k_odd = _comb_tail_map(F_local, D)
    # |fb|^k with the sign restored by k's parity (float pow of a negative
    # base is NaN); 0^0 == 1 keeps the k==0 slide-through rows exact
    mag = jnp.abs(fb3) ** jnp.asarray(k)  # [B, 1, D]
    neg = (fb3 < 0.0) & jnp.asarray(k_odd)
    pw = jnp.where(neg, -mag, mag)
    src_j = jnp.asarray(src)
    if pingpong:
        odd = jnp.asarray(k_odd)

        def A(z):
            g = z[..., src_j]
            return pw * jnp.where(odd, g[..., ::-1, :], g)
    else:

        def A(z):
            return pw * z[..., src_j]

    idx = jax.lax.axis_index(axis_name)

    def fold(j, z):
        return jnp.where(j < idx, A(z) + b_all[j], z)

    w0 = jax.lax.fori_loop(0, fp, fold, jnp.zeros_like(b_j))
    w, _, _ = comb(x, fb4, w0, x0, D=D)
    return params["dry"][:, None, None] * x + params["wet"][:, None, None] * w


def chorus_shard(x, params, axis_name: str, fp: int, voices: int, max_delay: int,
                 sample_rate: float, chunk_start=0):
    """Frame-sharded feedforward chorus/flanger: exact (pure gathers; the
    dry tail ppermutes from the previous shard, LFO phase from the global
    frame index)."""
    from whitebox_tpu.ops.delay import lfo_delay_frames, modulated_tap

    B, C, F_local = x.shape
    assert F_local >= max_delay, "shard must be at least max_delay long"
    xtail = _prev_tail(x[..., -max_delay:], axis_name, fp)
    idx = jax.lax.axis_index(axis_name)
    n0 = chunk_start + idx * F_local
    two_pi = 2.0 * np.pi
    acc = jnp.zeros_like(x)
    for v in range(voices):
        phases = jnp.asarray(
            [two_pi * v / voices + c * (0.5 * np.pi) for c in range(C)], jnp.float32
        )[:, None]
        d = lfo_delay_frames(
            n0, F_local,
            depth_frames=params["depth"][:, None, None],
            center_frames=params["center"][:, None, None],
            phase=phases,
            rate_splits=params["rate_splits"][:, None, None, :],
        )
        tap, _ = modulated_tap(x, d, xtail, max_delay=max_delay)
        acc = acc + tap
    wet = params["wet"][:, None, None] / float(voices)
    return params["dry"][:, None, None] * x + wet * acc


def convreverb_shard(x, params, axis_name: str, fp: int, ir_len: int):
    """Frame-sharded FIR convolution: local FFT conv; the (ir_len-1)-frame
    spill hops forward ceil((ir_len-1)/F_local) shards. Exact."""
    from whitebox_tpu.effects.reverb import _next_pow2

    B, C, F_local = x.shape
    nfft = _next_pow2(F_local + ir_len - 1)
    ir_f = jnp.fft.rfft(params["ir"], nfft, axis=-1)
    full = jnp.fft.irfft(jnp.fft.rfft(x, nfft, axis=-1) * ir_f, nfft, axis=-1)
    wet = full[..., :F_local]
    spill = full[..., F_local : F_local + ir_len - 1]
    hops = -(-(ir_len - 1) // F_local)
    pad = hops * F_local - (ir_len - 1)
    spill = jnp.pad(spill, [(0, 0)] * (spill.ndim - 1) + [(0, pad)])
    for h in range(1, min(hops, fp - 1) + 1):
        arrived = _prev_tail(spill, axis_name, fp, hops=h)
        wet = wet + arrived[..., (h - 1) * F_local : h * F_local]
    return params["dry"][:, None, None] * x + params["wet"][:, None, None] * wet


# ---------------------------------------------------------------------------
# chain dispatch (mirrors render/effects_generic stage kinds)
# ---------------------------------------------------------------------------


def _biquad_rows_shard(x, pa_rows, axis_name: str, fp: int):
    """One batched biquad section on [R, F_local] rows (pa_rows [R, 9])."""
    from whitebox_tpu.parallel.biquad_sharded import biquad_shard_framewise

    arrs = [pa_rows[:, j : j + 1] for j in range(9)]
    return biquad_shard_framewise(x, arrs, axis_name=axis_name, num_shards=fp)


def _tv_biquad_rows_shard(ftype, freq, q, gain_db, x_rows, axis_name: str, fp: int,
                          sample_rate: float, C: int):
    """Frame-sharded time-varying biquad (timed coefficient automation):
    each shard runs the blocked TV scan from zero, shards exchange their
    z-coordinate transitions (Tz [R,2,2], v [R,2]), and the true incoming
    state injects via tv_inject — biquad_shard_framewise generalized to
    per-param-block coefficients. freq/q/gain_db: [B, K_local]."""
    from whitebox_tpu.ops.biquad import (
        BiquadType, biquad_scan_blocked_tv, design_biquad_device, tv_inject,
        tv_section_params,
    )

    d = design_biquad_device(BiquadType(ftype), freq, q, gain_db, sample_rate)
    p9, P, Pinv, aux = tv_section_params(d)
    rep = lambda a: jnp.repeat(a, C, axis=0)
    R = x_rows.shape[0]
    y0, v_total, Tz, inj = biquad_scan_blocked_tv(
        x_rows, [rep(p) for p in p9], rep(P), rep(Pinv),
        jnp.zeros((R, 2), jnp.float32), aux={k: rep(v) for k, v in aux.items()},
        return_injection=True,
    )
    Tz_all = jax.lax.all_gather(Tz, axis_name)
    v_all = jax.lax.all_gather(v_total, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def fold(j, z):
        zn = jnp.einsum("rij,rj->ri", Tz_all[j], z) + v_all[j]
        return jnp.where(j < idx, zn, z)

    z_in = jax.lax.fori_loop(0, fp, fold, jnp.zeros_like(v_total))
    return tv_inject(y0, z_in, inj)


def _eval_shard_lanes(kind: str, params, n0, F_local: int):
    """Evaluate a stage's lane tables on this shard's global frame range
    (mirrors effects_generic._eval_stage_lanes; n0 = shard start frame)."""
    from whitebox_tpu.ops.automation import eval_lanes_device
    from whitebox_tpu.ops.biquad import PARAM_BLOCK

    auto_tab = params.get("auto")
    if not auto_tab:
        return {}
    if kind in ("biquad", "eq"):
        g = n0 + jnp.arange(max(F_local // PARAM_BLOCK, 1), dtype=jnp.int32) * PARAM_BLOCK
    else:
        g = n0 + jnp.arange(F_local, dtype=jnp.int32)
    return {name: eval_lanes_device(tab, g) for name, tab in auto_tab.items()}


def stage_shard(kind: str, static: tuple, params, x, axis_name: str, fp: int,
                sample_rate: float, chunk_start=0, key=None):
    """Apply one effect stage to a frame shard x [B, C, F_local].

    Stages with "auto" lane tables in ``params`` evaluate them at this
    shard's *global* frame positions, so sharded automation matches the
    single-chip render (biquad/EQ require F_local to be a multiple of
    PARAM_BLOCK so shard-local param blocks align with the global grid)."""
    from whitebox_tpu.render.effects_generic import _db_to_lin_dev, _time_coef_dev, _tv_vals

    B, C, F_local = x.shape
    col = lambda a: a[:, None]
    idx = jax.lax.axis_index(axis_name)
    n0 = chunk_start + idx * F_local
    lanes = _eval_shard_lanes(kind, params, n0, F_local)

    def mix_coef(name):
        return lanes[name][:, None, :] if name in lanes else params[name][:, None, None]

    if kind == "gain":
        if "gain_db" in lanes:
            return x * _db_to_lin_dev(lanes["gain_db"])[:, None, :]
        return x * params["g"][:, None, None]
    if kind == "biquad":
        if static:  # TV form: static == (ftype_value,)
            from whitebox_tpu.ops.biquad import PARAM_BLOCK

            assert F_local % PARAM_BLOCK == 0, \
                "TV-biquad shards must be PARAM_BLOCK-aligned"
            K = F_local // PARAM_BLOCK
            freq = _tv_vals(lanes, params, "freq_hz", "freq", K)
            qv = _tv_vals(lanes, params, "q", "q", K)
            gv = _tv_vals(lanes, params, "gain_db", "gain_db", K)
            y = _tv_biquad_rows_shard(static[0], freq, qv, gv,
                                      x.reshape(B * C, F_local), axis_name, fp,
                                      sample_rate, C)
            return y.reshape(B, C, F_local)
        pa = jnp.repeat(params["pa"], C, axis=0)
        return _biquad_rows_shard(x.reshape(B * C, F_local), pa, axis_name, fp).reshape(B, C, F_local)
    if kind == "eq":
        nb = static[0]
        y = x.reshape(B * C, F_local)
        if len(static) > 1 and isinstance(static[1], tuple):  # TV form
            from whitebox_tpu.ops.biquad import PARAM_BLOCK

            assert F_local % PARAM_BLOCK == 0, \
                "TV-EQ shards must be PARAM_BLOCK-aligned"
            K = F_local // PARAM_BLOCK
            for b in range(nb):
                freq = _tv_vals(lanes, params, f"b{b}.freq_hz", "freq", K, band=b)
                qv = _tv_vals(lanes, params, f"b{b}.q", "q", K, band=b)
                gv = _tv_vals(lanes, params, f"b{b}.gain_db", "gain_db", K, band=b)
                y = _tv_biquad_rows_shard(static[1][b], freq, qv, gv, y, axis_name, fp,
                                          sample_rate, C)
            return y.reshape(B, C, F_local)
        for b in range(nb):
            y = _biquad_rows_shard(y, jnp.repeat(params["pa"][:, b], C, axis=0), axis_name, fp)
        return y.reshape(B, C, F_local)
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
            detector, sc = static
            return compressor_shard(x, p, axis_name, fp, detector,
                                    key=key if sc else None)
        if kind == "limiter":
            (L,) = static
            return limiter_shard(x, p, axis_name, fp, L)
        (sc,) = static
        return gate_shard(x, p, axis_name, fp, key=key if sc else None)
    if kind == "delay":
        mode, D = static
        w = delay_shard(x, dict(params, dry=jnp.zeros_like(params["dry"]),
                                wet=jnp.ones_like(params["wet"])), axis_name, fp, D, mode)
        return mix_coef("dry") * x + mix_coef("wet") * w
    if kind in ("chorus", "flanger"):
        voices, MT = static
        wetsig = chorus_shard(x, dict(params, dry=jnp.zeros_like(params["dry"]),
                                      wet=jnp.full_like(params["wet"], float(voices))),
                              axis_name, fp, voices, MT, sample_rate, chunk_start)
        return mix_coef("dry") * x + (mix_coef("wet") / float(voices)) * wetsig
    if kind == "convreverb":
        (L,) = static
        wetsig = convreverb_shard(x, dict(params, dry=jnp.zeros_like(params["dry"]),
                                          wet=jnp.ones_like(params["wet"])), axis_name, fp, L)
        return mix_coef("dry") * x + mix_coef("wet") * wetsig
    if kind == "linphase":
        (L,) = static
        one = jnp.ones((x.shape[0],), jnp.float32)
        return convreverb_shard(x, dict(params, dry=jnp.zeros_like(one), wet=one),
                                axis_name, fp, L)
    if kind == "saturator":
        if "drive_db" in lanes:
            from whitebox_tpu.render.effects_generic import _LN10_20

            drive = jnp.exp(jnp.float32(_LN10_20) * lanes["drive_db"])[:, None, :]
            norm = 1.0 / jnp.tanh(drive)
        else:
            drive = params["drive"][:, None, None]
            norm = params["norm"][:, None, None]
        shaped = jnp.tanh(drive * x) * norm
        m = mix_coef("mix")
        return m * shaped + (1.0 - m) * x
    if kind == "width":
        if C != 2:
            return x
        w = lanes["width"] if "width" in lanes else params["width"][:, None]
        mid = 0.5 * (x[:, 0, :] + x[:, 1, :])
        side = 0.5 * (x[:, 0, :] - x[:, 1, :]) * w
        return jnp.stack([mid + side, mid - side], axis=1)
    raise ValueError(f"unknown effect kind {kind!r}")


def chain_shard(stages, params_list, x, axis_name: str, fp: int, sample_rate: float,
                chunk_start=0, key=None):
    """Apply a whole chain (effects_generic-style (kind, static) stages +
    aligned params) to a frame shard. ``key``: sidechain detector shard
    delivered to every sidechain-flagged dynamics stage in the chain."""
    for (kind, static), params in zip(stages, params_list):
        x = stage_shard(kind, static, params, x, axis_name, fp, sample_rate, chunk_start,
                        key=key)
    return x


def apply_chain_sharded(effects, x, mesh, sample_rate: float, *,
                        frames_axis: str = "frames", channels: int | None = None):
    """Apply an ``Effect`` list to ``x`` [C, F] with the frames axis sharded
    over ``mesh`` — the multi-chip master-bus finisher.

    Prepares each effect, builds the effects_generic stage signature, and
    shard_maps :func:`chain_shard` over the frames axis. F must divide by the
    mesh's frames-axis size, and each shard must be longer than any effect's
    intrinsic horizon (delay length, IR spill, limiter lookahead)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from whitebox_tpu.render.effects_generic import _stage_kind, _stage_params

    C = int(x.shape[0]) if channels is None else channels
    for e in effects:
        e.prepare(sample_rate, C)
    stages = [_stage_kind(e) for e in effects]
    params = [
        {k: jnp.asarray(np.stack([v])) for k, v in _stage_params(e, kind).items()}
        for e, (kind, _) in zip(effects, stages)
    ]
    fp = mesh.shape[frames_axis]

    def tile(xl, pl):
        y = chain_shard(stages, pl, xl[None], frames_axis, fp, sample_rate)
        return y[0]

    fn = shard_map(
        tile, mesh=mesh,
        in_specs=(P(None, frames_axis), [{k: P() for k in p} for p in params]),
        out_specs=P(None, frames_axis),
    )
    return fn(x, params)
