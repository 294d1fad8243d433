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


def compressor_shard(x, params, axis_name: str, fp: int, detector: str = "peak"):
    """x_local [B, C, F_local] -> compressed local frames (exact handoff)."""
    if detector == "rms":
        p = jnp.mean(jnp.square(x), axis=-2)
        avg = onepole_shard(p, params.get("det_avg", 0.0), axis_name, fp)
        lvl = jnp.sqrt(jnp.maximum(avg, 0.0))
    else:
        lvl = jnp.max(jnp.abs(x), axis=-2)
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


def gate_shard(x, params, axis_name: str, fp: int):
    lvl = jnp.max(jnp.abs(x), axis=-2)
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
            n0, F_local, rate_hz=params["rate_hz"][:, None, None],
            depth_frames=params["depth"][:, None, None],
            center_frames=params["center"][:, None, None],
            sample_rate=sample_rate, phase=phases,
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


def stage_shard(kind: str, static: tuple, params, x, axis_name: str, fp: int,
                sample_rate: float, chunk_start=0):
    """Apply one effect stage to a frame shard x [B, C, F_local]."""
    B, C, F_local = x.shape
    col = lambda a: a[:, None]
    if kind == "gain":
        return x * params["g"][:, None, None]
    if kind == "biquad":
        pa = jnp.repeat(params["pa"], C, axis=0)
        return _biquad_rows_shard(x.reshape(B * C, F_local), pa, axis_name, fp).reshape(B, C, F_local)
    if kind == "eq":
        (nb,) = static
        y = x.reshape(B * C, F_local)
        for b in range(nb):
            y = _biquad_rows_shard(y, jnp.repeat(params["pa"][:, b], C, axis=0), axis_name, fp)
        return y.reshape(B, C, F_local)
    if kind == "compressor":
        (detector,) = static
        return compressor_shard(x, {k: col(v) for k, v in params.items()}, axis_name, fp, detector)
    if kind == "limiter":
        (L,) = static
        return limiter_shard(x, {k: col(v) for k, v in params.items()}, axis_name, fp, L)
    if kind == "gate":
        return gate_shard(x, {k: col(v) for k, v in params.items()}, axis_name, fp)
    if kind == "delay":
        mode, D = static
        return delay_shard(x, params, axis_name, fp, D, mode)
    if kind in ("chorus", "flanger"):
        voices, MT = static
        return chorus_shard(x, params, axis_name, fp, voices, MT, sample_rate, chunk_start)
    if kind == "convreverb":
        (L,) = static
        return convreverb_shard(x, params, axis_name, fp, L)
    if kind == "saturator":
        shaped = jnp.tanh(params["drive"][:, None, None] * x) * params["norm"][:, None, None]
        m = params["mix"][:, None, None]
        return m * shaped + (1.0 - m) * x
    if kind == "width":
        if C != 2:
            return x
        mid = 0.5 * (x[:, 0, :] + x[:, 1, :])
        side = 0.5 * (x[:, 0, :] - x[:, 1, :]) * params["width"][:, None]
        return jnp.stack([mid + side, mid - side], axis=1)
    raise ValueError(f"unknown effect kind {kind!r}")


def chain_shard(stages, params_list, x, axis_name: str, fp: int, sample_rate: float,
                chunk_start=0):
    """Apply a whole chain (effects_generic-style (kind, static) stages +
    aligned params) to a frame shard."""
    for (kind, static), params in zip(stages, params_list):
        x = stage_shard(kind, static, params, x, axis_name, fp, sample_rate, chunk_start)
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
