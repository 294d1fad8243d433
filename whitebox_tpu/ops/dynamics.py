"""Dynamics processing (compressor / limiter / gate) — TPU-parallel.

The reference hosts dynamics as binary VST3 plugins (src/plughost — no
native DSP to port), so this module defines the framework's dynamics
numerics, built entirely from frame-parallel primitives:

- detector: peak (|x|, stereo-linked max over channels) or RMS (one-pole
  average of x^2) level, in dB.
- static curve: downward-compressor soft-knee gain computer
  (Giannoulis/Massberg/Reiss, "Digital Dynamic Range Compressor Design",
  JAES 2012, eq. 4) producing a desired *gain reduction* in dB >= 0.
- ballistics: the "smooth decoupled peak detector" (same paper, eq. 17):
  release as a max-decay recurrence R[n] = max(r[n], rho * R[n-1]), then
  attack as a one-pole smoother. Both recurrences are evaluated with
  ``jax.lax.associative_scan`` in O(log F) depth — the same sequence-
  parallel treatment ops/biquad.py gives IIR filters — and both carry
  exact chunk-boundary state, so chunked processing equals one-shot
  (required for frame-sharded multi-chip renders).

Sequential float64 references (`*_ref`) live alongside for tests; the f32
scan path tracks them to ~1e-5 relative like the biquad scan.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10  # -200 dBFS detector floor
_LOG10_20 = 8.685889638065035  # 20 / ln(10)


def time_coef(seconds, sample_rate: float):
    """One-pole/decay coefficient for a time constant: exp(-1/(t*fs)).

    t == 0 maps to coefficient 0 (instant). Accepts scalars or arrays."""
    t = np.asarray(seconds, dtype=np.float64)
    fs = float(sample_rate)
    with np.errstate(divide="ignore"):
        c = np.where(t <= 0.0, 0.0, np.exp(-1.0 / np.maximum(t * fs, 1e-12)))
    return np.float32(c) if np.ndim(t) == 0 else c.astype(np.float32)


# ---------------------------------------------------------------------------
# scan primitives (frames on the last axis, arbitrary leading batch dims)
# ---------------------------------------------------------------------------


def onepole_scan_t(x, a, y0):
    """onepole_scan that also returns the cumulative transition m[n] =
    a^(n+1) (the injection weights for chunk/shard state handoff)."""
    from whitebox_tpu.ops.scan_util import hillis_scan

    x = jnp.asarray(x, jnp.float32)
    a = jnp.broadcast_to(jnp.asarray(a, jnp.float32), x.shape)
    b = (1.0 - a) * x

    def comb(l, r):  # composition: later(earlier(y)) = m_r*(m_l*y+b_l)+b_r
        return l[0] * r[0], r[0] * l[1] + r[1]

    m, bb = hillis_scan(comb, (a, b), (1.0, 0.0))
    y = m * y0[..., None] + bb
    return y, y[..., -1], m


def onepole_scan(x, a, y0):
    """y[n] = a*y[n-1] + (1-a)*x[n] over the last axis, log-depth.

    ``a`` broadcasts against ``x`` minus the frame axis ([..., 1] or scalar).
    Returns (y, y_last) where y_last carries across chunks."""
    y, y_last, _ = onepole_scan_t(x, a, y0)
    return y, y_last


def maxdecay_scan_t(v, rho, e0):
    """maxdecay_scan that also returns the cumulative decay d[n] = rho^(n+1)
    (the injection weights for chunk/shard state handoff).

    hillis_scan left identity: the detector values v are >= 0 (gain
    reductions / openness targets), so (-1, 1) satisfies
    comb(identity, r) == r exactly."""
    from whitebox_tpu.ops.scan_util import hillis_scan

    v = jnp.asarray(v, jnp.float32)
    d = jnp.broadcast_to(jnp.asarray(rho, jnp.float32), v.shape)

    def comb(l, r):  # decay the earlier span's max by the later span's length
        return jnp.maximum(l[0] * r[1], r[0]), l[1] * r[1]

    m, dd = hillis_scan(comb, (v, d), (-1.0, 1.0))
    e = jnp.maximum(m, e0[..., None] * dd)
    return e, e[..., -1], dd


def maxdecay_scan(v, rho, e0):
    """e[n] = max(v[n], rho*e[n-1]) over the last axis, log-depth.

    The classic peak detector with exponential release: instant rise,
    exp decay. Returns (e, e_last)."""
    e, e_last, _ = maxdecay_scan_t(v, rho, e0)
    return e, e_last


# ---------------------------------------------------------------------------
# static curves (pure, elementwise)
# ---------------------------------------------------------------------------


def compressor_reduction_db(level_db, threshold_db, ratio, knee_db):
    """Desired downward gain reduction (dB, >= 0), soft knee.

    Giannoulis et al. eq. 4 expressed as reduction = x_db - y_db."""
    slope = 1.0 - 1.0 / ratio
    over = level_db - threshold_db
    w = jnp.maximum(knee_db, 1e-6)
    in_knee = slope * jnp.square(over + 0.5 * w) / (2.0 * w)
    r = jnp.where(over <= -0.5 * w, 0.0, jnp.where(over >= 0.5 * w, slope * over, in_knee))
    return jnp.maximum(r, 0.0)


def limiter_reduction_db(level_db, ceiling_db):
    """Hard-limit curve: everything over the ceiling is reduced (ratio inf)."""
    return jnp.maximum(level_db - ceiling_db, 0.0)


def gate_open_gain(level_db, threshold_db, range_db, hysteresis_db=0.0):
    """Target gate gain: 1 when open (level >= threshold), floor when closed.

    ``hysteresis_db`` softens the edge with a linear ramp just below the
    threshold instead of a hard step (clickless without ballistics)."""
    floor = jnp.exp(-jnp.abs(range_db) / _LOG10_20)
    h = jnp.asarray(hysteresis_db, jnp.float32)
    ramp = jnp.clip((level_db - (threshold_db - h)) / jnp.maximum(h, 1e-6), 0.0, 1.0)
    step = jnp.where(level_db >= threshold_db, 1.0, 0.0)
    t = jnp.where(h > 0.0, ramp, step)
    return floor + (1.0 - floor) * t


def _level_db(x):
    return _LOG10_20 * jnp.log(jnp.maximum(x, _EPS))


# ---------------------------------------------------------------------------
# full processors: x [..., C, F] -> (y, state)
# ---------------------------------------------------------------------------


def detector_level(x, mode: str, avg_coef, det0):
    """Stereo-linked detector level [..., F] from x [..., C, F].

    "peak": max |x| over channels (det0/state unused, returned unchanged).
    "rms": sqrt of one-pole average of the channel-mean x^2 (state = avg)."""
    if mode == "peak":
        return jnp.max(jnp.abs(x), axis=-2), det0
    if mode == "rms":
        p = jnp.mean(jnp.square(x), axis=-2)
        avg, last = onepole_scan(p, avg_coef, det0)
        return jnp.sqrt(jnp.maximum(avg, 0.0)), last
    raise ValueError(f"detector mode {mode!r}")


@partial(jax.jit, static_argnames=("detector",))
def compressor_process(x, params, state, *, detector: str = "peak", key=None):
    """Compress x [..., C, F].

    params: dict of f32 arrays broadcastable over the leading batch dims
      (shape [] or [B, 1]): threshold_db, ratio, knee_db, attack (coef),
      release (coef), makeup_db, det_avg (RMS detector coef).
    state: dict with "red" (release-held reduction, dB), "att" (attack
      smoother output, dB), "det" (RMS average) — each [..., 1]-less,
      i.e. shape of x without the C and F axes -> [...] per batch row.
    ``key`` [..., C, F] (optional): external sidechain signal — the
    detector listens to it while the gain applies to ``x`` (classic
    ducking; routed via sidechain sends, session/bus.py).
    Returns (y, new_state)."""
    lvl, det_last = detector_level(x if key is None else key, detector,
                                   params.get("det_avg", 0.0), state["det"])
    r_db = compressor_reduction_db(_level_db(lvl), params["threshold_db"], params["ratio"], params["knee_db"])
    held, red_last = maxdecay_scan(r_db, params["release"], state["red"])
    smooth, att_last = onepole_scan(held, params["attack"], state["att"])
    gain = jnp.exp((params["makeup_db"] - smooth) / _LOG10_20)
    return x * gain[..., None, :], {"red": red_last, "att": att_last, "det": det_last}


@partial(jax.jit, static_argnames=("lookahead",))
def limiter_process(x, params, state, *, lookahead: int = 0):
    """Limit x [..., C, F] to a ceiling (infinite-ratio compressor).

    ``lookahead`` (frames, static) applies the window max of the desired
    reduction over [n, n+L] so the attack ramp finishes *before* the peak
    arrives. state: "red", "att" as compressor; plus "look" [..., L] of
    future-window detector carry (the last L levels of the previous chunk)
    so chunked == one-shot."""
    lvl = jnp.max(jnp.abs(x), axis=-2)
    r_db = limiter_reduction_db(_level_db(lvl), params["ceiling_db"])
    if lookahead > 0:
        # trailing window max over the last L+1 input levels, paired with an
        # L-frame audio delay: the gain at output time n covers input peaks
        # up to L frames ahead of what is currently playing
        seq = jnp.concatenate([state["look"], r_db], axis=-1)
        r_db = _window_max(seq, lookahead + 1)[..., : r_db.shape[-1]]
        look_last = seq[..., -lookahead:]
    else:
        look_last = state["look"]
    held, red_last = maxdecay_scan(r_db, params["release"], state["red"])
    smooth, att_last = onepole_scan(held, params["attack"], state["att"])
    gain = jnp.exp(-smooth / _LOG10_20)
    if lookahead > 0:
        # delay the audio by L so the (already left-shifted) gain lines up
        xs = jnp.concatenate([state["xdelay"], x], axis=-1)
        y = xs[..., : x.shape[-1]] * gain[..., None, :]
        xdel_last = xs[..., x.shape[-1] :]
        return y, {"red": red_last, "att": att_last, "look": look_last, "xdelay": xdel_last}
    return x * gain[..., None, :], {"red": red_last, "att": att_last, "look": look_last, "xdelay": state["xdelay"]}


def _window_max(seq, w: int):
    """Sliding max over a trailing window of width w: out[n] = max(seq[n:n+w])."""
    return jax.lax.reduce_window(
        seq, -jnp.inf, jax.lax.max, (1,) * (seq.ndim - 1) + (w,), (1,) * seq.ndim, "valid"
    )


@partial(jax.jit, static_argnames=())
def gate_process(x, params, state, key=None):
    """Noise gate on x [..., C, F].

    Openness o[n] = max(target_gain[n], rho*o[n-1]): instant open, exp
    close at the release time; one-pole attack smoothing declicks the
    opening edge. params: threshold_db, range_db, hysteresis... (hysteresis
    folded into target curve host-side as hyst_db), attack, release.
    state: "open" (held openness), "att". ``key`` (optional): external
    sidechain detector signal (the gate opens when the KEY crosses the
    threshold — e.g. gating a pad from a kick)."""
    lvl = jnp.max(jnp.abs(x if key is None else key), axis=-2)
    tgt = gate_open_gain(_level_db(lvl), params["threshold_db"], params["range_db"],
                         params.get("hyst_db", 0.0))
    floor = jnp.exp(-jnp.abs(params["range_db"]) / _LOG10_20)
    held, open_last = maxdecay_scan(tgt, params["release"], state["open"])
    held = jnp.maximum(held, floor)  # decay stops at the closed-gain floor
    smooth, att_last = onepole_scan(held, params["attack"], state["att"])
    return x * smooth[..., None, :], {"open": open_last, "att": att_last}


# ---------------------------------------------------------------------------
# float64 sequential references (test oracles)
# ---------------------------------------------------------------------------


def _level_db_np(v):
    return 20.0 * np.log10(np.maximum(v, _EPS))


def _per_frame(v, F: int) -> np.ndarray:
    """Broadcast a scalar or per-frame param array to [F] f64 (the refs
    accept timed-automation arrays as well as constants)."""
    return np.broadcast_to(np.asarray(v, np.float64), (F,))


def compressor_ref(x: np.ndarray, *, threshold_db, ratio, knee_db, attack, release,
                   makeup_db=0.0, detector="peak", det_avg=0.0, key=None) -> np.ndarray:
    """Sequential f64 reference of compressor_process (one batch row [C, F]).

    Every level/ratio/ballistics param may be a scalar or a per-frame [F]
    array (timed effect-param automation). ``key`` [C, F]: external
    sidechain detector signal."""
    x = np.asarray(x, np.float64)
    C, F = x.shape
    det_src = x if key is None else np.asarray(key, np.float64)
    thr, rat, knee = _per_frame(threshold_db, F), _per_frame(ratio, F), _per_frame(knee_db, F)
    atk, rel, mk = _per_frame(attack, F), _per_frame(release, F), _per_frame(makeup_db, F)
    davg = _per_frame(det_avg, F)
    red = 0.0
    att = 0.0
    avg = 0.0
    y = np.empty_like(x)
    for n in range(F):
        if detector == "peak":
            lvl = np.max(np.abs(det_src[:, n]))
        else:
            avg = davg[n] * avg + (1.0 - davg[n]) * np.mean(det_src[:, n] ** 2)
            lvl = math.sqrt(max(avg, 0.0))
        slope = 1.0 - 1.0 / rat[n]
        w = max(knee[n], 1e-6)
        over = _level_db_np(lvl) - thr[n]
        if over <= -0.5 * w:
            r = 0.0
        elif over >= 0.5 * w:
            r = slope * over
        else:
            r = slope * (over + 0.5 * w) ** 2 / (2.0 * w)
        red = max(r, rel[n] * red)
        att = atk[n] * att + (1.0 - atk[n]) * red
        y[:, n] = x[:, n] * 10.0 ** ((mk[n] - att) / 20.0)
    return y


def limiter_ref(x: np.ndarray, *, ceiling_db, attack, release, lookahead=0) -> np.ndarray:
    x = np.asarray(x, np.float64)
    C, F = x.shape
    ceil_, atk, rel = _per_frame(ceiling_db, F), _per_frame(attack, F), _per_frame(release, F)
    lvl = np.max(np.abs(x), axis=0)
    r = np.maximum(_level_db_np(lvl) - ceil_, 0.0)
    if lookahead > 0:
        padded = np.concatenate([np.zeros(lookahead), r])  # past carry = silence
        r = np.array([np.max(padded[n : n + lookahead + 1]) for n in range(F)])
        xd = np.concatenate([np.zeros((C, lookahead)), x], axis=1)[:, :F]
    else:
        xd = x
    red = att = 0.0
    y = np.empty_like(x)
    for n in range(F):
        red = max(r[n], rel[n] * red)
        att = atk[n] * att + (1.0 - atk[n]) * red
        y[:, n] = xd[:, n] * 10.0 ** (-att / 20.0)
    return y


def gate_ref(x: np.ndarray, *, threshold_db, range_db, attack, release,
             hysteresis_db=0.0, key=None) -> np.ndarray:
    x = np.asarray(x, np.float64)
    C, F = x.shape
    det_src = x if key is None else np.asarray(key, np.float64)
    thr, rng = _per_frame(threshold_db, F), _per_frame(range_db, F)
    atk, rel = _per_frame(attack, F), _per_frame(release, F)
    hyst = _per_frame(hysteresis_db, F)
    opn = att = 0.0
    y = np.empty_like(x)
    for n in range(F):
        floor = 10.0 ** (-abs(rng[n]) / 20.0)
        lvl = np.max(np.abs(det_src[:, n]))
        ldb = _level_db_np(lvl)
        if hyst[n] > 0.0:  # linear ramp just below threshold (gate_open_gain)
            t = min(max((ldb - (thr[n] - hyst[n])) / max(hyst[n], 1e-6), 0.0), 1.0)
            tgt = floor + (1.0 - floor) * t
        else:
            tgt = 1.0 if ldb >= thr[n] else floor
        opn = max(tgt, rel[n] * opn)
        o = max(opn, floor)
        att = atk[n] * att + (1.0 - atk[n]) * o
        y[:, n] = x[:, n] * att
    return y
