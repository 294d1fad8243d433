"""Sinc playback via run pre-rendering — exact polyphase resampling on the
MXU, then a pure fast-path mix.

The oversample path (timeline/oversample.py) made sinc-quality playback
~20x RT by shrinking the slow path's work; this module removes the slow
path entirely. Observation: after carve's run merge, every resampled span
is a *closed-form phase ramp* ``x(k) = x0 + k*speed``; when the speed is
rational P/Q and the start phase sits on the 1/Q grid (true for every
rate-conversion ratio — 44.1k/96k -> 48k — and for loop-accumulated
offsets, which advance by multiples of P/Q from integer clip offsets), the
positions are EXACTLY ``(N0 + k*P)/Q`` — Q fixed fractional phases, no
phase-grid quantization.

Because gcd(P, Q) = 1, ``N0`` decomposes as ``k0*P + c0*Q`` with
``k0 = N0 * P^-1 mod Q``: every run is a window of the CANONICAL
resampling ``y[n] = x(n*P/Q)`` of its source shifted by the integer c0,
starting at output index k0 < Q. So one banded matrix per ratio

    out2d[q, :] = M0 @ x[c0 + q*P - half + 1 : ... + W]      (W <= 2*P')

renders every run (ops.resample.design_sinc_matrix's operator, start
residue folded into the window base), all runs batch into a single MXU
einsum per ratio, and the run's fast row simply starts ``src_int = k0``
into its rendered buffer. The mix then runs the config-1 fast path
(~1000x) and sinc quality costs one matmul pass instead of per-frame tap
gathers. This is also a *quality* upgrade: the output is the exact
Kaiser-sinc polyphase value, not the oversample+poly approximation.

Runs with irrational speeds or off-grid phases ride the TAYLOR-corrected
variant of the same machinery: approximate the speed by a continued-
fraction convergent P/Q with Q forced to a multiple of 128 (CF of
``128*speed``), render the rational ramp block-banded (blocks of 128
canonical outputs sharing one dense [3*128, Wb] matrix slab — per-output
cost ~``128*speed + taps`` MACs independent of Q, so Q can be ~20k and
the drift ``eps = speed - P/Q`` is ~1e-8..1e-10/frame), and correct the
residual phase error ``e(u) = e0 + (u - k0)*eps`` IN the same einsum with
first/second-derivative matrix slabs (`ops.resample._design_rows_d012`):
``y = y0 + e*y1 + e^2/2*y2``. Runs are segmented so ``|e|`` stays under
``_TAYLOR_EBUDGET`` (~0.014 source samples → Taylor residual ≤ -100 dB,
below the 90 dB Kaiser design). Off-grid rational phases reuse the same
correction with ``eps = 0``.

Reverse motion (LOOP_REVERSE / BIDIRECTIONAL, speed < 0) rides the same
machinery: the run is planned and rendered as its mirrored FORWARD ramp
(sinc interpolation is direction-independent) and the rewrite emits a
speed = -1.0 row reading the rendered buffer backward at exact integer
phases through the planned reverse slow path. Only speeds > 8 and
pathological near-simple-fraction speeds (coarse achievable anchor grid)
fall back to the oversample path (render.bounce dispatches).

Reference scope: quality mode the reference abandoned (sampler.cpp:61-86);
phases snap to the exact rational grid (carve's f64 accumulation deviates
by <=1e-6/Q — inside the documented resampling contract).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, replace
from fractions import Fraction

import numpy as np

from whitebox_tpu.timeline.carve import SegmentTable
from whitebox_tpu.timeline.pool import _GUARD, SamplePool

DEFAULT_TAPS = 32
_QF = 16      # window rows per sub-run: one batched shape per ratio;
              # per-run padding <= _QF*Qp - 1 frames, window overlap 1/_QF

_TAYLOR_QDEN = 160      # CF denominator cap for 128*speed: Q = 128*q' <= 20480
_TAYLOR_EBUDGET = 0.014  # max |phase error| (source samples): residual ~ -100 dB
_TAYLOR_MIN_SEG = 2048   # segments shorter than this aren't worth the padding
_TAYLOR_MAX_SPEED = 8.0  # window memory scales with speed; beyond -> fallback
_TAYLOR_BLK = 128        # canonical outputs per matrix slab (lane width)
_TAYLOR_MAT_BYTES = 96 * 1024 * 1024  # f32 device matrix cap per ratio
_TAYLOR_K0_BUDGET = 0.004  # |e0| share spent buying a small k0 (head pad)
_TAYLOR_K0_DMAX = 256      # anchor search halfwidth cap (host memory)
#: host cost of one _RunPlan in rendered-output equivalents (~7 us per
#: plan vs ~1 ns per ext output on v5e) — the exchange rate the adaptive
#: convergent chooser uses to trade segment count against padding
_TAYLOR_ALPHA = 7000.0


def _taylor_candidates(speed: float) -> list:
    """Every viable (P, Q, eps) Taylor ramp for ``speed``: the CF
    convergents of ``128*speed`` (best rational approximations — each
    lengthens the drift-budget segment by ~q'_next/q'_prev) plus the
    legacy ``limit_denominator`` pick, capped by the per-ratio device
    matrix budget. The planner picks per session from the measured
    run-length distribution (see plan_prerender): small Q wins for short
    runs (tail padding ~Q/2 per segment), big Q for long runs (fewer
    segments = fewer plans + less head padding)."""
    if not np.isfinite(speed) or speed <= 0.0 or speed > _TAYLOR_MAX_SPEED:
        return []
    x = 128.0 * speed
    Wb = int(128 * speed) + DEFAULT_TAPS  # ~ band width -> matrix bytes/Q
    cands: dict = {}

    def add(num: int, den: int):
        if num <= 0 or den <= 0 or 3 * (128 * den) * Wb * 4 > _TAYLOR_MAT_BYTES:
            return
        Q = 128 * den
        cands.setdefault((num, Q), float((speed * Q - num) / Q))

    fr = Fraction(x).limit_denominator(_TAYLOR_QDEN)
    add(fr.numerator, fr.denominator)
    h0, h1 = 1, int(math.floor(x))
    k0_, k1 = 0, 1
    add(h1, k1)
    y = x - math.floor(x)
    for _ in range(64):
        if y <= 1e-15:
            break
        y = 1.0 / y
        ai = int(y)
        y -= ai
        h0, h1 = h1, ai * h1 + h0
        k0_, k1 = k1, ai * k1 + k0_
        if 3 * (128 * k1) * Wb * 4 > _TAYLOR_MAT_BYTES:
            break
        add(h1, k1)
    return [(P, Q, e) for (P, Q), e in cands.items()]


def _taylor_anchor(x0: float, P: int, Q: int):
    """Snap ``frac(x0)`` to the achievable canonical anchor grid.

    Canonical fracs at output k are ``(k*P mod Q)/Q`` = multiples of
    ``1/q_hat`` (q_hat = Q/gcd(P, Q)); returns (k0, W0, e0) with
    ``x0 = W0 + (k0*P mod Q)/Q + e0`` and ``|e0| <= 1/(2*q_hat)``."""
    import math as _math

    g = _math.gcd(P, Q)
    q_hat = Q // g
    p_hat = (P // g) % q_hat
    phi = x0 - _math.floor(x0)
    r = int(round(phi * q_hat)) % q_hat
    k0 = 0 if q_hat == 1 else (r * pow(p_hat, -1, q_hat)) % q_hat
    # canonical position at buffer output k0 is W0 + (k0*P)//Q + frac —
    # the integer advance to k0 must come out of the window base
    anchor_frac = (k0 * P % Q) / Q
    W0 = int(round(x0 - anchor_frac)) - (k0 * P) // Q
    e0 = x0 - W0 - (k0 * P) // Q - anchor_frac
    return k0, W0, e0, q_hat


@functools.lru_cache(maxsize=None)
def _taylor_matrices(P: int, Q: int, taps: int, atten_db: float):
    """Block-banded Taylor slabs for the canonical ramp ``pos(m) = m*P/Q``.

    Returns (M3 f32 [nblk, 3*BLK, Wb], M3 f64, d_b tuple[int], Wb): block b
    holds the order-0/1/2 rows for canonical outputs ``m = b*BLK + j``,
    band-placed at window column ``(m*P)//Q - d_b + t``. Per-output einsum
    cost is ``3*Wb ~ 3*(BLK*speed + taps)`` MACs regardless of Q."""
    from whitebox_tpu.ops.resample import _design_rows_d012

    BLK = _TAYLOR_BLK
    assert Q % BLK == 0
    nblk = Q // BLK
    m = np.arange(Q, dtype=np.int64)
    num = m * P
    d = (num // Q).astype(np.int64)
    fr = (num % Q).astype(np.float64) / Q
    y0, y1, y2 = _design_rows_d012(fr, P / Q, taps, atten_db)  # [Q, taps] f64
    d_b = d[::BLK]                      # block base offsets
    rel = d - np.repeat(d_b, BLK)       # in-block band offsets
    Wb = int(rel.max()) + taps
    M = np.zeros((nblk, 3 * BLK, Wb), dtype=np.float64)
    b_i = (m // BLK)[:, None]
    j_i = (m % BLK)[:, None]
    cols = rel[:, None] + np.arange(taps)
    for o, y in enumerate((y0, y1, y2)):
        M[b_i, o * BLK + j_i, cols] = y
    return M.astype(np.float32), M, tuple(int(v) for v in d_b), Wb


def _rational_speed(speed: float, max_den: int = 4096):
    if not np.isfinite(speed) or speed <= 0.0:
        return None
    fr = Fraction(speed).limit_denominator(max_den)
    if fr.numerator <= 0 or float(fr) != float(speed):
        return None
    return fr.numerator, fr.denominator


@functools.lru_cache(maxsize=None)
def _canonical_matrix(Pp: int, Qp: int, taps: int, atten_db: float, ratio_key: tuple):
    """[Qp, Pp + taps] f32 canonical operator (+ f64 twin) for positions
    (k*Pp)/Qp above an integer base; row j covers window column d_j + t.
    The width is the band's true support (d_max < Pp), not a padded
    power — a dense matmul over zeros would cost ~3x the FLOPs.

    ``ratio_key`` = (P, Q) of the unscaled speed — sets the anti-alias
    cutoff (downsampling lowers it)."""
    from whitebox_tpu.ops.resample import _design_rows

    P, Q = ratio_key
    j = np.arange(Qp, dtype=np.int64)
    num = j * Pp
    d = num // Qp
    fr = (num % Qp).astype(np.float64) / Qp
    rows = _design_rows(fr, P / Q, taps, atten_db)  # [Qp, taps] f64
    W = Pp + taps
    assert int(d.max()) + taps <= W, (int(d.max()), Pp)
    M = np.zeros((Qp, W), dtype=np.float64)
    for jj in range(Qp):
        M[jj, d[jj] : d[jj] + taps] = rows[jj]
    return M.astype(np.float32), M


@dataclass
class _RunPlan:
    trk: int
    d0: int          # destination start frame
    L: int           # destination length
    sid: int         # source sample id
    c0: int          # integer source shift (N0 = k0*P + c0*Q)
    k0: int          # canonical output offset (< Q) -> the fast row's src_int
    Pp: int
    Qp: int
    nsub: int        # sub-runs of _QF window rows covering k0 + L outputs
    gain: float
    fis: int
    fii: float
    foe: int
    foi: float
    new_sid: int = -1
    ext_base: int = -1     # channel-0 offset inside the ext region
    sub0: int = -1         # first sub-run index within the group batch
    stride_group: int = 0  # channel separation (n_sub_g * stride)
    # Taylor-corrected runs (irrational / off-grid ramps): c0 plays W0 (the
    # integer anchor), k0 the canonical start output, and the residual
    # phase error e(u) = e0 + (u - k0)*eps is corrected in the einsum
    taylor: bool = False
    eps: float = 0.0
    e0: float = 0.0
    # reverse runs (speed < 0, LOOP_REVERSE / BIDIRECTIONAL): the run is
    # planned and rendered as its MIRRORED forward ramp (x0' = x0 +
    # (L-1)*speed, speed' = |speed| — sinc interpolation is direction-
    # independent, so the forward-rendered buffer holds exactly the values
    # the reverse output needs in reverse order) and the rewrite emits a
    # speed = -1.0 row reading the buffer backward at exact integer phases
    rev: bool = False


@dataclass
class PrerenderPlan:
    runs: list            # group-major order (== ext layout order)
    groups: list          # [(Pp, Qp, ratio_key, n_subruns)] in layout order
    ext_len: int          # total appended samples (128-aligned)
    guard: int            # device read-guard needed past the base pool
    taps: int
    atten_db: float
    #: original-table row indices of slow rows NOT covered by this plan
    #: (partial=True planning); they stay in the rewritten table and ride
    #: the oversample fallback. None = full coverage.
    uncovered_rows: np.ndarray | None = None


def plan_prerender(table: SegmentTable, pool: SamplePool, taps: int = DEFAULT_TAPS,
                   atten_db: float = 90.0, partial: bool = False) -> PrerenderPlan | None:
    """Host planning: merge slow rows into runs and check every run is an
    exact rational phase ramp. Returns None when any run isn't (caller
    falls back to the oversample path).

    ``partial=True``: plan the coverable runs and report the rest —
    irrational speeds, off-grid phases, reverse runs — in
    ``plan.uncovered_rows`` (original-table row indices) so the caller can
    route ONLY those through the oversample fallback instead of dropping
    the whole session off the exact path (the round-3 all-or-nothing
    cliff). Returns None when nothing is coverable.

    Ext layout is group-major (one group per distinct ratio) and
    channel-major within a group: the group's rendered batch transposed to
    [C, n_sub, _QF*Qp] *is* its ext segment, so assembly is a handful of
    reshapes regardless of run count."""
    from whitebox_tpu.ops.mix_pallas import _merge_slow_runs_soa

    if not len(table) or table.fast.all():
        return None
    soa = _merge_slow_runs_soa(table)
    if soa is None or soa["trk"].size == 0:
        return None

    half = taps // 2
    C = pool.channel_base.shape[1]

    # vectorized per-run arithmetic: rationalize each DISTINCT speed once,
    # then batch the modular phase decomposition (thousands of runs would
    # otherwise pay a Python Fraction + pow() each).
    # Reverse runs (speed < 0) are planned as their MIRRORED forward ramp:
    # x(u) = x0 + u*speed for u in [0, L) descends, so the forward ramp
    # x'(v) = (x0 + (L-1)*speed) + v*|speed| visits the same positions in
    # reverse order — the rendered buffer serves the reverse output via a
    # speed = -1.0 rewrite row (see _rewrite).
    L_all = (soa["end"] - soa["d0"]).astype(np.int64)
    rev_all = soa["speed"] < 0.0
    speeds = np.abs(soa["speed"])
    x0s = np.where(rev_all, soa["x0"] + (L_all - 1) * soa["speed"], soa["x0"])
    uspeeds, inv = np.unique(speeds, return_inverse=True)
    ok_u = np.ones(uspeeds.size, dtype=bool)
    upqsp = []
    for ui, sp in enumerate(uspeeds):
        pq = _rational_speed(float(sp))
        if pq is None:
            ok_u[ui] = False  # not exact-coverable; Taylor gets it below
            upqsp.append((1, 1, 1, 0))  # placeholder; run masked below
            continue
        P, Q = pq
        s = 1
        while s * P < taps:  # the window trick needs taps <= Pp
            s *= 2
        upqsp.append((P, Q, s, pow(P, -1, Q)))
    upq = np.asarray(upqsp, np.int64)  # [U, 4]
    P_a, Q_a, s_a, Pinv_a = (upq[inv, j] for j in range(4))
    cov = ok_u[inv]  # [n_runs] run exact-coverable so far
    N0f = x0s * Q_a
    N0 = np.round(N0f).astype(np.int64)
    offgrid = np.abs(N0f - N0) > 1e-6  # off the 1/Q grid: not a polyphase ramp
    cov &= ~offgrid
    # 128-aligned sub-run buffers (layout precondition, checked per ratio)
    stride_bad = (_QF * s_a * Q_a) % 128 != 0
    cov &= ~stride_bad

    # runs the exact path can't take get the Taylor-corrected path:
    # CF-convergent rational ramp + in-einsum derivative correction, run
    # segmented so the phase drift stays under budget. Grouped by unique
    # speed: rationalize + modular-inverse once per speed, then the
    # per-segment anchor math (_taylor_anchor's body) runs as vectorized
    # int64 over every segment of every run at once — the per-run Python
    # loop was ~0.45 s host at 5k runs / 19k segments (128-track
    # irrational-speed sessions), dominating the render's host leg.
    taylor_plans: list[_RunPlan] = []
    tay_guard_parts: list[np.ndarray] = []
    fallback = np.zeros(cov.shape, dtype=bool)
    unc = np.nonzero(~cov)[0]
    for ui in (np.unique(inv[unc]) if unc.size else ()):
        runs_u = unc[inv[unc] == ui]
        sp = float(uspeeds[ui])
        L_u = L_all[runs_u]
        # adaptive convergent choice: the drift budget per segment is
        # Lseg ~ avail/|eps|, so a deeper convergent (bigger Q) buys fewer
        # segments — at ~Q/2 tail padding each. Minimize the measured
        # total: n_seg*(E[k0] + Q/2 + alpha) over this speed's actual run
        # lengths, with runs no candidate can hold costed at the
        # oversample fallback's ~20x-per-output penalty.
        best = None
        for (Pc, Qc, ec) in _taylor_candidates(sp):
            gc_ = math.gcd(Pc, Qc)
            qh_c = Qc // gc_
            D_c = max(min(int(_TAYLOR_K0_BUDGET * qh_c - 0.5),
                          _TAYLOR_K0_DMAX), 0)
            avail_c = _TAYLOR_EBUDGET - ((D_c + 0.5) / qh_c + 1e-9)
            if avail_c <= 0.0:
                continue
            Lseg_c = None if abs(ec) < 1e-18 else int(avail_c / abs(ec))
            if Lseg_c is not None and Lseg_c < _TAYLOR_MIN_SEG:
                continue
            Ls = L_u if Lseg_c is None else np.minimum(L_u, Lseg_c)
            valid = (Ls >= np.minimum(L_u, _TAYLOR_MIN_SEG))
            nseg_c = -(-L_u[valid] // np.maximum(Ls[valid], 1))
            ek0 = qh_c / (2.0 * (D_c + 1))
            cost = float((nseg_c * (ek0 + Qc / 2.0 + _TAYLOR_ALPHA)).sum()
                         + 20.0 * L_u[~valid].sum())
            if best is None or cost < best[0]:
                best = (cost, Pc, Qc, ec, D_c, avail_c)
        if best is None:
            fallback[runs_u] = True
            continue
        _, P, Q, eps, D, avail = best
        g = math.gcd(P, Q)
        q_hat = Q // g
        p_hat = (P // g) % q_hat
        inv_p = 0 if q_hat == 1 else pow(p_hat, -1, q_hat)
        Lseg_u = (L_u.copy() if abs(eps) < 1e-18
                  else np.full(runs_u.size, int(avail / abs(eps)), np.int64))
        ok = Lseg_u >= np.minimum(L_u, _TAYLOR_MIN_SEG)
        fallback[runs_u[~ok]] = True
        runs_ok, L_o, Lseg_o = runs_u[ok], L_u[ok], Lseg_u[ok]
        if runs_ok.size == 0:
            continue
        # segment grid: run r_local contributes ceil(L/Lseg) segments at
        # t = j*Lseg, Li = min(Lseg, L - t)
        nseg = -(-L_o // Lseg_o)
        ridx = np.repeat(np.arange(runs_ok.size), nseg)
        j = np.arange(int(nseg.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nseg) - nseg, nseg)
        t = j * Lseg_o[ridx]
        Li = np.minimum(Lseg_o[ridx], L_o[ridx] - t)
        x0_seg = x0s[runs_ok][ridx] + t.astype(np.float64) * sp
        # _taylor_anchor, vectorized — extended with a +-D numerator
        # search that buys the SMALLEST reachable k0 within the |e0|
        # budget share (head padding is k0 wasted canonical outputs; the
        # plain round() lands at E[k0] ~ q_hat/2, the search at
        # ~q_hat/(2D+2))
        phi = x0_seg - np.floor(x0_seg)
        r_ = np.round(phi * q_hat).astype(np.int64) % q_hat
        if q_hat == 1:
            k0 = np.zeros_like(r_)
        elif D > 0:
            deltas = np.arange(-D, D + 1, dtype=np.int64)
            kc = (((r_[:, None] + deltas) % q_hat) * inv_p) % q_hat
            k0 = kc[np.arange(r_.size), np.argmin(kc, axis=1)]
        else:
            k0 = (r_ * inv_p) % q_hat
        kP = k0 * P
        anchor_frac = (kP % Q).astype(np.float64) / Q
        kPQ = kP // Q
        W0 = np.round(x0_seg - anchor_frac).astype(np.int64) - kPQ
        e0 = x0_seg - W0.astype(np.float64) - kPQ.astype(np.float64) - anchor_frac
        rev_seg = rev_all[runs_ok][ridx]
        # forward-ramp segment [t, t+Li) maps to reverse dst frames
        # [d0 + L-t-Li, d0 + L-t) — segment v plays at u = L-1-(t+v)
        d0_t = np.where(rev_seg, L_o[ridx] - t - Li, t)
        gidx = runs_ok[ridx]
        nsub = -(-(k0 + Li) // Q)
        taylor_plans.extend(_RunPlan(
            trk=trk, d0=d0, L=Lv, sid=sid, c0=c0, k0=k0v, Pp=P, Qp=Q,
            nsub=ns, gain=gn, fis=fis, fii=fii, foe=foe, foi=foi,
            taylor=True, eps=eps, e0=e0v, rev=rv)
            for trk, d0, Lv, sid, c0, k0v, ns, gn, fis, fii, foe, foi, e0v, rv
            in zip(soa["trk"][gidx].tolist(), (soa["d0"][gidx] + d0_t).tolist(),
                   Li.tolist(), soa["sid"][gidx].tolist(), W0.tolist(),
                   k0.tolist(), nsub.tolist(), soa["gain"][gidx].tolist(),
                   soa["fis"][gidx].tolist(), soa["fii"][gidx].tolist(),
                   soa["foe"][gidx].tolist(), soa["foi"][gidx].tolist(),
                   e0.tolist(), rev_seg.tolist()))
        # per-segment window end for the device read guard (vectorized
        # twin of the old per-plan loop)
        base_seg = pool.channel_base[soa["sid"][gidx]].max(axis=1).astype(np.int64)
        tay_guard_parts.append(
            base_seg + W0 - (taps // 2 - 1) + (nsub - 1) * P + P + taps + 2)

    if fallback.any():
        if not partial:
            return None
        if not (cov.any() or taylor_plans):
            return None
        slow_mask = ~table.fast
        unc_rows = []
        for r in np.nonzero(fallback)[0]:
            lo, hi = int(soa["row_lo"][r]), int(soa["row_hi"][r])
            rows = np.arange(lo, hi + 1)
            unc_rows.append(rows[slow_mask[lo : hi + 1]])
        uncovered_rows = np.concatenate(unc_rows)
    else:
        uncovered_rows = None
    keep_runs = np.nonzero(cov)[0]
    soa = {k: v[keep_runs] for k, v in soa.items()}
    P_a, Q_a, s_a, Pinv_a, N0, rev_k = (
        a[keep_runs] for a in (P_a, Q_a, s_a, Pinv_a, N0, rev_all))

    k0_a = (N0 % Q_a * Pinv_a) % Q_a
    c0_a = (N0 - k0_a * P_a) // Q_a
    L_a = soa["end"] - soa["d0"]
    nsub_a = -(-(k0_a + L_a) // (_QF * s_a * Q_a))

    plans = [
        _RunPlan(trk=trk, d0=d0, L=L, sid=sid, c0=c0, k0=k0,
                 Pp=Pp, Qp=Qp, nsub=nsub,
                 gain=gain, fis=fis, fii=fii, foe=foe, foi=foi, rev=rev)
        for trk, d0, L, sid, c0, k0, Pp, Qp, nsub, gain, fis, fii, foe, foi, rev in zip(
            soa["trk"].tolist(), soa["d0"].tolist(), L_a.tolist(), soa["sid"].tolist(),
            c0_a.tolist(), k0_a.tolist(), (s_a * P_a).tolist(), (s_a * Q_a).tolist(),
            nsub_a.tolist(), soa["gain"].tolist(), soa["fis"].tolist(),
            soa["fii"].tolist(), soa["foe"].tolist(), soa["foi"].tolist(),
            rev_k.tolist())
    ]

    # group-major layout: one group per (kind, ratio); channel-major inside
    # (ratio key from the uniq table — a per-run Fraction here was ~30% of
    # the whole plan cost at 10k-run scale)
    by_shape: dict[tuple, list[_RunPlan]] = {}
    for i, p in enumerate(plans):
        key = ("exact", p.Pp, p.Qp, (int(P_a[i]), int(Q_a[i])))
        by_shape.setdefault(key, []).append(p)
    for p in taylor_plans:
        key = ("taylor", p.Pp, p.Qp, (p.Pp, p.Qp))
        by_shape.setdefault(key, []).append(p)
    ordered: list[_RunPlan] = []
    groups = []
    ext_off = 0
    for key in sorted(by_shape.keys()):
        runs = by_shape[key]
        kind, Pp, Qp, ratio_key = key
        # frames per sub-run buffer: exact sub-runs batch _QF canonical
        # window rows; taylor sub-runs are one canonical period each
        stride = Qp if kind == "taylor" else _QF * Qp
        if stride % 128:
            return None  # layout needs 128-aligned sub-run buffers
        n_sub_g = sum(p.nsub for p in runs)
        sub = 0
        for p in runs:
            p.sub0 = sub
            # channel-major: channel ch of sub-run j lives at
            # ext_origin + ext_base_of_group + (ch*n_sub_g + j)*stride
            p.ext_base = ext_off + sub * stride
            sub += p.nsub
        for p in runs:
            p.stride_group = n_sub_g * stride  # channel separation
        ordered.extend(runs)
        groups.append((kind, Pp, Qp, ratio_key, n_sub_g))
        ext_off += n_sub_g * stride * C

    # device read guard: the last sub-run's window may overshoot the pool
    # (vectorized over runs x channels)
    pool_len = pool.data.shape[0]
    pool_len += (-pool_len) % 128
    guard = 0
    if plans:
        Pp_a = s_a * P_a
        win_last = (pool.channel_base[soa["sid"]].astype(np.int64) + (
            c0_a - (half - 1) + (nsub_a - 1) * _QF * Pp_a)[:, None])
        guard = int(max(0, (win_last + ((_QF + 1) * Pp_a)[:, None]).max() - pool_len))
    if tay_guard_parts:
        guard = max(guard, int(np.concatenate(tay_guard_parts).max()) - pool_len)
    guard += (-guard) % 128
    return PrerenderPlan(runs=ordered, groups=groups, ext_len=ext_off,
                         guard=max(guard, 0), taps=taps, atten_db=float(atten_db),
                         uncovered_rows=uncovered_rows)


def _rewrite(table: SegmentTable, pool: SamplePool, plan: PrerenderPlan,
             ext_origin: int) -> tuple[SegmentTable, SamplePool]:
    """Replace slow rows with fast rows into the ext region; extend pool
    METADATA (data stays wherever the caller materialized it)."""
    C = pool.channel_base.shape[1]
    n_new = len(plan.runs)
    base_sid = pool.num_samples
    cb_new = np.zeros((n_new, C), dtype=np.int64)
    counts_new = np.zeros(n_new, dtype=np.int64)
    for i, p in enumerate(plan.runs):
        p.new_sid = base_sid + i
        for ch in range(C):
            cb_new[i, ch] = ext_origin + p.ext_base + ch * p.stride_group
        counts_new[i] = p.k0 + p.L

    keep = table.fast.copy()
    if plan.uncovered_rows is not None:
        keep[plan.uncovered_rows] = True  # partial plan: leave them slow

    def cat(a, vals, dt):
        return np.concatenate([a[keep], np.asarray(vals, dt)])

    runs = plan.runs
    # reverse runs were rendered as their mirrored FORWARD ramp: the row
    # reads the buffer backward (speed -1.0 from the last valid output) at
    # exact integer phases — bit-exact through the planned reverse slow
    # path (frac is exactly 0, so interpolation degenerates to the sample)
    table2 = SegmentTable(
        track=cat(table.track, [p.trk for p in runs], np.int32),
        dst_start=cat(table.dst_start, [p.d0 for p in runs], np.int32),
        length=cat(table.length, [p.L for p in runs], np.int32),
        sample_id=cat(table.sample_id, [p.new_sid for p in runs], np.int32),
        src_int=cat(table.src_int,
                    [p.k0 + p.L - 1 if p.rev else p.k0 for p in runs], np.int32),
        src_frac=cat(table.src_frac, [0.0] * len(runs), np.float64),
        speed=cat(table.speed, [-1.0 if p.rev else 1.0 for p in runs], np.float64),
        gain=cat(table.gain, [p.gain for p in runs], np.float32),
        fast=cat(table.fast, [not p.rev for p in runs], bool),
        clamp=cat(table.clamp, [False] * len(runs), bool),
        clip_id=cat(table.clip_id, [-1] * len(runs), np.int32),
        fin_start=cat(table.fin_start, [p.fis for p in runs], np.int32),
        fin_inv=cat(table.fin_inv, [p.fii for p in runs], np.float32),
        fout_end=cat(table.fout_end, [p.foe for p in runs], np.int32),
        fout_inv=cat(table.fout_inv, [p.foi for p in runs], np.float32),
        num_tracks=table.num_tracks, total_frames=table.total_frames,
        buffer_size=table.buffer_size,
    )
    order = np.lexsort((table2.dst_start, table2.track))
    table2 = SegmentTable(
        **{f: getattr(table2, f)[order] for f in (
            "track", "dst_start", "length", "sample_id", "src_int", "src_frac",
            "speed", "gain", "fast", "clamp", "clip_id",
            "fin_start", "fin_inv", "fout_end", "fout_inv")},
        num_tracks=table2.num_tracks, total_frames=table2.total_frames,
        buffer_size=table2.buffer_size,
    )
    if ext_origin + plan.ext_len + _GUARD >= 2**31:
        raise ValueError("prerendered pool exceeds int32 addressing")
    pool2 = SamplePool(
        data=pool.data,  # metadata extension only; see apply_prerender_*
        channel_base=np.concatenate(
            [pool.channel_base.astype(np.int64), cb_new]).astype(np.int32),
        counts=np.concatenate([pool.counts, counts_new]),
        rates=np.concatenate([pool.rates, np.full(n_new, 48000.0)]),
        index_of=dict(pool.index_of),
    )
    return table2, pool2


#: cap on a prerender group's live gather+einsum intermediates; groups
#: bigger than this render in sequential sub-run slabs (lax.scan)
_EXT_SLAB_BYTES = 256 * 1024 * 1024


def _ext_chunk(n_sub: int, per_sub_bytes: int) -> int:
    """Sub-runs per slab so one slab's intermediates stay under
    _EXT_SLAB_BYTES (>=128, multiple of 8 for gather-friendly batching)."""
    c = max(128, _EXT_SLAB_BYTES // max(per_sub_bytes, 1))
    return min(n_sub, (c // 8) * 8)


def _render_ext_body(pool2d, group_args, layout):
    """TRACED: compute the prerendered full pool [rows, 128]."""
    import jax
    import jax.numpy as jnp

    C, guard, groups, taps = layout
    # Window fetch = aligned 128-row gather + in-register barrel shift.
    # A vmapped dynamic_slice at arbitrary offsets lowers to an unaligned
    # 1-D gather that ran at ~5 GB/s on v5e (338 ms for this stage at
    # 128-track scale); gathering whole [*,128] rows on the major axis and
    # rotating by the 7-bit residue with static rolls+selects (which XLA
    # fuses into one elementwise pass) is ~7x faster. take_along_axis on
    # the minor axis is 50x WORSE (5.9 s) — never index per-element.
    pad_rows = guard // 128 + 2  # row-gather may touch ceil(need/128)+1 rows past the end
    p2 = jnp.concatenate([pool2d, jnp.zeros((pad_rows, 128), jnp.float32)])

    def fetch(sT, need):
        # aligned 128-row gather + in-register barrel shift (see note above)
        nrow = -(-need // 128) + 1
        a = sT // 128
        B = p2[a[..., None] + jnp.arange(nrow)]  # [C, n_sub, nrow, 128]
        B = B.reshape(C, sT.shape[1], nrow * 128)
        r = (sT % 128)[..., None]
        for k in range(7):  # barrel shift: B_final[u] = B[u + r]
            bit = 1 << k
            B = jnp.where((r & bit) != 0, jnp.roll(B, -bit, axis=-1), B)
        return B

    # one batched einsum per ratio; the transposed batch [C, n_sub, F]
    # IS the group's ext segment (channel-major layout). Groups whose
    # window gather + einsum intermediates would exceed _EXT_SLAB_BYTES
    # render in bounded sub-run slabs under lax.scan (sequential by
    # construction — a 60 s 128-track session's gathers peaked >10 GB
    # unchunked and OOM'd a 16 GB v5e; the scan caps live intermediates
    # at ext + one slab).
    pieces = [pool2d.reshape(-1)]
    for g, ga in zip(groups, group_args):
        if g[0] == "taylor":
            _, P, Q, n_sub, Wb, d_b = g
            starts_g, M3, e0s, epss = ga
            BLK = _TAYLOR_BLK
            nblk = Q // BLK
            need = d_b[-1] + Wb
            nrow = -(-need // 128) + 1
            m = jnp.arange(Q, dtype=jnp.float32).reshape(nblk, BLK)

            def taylor_slab(sT, e0c, epsc):
                # sT [C, n], e0c/epsc [n] -> y [C, n, Q]
                B = fetch(sT, need)
                # static per-block window slices -> block-banded operand
                Xb = jnp.stack([B[:, :, db : db + Wb] for db in d_b], axis=2)
                # orders 0/1/2 stacked along j: [C, n, nblk, 3, BLK]
                out = jnp.einsum("csbw,bjw->csbj", Xb, M3,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
                out = out.reshape(C, sT.shape[1], nblk, 3, BLK)
                E = e0c[:, None, None] + m[None] * epsc[:, None, None]
                return out[:, :, :, 0] + E * out[:, :, :, 1] + (0.5 * E * E) * out[:, :, :, 2]

            per_sub = C * 4 * (nrow * 128 + nblk * Wb + nblk * 3 * BLK + Q)
            chunk = _ext_chunk(n_sub, per_sub)
            if chunk >= n_sub:
                pieces.append(taylor_slab(starts_g.T, e0s, epss).reshape(-1))
                continue
            S = -(-n_sub // chunk)
            padn = S * chunk - n_sub
            sTp = jnp.pad(starts_g, ((0, padn), (0, 0))).T.reshape(C, S, chunk)
            e0p = jnp.pad(e0s, (0, padn)).reshape(S, chunk)
            epp = jnp.pad(epss, (0, padn)).reshape(S, chunk)
            buf0 = jnp.zeros((C, S * chunk, Q), jnp.float32)

            def step(buf, s):
                y = taylor_slab(sTp[:, s], e0p[s], epp[s]).reshape(C, chunk, Q)
                return jax.lax.dynamic_update_slice(buf, y, (0, s * chunk, 0)), None

            buf, _ = jax.lax.scan(step, buf0, jnp.arange(S))
            pieces.append(buf[:, :n_sub].reshape(-1))
            continue
        _, Pp, Qp, n_sub = g
        starts_g, M = ga
        need = (_QF + 1) * Pp

        def rat_slab(sT):
            # sT [C, n]: batch channel-major so the group output IS its
            # ext segment with no 0.9 GB transpose at the end
            B = fetch(sT, need)
            A = B[:, :, :need].reshape(C, sT.shape[1], _QF + 1, Pp)
            # window = own P'-row + the next row's first `taps` columns
            Xr = jnp.concatenate([A[:, :, :_QF], A[:, :, 1:, :taps]], axis=-1)
            # HIGHEST: the TPU default matmul precision is bf16, which
            # floors the resampler at ~-60 dB; bf16x3 restores f32 quality
            return jnp.einsum("csqw,jw->csqj", Xr, M,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)  # [C, n, QF, Qp]

        nrow_r = -(-need // 128) + 1
        per_sub = C * 4 * (nrow_r * 128 + 2 * _QF * (Pp + taps) + _QF * Qp)
        chunk = _ext_chunk(n_sub, per_sub)
        if chunk >= n_sub:
            pieces.append(rat_slab(starts_g.T).reshape(-1))
            continue
        S = -(-n_sub // chunk)
        padn = S * chunk - n_sub
        sTp = jnp.pad(starts_g, ((0, padn), (0, 0))).T.reshape(C, S, chunk)
        buf0 = jnp.zeros((C, S * chunk, _QF * Qp), jnp.float32)

        def step(buf, s):
            y = rat_slab(sTp[:, s]).reshape(C, chunk, _QF * Qp)
            return jax.lax.dynamic_update_slice(buf, y, (0, s * chunk, 0)), None

        buf, _ = jax.lax.scan(step, buf0, jnp.arange(S))
        pieces.append(buf[:, :n_sub].reshape(-1))
    # fresh tail guard: the mix kernel's fixed DMA windows read past
    # the last ext buffer
    pieces.append(jnp.zeros(_GUARD, jnp.float32))
    full = jnp.concatenate(pieces)
    pad = (-full.shape[0]) % 128
    if pad:
        full = jnp.concatenate([full, jnp.zeros(pad, jnp.float32)])
    return full.reshape(-1, 128)


def _render_ext_jit():
    import jax

    return jax.jit(_render_ext_body, static_argnames=("layout",))


_render_ext_fn = None


@functools.lru_cache(maxsize=32)
def _fused_render_fn(layout, mix_kw_items):
    """jit(prerender ext + Pallas mix) — ONE device dispatch per render for
    the repeated-render (pool-resident) protocol."""
    import jax

    from whitebox_tpu.ops.mix_pallas import _mix_call

    kw = dict(mix_kw_items)

    @jax.jit
    def fused(pool2d, group_args, mix_rest):
        full = _render_ext_body(pool2d, group_args, layout)
        return _mix_call(full, *mix_rest, **kw)

    return fused


def prerender_tables(table: SegmentTable, pool: SamplePool, plan: PrerenderPlan,
                     pool_device) -> tuple[SegmentTable, SamplePool]:
    """Metadata-only rewrite for the fused render path (no device work):
    the ext region's origin is the device pool's flattened length."""
    return _rewrite(table, pool, plan, ext_origin=int(np.prod(pool_device.shape)))


#: device-resident canonical matrices, keyed by (kind, P', Q', taps,
#: atten, backend). The matrices are pure functions of the ratio — tens of
#: MB each at large Q' — and repeated renders used to re-upload them every
#: iteration (~79 MB/render at 128-track irrational scale; the relay
#: moves ~25-50 MB/s, so the upload WAS the prerender wall time).
_DEVICE_MAT_CACHE: dict = {}


def _device_matrix(kind: str, Pp: int, Qp: int, taps: int, atten_db: float, ratio_key):
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    key = (kind, Pp, Qp, taps, atten_db, ratio_key, backend)
    hit = _DEVICE_MAT_CACHE.get(key)
    if hit is not None:
        try:  # a crash-cleanup (bench OOM isolation) may have deleted it
            if not hit.is_deleted():
                return hit
        except AttributeError:
            return hit
    if kind == "taylor":
        M3, _, _, _ = _taylor_matrices(Pp, Qp, taps, atten_db)
        dev = jax.device_put(jnp.asarray(M3))
    else:
        M, _ = _canonical_matrix(Pp, Qp, taps, atten_db, ratio_key)
        dev = jax.device_put(jnp.asarray(M))
    _DEVICE_MAT_CACHE[key] = dev
    return dev


def _device_group_args(plan: PrerenderPlan, pool: SamplePool):
    """(group_args, layout_groups): per-group device operands + the static
    layout entries consumed by `_render_ext_body`."""
    import jax.numpy as jnp

    group_args = []
    layout_groups = []
    for (starts, extras), (kind, Pp, Qp, ratio_key, n_sub) in zip(
            _group_starts(plan, pool), plan.groups):
        if kind == "taylor":
            _, _, d_b, Wb = _taylor_matrices(Pp, Qp, plan.taps, plan.atten_db)
            e0s, epss = extras
            group_args.append((jnp.asarray(starts),
                               _device_matrix("taylor", Pp, Qp, plan.taps,
                                              plan.atten_db, ratio_key),
                               jnp.asarray(e0s), jnp.asarray(epss)))
            layout_groups.append(("taylor", Pp, Qp, n_sub, Wb, d_b))
        else:
            group_args.append((jnp.asarray(starts),
                               _device_matrix("exact", Pp, Qp, plan.taps,
                                              plan.atten_db, ratio_key)))
            layout_groups.append(("exact", Pp, Qp, n_sub))
    return group_args, tuple(layout_groups)


def render_prerendered_fused(plan: PrerenderPlan, pool: SamplePool, renderer,
                             pool_device):
    """Single-dispatch render: prerender the runs AND run the mix kernel in
    one jitted program. ``renderer``: a PallasMixRenderer built on the
    rewritten table with ``pool_device`` (its device pool arg is replaced
    by the fused computation). Returns the device output array."""
    C = pool.channel_base.shape[1]
    group_args, layout_groups = _device_group_args(plan, pool)
    layout = (C, plan.guard, layout_groups, plan.taps)
    fn = _fused_render_fn(layout, tuple(sorted(renderer._kw.items())))
    return fn(pool_device, group_args, tuple(renderer._args[1:]))


def _group_starts(plan: PrerenderPlan, pool: SamplePool):
    """Per-group (starts [n_sub, C] int32, taylor_extras) — extras is
    (e0_sub f32 [n_sub], eps_sub f32 [n_sub]) for taylor groups, else None
    (host, vectorized)."""
    half = plan.taps // 2
    out = []
    i0 = 0
    for (kind, Pp, Qp, ratio_key, n_sub) in plan.groups:
        i1, acc = i0, 0
        while acc < n_sub:
            acc += plan.runs[i1].nsub
            i1 += 1
        runs = plan.runs[i0:i1]
        i0 = i1
        nsub = np.array([p.nsub for p in runs], np.int64)
        sid = np.array([p.sid for p in runs], np.int64)
        c0 = np.array([p.c0 for p in runs], np.int64)
        parent = np.repeat(np.arange(len(runs)), nsub)
        j = np.arange(nsub.sum()) - np.repeat(np.cumsum(nsub) - nsub, nsub)
        base = pool.channel_base[sid[parent]].astype(np.int64)  # [n_sub, C]
        extras = None
        if kind == "taylor":
            # window advance per canonical period is exactly Pp source
            # samples; residual error at the period start is e0 + drift
            starts = base + (c0[parent] - (half - 1) + j * Pp)[:, None]
            k0 = np.array([p.k0 for p in runs], np.int64)[parent]
            e0 = np.array([p.e0 for p in runs], np.float64)[parent]
            eps = np.array([p.eps for p in runs], np.float64)[parent]
            e0_sub = e0 + (j * Qp - k0) * eps
            extras = (e0_sub.astype(np.float32), eps.astype(np.float32))
        else:
            starts = base + (c0[parent] - (half - 1) + j * (_QF * Pp))[:, None]
        assert starts.shape[0] == n_sub
        out.append((starts.astype(np.int32), extras))
    return out


def apply_prerender_device(table: SegmentTable, pool: SamplePool, plan: PrerenderPlan,
                           pool_device=None):
    """Render every run on device (one jitted dispatch) and return
    (table2, pool2_meta, pool2d_device [rows, 128]).

    ``pool_device``: an existing device-resident [rows, 128] pool (the
    bench's pool-resident protocol); default uploads pool.data."""
    import jax
    import jax.numpy as jnp

    global _render_ext_fn
    if _render_ext_fn is None:
        _render_ext_fn = _render_ext_jit()

    C = pool.channel_base.shape[1]
    if pool_device is None:
        flat = pool.data
        if flat.shape[0] % 128:
            flat = np.pad(flat, (0, 128 - flat.shape[0] % 128))
        pool_device = jax.device_put(jnp.asarray(flat.reshape(-1, 128)))
    pool_len = int(np.prod(pool_device.shape))

    group_args, layout_groups = _device_group_args(plan, pool)
    layout = (C, plan.guard, layout_groups, plan.taps)
    pool2d_full = _render_ext_fn(pool_device, group_args, layout=layout)
    table2, pool2 = _rewrite(table, pool, plan, ext_origin=pool_len)
    return table2, pool2, pool2d_full


def resolve_sinc_host(table: SegmentTable, pool: SamplePool):
    """HOST-side ``interpolation="sinc"`` front-end (streamed / sharded /
    XLA renders whose pools live in host memory): same dispatch as
    ``resolve_sinc_pallas`` but the ext renders in NumPy and lands in
    ``pool.data``. Returns ``(table, pool, interp)`` — ``interp`` is
    "linear" when the prerender covers everything (rewritten rows play at
    speed ±1.0, exact under linear interpolation) or the poly-tap tuple
    when a pathological residue rode the oversample fallback."""
    if not len(table) or table.fast.all():
        return table, pool, "linear"
    pplan = plan_prerender(table, pool, partial=True)
    if pplan is None:
        from whitebox_tpu.timeline.oversample import resolve_interpolation

        return resolve_interpolation(table, pool, "sinc")
    interp = "linear"
    if pplan.uncovered_rows is not None:
        from whitebox_tpu.ops.resample import design_poly_interp
        from whitebox_tpu.timeline.oversample import (
            OVERSAMPLE_FACTOR, oversample_slow_rows,
        )

        table, pool = oversample_slow_rows(table, pool, rows=pplan.uncovered_rows)
        interp = ("poly", design_poly_interp(OVERSAMPLE_FACTOR))
    table, pool = apply_prerender_host(table, pool, pplan)
    return table, pool, interp


def apply_prerender_host(table: SegmentTable, pool: SamplePool, plan: PrerenderPlan,
                         f64: bool = False):
    """NumPy twin of the device path (tests / XLA fallback): returns
    (table2, pool2) with pool2.data extended by the rendered runs.

    ``f64=True`` evaluates the banded products in float64 (the quality
    reference)."""
    C = pool.channel_base.shape[1]
    flat = pool.data
    if flat.shape[0] % 128:
        flat = np.pad(flat, (0, 128 - flat.shape[0] % 128))
    pool_len = flat.shape[0]
    flatg = np.pad(flat, (0, plan.guard)) if plan.guard else flat
    def _fetch(start: int, need: int) -> np.ndarray:
        # windows near sample 0 may start negative (half-1 pre-ring); the
        # device reads its zero padding there — mirror with zeros
        seg = flatg[max(start, 0) : start + need]
        if start < 0:
            seg = np.pad(seg, (min(-start, need), 0))
        if seg.shape[0] < need:
            seg = np.pad(seg, (0, need - seg.shape[0]))
        return seg

    ext = np.zeros(plan.ext_len + _GUARD, dtype=np.float32)  # incl. tail guard
    ext_off = 0
    for (starts, extras), (kind, Pp, Qp, ratio_key, n_sub) in zip(
            _group_starts(plan, pool), plan.groups):
        if kind == "taylor":
            M3f, M3_64, d_b, Wb = _taylor_matrices(Pp, Qp, plan.taps, plan.atten_db)
            M3 = M3_64 if f64 else M3f
            BLK = _TAYLOR_BLK
            nblk = Qp // BLK
            stride = Qp
            need = d_b[-1] + Wb
            e0s, epss = extras
            m = np.arange(Qp, dtype=np.float64).reshape(nblk, BLK)
            for s in range(n_sub):
                E = np.float64(e0s[s]) + m * np.float64(epss[s])
                if not f64:
                    E = E.astype(np.float32)
                for ch in range(C):
                    seg = _fetch(int(starts[s, ch]), need)
                    Xb = np.stack([seg[db : db + Wb] for db in d_b])  # [nblk, Wb]
                    out = np.einsum("bw,bjw->bj", Xb.astype(M3.dtype), M3)
                    out = out.reshape(nblk, 3, BLK)
                    y = out[:, 0] + E * out[:, 1] + (0.5 * E * E) * out[:, 2]
                    o = ext_off + (ch * n_sub + s) * stride
                    ext[o : o + stride] = y.reshape(-1).astype(np.float32)
            ext_off += n_sub * stride * C
            continue
        Mf, M64 = _canonical_matrix(Pp, Qp, plan.taps, plan.atten_db, ratio_key)
        M = M64 if f64 else Mf
        stride = _QF * Qp
        need = (_QF + 1) * Pp
        for s in range(n_sub):
            for ch in range(C):
                seg = _fetch(int(starts[s, ch]), need)
                A = seg.reshape(_QF + 1, Pp)
                Xr = np.concatenate([A[:_QF], A[1:, : plan.taps]], axis=-1)
                y = (Xr.astype(M.dtype) @ M.T).reshape(-1)
                o = ext_off + (ch * n_sub + s) * stride
                ext[o : o + stride] = y.astype(np.float32)
        ext_off += n_sub * stride * C
    table2, pool2 = _rewrite(table, pool, plan, ext_origin=pool_len)
    pool2 = replace(pool2, data=np.concatenate([flat, ext]))
    return table2, pool2


def resolve_sinc_pallas(table: SegmentTable, pool: SamplePool):
    """Shared ``interpolation="sinc"`` front-end for the Pallas fast path
    (bounce AND the stems exporters — both must play the same quality form).

    Pre-renders every coverable resampled run (forward AND reverse) with
    the exact/Taylor polyphase matmuls into a speed-1 pool extension; the
    residue (pathological ratios, speeds > 8) is oversampled 4x and
    plays through the LS-optimal 6-tap kernel path. Returns
    ``(table, pool, interp, pre_pool_dev, pplan)`` where ``pplan`` is None
    when no run qualified (the whole session took the oversample form).
    """
    import logging

    _log = logging.getLogger("whitebox_tpu.timeline.prerender")
    pplan = plan_prerender(table, pool, partial=True)
    if pplan is None:
        from whitebox_tpu.timeline.oversample import resolve_interpolation

        table, pool, interp = resolve_interpolation(table, pool, "sinc")
        return table, pool, interp, None, None
    interp = "linear"
    if pplan.uncovered_rows is not None:
        # mixed session: rational/Taylor runs ride the exact polyphase
        # path; the residue plays from the oversampled fallback pool at
        # U*speed through the poly-tap kernel path
        from whitebox_tpu.ops.resample import design_poly_interp
        from whitebox_tpu.timeline.oversample import (
            OVERSAMPLE_FACTOR, oversample_slow_rows,
        )

        table, pool = oversample_slow_rows(table, pool, rows=pplan.uncovered_rows)
        interp = ("poly", design_poly_interp(OVERSAMPLE_FACTOR))
        _log.debug("sinc prerender: partial, %d residual rows via "
                   "oversample fallback", len(pplan.uncovered_rows))
    table, pool, pre_pool_dev = apply_prerender_device(table, pool, pplan)
    _log.debug("sinc prerender: %d runs -> fast rows", len(pplan.runs))
    return table, pool, interp, pre_pool_dev, pplan
