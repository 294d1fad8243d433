"""Biquad filters: RBJ-cookbook design + TPU-parallel filtering.

The reference hosts effects as binary VST3 plugins (src/plughost) — there is
no native DSP to port, so this module *defines* the framework's effect
numerics:

- Coefficient design: Robert Bristow-Johnson's Audio EQ Cookbook formulas
  (public domain), computed in float64.
- ``biquad_sequential``: the ground-truth filter — float64 transposed
  direct-form II, one sample at a time (NumPy; the oracle for tests).
- ``biquad_scan``: the TPU path — state-space form evaluated as a
  log-depth frame-parallel prefix scan (f32). This is the "sequence
  parallelism" answer to IIR state: the recurrence
  z[n] = A z[n-1] + B x[n] is a composition of affine maps, scanned in
  O(log F) depth via ``ops.scan_util.hillis_scan`` (contiguous shifted
  combines — ``lax.associative_scan``'s Blelloch sweep slices the
  128-lane frame axis at power-of-two strides and the relayout traffic,
  not the math, was the device wall of scan-bound chains on v5e). f32
  associative evaluation deviates from the sequential reference by
  ~1e-5 relative for typical audio filters (tested bounds).
- Chunk/shard boundaries carry (state) exactly: the scan also yields the
  cumulative transition, so chunked and monolithic renders agree.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.ops.scan_util import hillis_scan


class BiquadType(enum.Enum):
    LOWPASS = "lowpass"
    HIGHPASS = "highpass"
    BANDPASS = "bandpass"
    NOTCH = "notch"
    ALLPASS = "allpass"
    PEAK = "peak"
    LOWSHELF = "lowshelf"
    HIGHSHELF = "highshelf"


@dataclass(frozen=True)
class BiquadCoeffs:
    """Normalized (a0 == 1) coefficients, float64."""

    b0: float
    b1: float
    b2: float
    a1: float
    a2: float

    def as_arrays(self):
        return (np.float32(self.b0), np.float32(self.b1), np.float32(self.b2),
                np.float32(self.a1), np.float32(self.a2))


def design_biquad(
    ftype: BiquadType | str,
    freq_hz: float,
    sample_rate: float,
    q: float = math.sqrt(0.5),
    gain_db: float = 0.0,
) -> BiquadCoeffs:
    """RBJ Audio EQ Cookbook, float64."""
    ftype = BiquadType(ftype)
    w0 = 2.0 * math.pi * freq_hz / sample_rate
    cw, sw = math.cos(w0), math.sin(w0)
    alpha = sw / (2.0 * q)
    A = 10.0 ** (gain_db / 40.0)

    if ftype == BiquadType.LOWPASS:
        b0, b1, b2 = (1 - cw) / 2, 1 - cw, (1 - cw) / 2
        a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    elif ftype == BiquadType.HIGHPASS:
        b0, b1, b2 = (1 + cw) / 2, -(1 + cw), (1 + cw) / 2
        a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    elif ftype == BiquadType.BANDPASS:
        b0, b1, b2 = alpha, 0.0, -alpha
        a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    elif ftype == BiquadType.NOTCH:
        b0, b1, b2 = 1.0, -2 * cw, 1.0
        a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    elif ftype == BiquadType.ALLPASS:
        b0, b1, b2 = 1 - alpha, -2 * cw, 1 + alpha
        a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    elif ftype == BiquadType.PEAK:
        b0, b1, b2 = 1 + alpha * A, -2 * cw, 1 - alpha * A
        a0, a1, a2 = 1 + alpha / A, -2 * cw, 1 - alpha / A
    elif ftype == BiquadType.LOWSHELF:
        sq = 2 * math.sqrt(A) * alpha
        b0 = A * ((A + 1) - (A - 1) * cw + sq)
        b1 = 2 * A * ((A - 1) - (A + 1) * cw)
        b2 = A * ((A + 1) - (A - 1) * cw - sq)
        a0 = (A + 1) + (A - 1) * cw + sq
        a1 = -2 * ((A - 1) + (A + 1) * cw)
        a2 = (A + 1) + (A - 1) * cw - sq
    elif ftype == BiquadType.HIGHSHELF:
        sq = 2 * math.sqrt(A) * alpha
        b0 = A * ((A + 1) + (A - 1) * cw + sq)
        b1 = -2 * A * ((A - 1) + (A + 1) * cw)
        b2 = A * ((A + 1) + (A - 1) * cw - sq)
        a0 = (A + 1) - (A - 1) * cw + sq
        a1 = 2 * ((A - 1) - (A + 1) * cw)
        a2 = (A + 1) - (A - 1) * cw - sq
    else:  # pragma: no cover
        raise ValueError(ftype)

    return BiquadCoeffs(b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def biquad_sequential(x: np.ndarray, c: BiquadCoeffs, state: np.ndarray | None = None):
    """Ground-truth filter: f64 transposed direct-form II, per channel.

    x: [C, F] (any float dtype). Returns (y [C, F] f64, state [C, 2] f64).
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    C, F = x.shape
    st = np.zeros((C, 2), dtype=np.float64) if state is None else state.astype(np.float64).copy()
    y = np.empty_like(x)
    for ch in range(C):
        s1, s2 = st[ch]
        for n in range(F):
            xn = x[ch, n]
            yn = c.b0 * xn + s1
            s1 = c.b1 * xn - c.a1 * yn + s2
            s2 = c.b2 * xn - c.a2 * yn
            y[ch, n] = yn
        st[ch] = (s1, s2)
    return y, st


def _affine_compose(left, right):
    """Combine scan elements (f32): ``left`` is the earlier prefix; the
    result applies left first (right ∘ left). Elements are 6 arrays:
    (m11, m12, m21, m22, v1, v2) for the affine map z -> M z + v."""
    (a11_l, a12_l, a21_l, a22_l, v1_l, v2_l) = left
    (a11_r, a12_r, a21_r, a22_r, v1_r, v2_r) = right
    a11 = a11_r * a11_l + a12_r * a21_l
    a12 = a11_r * a12_l + a12_r * a22_l
    a21 = a21_r * a11_l + a22_r * a21_l
    a22 = a21_r * a12_l + a22_r * a22_l
    v1 = a11_r * v1_l + a12_r * v2_l + v1_r
    v2 = a21_r * v1_l + a22_r * v2_l + v2_r
    return (a11, a12, a21, a22, v1, v2)


# left identity of _affine_compose (z -> I z + 0): compose(I, r) == r exactly
_AFFINE_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def eig_section_params(c: BiquadCoeffs) -> np.ndarray:
    """Precompute the eigenbasis-transformed section (host, f64) -> 9 f32.

    The TDF2 state map z[n] = A z[n-1] + B x[n] uses the companion matrix
    A = [[-a1, 1], [-a2, 0]], which is highly non-normal near the unit
    circle — f32 parallel products of it lose up to ~-44 dB (e.g. a 30 Hz
    highpass). Transforming to the eigenbasis (M = P^-1 A P: a scaled
    rotation for complex poles, diagonal for real ones — both *normal*
    matrices) makes f32 scan products well-conditioned.

    Returns (m11, m12, m21, m22, bv1, bv2, p11, p12, b0) where
    z'[n] = M z'[n-1] + Bv x[n] and y[n] = b0 x[n] + (p11 z'1 + p12 z'2)[n-1].
    """
    A = np.array([[-c.a1, 1.0], [-c.a2, 0.0]], dtype=np.float64)
    Bv = np.array([c.b1 - c.a1 * c.b0, c.b2 - c.a2 * c.b0], dtype=np.float64)

    if c.a1 == 0.0 and c.a2 == 0.0:
        # FIR section (gain / identity): A is nilpotent; keep companion form
        P = np.eye(2)
        M = A
    else:
        w, V = np.linalg.eig(A)
        if np.iscomplexobj(w) and abs(w[0].imag) > 1e-12:
            # complex pair: real canonical form [[re, im], [-im, re]]
            v = V[:, 0]
            P = np.stack([v.real, v.imag], axis=1)
            M = np.array([[w[0].real, w[0].imag], [-w[0].imag, w[0].real]])
        else:
            w = w.real
            V = V.real
            if abs(w[0] - w[1]) < 1e-9 or np.linalg.cond(V) > 1e6:
                # (nearly) defective: stay in companion form (rare; the
                # conditioning hazard needs r ~ 1 AND a parallel product,
                # and defective audio filters at r ~ 1 are degenerate)
                P = np.eye(2)
                M = A
            else:
                P = V
                M = np.diag(w)
        if np.linalg.cond(P) > 1e7:
            P = np.eye(2)
            M = A
    Pinv = np.linalg.inv(P)
    Bp = Pinv @ Bv
    return np.array(
        [M[0, 0], M[0, 1], M[1, 0], M[1, 1], Bp[0], Bp[1], P[0, 0], P[0, 1], c.b0],
        dtype=np.float32,
    )


N_SECTION_PARAMS = 9


def _biquad_scan_eig(x, params, state):
    """Core scan. params: 9 arrays [B, 1] f32 (see eig_section_params).

    x [B, F] f32; state [B, 2] f32 in the section's eigen coordinates.
    Returns (y [B, F] f32, new_state [B, 2]).
    """
    m11, m12, m21, m22, bv1, bv2, p11, p12, b0 = params
    zeros = jnp.zeros_like(x)
    elems = (
        m11 + zeros, m12 + zeros, m21 + zeros, m22 + zeros,
        bv1 * x, bv2 * x,
    )
    a11, a12, a21, a22, v1, v2 = hillis_scan(
        _affine_compose, elems, _AFFINE_IDENTITY)
    z1 = a11 * state[:, 0:1] + a12 * state[:, 1:2] + v1
    z2 = a21 * state[:, 0:1] + a22 * state[:, 1:2] + v2
    z1_shift = jnp.concatenate([state[:, 0:1], z1[:, :-1]], axis=1)
    z2_shift = jnp.concatenate([state[:, 1:2], z2[:, :-1]], axis=1)
    y = b0 * x + (p11 * z1_shift + p12 * z2_shift)
    new_state = jnp.stack([z1[:, -1], z2[:, -1]], axis=1)
    return y.astype(jnp.float32), new_state


def biquad_scan_with_transition(x, params, state):
    """Like the core scan but also returns the shard-level affine transition
    (A_total [B,2,2], v_total [B,2]) and the per-position cumulative A
    (shifted by one: position n carries A^(0..n-1)) — the pieces a
    frame-sharded render needs to inject an upstream state exactly:

        y_corrected[n] = y_local[n] + P_row · (Acum_shift[n] @ z_in)
        z_out          = A_total @ z_in + v_total
    """
    m11, m12, m21, m22, bv1, bv2, p11, p12, b0 = params
    zeros = jnp.zeros_like(x)
    elems = (
        m11 + zeros, m12 + zeros, m21 + zeros, m22 + zeros,
        bv1 * x, bv2 * x,
    )
    a11, a12, a21, a22, v1, v2 = hillis_scan(
        _affine_compose, elems, _AFFINE_IDENTITY)
    z1 = a11 * state[:, 0:1] + a12 * state[:, 1:2] + v1
    z2 = a21 * state[:, 0:1] + a22 * state[:, 1:2] + v2
    z1_shift = jnp.concatenate([state[:, 0:1], z1[:, :-1]], axis=1)
    z2_shift = jnp.concatenate([state[:, 1:2], z2[:, :-1]], axis=1)
    y = b0 * x + (p11 * z1_shift + p12 * z2_shift)
    new_state = jnp.stack([z1[:, -1], z2[:, -1]], axis=1)

    one = jnp.ones_like(x[:, :1])
    zero = jnp.zeros_like(x[:, :1])
    acum = (
        jnp.concatenate([one, a11[:, :-1]], axis=1),
        jnp.concatenate([zero, a12[:, :-1]], axis=1),
        jnp.concatenate([zero, a21[:, :-1]], axis=1),
        jnp.concatenate([one, a22[:, :-1]], axis=1),
    )
    A_total = jnp.stack([
        jnp.stack([a11[:, -1], a12[:, -1]], axis=-1),
        jnp.stack([a21[:, -1], a22[:, -1]], axis=-1),
    ], axis=1)  # [B, 2, 2]
    return y.astype(jnp.float32), new_state, acum, A_total


def coeffs_device_arrays(c: BiquadCoeffs) -> np.ndarray:
    """f64 coefficients -> the 9 eigenbasis section params (f32)."""
    return eig_section_params(c)


def biquad_scan(x, c: BiquadCoeffs, state=None):
    """TPU-parallel biquad via eigenbasis associative scan (log-depth).

    x: [C, F] f32 (jnp). state: [C, 2] f32 in eigen coordinates (opaque —
    thread it between chunked calls; zeros == silence). Returns (y, state).
    """
    x = jnp.atleast_2d(x).astype(jnp.float32)
    B = x.shape[0]
    pa = eig_section_params(c)
    arrs = [jnp.full((B, 1), v, dtype=jnp.float32) for v in pa]
    if state is None:
        state = jnp.zeros((B, 2), dtype=jnp.float32)
    return _biquad_scan_eig(x, arrs, state)


IDENTITY_COEFFS = BiquadCoeffs(1.0, 0.0, 0.0, 0.0, 0.0)


def biquad_scan_batched(x, coeff_arrays, state):
    """Batched-section biquad: x [B, F]; coeff_arrays = 9 x [B, 1] f32
    (eig_section_params per row); state [B, 2] (eigen coords).

    Each batch row has its own section (identity rows pass through), so a
    whole session's per-track chains run as one cascade of batched scans —
    the TPU-shaped replacement for "one plugin instance per track".
    """
    return _biquad_scan_eig(x.astype(jnp.float32), list(coeff_arrays), state)


# ---------------------------------------------------------------------------
# time-varying sections (timed coefficient automation)
# ---------------------------------------------------------------------------

#: param-block length for coefficient automation — the reference's default
#: audio buffer (config.cpp:146): effect params change at block rate there
#: (param_changes.h sample-ranged queues are delivered per process() call),
#: so coefficients step every PARAM_BLOCK frames here.
PARAM_BLOCK = 512


def design_biquad_device(ftype: BiquadType | str, freq_hz, q, gain_db, sample_rate: float):
    """RBJ design, elementwise on device (f32 jnp arrays in, dict out).

    Uses half-angle forms (1-cos w = 2 sin^2(w/2)) so low-frequency designs
    keep precision in f32, and returns the pole's (re, imsq) computed from
    the *analytic* factorization — ``imsq = k * sw^2 (1 - 1/(4q^2)) / a0^2``
    — rather than the catastrophically-cancelling ``a2 - a1^2/4``.
    Returns dict(b0,b1,b2,a1,a2,re,imsq) of broadcast-compatible arrays.
    """
    ftype = BiquadType(ftype)
    w0 = jnp.float32(2.0 * math.pi / sample_rate) * freq_hz
    s2 = jnp.sin(0.5 * w0)
    s2sq = jnp.square(s2)
    cw = 1.0 - 2.0 * s2sq
    sw = 2.0 * s2 * jnp.sqrt(jnp.maximum(1.0 - s2sq, 0.0))
    alpha = sw / (2.0 * q)
    A = jnp.exp2(jnp.float32(math.log2(10.0) / 40.0) * gain_db)

    # U1/U2 are the cancellation-free forms of b1*a0 - a1*b0 and
    # b2*a0 - a2*b0: the naive f32 differences cancel catastrophically at
    # low frequencies (e.g. a 30 Hz highpass loses ~6e-5 relative on bv,
    # which the recursion amplifies to ~3e-4 output error); these algebraic
    # reductions keep every term same-signed.
    shelf = ftype in (BiquadType.LOWSHELF, BiquadType.HIGHSHELF)
    swsq = jnp.square(sw)
    if ftype == BiquadType.LOWPASS:
        b0, b1, b2 = s2sq, 2.0 * s2sq, s2sq
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
        U1 = 2.0 * s2sq * (2.0 - 2.0 * s2sq + alpha)
        U2 = 2.0 * s2sq * alpha
    elif ftype == BiquadType.HIGHPASS:
        h = 1.0 - s2sq
        b0, b1, b2 = h, -2.0 * h, h
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
        U1 = -2.0 * h * (2.0 * s2sq + alpha)
        U2 = 2.0 * h * alpha
    elif ftype == BiquadType.BANDPASS:
        b0, b1, b2 = alpha, jnp.zeros_like(alpha), -alpha
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
        U1 = 2.0 * cw * alpha
        U2 = -2.0 * alpha
    elif ftype == BiquadType.NOTCH:
        b0, b1, b2 = jnp.ones_like(alpha), -2.0 * cw, jnp.ones_like(alpha)
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
        U1 = -2.0 * cw * alpha
        U2 = 2.0 * alpha
    elif ftype == BiquadType.ALLPASS:
        b0, b1, b2 = 1.0 - alpha, -2.0 * cw, 1.0 + alpha
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
        U1 = -4.0 * cw * alpha
        U2 = 4.0 * alpha
    elif ftype == BiquadType.PEAK:
        b0, b1, b2 = 1.0 + alpha * A, -2.0 * cw, 1.0 - alpha * A
        a0, a1, a2 = 1.0 + alpha / A, -2.0 * cw, 1.0 - alpha / A
        dA = A - 1.0 / A
        U1 = 2.0 * cw * alpha * dA
        U2 = -2.0 * alpha * dA
    elif ftype == BiquadType.LOWSHELF:
        sq = 2.0 * jnp.sqrt(A) * alpha
        b0 = A * ((A + 1.0) - (A - 1.0) * cw + sq)
        b1 = 2.0 * A * ((A - 1.0) - (A + 1.0) * cw)
        b2 = A * ((A + 1.0) - (A - 1.0) * cw - sq)
        a0 = (A + 1.0) + (A - 1.0) * cw + sq
        a1 = -2.0 * ((A - 1.0) + (A + 1.0) * cw)
        a2 = (A + 1.0) + (A - 1.0) * cw - sq
        U1 = 4.0 * A * (A - 1.0) * ((A + 1.0) * swsq + sq)
        U2 = -4.0 * A * (A - 1.0) * cw * sq
    elif ftype == BiquadType.HIGHSHELF:
        sq = 2.0 * jnp.sqrt(A) * alpha
        b0 = A * ((A + 1.0) + (A - 1.0) * cw + sq)
        b1 = -2.0 * A * ((A - 1.0) + (A + 1.0) * cw)
        b2 = A * ((A + 1.0) + (A - 1.0) * cw - sq)
        a0 = (A + 1.0) - (A - 1.0) * cw + sq
        a1 = 2.0 * ((A - 1.0) - (A + 1.0) * cw)
        a2 = (A + 1.0) - (A - 1.0) * cw - sq
        U1 = -4.0 * A * (A - 1.0) * ((A + 1.0) * swsq + sq)
        U2 = 4.0 * A * (A - 1.0) * cw * sq
    else:  # pragma: no cover
        raise ValueError(ftype)

    inv_a0 = 1.0 / a0
    # pole: re = -a1/(2 a0); imsq (signed; < 0 -> real poles) from the
    # analytic a0*a2 - a1^2/4 per family (no f32 cancellation):
    #   standard denominator: sw^2 - alpha^2
    #   peak (denominator alpha/A): sw^2 - (alpha/A)^2
    #   shelves: 4A (sw^2 - alpha^2)
    if ftype == BiquadType.PEAK:
        disc = jnp.square(sw) - jnp.square(alpha / A)
    elif shelf:
        disc = 4.0 * A * (jnp.square(sw) - jnp.square(alpha))
    else:
        disc = jnp.square(sw) - jnp.square(alpha)
    inv_a0sq = jnp.square(inv_a0)
    out = {
        "b0": (b0 * inv_a0).astype(jnp.float32),
        "b1": (b1 * inv_a0).astype(jnp.float32),
        "b2": (b2 * inv_a0).astype(jnp.float32),
        "a1": (a1 * inv_a0).astype(jnp.float32),
        "a2": (a2 * inv_a0).astype(jnp.float32),
        "bv1": (U1 * inv_a0sq).astype(jnp.float32),
        "bv2": (U2 * inv_a0sq).astype(jnp.float32),
        "re": (-0.5 * a1 * inv_a0).astype(jnp.float32),
        "imsq": (disc * inv_a0sq).astype(jnp.float32),
    }
    return out


_TV_EPS = 1e-8  # |imsq| below this -> (near-)defective: companion basis


def tv_section_params(d: dict):
    """Eigenbasis section params from a device design, elementwise.

    Mirrors eig_section_params (host, f64) with closed-form eigenvectors of
    the companion matrix (v = (1, lambda + a1)), selected per element among
    complex-pair / real-diagonal / companion bases. Returns
    (params9, P [..., 2, 2], Pinv [..., 2, 2]) where params9 is the 9-tuple
    (m11,m12,m21,m22,bv1,bv2,p11,p12,b0) and P maps eigen -> z (TDF2)
    coordinates."""
    b0, b1, b2, a1, a2 = d["b0"], d["b1"], d["b2"], d["a1"], d["a2"]
    re, imsq = d["re"], d["imsq"]
    # the stable forms from design_biquad_device when available; the naive
    # difference cancels in f32 for low-frequency designs
    bv1 = d.get("bv1", b1 - a1 * b0)
    bv2 = d.get("bv2", b2 - a2 * b0)

    is_c = imsq > _TV_EPS
    is_r = imsq < -_TV_EPS
    one = jnp.ones_like(re)
    zero = jnp.zeros_like(re)

    im = jnp.sqrt(jnp.where(is_c, imsq, 1.0))
    s = jnp.sqrt(jnp.where(is_r, -imsq, 1.0))
    lp = re + s
    lm = re - s

    def sel(c, r, k):
        return jnp.where(is_c, c, jnp.where(is_r, r, k)).astype(jnp.float32)

    m11 = sel(re, lp, -a1)
    m12 = sel(im, zero, one)
    m21 = sel(-im, zero, -a2)
    m22 = sel(re, lm, zero)
    # P columns are Re v / Im v (complex) or the two eigenvectors (real)
    p_11 = sel(one, one, one)
    p_12 = sel(zero, one, zero)
    p_21 = sel(-re, -lm, zero)
    p_22 = sel(im, -lp, one)
    inv_im = 1.0 / im
    inv_2s = 1.0 / (2.0 * s)
    q_11 = sel(one, lp * inv_2s, one)
    q_12 = sel(zero, inv_2s, zero)
    q_21 = sel(re * inv_im, -lm * inv_2s, zero)
    q_22 = sel(inv_im, -inv_2s, one)

    bp1 = q_11 * bv1 + q_12 * bv2
    bp2 = q_21 * bv1 + q_22 * bv2
    params9 = (m11, m12, m21, m22, bp1, bp2, p_11, p_12, b0.astype(jnp.float32))
    P = jnp.stack([jnp.stack([p_11, p_12], axis=-1), jnp.stack([p_21, p_22], axis=-1)], axis=-2)
    Pinv = jnp.stack([jnp.stack([q_11, q_12], axis=-1), jnp.stack([q_21, q_22], axis=-1)], axis=-2)
    aux = {"is_c": is_c, "re": re.astype(jnp.float32), "im": jnp.where(is_c, im, 0.0).astype(jnp.float32)}
    return params9, P, Pinv, aux


def biquad_scan_blocked_tv(x, params9, P, Pinv, z_in, PB: int = PARAM_BLOCK, aux=None,
                           return_injection: bool = False):
    """Time-varying biquad: per-param-block coefficients, blocked scans.

    x [R, F] f32 with F a multiple of PB; params9: 9 arrays [R, K]
    (K = F // PB) from tv_section_params; P / Pinv [R, K, 2, 2]; z_in
    [R, 2] entry state in z (TDF2 s1/s2) coordinates — the coordinates the
    f64 host reference carries across coefficient changes.

    Within each block: the eigenbasis associative scan (well-conditioned).
    Across blocks: a sequential scan (K = frames/512 steps of [R]-batched
    2x2 matvecs — negligible serialization) carrying the state in the
    *current block's eigen coordinates*; adjacent blocks convert via
    J_k = Pinv_{k+1} P_k. For complex-pole pairs J has the cancellation-
    free closed form [[1,0],[(re_k - re_{k+1})/im_{k+1}, im_k/im_{k+1}]],
    which is exactly the identity when coefficients repeat — so constant
    stretches suffer zero conversion noise (ill-conditioned P round-trips
    per block would otherwise cost ~1e-4 on resonant filters). ``aux``
    (from tv_section_params) enables that form. Returns (y, z_out)."""
    R, F = x.shape
    K = F // PB
    assert K * PB == F, "frame count must be a multiple of the param block"
    xb = x.reshape(R, K, PB).reshape(R * K, PB)
    pf = [p.reshape(R * K, 1) for p in params9]
    y0, v_eig, acum, A_eig = biquad_scan_with_transition(
        xb, pf, jnp.zeros((R * K, 2), jnp.float32)
    )
    A_eig = A_eig.reshape(R, K, 2, 2)
    v_eig = v_eig.reshape(R, K, 2)

    # adjacent-basis transitions J_k: block-k eigen coords -> block-(k+1)
    Jg = jnp.einsum("rkij,rkjl->rkil", Pinv[:, 1:], P[:, :-1])  # generic
    if aux is not None:
        is_c, re, im = aux["is_c"], aux["re"], aux["im"]
        both_c = is_c[:, 1:] & is_c[:, :-1]
        im1 = jnp.where(both_c, im[:, 1:], 1.0)
        j21 = (re[:, 1:] - re[:, :-1]) / im1
        j22 = im[:, :-1] / im1
        ones = jnp.ones_like(j21)
        zeros = jnp.zeros_like(j21)
        Jc = jnp.stack([
            jnp.stack([ones, zeros], axis=-1),
            jnp.stack([j21, j22], axis=-1),
        ], axis=-2)
        Jg = jnp.where(both_c[..., None, None], Jc, Jg)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (R, 1, 2, 2))
    J = jnp.concatenate([Jg, eye], axis=1)  # [R, K, 2, 2] (last unused -> I)

    e0 = jnp.einsum("rij,rj->ri", Pinv[:, 0], z_in)

    if not return_injection:
        def step(e, blk):
            A_k, v_k, J_k = blk
            exit_k = jnp.einsum("rij,rj->ri", A_k, e) + v_k
            return jnp.einsum("rij,rj->ri", J_k, exit_k), (e, exit_k)

        e_last, (e_entry, e_exit) = jax.lax.scan(
            step, e0,
            (A_eig.transpose(1, 0, 2, 3), v_eig.transpose(1, 0, 2), J.transpose(1, 0, 2, 3)),
        )
        e_entry = e_entry.transpose(1, 0, 2)  # [R, K, 2] (per-block eigen coords)
        z_out = jnp.einsum("rij,rj->ri", P[:, -1], e_exit[-1])

        ze = e_entry.reshape(R * K, 2)
        a11, a12, a21, a22 = acum  # [R*K, PB], shifted cumulative transitions
        p11, p12 = pf[6], pf[7]
        corr = p11 * (a11 * ze[:, 0:1] + a12 * ze[:, 1:2]) + p12 * (
            a21 * ze[:, 0:1] + a22 * ze[:, 1:2]
        )
        y = (y0 + corr).reshape(R, K, PB).reshape(R, F)
        return y.astype(jnp.float32), z_out

    # injection mode (frame-sharded handoff): also track the *linear* map
    # from an unknown span-entry z to each block's eigen entry state
    # (T [R, K, 2, 2]) and to the span-exit z (Tz [R, 2, 2]), so a shard
    # can run from zero, learn its true z_in from gathered summaries, and
    # correct with tv_inject — the TV analogue of biquad_shard_framewise.
    # tie the carry init to shard-varying values (v_eig/A_eig derive from
    # the shard's audio): shard_map's scan requires carry-in and carry-out
    # to agree on varying-axes metadata, and e0/M0 alone are replicated
    e0 = e0 + 0.0 * v_eig[:, 0]
    M0 = jnp.broadcast_to(Pinv[:, 0], (R, 2, 2)) + 0.0 * A_eig[:, 0]

    def step(carry, blk):
        e, M = carry
        A_k, v_k, J_k = blk
        exit_k = jnp.einsum("rij,rj->ri", A_k, e) + v_k
        M_exit = jnp.einsum("rij,rjk->rik", A_k, M)
        return (
            jnp.einsum("rij,rj->ri", J_k, exit_k),
            jnp.einsum("rij,rjk->rik", J_k, M_exit),
        ), (e, M, exit_k, M_exit)

    (_, _), (e_entry, T, e_exit, M_exit) = jax.lax.scan(
        step, (e0, M0),
        (A_eig.transpose(1, 0, 2, 3), v_eig.transpose(1, 0, 2), J.transpose(1, 0, 2, 3)),
    )
    e_entry = e_entry.transpose(1, 0, 2)  # [R, K, 2]
    T = T.transpose(1, 0, 2, 3)  # [R, K, 2, 2]
    z_out = jnp.einsum("rij,rj->ri", P[:, -1], e_exit[-1])
    Tz = jnp.einsum("rij,rjk->rik", P[:, -1], M_exit[-1])  # [R, 2, 2]

    ze = e_entry.reshape(R * K, 2)
    a11, a12, a21, a22 = acum
    p11, p12 = pf[6], pf[7]
    corr = p11 * (a11 * ze[:, 0:1] + a12 * ze[:, 1:2]) + p12 * (
        a21 * ze[:, 0:1] + a22 * ze[:, 1:2]
    )
    y = (y0 + corr).reshape(R, K, PB).reshape(R, F).astype(jnp.float32)
    inj = {"T": T, "acum": acum, "p11": p11, "p12": p12, "K": K, "PB": PB}
    return y, z_out, Tz, inj


def tv_inject(y, z_in, inj):
    """Add the response to a span-entry state ``z_in`` [R, 2] to a
    ``return_injection`` result (y [R, F]): the sharded handoff correction."""
    R, F = y.shape
    K, PB = inj["K"], inj["PB"]
    ze = jnp.einsum("rkij,rj->rki", inj["T"], z_in).reshape(R * K, 2)
    a11, a12, a21, a22 = inj["acum"]
    corr = inj["p11"] * (a11 * ze[:, 0:1] + a12 * ze[:, 1:2]) + inj["p12"] * (
        a21 * ze[:, 0:1] + a22 * ze[:, 1:2]
    )
    return y + corr.reshape(R, K, PB).reshape(R, F)


def biquad_sequential_tv(x: np.ndarray, ftype, freq, q, gain_db, sample_rate: float,
                         PB: int = PARAM_BLOCK, state: np.ndarray | None = None):
    """Host f64 reference for coefficient automation: coefficients
    redesigned every PB frames (values indexed per block), TDF2 state
    carried across the change. x [C, F]; freq/q/gain_db arrays [K]."""
    x = np.atleast_2d(np.asarray(x, np.float64))
    C, F = x.shape
    K = -(-F // PB)
    st = np.zeros((C, 2), np.float64) if state is None else state.astype(np.float64).copy()
    y = np.empty_like(x)
    for k in range(K):
        c = design_biquad(ftype, float(freq[k]), sample_rate, float(q[k]), float(gain_db[k]))
        sl = slice(k * PB, min((k + 1) * PB, F))
        y[:, sl], st = biquad_sequential(x[:, sl], c, st)
    return y, st


def pack_chain_sections(chains: list, channels: int, max_sections: int | None = None):
    """Flatten per-track effect chains into batched cascade coefficients.

    ``chains``: one prepared EffectChain (or None) per track. Every effect
    must reduce to biquad sections (Biquad / ParametricEQ bands / Gain as a
    b0-only section). Returns (S, [S, T*C, 1] x10 hi/lo coeff arrays) with
    identity sections padding shorter chains.
    """
    from whitebox_tpu.effects.base import EffectChain
    from whitebox_tpu.effects.eq import Biquad, ParametricEQ
    from whitebox_tpu.effects.gain import Gain

    def sections_of(chain) -> list[BiquadCoeffs]:
        if chain is None:
            return []
        effs = chain.effects if isinstance(chain, EffectChain) else [chain]
        secs: list[BiquadCoeffs] = []
        for e in effs:
            if isinstance(e, Biquad):
                assert e.coeffs is not None, "effect not prepared"
                secs.append(e.coeffs)
            elif isinstance(e, ParametricEQ):
                assert e.coeffs, "effect not prepared"
                secs.extend(e.coeffs)
            elif isinstance(e, Gain):
                g = float(e.gain_linear)
                secs.append(BiquadCoeffs(g, 0.0, 0.0, 0.0, 0.0))
            else:
                raise TypeError(f"effect {e!r} has no biquad-section form")
        return secs

    per_track = [sections_of(c) for c in chains]
    S = max([len(p) for p in per_track] + [max_sections or 0, 1])
    T = len(chains)
    coeff = np.zeros((N_SECTION_PARAMS, S, T, 1), dtype=np.float32)
    for t, secs in enumerate(per_track):
        for s in range(S):
            c = secs[s] if s < len(secs) else IDENTITY_COEFFS
            coeff[:, s, t, 0] = coeffs_device_arrays(c)
    # expand to T*C rows (same section for every channel of a track)
    coeff = np.repeat(coeff, channels, axis=2)
    return S, coeff  # [N_SECTION_PARAMS, S, T*C, 1]
