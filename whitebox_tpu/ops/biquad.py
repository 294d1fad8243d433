"""Biquad filters: RBJ-cookbook design + TPU-parallel filtering.

The reference hosts effects as binary VST3 plugins (src/plughost) — there is
no native DSP to port, so this module *defines* the framework's effect
numerics:

- Coefficient design: Robert Bristow-Johnson's Audio EQ Cookbook formulas
  (public domain), computed in float64.
- ``biquad_sequential``: the ground-truth filter — float64 transposed
  direct-form II, one sample at a time (NumPy; the oracle for tests).
- ``biquad_scan``: the TPU path — state-space form evaluated with
  ``jax.lax.associative_scan`` (log-depth, frame-parallel, f32). This is the
  "sequence parallelism" answer to IIR state: the recurrence
  z[n] = A z[n-1] + B x[n] is a composition of affine maps, scanned in
  O(log F) depth. f32 associative evaluation deviates from the sequential
  reference by ~1e-5 relative for typical audio filters (tested bounds).
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
    a11, a12, a21, a22, v1, v2 = jax.lax.associative_scan(_affine_compose, elems, axis=1)
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
    a11, a12, a21, a22, v1, v2 = jax.lax.associative_scan(_affine_compose, elems, axis=1)
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
