"""Double-single (two-float) arithmetic for resampler phase on TPU.

TPU has no f64; the engine's resampler phase is f64 (sampler.cpp:50-52).
We carry phase as an unevaluated sum of two f32 (~49-bit significand):
host splits exact f64 values, the kernel evaluates
``x = frac + j * speed`` and extracts ``floor``/fraction with ~2^-48
relative error — at most 1 f32 ulp of the interpolation fraction away from
the engine's f64 value (see timeline.carve docstring for the contract).

Classic error-free transforms (Dekker/Knuth), FMA-free so the lowering is
portable across XLA backends.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1 Dekker split constant for f32


def split_f64(x) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: exact f64 -> (hi, lo) f32 pair (hi+lo ~ x to ~2^-49 rel)."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _dekker_split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def phase_eval(j, frac_hi, frac_lo, speed_hi, speed_lo):
    """Evaluate x = (frac_hi+frac_lo) + j*(speed_hi+speed_lo); return
    (ix_int32, fx_f32) with x = ix + fx, fx in [0, 1).

    ``j`` int32 (exactly representable in f32, i.e. < 2^24 — block-local
    frame index). All inputs broadcastable.
    """
    jf = j.astype(jnp.float32)
    p, pe = _two_prod(jf, speed_hi)
    lo_term = pe + jf * speed_lo
    s, se = _two_sum(frac_hi, p)
    lo = se + (frac_lo + lo_term)
    hi, lo = _two_sum(s, lo)  # renormalize

    ixf = jnp.floor(hi)
    r = (hi - ixf) + lo
    # boundary adjustments: r can land just outside [0, 1)
    under = r < 0.0
    over = r >= 1.0
    ixf = jnp.where(under, ixf - 1.0, jnp.where(over, ixf + 1.0, ixf))
    r = jnp.where(under, r + 1.0, jnp.where(over, r - 1.0, r))
    return ixf.astype(jnp.int32), r.astype(jnp.float32)


# ---- generic double-single vector ops (used by the biquad scan) ----


def ds_quick_renorm(h, l):
    s = h + l
    e = l - (s - h)
    return s, e


def ds_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return ds_quick_renorm(s, e)


def ds_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return ds_quick_renorm(p, e)


def ds_collapse(h, l):
    return h + l
