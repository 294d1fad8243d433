"""Windowed-sinc resampling — the north-star upgrade over the engine's
linear interpolation (sampler.cpp:34-59; its Catmull-Rom is unfinished and
sinc absent, SURVEY §2.9).

Design: polyphase Kaiser-windowed sinc bank computed on host in f64
(`design_sinc_bank`), evaluated on device as a per-frame K-tap dot product
with the fractional phase selecting (and linearly blending between)
adjacent polyphase rows. Downsampling applies the standard anti-alias
cutoff/stretch (cutoff = min(1, 1/ratio), taps scaled by the stretch).

Used two ways:
- ``resample_audio``: standalone high-quality SRC ([C, N] at src_rate ->
  dst_rate), batched over channels on device.
- mix integration: ``bounce(..., interpolation="sinc")`` renders resampled
  clip segments through the same segment tables with sinc taps instead of
  lerp (linear remains the default = reference parity).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TAPS = 32
DEFAULT_PHASES = 512


def _kaiser_beta(atten_db: float) -> float:
    if atten_db > 50.0:
        return 0.1102 * (atten_db - 8.7)
    if atten_db >= 21.0:
        return 0.5842 * (atten_db - 21.0) ** 0.4 + 0.07886 * (atten_db - 21.0)
    return 0.0


def design_sinc_bank(
    ratio: float = 1.0,
    taps: int = DEFAULT_TAPS,
    phases: int = DEFAULT_PHASES,
    atten_db: float = 90.0,
) -> np.ndarray:
    """Polyphase bank [phases + 1, taps] f32 (f64 design).

    ``ratio`` = source advance per output frame; ratios > 1 (downsampling)
    lower the cutoff for anti-aliasing. Row p holds the taps for fractional
    phase p/phases; the extra row lets the kernel lerp between rows.
    Tap k of row p weights source sample ``ix + k - taps//2 + 1``.
    """
    cutoff = min(1.0, 1.0 / ratio) * 0.91  # transition margin below Nyquist
    beta = _kaiser_beta(atten_db)
    half = taps // 2
    bank = np.zeros((phases + 1, taps), dtype=np.float64)
    for p in range(phases + 1):
        frac = p / phases
        # source positions relative to interpolation point
        n = np.arange(taps, dtype=np.float64) - (half - 1) - frac
        h = cutoff * np.sinc(cutoff * n)
        w = np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - (n / half) ** 2))) / np.i0(beta)
        w[np.abs(n) > half] = 0.0
        bank[p] = h * w
    # normalize each phase row for exact DC gain
    bank /= bank.sum(axis=1, keepdims=True)
    return bank.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_frames", "taps", "phases"))
def _resample_kernel(x_padded, ratio_f64_hi, ratio_f64_lo, bank, out_frames: int, taps: int, phases: int):
    """x_padded [C, Np] -> [C, out_frames]; phase via double-single."""
    from whitebox_tpu.ops.dsarith import phase_eval

    n = jnp.arange(out_frames, dtype=jnp.int32)
    ix, fx = phase_eval(n, jnp.float32(0.0), jnp.float32(0.0), ratio_f64_hi, ratio_f64_lo)
    pf = fx * phases
    p0 = jnp.clip(pf.astype(jnp.int32), 0, phases - 1)
    pl = pf - p0.astype(jnp.float32)
    half = taps // 2

    def per_channel(xc):
        acc = jnp.zeros(out_frames, dtype=jnp.float32)
        for k in range(taps):
            w = bank[p0, k] + pl * (bank[p0 + 1, k] - bank[p0, k])
            acc = acc + w * xc[jnp.clip(ix + (k - half + 1) + half, 0, xc.shape[0] - 1)]
        return acc

    return jax.vmap(per_channel)(x_padded)


def resample_audio(
    x: np.ndarray,
    src_rate: float,
    dst_rate: float,
    taps: int = DEFAULT_TAPS,
    phases: int = DEFAULT_PHASES,
    atten_db: float = 90.0,
) -> np.ndarray:
    """High-quality SRC: planar [C, N] (f32) src_rate -> dst_rate."""
    from whitebox_tpu.ops.dsarith import split_f64

    x = np.atleast_2d(np.asarray(x, dtype=np.float32))
    C, N = x.shape
    ratio = float(src_rate) / float(dst_rate)
    out_frames = int(math.floor((N - 1) / ratio)) + 1
    bank = design_sinc_bank(ratio, taps, phases, atten_db)

    half = taps // 2
    xp = np.pad(x, ((0, 0), (half, half + 1)))
    rh, rl = split_f64(np.float64(ratio))
    out = _resample_kernel(
        jnp.asarray(xp), jnp.float32(rh), jnp.float32(rl), jnp.asarray(bank),
        out_frames=out_frames, taps=taps, phases=phases,
    )
    return np.asarray(out)


def resample_reference(x: np.ndarray, src_rate: float, dst_rate: float, taps=DEFAULT_TAPS,
                       phases=DEFAULT_PHASES, atten_db=90.0) -> np.ndarray:
    """Host f64 mirror (test reference)."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    C, N = x.shape
    ratio = float(src_rate) / float(dst_rate)
    out_frames = int(math.floor((N - 1) / ratio)) + 1
    bank = design_sinc_bank(ratio, taps, phases, atten_db).astype(np.float64)
    half = taps // 2
    xp = np.pad(x, ((0, 0), (half, half + 1)))
    out = np.zeros((C, out_frames), dtype=np.float64)
    for n in range(out_frames):
        pos = n * ratio
        ix = int(math.floor(pos))
        frac = pos - ix
        pf = frac * phases
        p0 = min(int(pf), phases - 1)
        pl = pf - p0
        w = bank[p0] + pl * (bank[p0 + 1] - bank[p0])
        seg = xp[:, ix + 1 : ix + 1 + taps]
        out[:, n] = seg @ w
    return out.astype(np.float32)
