"""FFT-FIR effects finishing — the high-throughput alternative to the
associative-scan cascade (render/effects_pipeline.py).

Each track's whole effect chain is LTI, so the host collapses it into one
impulse response (f64 sequential filtering of a delta, truncated where the
tail falls below -120 dBFS) and the device convolves per-track buffers with
it via overlap-save FFT — O(F log B) on the TPU's FFT path instead of
log-depth scans per biquad section. The master chain gets the same
treatment after the ordered track sum.

Accuracy: truncation bounded by the tail threshold (default 1e-6 ≈
-120 dB); f32 FFT roundoff ~1e-6 relative. The scan path remains the
high-accuracy default; ``bounce(effects_mode="fir")`` selects this one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.ops.biquad import biquad_sequential
from whitebox_tpu.session.session import Session


def chain_impulse_response(chain, sample_rate: float, tail_thresh: float = 1e-6, max_len: int = 1 << 16) -> np.ndarray:
    """Combined IR of an effect chain (f64, truncated at the tail threshold)."""
    from whitebox_tpu.effects.base import EffectChain
    from whitebox_tpu.effects.eq import Biquad, ParametricEQ
    from whitebox_tpu.effects.gain import Gain

    length = 1024
    while True:
        x = np.zeros((1, length), dtype=np.float64)
        x[0, 0] = 1.0
        effs = chain.effects if isinstance(chain, EffectChain) else list(chain or [])
        for e in effs:
            if isinstance(e, Gain):
                x = x * float(e.gain_linear)
            elif isinstance(e, Biquad):
                assert e.coeffs is not None, "effect not prepared"
                x, _ = biquad_sequential(x, e.coeffs)
            elif isinstance(e, ParametricEQ):
                assert e.coeffs, "effect not prepared"
                for c in e.coeffs:
                    x, _ = biquad_sequential(x, c)
            else:
                raise TypeError(f"effect {e!r} has no LTI form")
        tail = np.abs(x[0, -length // 8 :]).max()
        if tail < tail_thresh or length >= max_len:
            break
        length *= 2
    h = x[0]
    # trim to the last sample above threshold
    nz = np.nonzero(np.abs(h) >= tail_thresh)[0]
    n = int(nz[-1]) + 1 if nz.size else 1
    return h[:n].astype(np.float32)


def prepare_fir_tables(session: Session, sample_rate: float, channels: int = 2):
    """Per-track + master IRs -> padded device arrays.

    Returns (h_rows [T*C, Lh] f32, master_h [Lm] f32 or None).
    """
    from whitebox_tpu.effects.base import EffectChain

    T = len(session.tracks)
    irs = []
    for t in session.tracks:
        if t.effects:
            chain = t.effects if isinstance(t.effects, EffectChain) else EffectChain(list(t.effects))
            chain.prepare(sample_rate, channels)
            irs.append(chain_impulse_response(chain, sample_rate))
        else:
            irs.append(np.ones(1, dtype=np.float32))
    Lh = max(h.shape[0] for h in irs)
    h_rows = np.zeros((T * channels, Lh), dtype=np.float32)
    for t, h in enumerate(irs):
        for c in range(channels):
            h_rows[t * channels + c, : h.shape[0]] = h

    master_h = None
    if session.master_effects:
        m = session.master_effects
        chain = m if isinstance(m, EffectChain) else EffectChain(list(m))
        chain.prepare(sample_rate, channels)
        master_h = chain_impulse_response(chain, sample_rate)
    return h_rows, master_h


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _overlap_save(x, h, B: int):
    """Linear convolution (causal) of x [R, F] with h [R, Lh] via
    overlap-save rFFT blocks of size B; returns [R, F]."""
    R, F = x.shape
    Lh = h.shape[1]
    H = B - (Lh - 1)
    n_blocks = -(-F // H)
    xp = jnp.pad(x, ((0, 0), (Lh - 1, n_blocks * H - F)))
    Hf = jnp.fft.rfft(jnp.pad(h, ((0, 0), (0, B - Lh))), axis=1)

    def body(_, i):
        seg = jax.lax.dynamic_slice_in_dim(xp, i * H, B, axis=1)
        y = jnp.fft.irfft(jnp.fft.rfft(seg, axis=1) * Hf, n=B, axis=1)
        return None, y[:, Lh - 1 :]

    _, ys = jax.lax.scan(body, None, jnp.arange(n_blocks))
    return ys.transpose(1, 0, 2).reshape(R, n_blocks * H)[:, :F]


@functools.partial(jax.jit, static_argnames=("T", "C", "B", "Bm"))
def finish_mix_fir(per_track, h_rows, master_h, track_gain, auto=None, *, T, C, B, Bm):
    """per_track [T, C, F] -> [C, F]: per-track IR conv, per-frame gains,
    ordered sum, master IR conv, hard clip."""
    from whitebox_tpu.render.effects_pipeline import _frame_gains

    F = per_track.shape[-1]
    x = per_track.reshape(T * C, F)
    y = _overlap_save(x, h_rows, B).reshape(T, C, F)

    g = jnp.arange(F, dtype=jnp.int32)
    gains = _frame_gains(auto, track_gain, g, T, C)
    y = y * gains

    def add(acc, row):
        return acc + row, None

    total, _ = jax.lax.scan(add, jnp.zeros((C, F), jnp.float32), y)

    if master_h is not None:
        total = _overlap_save(total, jnp.broadcast_to(master_h, (C, master_h.shape[-1])), Bm)

    total = jnp.where(total > 1.0, jnp.float32(1.0), total)
    total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
    return total


def run_fir_finish(per_track, session: Session, sample_rate: float, track_gain, auto, channels: int = 2):
    """Convenience wrapper: prepare IRs and run the jitted finish."""
    h_rows, master_h = prepare_fir_tables(session, sample_rate, channels)
    T = len(session.tracks)
    B = max(_next_pow2(2 * h_rows.shape[1]), 4096)
    if master_h is not None:
        Bm = max(_next_pow2(2 * master_h.shape[0]), 4096)
        mh = jnp.asarray(master_h)
    else:
        Bm = 4096
        mh = None
    return finish_mix_fir(
        per_track, jnp.asarray(h_rows), mh, track_gain, auto,
        T=T, C=channels, B=B, Bm=Bm,
    )
