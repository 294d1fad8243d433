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


def _biquad_impulse(c, length: int) -> np.ndarray:
    """Length-``length`` impulse response of one biquad section, f64.

    Closed form via the denominator poles (vectorized — the per-sample
    recursion made IR prep the wall-clock bound at 128 chains): for
    1/(1 + a1 z^-1 + a2 z^-2) with poles p1,p2,
    g[n] = (p1^{n+1} - p2^{n+1}) / (p1 - p2) (repeated-pole limit
    (n+1) p^n), then the numerator [b0 b1 b2] is a 3-tap convolution."""
    a1, a2 = float(c.a1), float(c.a2)
    disc = complex(a1 * a1 - 4.0 * a2) ** 0.5  # quadratic formula (np.roots
    p1 = (-a1 + disc) / 2.0  # costs ~0.3ms/call via eig; this is ~µs)
    p2 = (-a1 - disc) / 2.0
    if max(abs(p1), abs(p2)) >= 1.0 + 1e-12:
        # unstable section: fall back to the literal recursion
        x = np.zeros((1, length), dtype=np.float64)
        x[0, 0] = 1.0
        y, _ = biquad_sequential(x, c)
        return y[0]
    n = np.arange(length, dtype=np.float64)
    if abs(p1 - p2) > 1e-10 * max(abs(p1), abs(p2), 1.0):
        g = ((p1 ** (n + 1) - p2 ** (n + 1)) / (p1 - p2)).real
    else:
        g = ((n + 1) * p1**n).real
    h = float(c.b0) * g
    h[1:] += float(c.b1) * g[:-1]
    h[2:] += float(c.b2) * g[:-2]
    return h


def _fftconv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = a.shape[0] + b.shape[0] - 1
    nf = _next_pow2(n)
    return np.fft.irfft(np.fft.rfft(a, nf) * np.fft.rfft(b, nf), nf)[:n]


def chain_impulse_response(chain, sample_rate: float, tail_thresh: float = 1e-6, max_len: int = 1 << 16) -> np.ndarray:
    """Combined IR of an effect chain (f64, truncated at the tail threshold)."""
    from whitebox_tpu.effects.base import EffectChain
    from whitebox_tpu.effects.eq import Biquad, ParametricEQ
    from whitebox_tpu.effects.gain import Gain

    gain = 1.0
    sections = []
    effs = chain.effects if isinstance(chain, EffectChain) else list(chain or [])
    for e in effs:
        if isinstance(e, Gain):
            gain *= float(e.gain_linear)
        elif isinstance(e, Biquad):
            assert e.coeffs is not None, "effect not prepared"
            sections.append(e.coeffs)
        elif isinstance(e, ParametricEQ):
            assert e.coeffs, "effect not prepared"
            sections.extend(e.coeffs)
        else:
            raise TypeError(f"effect {e!r} has no LTI form")

    # memoize on the chain object, keyed by the actual coefficient values
    # (re-prepare with different params changes the key, so no staleness)
    key = (float(sample_rate), float(tail_thresh), gain,
           tuple((float(c.b0), float(c.b1), float(c.b2), float(c.a1), float(c.a2)) for c in sections))
    cached = getattr(chain, "_ir_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]

    length = 1024
    while True:
        h = np.zeros(length, dtype=np.float64)
        h[0] = gain
        for c in sections:
            h = _fftconv(h, _biquad_impulse(c, length))[:length]
        tail = np.abs(h[-length // 8 :]).max()
        if tail < tail_thresh or length >= max_len:
            break
        length *= 2
    # trim to the last sample above threshold
    nz = np.nonzero(np.abs(h) >= tail_thresh)[0]
    n = int(nz[-1]) + 1 if nz.size else 1
    h32 = h[:n].astype(np.float32)
    try:
        chain._ir_cache = (key, h32)
    except AttributeError:
        pass  # plain lists of effects can't carry the cache
    return h32


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


def prepare_fir_tables_spectral(session: Session, sample_rate: float, track_gain,
                                channels: int = 2) -> np.ndarray:
    """Fold the master-bus IR and the constant per-(track,channel) gains into
    the per-track IRs: conv(sum_t g_t·x_t*h_t, h_m) == sum_t x_t*(g_t·h_t*h_m)
    since everything is LTI. Returns h_rows [T*C, Lh] f32."""
    from whitebox_tpu.effects.base import EffectChain

    T = len(session.tracks)
    tg = np.asarray(track_gain, dtype=np.float64)

    master_h = None
    if session.master_effects:
        m = session.master_effects
        chain = m if isinstance(m, EffectChain) else EffectChain(list(m))
        chain.prepare(sample_rate, channels)
        master_h = chain_impulse_response(chain, sample_rate).astype(np.float64)

    irs = []
    for t in session.tracks:
        if t.effects:
            chain = t.effects if isinstance(t.effects, EffectChain) else EffectChain(list(t.effects))
            chain.prepare(sample_rate, channels)
            irs.append(chain_impulse_response(chain, sample_rate).astype(np.float64))
        else:
            irs.append(np.ones(1, dtype=np.float64))

    # fold the master IR into every track IR in one batched FFT conv
    Lt = max(h.shape[0] for h in irs)
    hs = np.zeros((T, Lt), dtype=np.float64)
    for t, h in enumerate(irs):
        hs[t, : h.shape[0]] = h
    if master_h is not None:
        n = Lt + master_h.shape[0] - 1
        nf = _next_pow2(n)
        hs = np.fft.irfft(np.fft.rfft(hs, nf, axis=1) * np.fft.rfft(master_h, nf), nf, axis=1)[:, :n]
        keep = np.abs(hs).max(axis=0) >= 1e-6
        nz = np.nonzero(keep)[0]
        hs = hs[:, : int(nz[-1]) + 1] if nz.size else hs[:, :1]

    # gains fold: h_rows[t*C + c] = hs[t] * tg[t, c]
    h_rows = (hs[:, None, :] * tg[:, :channels, None]).astype(np.float32)
    return h_rows.reshape(T * channels, hs.shape[1])


@functools.partial(jax.jit, static_argnames=("T", "C", "B", "G"))
def finish_mix_fir_spectral(per_track, h_rows, *, T, C, B, G):
    """per_track [T, C, F] -> [C, F] in one overlap-save sweep.

    Blocks are processed G at a time as a single batched rFFT (no
    per-block serialization), and the track sum happens in the frequency
    domain — only [C, G, B] ever comes back through the inverse FFT, so
    the filtered [T, C, F] intermediate is never materialized. Requires
    master IR + constant gains pre-folded into ``h_rows``
    (prepare_fir_tables_spectral); per-frame gains need the general path."""
    F = per_track.shape[-1]
    R = T * C
    Lh = h_rows.shape[1]
    H = B - (Lh - 1)
    assert Lh - 1 <= H, "IR longer than hop; raise B"
    n_blocks = -(-F // H)
    n_groups = -(-n_blocks // G)
    x = per_track.reshape(R, F)
    # Overlap-save with windows built by reshape+slice instead of a gather:
    # xp carries the Lh-1 priming zeros in front, so window j = xp[j*H:j*H+B]
    # = chunk_j (H wide) ++ head of chunk_{j+1} (Lh-1 wide), and its valid
    # circular-conv samples are exactly global frames [j*H, (j+1)*H).
    n_chunks = n_groups * G + 1  # one trailing chunk so the last head exists
    xp = jnp.pad(x, ((0, 0), (Lh - 1, n_chunks * H - F - (Lh - 1))))
    Hf = jnp.fft.rfft(jnp.pad(h_rows, ((0, 0), (0, B - Lh))), axis=1)  # [R, K]
    chunks = xp.reshape(R, n_chunks, H)

    def group(_, gi):
        cur = jax.lax.dynamic_slice_in_dim(chunks, gi * G, G, axis=1)  # [R, G, H]
        nxt = jax.lax.dynamic_slice_in_dim(chunks, gi * G + 1, G, axis=1)[:, :, : Lh - 1]
        segs = jnp.concatenate([cur, nxt], axis=-1)  # [R, G, B]
        Yf = jnp.fft.rfft(segs, axis=-1) * Hf[:, None, :]
        Ys = Yf.reshape(T, C, G, -1).sum(axis=0)  # [C, G, K] spectral track sum
        y = jnp.fft.irfft(Ys, n=B, axis=-1)[:, :, Lh - 1 :]  # [C, G, H]
        return None, y

    _, ys = jax.lax.scan(group, None, jnp.arange(n_groups))  # [n_groups, C, G, H]
    total = ys.transpose(1, 0, 2, 3).reshape(C, n_groups * G * H)[:, :F]
    total = jnp.where(total > 1.0, jnp.float32(1.0), total)
    total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
    return total


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


def prepare_fir_finish(session: Session, sample_rate: float, track_gain, auto, channels: int = 2):
    """One-time host prep (chain IRs -> device arrays); returns a closure
    ``finish(per_track) -> [C, F]`` whose calls are pure device work.

    Constant-gain sessions take the spectral-sum fast path (master + gains
    folded into the IRs, batched blocks, frequency-domain track sum);
    per-frame gains (automation/MIDI mute lanes) use the general path."""
    T = len(session.tracks)
    if auto is None:
        h_rows = prepare_fir_tables_spectral(session, sample_rate, track_gain, channels)
        Lh = h_rows.shape[1]
        B = max(4096, _next_pow2(4 * Lh))
        R = T * channels
        # bound the [R, G, B] block batch to ~256 MB of f32
        G = int(max(1, min((64 << 20) // max(R * B, 1), 64)))
        hj = jnp.asarray(h_rows)
        return lambda per_track: finish_mix_fir_spectral(per_track, hj, T=T, C=channels, B=B, G=G)

    h_rows, master_h = prepare_fir_tables(session, sample_rate, channels)
    B = max(_next_pow2(2 * h_rows.shape[1]), 4096)
    if master_h is not None:
        Bm = max(_next_pow2(2 * master_h.shape[0]), 4096)
        mh = jnp.asarray(master_h)
    else:
        Bm = 4096
        mh = None
    hj = jnp.asarray(h_rows)
    return lambda per_track: finish_mix_fir(
        per_track, hj, mh, track_gain, auto, T=T, C=channels, B=B, Bm=Bm
    )


def run_fir_finish(per_track, session: Session, sample_rate: float, track_gain, auto, channels: int = 2):
    """Convenience wrapper: prepare IRs and run the jitted finish."""
    return prepare_fir_finish(session, sample_rate, track_gain, auto, channels)(per_track)
