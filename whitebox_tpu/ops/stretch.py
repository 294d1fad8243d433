"""Phase-vocoder time-stretch and pitch-shift.

The reference resamples clips (speed != 1 changes duration AND pitch,
src/dsp/sampler.cpp:34-59); independent control of duration and pitch has
no upstream equivalent. This is the STFT phase vocoder:

    analysis frames at hop ``ha`` -> phase propagation at synthesis hop
    ``hs`` (true-frequency estimate per bin) -> overlap-add resynthesis

TPU shape: framing is one strided gather (static shapes), the forward and
inverse FFTs are batched ``jnp.fft.rfft/irfft`` over all frames at once
(complex-input FFT is unsupported on this backend — rfft/irfft only, see
CLAUDE.md), and the sequential-looking phase recursion is a **cumulative
sum** over frames of elementwise phase increments — `jnp.cumsum`, not a
scan — so the whole transform is three batched device ops. Overlap-add
uses segment_sum over precomputed output positions.

``pitch_shift`` = time-stretch by the pitch ratio, then the existing
windowed-sinc SRC (ops/resample.resample_audio) back to the original
duration.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["time_stretch", "pitch_shift"]


def _frame_positions(n_out_frames: int, ha: float) -> np.ndarray:
    """Integer analysis positions for each synthesis frame (host, static)."""
    return np.round(np.arange(n_out_frames, dtype=np.float64) * ha).astype(np.int64)


def time_stretch(audio, ratio: float, *, fft_size: int = 2048,
                 hop: int | None = None) -> np.ndarray:
    """Stretch ``audio`` [C, F] by ``ratio`` (>1 = longer) at constant pitch.

    Returns f32 [C, round(F * ratio)]. ``hop`` is the synthesis hop
    (default fft_size // 4 — 75 % overlap Hann, COLA-exact).
    """
    x = np.atleast_2d(np.asarray(audio, np.float32))
    C, F = x.shape
    ratio = float(ratio)
    if ratio <= 0:
        raise ValueError("ratio must be positive")
    hs = int(hop or fft_size // 4)
    ha = hs / ratio
    out_frames_target = int(round(F * ratio))

    # synthesis frame count covering the target length
    n_frames = max(int(math.ceil((out_frames_target + fft_size) / hs)) + 1, 2)
    pos = _frame_positions(n_frames, ha)  # analysis start per frame
    # actual per-frame analysis advance (phase propagation uses the true
    # integer hop between the rounded positions, not the ideal ha)
    dt = np.diff(pos, prepend=pos[0])  # [n_frames], dt[0] = 0
    pad = int(pos[-1]) + fft_size + 1
    xp = np.pad(x, ((0, 0), (0, max(pad - F, 0))))

    win = np.hanning(fft_size + 1)[:-1].astype(np.float32)  # periodic Hann
    k = np.arange(fft_size // 2 + 1, dtype=np.float64)
    wk = 2.0 * np.pi * k / fft_size  # bin center frequency (rad/sample)

    xj = jnp.asarray(xp)
    posj = jnp.asarray(pos)

    # ---- framing: [C, n_frames, fft] strided gather (static shapes) ----
    idx = posj[:, None] + jnp.arange(fft_size)[None, :]  # [n_frames, fft]
    frames = xj[:, idx] * jnp.asarray(win)[None, None, :]

    spec = jnp.fft.rfft(frames, axis=-1)  # [C, n_frames, K]
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)

    # ---- phase propagation as a cumsum of elementwise increments ----
    # heterodyned phase increment: observed inter-frame phase change minus
    # the bin's expected advance over the ACTUAL analysis hop dt, wrapped
    # to (-pi, pi], giving the per-bin frequency deviation
    dphase = jnp.diff(phase, axis=1, prepend=phase[:, :1])  # [C, T, K]
    # all phase terms stay PRINCIPAL-VALUE-SIZED on device: unwrapped
    # phases reach ~1e4 rad where f32 carries ~1e-3 rad of representation
    # error and TPU sin/cos degrade further (limited range reduction).
    # dt*wk and the nominal synthesis ramp wk*hs*t are host-wrapped
    # EXACTLY (f64 / integer arithmetic); only the small heterodyne
    # deviation accumulates in f32.
    expected = jnp.asarray(  # (dt * wk) mod 2pi, exact in host f64
        np.mod(dt[:, None] * wk[None, :], 2.0 * np.pi).astype(np.float32))
    dtj = jnp.asarray(dt.astype(np.float64))
    dev = dphase - expected[None]
    dev = dev - 2.0 * jnp.pi * jnp.round(dev / (2.0 * jnp.pi))  # principal value
    # deviation part of the synthesis increment: dev/dt per sample * hs
    dev_inc = jnp.where(dtj[None, :, None] > 0,
                        dev * (float(hs) / jnp.maximum(dtj, 1.0))[None, :, None],
                        0.0)
    # nominal synthesis ramp wk*hs*t, wrapped exactly: wk = 2pi*k/fft, so
    # wk*hs*t mod 2pi = 2pi * ((k*hs*t) mod fft) / fft (host int64)
    ki = np.arange(fft_size // 2 + 1, dtype=np.int64)
    ti = np.arange(n_frames, dtype=np.int64)
    nominal = jnp.asarray(
        ((ti[:, None] * ((ki * hs) % fft_size)[None, :]) % fft_size)
        .astype(np.float32) * np.float32(2.0 * np.pi / fft_size))  # [T, K]
    out_phase = phase[:, 0:1, :] + nominal[None] + jnp.concatenate(
        [jnp.zeros_like(dev_inc[:, :1]), jnp.cumsum(dev_inc[:, 1:], axis=1)],
        axis=1)
    # re-wrap the bounded sum before the transcendentals
    out_phase = out_phase - 2.0 * jnp.pi * jnp.round(out_phase / (2.0 * jnp.pi))

    # complex exp does not lower on this TPU backend (like complex-input
    # FFT); build the spectrum from a real cos/sin pair instead
    out_spec = jax.lax.complex(mag * jnp.cos(out_phase),
                               mag * jnp.sin(out_phase))
    ysegs = jnp.fft.irfft(out_spec, fft_size, axis=-1) * jnp.asarray(win)[None, None, :]

    # ---- overlap-add + window-power normalization ----
    out_len = (n_frames - 1) * hs + fft_size
    starts = jnp.arange(n_frames) * hs
    oidx = (starts[:, None] + jnp.arange(fft_size)[None, :]).reshape(-1)
    y = jax.vmap(lambda seg: jnp.zeros(out_len, jnp.float32).at[oidx].add(
        seg.reshape(-1)))(ysegs)
    wsum = jnp.zeros(out_len, jnp.float32).at[oidx].add(
        jnp.broadcast_to(jnp.asarray(win * win), (n_frames, fft_size)).reshape(-1))
    y = y / jnp.maximum(wsum, 1e-6)[None, :]
    # frame t is window-centered at t*hs + fft/2 in BOTH domains, so the
    # stretched signal starts at output index 0 (ratio-1 reconstructs x)
    out = np.asarray(y[:, :out_frames_target], np.float32)
    if out.shape[1] < out_frames_target:
        out = np.pad(out, ((0, 0), (0, out_frames_target - out.shape[1])))
    return out


def pitch_shift(audio, semitones: float, sample_rate: float, *,
                fft_size: int = 2048) -> np.ndarray:
    """Shift pitch by ``semitones`` at constant duration: stretch by the
    pitch ratio, then windowed-sinc resample back (ops/resample)."""
    from whitebox_tpu.ops.resample import resample_audio

    x = np.atleast_2d(np.asarray(audio, np.float32))
    r = 2.0 ** (float(semitones) / 12.0)
    if abs(r - 1.0) < 1e-9:
        return x.astype(np.float32)
    stretched = time_stretch(x, r, fft_size=fft_size)
    # playing the stretched audio at rate*r compresses it back to the
    # original duration while transposing by r
    out = resample_audio(stretched, float(sample_rate) * r, float(sample_rate))
    F = x.shape[1]
    if out.shape[1] < F:
        out = np.pad(out, ((0, 0), (0, F - out.shape[1])))
    return np.asarray(out[:, :F], np.float32)
