"""Biquad / parametric EQ effects over ops.biquad."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from whitebox_tpu.effects.base import Effect
from whitebox_tpu.ops.biquad import BiquadCoeffs, BiquadType, biquad_scan, design_biquad


class Biquad(Effect):
    """A single RBJ biquad section."""

    name = "biquad"

    def __init__(self, ftype: str | BiquadType, freq_hz: float, q: float = 0.7071067811865476, gain_db: float = 0.0) -> None:
        super().__init__()
        self.ftype = BiquadType(ftype)
        self.freq_hz = float(freq_hz)
        self.q = float(q)
        self.gain_db = float(gain_db)
        self.coeffs: BiquadCoeffs | None = None

    def prepare(self, sample_rate: float, channels: int = 2) -> "Biquad":
        super().prepare(sample_rate, channels)
        self.coeffs = design_biquad(self.ftype, self.freq_hz, sample_rate, self.q, self.gain_db)
        return self

    def init_state(self, channels: int):
        return jnp.zeros((channels, 2), dtype=jnp.float32)

    def process(self, x, state):
        assert self.coeffs is not None, "call prepare(sample_rate) first"
        return biquad_scan(jnp.atleast_2d(x), self.coeffs, state)

    def tail_frames(self) -> int:
        return 4096  # conservative IIR ring-out hint


class ParametricEQ(Effect):
    """Multi-band EQ: low shelf + N peaks + high shelf, as a biquad cascade.

    bands: list of (ftype, freq_hz, q, gain_db) tuples.
    """

    name = "eq"

    def __init__(self, bands: list[tuple]) -> None:
        super().__init__()
        self.bands = [
            (BiquadType(t), float(f), float(q), float(g)) for (t, f, q, g) in bands
        ]
        self.coeffs: list[BiquadCoeffs] = []

    def prepare(self, sample_rate: float, channels: int = 2) -> "ParametricEQ":
        super().prepare(sample_rate, channels)
        self.coeffs = [design_biquad(t, f, sample_rate, q, g) for (t, f, q, g) in self.bands]
        return self

    def init_state(self, channels: int):
        return [jnp.zeros((channels, 2), dtype=jnp.float32) for _ in self.bands]

    def process(self, x, state):
        assert self.coeffs, "call prepare(sample_rate) first"
        x = jnp.atleast_2d(x)
        new_states = []
        for c, st in zip(self.coeffs, state):
            x, ns = biquad_scan(x, c, st)
            new_states.append(ns)
        return x, new_states

    def tail_frames(self) -> int:
        return 4096 * max(len(self.bands), 1)


class LinearPhaseEQ(Effect):
    """Linear-phase multi-band EQ: the ParametricEQ magnitude response on a
    symmetric FIR, so all frequencies share one constant group delay of
    ``(taps - 1) / 2`` frames (no phase distortion — the mastering-EQ mode
    binary plugins offer; the reference has no native equivalent).

    Design: the RBJ cascade's |H| is sampled on a dense rfft grid, the
    zero-phase impulse response is rotated to causal center and Kaiser-
    windowed to ``taps`` coefficients. Processing rides the same
    overlap-save FFT convolution as ConvolutionReverb (exact chunk carry),
    so the device path is the proven "convreverb" machinery with its own
    latency accounting for PDC (bounce(pdc=True) re-aligns the track).

    bands: list of (ftype, freq_hz, q, gain_db); ``taps`` must be odd
    (type-I linear phase).
    """

    name = "linphase"

    def __init__(self, bands: list[tuple], *, taps: int = 2047) -> None:
        super().__init__()
        if taps < 3 or taps % 2 == 0:
            raise ValueError("taps must be odd and >= 3 (type-I linear phase)")
        self.bands = [
            (BiquadType(t), float(f), float(q), float(g)) for (t, f, q, g) in bands
        ]
        self.taps = int(taps)
        self._ir = None  # prepared [1, taps] f64->f32

    def prepare(self, sample_rate: float, channels: int = 2) -> "LinearPhaseEQ":
        super().prepare(sample_rate, channels)
        self._ir = np.broadcast_to(
            design_linear_phase_fir(self.bands, sample_rate, self.taps)[None, :],
            (channels, self.taps),
        ).astype(np.float32)
        return self

    def static_config(self):
        return (self.taps,)

    def param_arrays(self) -> dict:
        return {}

    def init_state(self, channels: int):
        return {"carry": jnp.zeros((channels, self.taps - 1))}

    def process(self, x, state):
        from whitebox_tpu.effects.reverb import _next_pow2, fft_convolve_chunk

        assert self._ir is not None, "call prepare(sample_rate) first"
        x = jnp.atleast_2d(x)
        nfft = _next_pow2(x.shape[-1] + self.taps - 1)
        ir_f = jnp.fft.rfft(jnp.asarray(self._ir), nfft, axis=-1)
        y, carry = fft_convolve_chunk(x, ir_f, self.taps, state["carry"])
        return y, {"carry": carry}

    def latency_frames(self) -> int:
        return (self.taps - 1) // 2

    def tail_frames(self) -> int:
        return self.taps


def cascade_magnitude(bands, freqs_hz: np.ndarray, sample_rate: float) -> np.ndarray:
    """|H| of the RBJ biquad cascade at ``freqs_hz`` (f64, exact eval)."""
    w = 2.0 * np.pi * np.asarray(freqs_hz, np.float64) / float(sample_rate)
    z1 = np.exp(-1j * w)
    z2 = z1 * z1
    mag = np.ones_like(w)
    for (t, f, q, g) in bands:
        c = design_biquad(t, f, sample_rate, q, g)
        num = c.b0 + c.b1 * z1 + c.b2 * z2
        den = 1.0 + c.a1 * z1 + c.a2 * z2
        mag = mag * np.abs(num / den)
    return mag


def design_linear_phase_fir(bands, sample_rate: float, taps: int,
                            oversample: int = 8, beta: float = 8.6) -> np.ndarray:
    """Symmetric FIR matching the cascade magnitude (f64).

    Dense zero-phase sampling -> irfft -> rotate the (circularly symmetric)
    impulse to causal center -> Kaiser(beta) truncation to ``taps``.
    """
    nfft = 1
    while nfft < taps * oversample:
        nfft <<= 1
    freqs = np.arange(nfft // 2 + 1, dtype=np.float64) * (sample_rate / nfft)
    mag = cascade_magnitude(bands, freqs, sample_rate)
    h0 = np.fft.irfft(mag, nfft)  # zero-phase, symmetric around index 0
    half = (taps - 1) // 2
    h = np.concatenate([h0[-half:], h0[: half + 1]])  # centered at ``half``
    return h * np.kaiser(taps, beta)
