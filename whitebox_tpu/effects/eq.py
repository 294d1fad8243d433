"""Biquad / parametric EQ effects over ops.biquad."""

from __future__ import annotations

import jax.numpy as jnp

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
