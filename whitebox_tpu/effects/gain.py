"""Gain effect — the simplest slot (dsp::apply_gain as a module)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from whitebox_tpu.core.math import db_to_linear_f32
from whitebox_tpu.effects.base import Effect


class Gain(Effect):
    name = "gain"

    def __init__(self, gain_db: float = 0.0) -> None:
        super().__init__()
        self.gain_db = float(gain_db)

    @property
    def gain_linear(self) -> np.float32:
        return np.float32(db_to_linear_f32(self.gain_db))

    def process(self, x, state):
        return jnp.atleast_2d(x) * self.gain_linear, state
