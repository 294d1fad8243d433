"""Waveshaping & stereo-field effects: Saturator, StereoWidth.

Memoryless (stateless) processors — trivially frame-parallel; native
replacements for the saturation/width plugins the reference would host
via VST3 (src/plughost).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from whitebox_tpu.effects.base import Effect


class Saturator(Effect):
    """tanh soft-clip: y = mix * tanh(d*x)/tanh(d) + (1-mix) * x.

    The 1/tanh(d) normalization keeps a full-scale input at full scale, so
    drive changes color, not level (approximately)."""

    name = "saturator"

    def __init__(self, drive_db: float = 6.0, mix: float = 1.0) -> None:
        super().__init__()
        self.drive_db = float(drive_db)
        self.mix = float(mix)

    def static_config(self):
        return ()

    def param_arrays(self) -> dict:
        d = 10.0 ** (self.drive_db / 20.0)
        return {"drive": d, "norm": 1.0 / math.tanh(d), "mix": self.mix}

    def process(self, x, state):
        x = jnp.atleast_2d(x)
        p = self.param_arrays()
        shaped = jnp.tanh(jnp.float32(p["drive"]) * x) * jnp.float32(p["norm"])
        m = jnp.float32(p["mix"])
        return m * shaped + (1.0 - m) * x, state


class StereoWidth(Effect):
    """Mid/side width control: width 0 = mono, 1 = unchanged, >1 = wider."""

    name = "width"

    def __init__(self, width: float = 1.0) -> None:
        super().__init__()
        self.width = float(width)

    def static_config(self):
        return ()

    def param_arrays(self) -> dict:
        return {"width": self.width}

    def process(self, x, state):
        x = jnp.atleast_2d(x)
        if x.shape[-2] != 2:  # width is a stereo concept; pass others through
            return x, state
        mid = 0.5 * (x[..., 0, :] + x[..., 1, :])
        side = 0.5 * (x[..., 0, :] - x[..., 1, :]) * jnp.float32(self.width)
        return jnp.stack([mid + side, mid - side], axis=-2), state
