"""Effect module API.

An Effect is configured against a sample rate (mirroring
``PluginInterface::init_processing(mode, max_block, sample_rate)``,
plugin_interface.h:142) and then processes ``[channels, frames]`` f32
blocks with explicit state threading — pure functions, jit/scan/shard
friendly:

    eff = Biquad("lowpass", 1000.0)
    eff.prepare(48000.0, channels=2)
    y, state = eff.process(x, eff.init_state(2))

Chunked processing with carried state must equal one-shot processing
(tested); that property is what lets chains run inside frame-sharded
multi-chip renders.
"""

from __future__ import annotations

import jax.numpy as jnp


class Effect:
    """Base class; subclasses implement init_state/process."""

    name = "effect"

    def __init__(self) -> None:
        self.sample_rate: float | None = None

    def prepare(self, sample_rate: float, channels: int = 2) -> "Effect":
        self.sample_rate = float(sample_rate)
        return self

    def init_state(self, channels: int):
        return None

    def process(self, x, state):
        raise NotImplementedError

    def tail_frames(self) -> int:
        """Ring-out length hint (PluginInterface tail queries)."""
        return 0

    # --- generic-pipeline stage protocol defaults (see effects/registry.py)
    def static_config(self) -> tuple:
        """Hashable static config — part of the chain-grouping signature."""
        return ()

    def param_arrays(self) -> dict:
        """Per-instance numeric params, stacked [B, ...] across a group."""
        return {}

    def latency_frames(self) -> int:
        """Processing latency (PluginInterface latency query). Nonzero for
        lookahead effects (Limiter); drives PDC (bounce(pdc=True))."""
        return 0


class EffectChain(Effect):
    """Sequential composition of effects (the track's effect slots)."""

    name = "chain"

    def __init__(self, effects: list[Effect] | None = None) -> None:
        super().__init__()
        self.effects: list[Effect] = list(effects or [])

    def append(self, effect: Effect) -> "EffectChain":
        self.effects.append(effect)
        return self

    def prepare(self, sample_rate: float, channels: int = 2) -> "EffectChain":
        super().prepare(sample_rate, channels)
        for e in self.effects:
            e.prepare(sample_rate, channels)
        return self

    def init_state(self, channels: int):
        return [e.init_state(channels) for e in self.effects]

    def process(self, x, state):
        x = jnp.atleast_2d(x)
        new_states = []
        for e, st in zip(self.effects, state):
            x, ns = e.process(x, st)
            new_states.append(ns)
        return x, new_states

    def tail_frames(self) -> int:
        return sum(e.tail_frames() for e in self.effects)

    def latency_frames(self) -> int:
        return sum(e.latency_frames() for e in self.effects)

    def __len__(self) -> int:
        return len(self.effects)

    def __iter__(self):
        return iter(self.effects)
