"""Native jittable effect chain — replaces the reference's plughost layer.

Where whitebox hosts one binary VST3 plugin per track
(src/plughost/plugin_interface.h:106, track.h:124), this framework fronts
effect slots with composable, jittable JAX modules. The processing position
mirrors the reference: per-track chains run on the track buffer *before*
volume/pan (track.cpp:600,648-662); a master-bus chain (an extension — the
reference has none, SURVEY §2.9) runs after the track sum, before the hard
clip.
"""

from whitebox_tpu.effects.base import Effect, EffectChain  # noqa: F401
from whitebox_tpu.effects.gain import Gain  # noqa: F401
from whitebox_tpu.effects.eq import Biquad, LinearPhaseEQ, ParametricEQ  # noqa: F401
from whitebox_tpu.effects.dynamics import Compressor, Limiter, NoiseGate  # noqa: F401
from whitebox_tpu.effects.delay import Chorus, Delay, Flanger  # noqa: F401
from whitebox_tpu.effects.reverb import ConvolutionReverb, design_room_ir  # noqa: F401
from whitebox_tpu.effects.shape import Saturator, StereoWidth  # noqa: F401
from whitebox_tpu.effects.registry import (  # noqa: F401
    UnknownEffect, lookup_effect, register_effect, unregister_effect,
)
