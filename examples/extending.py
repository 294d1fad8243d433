"""Extending the framework: custom effects + streaming record.

Walks the two round-4 extensibility surfaces end to end:

1. A user-defined effect (`register_effect`, effects/registry.py — the
   analogue of the reference's persisted plugin registry,
   plugin_manager.cpp:39-68): a tilt filter written out-of-package that
   persists through ``.wb`` by type name + state blob, renders inside a
   chain, and — because it implements the *stage protocol* — joins the
   batched generic pipeline with the built-ins.

2. Streaming record ingestion (`RecordingTake`, session/record.py — the
   audio_record.h lifecycle): blocks append under bounded allocation
   while a preview of the same session plays (the punch-in workflow),
   and ``finalize`` registers the take as an asset + clip.

Run: python examples/extending.py  (CPU-safe; ~30 s)
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.effects import Effect, EffectChain, register_effect
    from whitebox_tpu.io import wav
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.render.preview import PreviewStream
    from whitebox_tpu.session import Session
    from whitebox_tpu.session.project import read_project, write_project
    from whitebox_tpu.session.record import RecordingTake

    rate = 48000.0

    # ------------------------------------------------------------------
    # 1. a custom effect: one-pole "tilt" (lowpass + complementary boost)
    # ------------------------------------------------------------------
    @register_effect("example.tilt")
    class Tilt(Effect):
        """y[n] = x[n] + amount * (lp[n] - x[n]); lp = one-pole at `coef`."""

        def __init__(self, coef: float = 0.9, amount: float = 0.5) -> None:
            super().__init__()
            self.coef = float(coef)
            self.amount = float(amount)

        # --- persistence (the .wb state blob)
        def as_dict(self):
            return {"coef": self.coef, "amount": self.amount}

        @classmethod
        def from_dict(cls, d):
            return cls(float(d["coef"]), float(d["amount"]))

        # --- [C, F] one-shot processing
        def init_state(self, channels: int):
            return jnp.zeros((channels,), jnp.float32)

        def process(self, x, state):
            a = jnp.float32(self.coef)
            k = jnp.float32(self.amount)

            def step(lp1, xt):
                lp = (1.0 - a) * xt + a * lp1
                return lp, xt + k * (lp - xt)

            lp1, ys = jax.lax.scan(step, state, jnp.asarray(x, jnp.float32).T)
            return ys.T, lp1

        # --- stage protocol: joins the batched generic pipeline
        def static_config(self):
            return ()

        def param_arrays(self):
            return {"a": np.float32(self.coef), "k": np.float32(self.amount)}

        @classmethod
        def stage_init_state(cls, static, params, B: int, C: int):
            return jnp.zeros((B, C), jnp.float32)

        @classmethod
        def stage_apply(cls, static, params, x, state, n0, sample_rate,
                        key=None, lanes=None):
            B, C, Fc = x.shape
            a = params["a"][:, None]
            k = params["k"][:, None]

            def step(lp1, xt):
                lp = (1.0 - a) * xt + a * lp1
                return lp, xt + k * (lp - xt)

            lp1, ys = jax.lax.scan(step, state, jnp.moveaxis(x, -1, 0))
            return jnp.moveaxis(ys, 0, -1), lp1

    tmp = tempfile.mkdtemp(prefix="wb_extending_")
    t = np.arange(int(rate * 2)) / rate
    kick = (np.sin(2 * np.pi * 60 * t) * np.exp(-t * 8) * 0.8).astype(np.float32)
    wav.write_wav(os.path.join(tmp, "kick.wav"), kick[None], int(rate), AudioFormat.F32)

    s = Session(bpm=120.0)
    asset = s.sample_table.load_from_file(os.path.join(tmp, "kick.wav"))
    drums = s.add_track("drums", volume_db=-3.0)
    for b in range(8):
        s.add_audio_clip(drums, f"k{b}", float(b), b + 0.9, asset=asset)
    drums.effects = EffectChain([Tilt(coef=0.92, amount=0.6)])

    proj = os.path.join(tmp, "tilted.wb")
    write_project(s, proj)
    s2 = read_project(proj)  # the custom effect round-trips by type name
    fx = s2.tracks[0].effects.effects[0]
    assert type(fx).__name__ == "Tilt" and abs(fx.amount - 0.6) < 1e-9
    r = bounce(s2, rate)
    print(f"custom-effect render: {r.audio.shape[1]} frames, "
          f"peak {float(np.max(np.abs(np.asarray(r.audio)))):.3f}")

    # ------------------------------------------------------------------
    # 2. punch-in: record a take while the session previews
    # ------------------------------------------------------------------
    vox = s2.add_track("vox", volume_db=0.0)
    stream = PreviewStream(s2, rate, buffer_size=512)
    take = RecordingTake(s2, vox, rate, at_beat=2.0, channels=1, name="take 1")
    rng = np.random.default_rng(7)
    for _ in range(20):                       # "device blocks" arriving
        stream.next_block()                   # preview keeps playing
        take.append(rng.standard_normal((1, 512)).astype(np.float32) * 0.1)
    clip = take.finalize()                    # truncate + register + place
    print(f"recorded take: {take.frames_written} frames -> clip "
          f"[{clip.min_time:.2f}, {clip.max_time:.2f}) beats on 'vox'")

    r2 = bounce(s2, rate)
    print(f"post-punch-in render: {r2.audio.shape[1]} frames — done")


if __name__ == "__main__":
    main()
