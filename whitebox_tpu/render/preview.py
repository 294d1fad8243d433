"""Streaming preview: a block-pull interface over the timeline renderer.

The reference's audio_io backends pull one buffer_size block per device
callback (audio_io_pulseaudio.cpp:396-466). Offline, the equivalent
capability is a seekable block stream: the session is carved and packed for
the device ONCE, then the device renders ``lookahead_blocks``-sized windows
on demand and ``next_block()`` serves engine-sized blocks out of the current
window — memory stays bounded by one window regardless of session length.
Seeking drops the window (the next pull re-renders at the new position);
effect/IIR state carries across pulls like a live engine's filters would.
Edits during playback invalidate automatically: every pull compares the
session's edit_stamp and re-carves when it moved (the offline analogue of
Track::refresh_voice / internal_state_changed, track.cpp:289-345).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.core.math import beat_to_samples
from whitebox_tpu.session.session import Session


class PreviewStream:
    def __init__(
        self,
        session: Session,
        sample_rate: float = 48000.0,
        buffer_size: int = 512,
        channels: int = 2,
        lookahead_blocks: int = 64,
        interpolation: str = "linear",
    ) -> None:
        self.session = session
        self.sample_rate = float(sample_rate)
        self.buffer_size = int(buffer_size)
        self.channels = channels
        self.lookahead = max(int(lookahead_blocks), 1) * self.buffer_size
        if self.lookahead % 512:
            # TV biquad/EQ lanes need PARAM_BLOCK(512)-aligned chunks, and
            # window fetches must stay contiguous multiples of buffer_size
            # (overlapping fetches would double-advance effect state), so
            # round up to a multiple of lcm(buffer_size, 512)
            import math as _math

            step = _math.lcm(self.buffer_size, 512)
            self.lookahead = -(-self.lookahead // step) * step
        self._interpolation = interpolation
        self._pos = 0
        self._build()

    def _build(self) -> None:
        """(Re-)carve and pack the session; called at construction and
        whenever the session's edit_stamp moves mid-playback (the offline
        refresh_voice / internal_state_changed, track.cpp:289-345)."""
        from whitebox_tpu.ops.automation import session_has_automation
        from whitebox_tpu.ops.mix import pack_device_tables
        from whitebox_tpu.render.bounce import _prepare_synth_tables, _session_has_midi
        from whitebox_tpu.render.effects_pipeline import session_has_effects
        from whitebox_tpu.timeline.carve import carve_session
        from whitebox_tpu.timeline.oversample import resolve_interpolation

        session = self.session
        sample_rate = self.sample_rate
        buffer_size = self.buffer_size
        channels = self.channels
        interpolation = self._interpolation
        self._stamp = session.edit_stamp()

        table, pool = carve_session(session, sample_rate, buffer_size=buffer_size, out_channels=channels)
        # same TPU-shaped sinc as bounce: oversampled pool + LS-optimal taps
        table, pool, self._interp = resolve_interpolation(table, pool, interpolation)
        dev = pack_device_tables(table, pool, session, channels=channels)
        self._tables = jax.device_put(dev.as_jax())
        self._pool = jax.device_put(jnp.asarray(pool.data))
        self._total = dev.total_frames
        self._T = dev.num_tracks

        self._has_midi = _session_has_midi(session)
        from whitebox_tpu.session.bus import session_has_routing

        self._routed = session_has_routing(session)
        self._has_fx = (session_has_effects(session) or session_has_automation(session)
                        or self._has_midi or self._routed)
        if self._has_fx:
            from whitebox_tpu.render.effects_generic import session_fx_packable
            from whitebox_tpu.render.effects_pipeline import (
                init_effect_states, prepare_automation_tables, prepare_effect_tables,
            )

            self._packable = session_fx_packable(session) and not self._routed
            if self._routed:
                from whitebox_tpu.render.routing import (
                    init_routed_states, make_routed_chunk_fn, prepare_routed_fx,
                )

                rfx = prepare_routed_fx(session, sample_rate, channels)
                self._rstep = make_routed_chunk_fn(rfx, self._T, channels, chunk=self.lookahead)
                self._states = init_routed_states(rfx, channels)
                self._mstates = ()
            elif self._packable:
                (self._S, self._coeffs), (self._Sm, self._mcoeffs) = prepare_effect_tables(
                    session, sample_rate, channels
                )
                self._states, self._mstates = init_effect_states(self._T, channels, self._S, self._Sm)
            else:
                from whitebox_tpu.render.effects_generic import (
                    init_generic_states, make_generic_chunk_fn, prepare_generic_fx,
                )

                gfx = prepare_generic_fx(session, sample_rate, channels)
                self._gstep = make_generic_chunk_fn(gfx, self._T, channels, chunk=self.lookahead)
                self._states, self._mstates = init_generic_states(gfx, channels)
            self._auto = prepare_automation_tables(session, sample_rate)
            self._tg = jnp.asarray(dev.track_gain)
            self._synth = (
                _prepare_synth_tables(session, sample_rate, buffer_size,
                                      max(self._total // buffer_size, 1))
                if self._has_midi else {}
            )

        self._window: np.ndarray | None = None
        self._win_start = 0

    # ---- device window fetch ----

    def fetch_window_device(self, start: int):
        """Render the ``lookahead``-frame window at ``start`` and return it
        as a DEVICE array ([channels, lookahead]); effect/IIR state commits
        exactly as a host pull would. This is the device-side consumer
        form of the block pull — and the instrument the real-time-budget
        benchmark (config 8) uses to fence per-block device cost without
        the host readback leg."""
        from whitebox_tpu.ops.mix import render_chunk

        frames = self.lookahead
        if self._has_fx:
            from whitebox_tpu.ops.mix import render_chunk_per_track
            from whitebox_tpu.render.bounce import _add_synth
            from whitebox_tpu.render.effects_pipeline import finish_mix_chunk

            pt = render_chunk_per_track(self._pool, self._tables, jnp.int32(start), frames=frames,
                                        interp=self._interp)
            if self._synth:
                pt = _add_synth(pt, self._synth, start, frames)
            if self._routed:
                chunk, self._states = self._rstep(
                    pt, self._states, jnp.int32(start), self._tg, self._auto
                )
            elif self._packable:
                chunk, self._states, self._mstates = finish_mix_chunk(
                    pt, self._coeffs, self._mcoeffs, self._tg, self._states, self._mstates,
                    jnp.int32(start), self._auto, T=self._T, C=self.channels, S=self._S, Sm=self._Sm,
                )
            else:
                chunk, self._states, self._mstates = self._gstep(
                    pt, self._states, self._mstates, jnp.int32(start), self._tg, self._auto
                )
        else:
            chunk = render_chunk(self._pool, self._tables, jnp.int32(start), frames=frames, strict_order=True,
                                 interp=self._interp)
        return chunk

    def _fetch_window(self, start: int) -> None:
        self._window = np.asarray(self.fetch_window_device(start))
        self._win_start = start

    # ---- transport ----

    @property
    def total_frames(self) -> int:
        return self._total

    @property
    def position_frames(self) -> int:
        return self._pos

    @property
    def position_beats(self) -> float:
        tm = getattr(self.session, "tempo_map", None)
        if tm is not None:
            return float(tm.seconds_to_beats(self._pos / self.sample_rate))
        return self._pos / self.sample_rate / self.session.beat_duration

    @property
    def window_frames(self) -> int:
        """Resident device-rendered cache size (bounded memory contract)."""
        return 0 if self._window is None else self._window.shape[1]

    def seek(self, beat: float) -> None:
        tm = getattr(self.session, "tempo_map", None)
        if tm is not None:
            frame = int(tm.beats_to_samples(beat, self.sample_rate))
        else:
            frame = int(beat_to_samples(beat, self.sample_rate, self.session.beat_duration))
        self._pos = max(0, min(frame, self._total))
        self._window = None  # invalidate; next pull renders at the new position

    def next_block(self) -> np.ndarray | None:
        """Next [channels, buffer_size] block, zero-padded at the tail;
        None when the timeline is exhausted.

        Edits since the last pull (any change to Session.edit_stamp) drop
        the cached window and re-carve, so playback continues from the
        current position over the NEW session state — never stale tables."""
        if self.session.edit_stamp() != self._stamp:
            pos = self._pos
            self._build()
            self._pos = min(pos, self._total)
        if self._pos >= self._total:
            return None
        if (
            self._window is None
            or self._pos < self._win_start
            or self._pos + self.buffer_size > self._win_start + self._window.shape[1]
        ):
            self._fetch_window(self._pos)
        lo = self._pos - self._win_start
        end = min(self._pos + self.buffer_size, self._total)
        block = np.zeros((self.channels, self.buffer_size), dtype=np.float32)
        block[:, : end - self._pos] = self._window[:, lo : lo + (end - self._pos)]
        self._pos = end
        return block

    def __iter__(self):
        while True:
            b = self.next_block()
            if b is None:
                return
            yield b
