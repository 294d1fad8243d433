"""Stamp-keyed session render cache — persistent carve/plan/renderer.

The reference engine never re-walks the timeline for an unchanged session:
event lists and voices persist across process() calls and only rebuild on
``internal_state_changed`` (Track::refresh_voice, track.cpp:289-345). The
offline rebuild's ``bounce`` re-carves per call — correct, but repeated
renders of an unchanged session (bounce-again workflows, A/B exports,
benchmark steady state) pay host carve + plan + table upload for nothing.

:class:`SessionRenderCache` is the analogue of the reference's persistence:
it holds the carved tables, the Pallas plan, and the device-resident
renderer, keyed by ``Session.edit_stamp()``. Every access revalidates the
stamp — any edit (including direct field mutations) rebuilds on the next
render, exactly like ``render.preview.PreviewStream`` invalidates mid-
playback. An unchanged re-render costs one stamp pass + the device
dispatch.

Scope: the fused Pallas mix surface (plain sessions and automation-only
sessions via in-kernel lanes — the same surface ``PallasMixRenderer``
serves directly). Sessions with effect chains / routing / MIDI finish
through the chunked pipelines in ``render.bounce``, whose per-render host
cost is preparation of effect state, not the carve.
"""

from __future__ import annotations

from whitebox_tpu.session.session import Session


class SessionRenderCache:
    def __init__(self, session: Session, sample_rate: float = 48000.0,
                 *, buffer_size: int = 512, channels: int = 2) -> None:
        from whitebox_tpu.ops.automation import session_has_automation
        from whitebox_tpu.render.effects_pipeline import session_has_effects
        from whitebox_tpu.session.bus import session_has_routing

        self.session = session
        self.sample_rate = float(sample_rate)
        self.buffer_size = int(buffer_size)
        self.channels = int(channels)
        self._stamp = None
        self._renderer = None
        self._pool = None
        self._pool_dev = None
        self._check_scope = lambda: not (
            session_has_effects(session) or session_has_routing(session))
        self._has_lanes = session_has_automation

    def _build(self) -> None:
        from whitebox_tpu.ops.mix_pallas import PallasMixRenderer
        from whitebox_tpu.render.bounce import _session_has_midi
        from whitebox_tpu.render.effects_pipeline import (
            prepare_automation_tables_host,
        )
        from whitebox_tpu.timeline.carve import carve_session

        if not self._check_scope() or _session_has_midi(self.session):
            raise ValueError(
                "SessionRenderCache serves the fused Pallas mix surface "
                "(plain / automation-only sessions); sessions with effect "
                "chains, routing, or MIDI render through render.bounce")
        if self._pool is not None:
            # the resident pool only survives edits that keep the asset set:
            # a clip now referencing an unseen asset drops pool + upload
            idx = self._pool.index_of
            for t in self.session.tracks:
                for c in t.clips:
                    if (c.is_audio() and c.audio is not None
                            and c.audio.asset is not None
                            and id(c.audio.asset) not in idx):
                        self._pool = None
                        self._pool_dev = None
                        break
                if self._pool is None:
                    break
        table, pool = carve_session(self.session, self.sample_rate,
                                    buffer_size=self.buffer_size,
                                    out_channels=self.channels,
                                    slow_emit="runs", pool=self._pool)
        auto = (prepare_automation_tables_host(self.session, self.sample_rate)
                if self._has_lanes(self.session) else None)
        self._renderer = PallasMixRenderer(
            table, pool, self.session, channels=self.channels,
            pool_device=self._pool_dev, auto_tables=auto)
        self._pool = pool
        # the sample pool survives edits that don't add samples; tables and
        # plan rebuild, the big upload doesn't
        self._pool_dev = self._renderer.pool_device

    def renderer(self):
        """The resident renderer, revalidated against the session's edit
        stamp (stale tables are impossible — same contract as the
        PreviewStream's per-pull check)."""
        stamp = self.session.edit_stamp()
        if self._renderer is None or stamp != self._stamp:
            self._build()
            self._stamp = stamp
        return self._renderer

    def render_device(self):
        """Render on device ([C, n_tiles*R, 128] f32, the renderer's device
        layout); an unchanged session re-dispatches the resident program."""
        return self.renderer().render_device()

    def render(self):
        """Render and read back host audio [C, frames]."""
        return self.renderer().render()
