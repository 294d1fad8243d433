"""SessionRenderCache (render/cached.py): stamp-keyed carve/plan/renderer
persistence — the offline analogue of the reference's persistent event
lists (Track::refresh_voice rebuilds only on internal_state_changed,
track.cpp:289-345). Unchanged re-renders must reuse the resident program;
ANY edit (direct field mutations included) must rebuild; outputs always
bit-match a fresh render."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.ops.mix_pallas import PallasMixRenderer
from whitebox_tpu.render.cached import SessionRenderCache
from whitebox_tpu.timeline.carve import carve_session

RATE = 48000.0


def _fresh_render(s):
    t, p = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
    return PallasMixRenderer(t, p, s).render()


class TestSessionRenderCache:
    def test_unchanged_session_reuses_renderer(self):
        s = random_session(3, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        cache = SessionRenderCache(s, RATE)
        r1 = cache.renderer()
        out1 = cache.render()
        assert cache.renderer() is r1  # no rebuild without an edit
        np.testing.assert_array_equal(out1, _fresh_render(s))

    def test_direct_field_edit_invalidates(self):
        s = random_session(4, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        cache = SessionRenderCache(s, RATE)
        r1 = cache.renderer()
        before = cache.render()
        s.tracks[0].clips[0].audio.gain *= 0.5  # direct mutation, no API
        r2 = cache.renderer()
        assert r2 is not r1
        after = cache.render()
        assert not np.array_equal(before, after)
        np.testing.assert_array_equal(after, _fresh_render(s))

    def test_pool_survives_non_asset_edit(self):
        s = random_session(5, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        cache = SessionRenderCache(s, RATE)
        cache.render()
        dev = cache._pool_dev
        s.tracks[1].volume_db = -4.5
        cache.render()
        assert cache._pool_dev is dev  # big upload reused

    def test_new_asset_edit_rebuilds_pool(self):
        from whitebox_tpu.session.sample import Sample

        s = random_session(6, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        cache = SessionRenderCache(s, RATE)
        cache.render()
        data = (np.sin(np.linspace(0, 40, 3000)) * 0.4).astype(np.float32)[None]
        a = s.sample_table.add_sample(
            Sample.from_planar(data, int(RATE), AudioFormat.F32, name="new"),
            key="new")
        s.add_audio_clip(s.tracks[0], "n", 12.0, 13.0, asset=a)
        out = cache.render()  # must not KeyError on the stale pool
        np.testing.assert_array_equal(out, _fresh_render(s))

    def test_automation_only_session_uses_in_kernel_lanes(self):
        from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation

        s = random_session(7, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[0].automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(3.0, 0.3))
        cache = SessionRenderCache(s, RATE)
        out = cache.render()
        from whitebox_tpu.render.bounce import bounce

        ref = bounce(s, RATE, engine="pallas").audio
        n = min(out.shape[1], ref.shape[1])
        np.testing.assert_array_equal(out[:, :n], ref[:, :n])
        # editing the lane (direct mutation) invalidates: a zero point at
        # beat 0.5 silences early material, so the render MUST change
        s.tracks[0].automation.volume.add(0.5, 0.0)
        out2 = cache.render()
        assert not np.array_equal(out, out2)

    def test_out_of_scope_sessions_raise(self):
        from whitebox_tpu.effects import Biquad, EffectChain

        s = random_session(8, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 4000.0)])
        with pytest.raises(ValueError, match="render.bounce"):
            SessionRenderCache(s, RATE).render()
