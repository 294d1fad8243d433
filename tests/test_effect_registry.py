"""User-effect registry (effects/registry.py) — the plughost
plugin-manager analogue (plugin_manager.cpp:39-68): out-of-package
effects register, render through the generic pipeline, persist through
.wb, and degrade to a lossless bypass when unregistered."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whitebox_tpu.effects import (
    EffectChain, Gain, UnknownEffect, register_effect, unregister_effect,
)
from whitebox_tpu.effects.base import Effect

RATE = 48000.0


class OnePoleLP(Effect):
    """Out-of-package test effect: y[n] = (1-a)·x[n] + a·y[n-1].

    Implements the full stage protocol (registry.py) including an
    automatable 'coef' param, plus its own f64 host reference."""

    automatable = frozenset({"coef"})

    def __init__(self, coef: float = 0.5) -> None:
        super().__init__()
        self.coef = float(coef)

    # --- persistence
    def as_dict(self):
        return {"coef": self.coef}

    @classmethod
    def from_dict(cls, d):
        return cls(float(d["coef"]))

    # --- instance processing ([C, F])
    def init_state(self, channels: int):
        return jnp.zeros((channels,), jnp.float32)

    def process(self, x, state):
        a = jnp.float32(self.coef)

        def step(y1, xt):
            y = (1.0 - a) * xt + a * y1
            return y, y

        y1, ys = jax.lax.scan(step, state, jnp.asarray(x, jnp.float32).T)
        return ys.T, y1

    # --- batched stage protocol ([B, C, Fc])
    def static_config(self):
        return ()

    def param_arrays(self):
        return {"a": np.float32(self.coef)}

    @classmethod
    def stage_init_state(cls, static, params, B: int, C: int):
        return jnp.zeros((B, C), jnp.float32)

    @classmethod
    def stage_apply(cls, static, params, x, state, n0, sample_rate,
                    key=None, lanes=None):
        B, C, Fc = x.shape
        if lanes and "coef" in lanes:
            a_t = lanes["coef"][:, None, :]  # [B, 1, Fc]
        else:
            a_t = jnp.broadcast_to(params["a"][:, None, None], (B, 1, Fc))

        def step(y1, inp):
            xt, at = inp  # [B, C], [B, 1]
            y = (1.0 - at) * xt + at * y1
            return y, y

        y1, ys = jax.lax.scan(
            step, state,
            (jnp.moveaxis(x, -1, 0), jnp.moveaxis(a_t, -1, 0)),
        )
        return jnp.moveaxis(ys, 0, -1), y1

    # --- f64 host reference (consumed by reference_run_chain)
    def reference_process(self, x, lanes=None):
        a_t = (lanes or {}).get("coef")
        if a_t is None:
            a_t = np.full(x.shape[1], float(self.coef))
        y = np.zeros_like(x)
        y1 = np.zeros(x.shape[0])
        for n in range(x.shape[1]):
            y1 = (1.0 - a_t[n]) * x[:, n] + a_t[n] * y1
            y[:, n] = y1
        return y


@pytest.fixture()
def onepole_registered():
    register_effect("test.onepole", OnePoleLP)
    yield
    unregister_effect("test.onepole")


def _session_with_custom(seed=7, n_tracks=3):
    from tests.test_carve import random_session

    s = random_session(seed, rate=RATE, bpm=120, n_tracks=n_tracks)
    for i, t in enumerate(s.tracks):
        t.effects = EffectChain([Gain(-3.0), OnePoleLP(0.2 + 0.2 * (i % 2))])
    return s


class TestRegistration:
    def test_rejects_builtin_name(self):
        with pytest.raises(ValueError, match="built-in"):
            register_effect("compressor", OnePoleLP)

    def test_requires_serde(self):
        class NoSerde(Effect):
            pass

        with pytest.raises(TypeError, match="as_dict"):
            register_effect("test.noserde", NoSerde)

    def test_requires_effect_subclass(self):
        with pytest.raises(TypeError):
            register_effect("test.noteffect", object)

    def test_decorator_form_and_name_assignment(self):
        @register_effect("test.deco")
        class Deco(Effect):
            def as_dict(self):
                return {}

            @classmethod
            def from_dict(cls, d):
                return cls()

        try:
            assert Deco.name == "test.deco"
        finally:
            unregister_effect("test.deco")


class TestRender:
    def test_generic_pipeline_matches_host_reference(self, onepole_registered):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.effects_generic import reference_generic_finish
        from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

        s = _session_with_custom()
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_generic_finish(pt, s, RATE)
        n = min(res.audio.shape[1], ref.shape[1])
        scale = max(float(np.sqrt(np.mean(ref**2))), 1e-6)
        err = float(np.sqrt(np.mean((res.audio[:, :n] - ref[:, :n]) ** 2))) / scale
        assert err < 5e-5, err

    def test_instance_chunked_equals_oneshot(self):
        e = OnePoleLP(0.63).prepare(RATE, 2)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 2000)).astype(np.float32)
        y1, _ = e.process(x, e.init_state(2))
        st = e.init_state(2)
        outs = []
        for k in range(0, 2000, 512):
            y, st = e.process(x[:, k : k + 512], st)
            outs.append(np.asarray(y))
        np.testing.assert_array_equal(np.asarray(y1), np.concatenate(outs, -1))

    def test_custom_param_automation(self, onepole_registered):
        from whitebox_tpu.ops.automation import (
            AutomationLane, CurveType, EnvelopePoint, TrackAutomation,
        )
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.effects_generic import reference_generic_finish
        from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

        lane = AutomationLane([
            EnvelopePoint(0.0, 0.1, CurveType.LINEAR, 0.0),
            EnvelopePoint(4.0, 0.9, CurveType.LINEAR, 0.0),
        ])
        s = _session_with_custom(seed=11, n_tracks=2)
        for t in s.tracks:
            t.automation = TrackAutomation(effects={(1, "coef"): lane})
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_generic_finish(pt, s, RATE)
        n = min(res.audio.shape[1], ref.shape[1])
        scale = max(float(np.sqrt(np.mean(ref**2))), 1e-6)
        err = float(np.sqrt(np.mean((res.audio[:, :n] - ref[:, :n]) ** 2))) / scale
        assert err < 5e-4, err

    def test_unautomatable_param_rejected(self, onepole_registered):
        from whitebox_tpu.ops.automation import (
            AutomationLane, CurveType, EnvelopePoint, TrackAutomation,
        )
        from whitebox_tpu.render.bounce import bounce

        s = _session_with_custom(seed=12, n_tracks=1)
        s.tracks[0].automation = TrackAutomation(effects={
            (1, "nope"): AutomationLane([EnvelopePoint(0.0, 0.5, CurveType.LINEAR, 0.0)])
        })
        with pytest.raises(ValueError, match="automatable"):
            bounce(s, RATE, engine="xla", chunk_frames=8192)

    def test_stage_protocol_missing_raises(self):
        @register_effect("test.nostage")
        class NoStage(Effect):
            def as_dict(self):
                return {}

            @classmethod
            def from_dict(cls, d):
                return cls()

        try:
            from whitebox_tpu.render.bounce import bounce

            s = _session_with_custom(seed=13, n_tracks=1)
            s.tracks[0].effects = EffectChain([NoStage()])
            with pytest.raises(ValueError, match="stage protocol"):
                bounce(s, RATE, engine="xla", chunk_frames=8192)
        finally:
            unregister_effect("test.nostage")


class TestPersistence:
    def test_wb_roundtrip(self, onepole_registered, tmp_path):
        from whitebox_tpu.session.project import read_project, write_project

        s = _session_with_custom(seed=21, n_tracks=2)
        s.master_effects = EffectChain([OnePoleLP(0.77)])
        p = tmp_path / "custom.wb"
        write_project(s, p)
        s2 = read_project(p)
        for t in s2.tracks:
            e = t.effects.effects[1]
            assert isinstance(e, OnePoleLP)
        assert [e.coef for t in s2.tracks for e in t.effects.effects[1:]] == [
            e.coef for t in s.tracks for e in t.effects.effects[1:]
        ]
        m = s2.master_effects.effects[0]
        assert isinstance(m, OnePoleLP) and m.coef == 0.77

    def test_unknown_type_lossless_bypass(self, tmp_path):
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session.project import read_project, write_project

        register_effect("test.onepole", OnePoleLP)
        s = _session_with_custom(seed=22, n_tracks=1)
        p = tmp_path / "u.wb"
        write_project(s, p)
        unregister_effect("test.onepole")

        s2 = read_project(p)  # unknown type -> bypass placeholder
        e = s2.tracks[0].effects.effects[1]
        assert isinstance(e, UnknownEffect) and e.type_name == "test.onepole"
        assert e.state == {"coef": s.tracks[0].effects.effects[1].coef}

        # renders as a bypass (== the same session with only the Gain)
        res = bounce(s2, RATE, engine="xla", chunk_frames=8192)
        s3 = read_project(p)
        s3.tracks[0].effects = EffectChain([s3.tracks[0].effects.effects[0]])
        res2 = bounce(s3, RATE, engine="xla", chunk_frames=8192)
        np.testing.assert_allclose(res.audio, res2.audio, atol=2e-6)

        # re-save preserves the document verbatim; re-register restores it
        p2 = tmp_path / "u2.wb"
        write_project(s2, p2)
        register_effect("test.onepole", OnePoleLP)
        try:
            s4 = read_project(p2)
            e4 = s4.tracks[0].effects.effects[1]
            assert isinstance(e4, OnePoleLP)
            assert e4.coef == s.tracks[0].effects.effects[1].coef
        finally:
            unregister_effect("test.onepole")

    def test_unregistered_write_raises(self, tmp_path):
        from whitebox_tpu.session.project import write_project

        s = _session_with_custom(seed=23, n_tracks=1)
        with pytest.raises(TypeError, match="not registered"):
            write_project(s, tmp_path / "x.wb")
