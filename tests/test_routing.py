"""Bus / group / send routing (session/bus.py + render/routing.py):
matrices, device pipelines vs the f64 host reference, fader semantics,
serialization, undo, and edit-stamp invalidation."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.effects import (
    Biquad, Compressor, Delay, EffectChain, Gain, NoiseGate, ParametricEQ,
)
from whitebox_tpu.render.routing import (
    make_routed_chunk_fn, make_routed_finisher, prepare_routed_fx,
    reference_routed_finish, init_routed_states,
)
from whitebox_tpu.session.bus import build_routing_matrices, session_has_routing

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _routed_session(seed=11, n_tracks=6, generic=False):
    """Tracks 0-1 grouped to bus 0 (EQ), track 2 post-sends to bus 1
    (delay/biquad), track 3 pre-sends to bus 1, tracks 4-5 direct."""
    s = random_session(seed, rate=RATE, bpm=120.0, n_tracks=n_tracks,
                       formats=(AudioFormat.F32,), n_clips=2)
    drums = s.add_bus("drums", volume_db=-2.0, pan=0.2)
    fxb = s.add_bus("fx", volume_db=-6.0)
    drums.effects = EffectChain([ParametricEQ([
        ("lowshelf", 120.0, 0.707, 2.5), ("peak", 2500.0, 1.2, -2.0)])])
    if generic:
        fxb.effects = EffectChain([Delay(0.03, 0.35), Compressor(-18.0, 3.0)])
    else:
        fxb.effects = EffectChain([Biquad("highpass", 300.0), Gain(-1.5)])
    s.set_track_output(0, 0)
    s.set_track_output(1, 0)
    s.add_send(2, 1, gain_db=-3.0)
    s.add_send(3, 1, gain_db=-4.5, pre_fader=True)
    s.tracks[0].effects = EffectChain([Biquad("lowpass", 9000.0)])
    s.master_effects = EffectChain([Biquad("highpass", 30.0)])
    return s


def _per_track(s):
    from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

    table, pool = carve_session(s, RATE, buffer_size=512)
    return render_segments_per_track_numpy(table, pool)


class TestRoutingMatrices:
    def test_masks_and_gains(self):
        s = _routed_session()
        r_post, r_pre, bus_gain, k_post, k_pre = build_routing_matrices(s, 2)
        assert r_post.shape == (3, 6) and r_pre.shape == (2, 6)
        # master-direct: tracks 2-5 (sends don't move the destination)
        assert list(r_post[0]) == [0, 0, 1, 1, 1, 1]
        assert list(r_post[1]) == [1, 1, 0, 0, 0, 0]  # group routing
        g = float(np.float32(10.0 ** np.float32(-3.0 / 20.0)))
        assert r_post[2, 2] == pytest.approx(g, rel=1e-6)
        assert r_pre[1, 3] > 0 and r_pre[1, 2] == 0
        assert bus_gain.shape == (2, 2)

    def test_has_routing(self):
        s = random_session(1, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        assert not session_has_routing(s)
        s.add_bus("b")  # unused bus: still no routed render needed
        assert not session_has_routing(s)
        s.add_send(0, 0, -3.0)
        assert session_has_routing(s)

    def test_delete_bus_reindexes(self):
        s = random_session(2, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=1)
        s.add_bus("a"), s.add_bus("b")
        s.set_track_output(0, 1)
        s.add_send(1, 0, -3.0)
        s.add_send(1, 1, -6.0)
        s.delete_bus(0)
        assert s.tracks[0].output_bus == 0  # shifted down
        assert len(s.tracks[1].sends) == 1 and s.tracks[1].sends[0].bus == 0
        s.delete_bus(0)
        assert s.tracks[0].output_bus is None  # falls back to master


class TestRoutedFinisher:
    def test_packable_chains_match_reference(self):
        s = _routed_session(generic=False)
        pt = _per_track(s)
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_routed_finish(pt, s, RATE, C)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 2e-5, f"relative rms err {err}"

    def test_generic_chains_match_reference(self):
        s = _routed_session(generic=True)
        pt = _per_track(s)
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_routed_finish(pt, s, RATE, C)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"

    def test_chunked_equals_oneshot(self):
        s = _routed_session(generic=True)
        pt = _per_track(s).astype(np.float32)
        T, C, F = pt.shape
        Fc = 2048
        F = (F // Fc) * Fc
        pt = pt[:, :, :F]
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=F)
        one = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        step = make_routed_chunk_fn(rfx, T, C, chunk=Fc)
        states = init_routed_states(rfx, C)
        pieces = []
        for start in range(0, F, Fc):
            piece, states = step(jnp.asarray(pt[:, :, start:start + Fc]), states,
                                 jnp.int32(start), jnp.asarray(tg))
            pieces.append(np.asarray(piece))
        assert np.max(np.abs(np.concatenate(pieces, -1) - one)) < 1e-6

    def test_pre_fader_send_survives_mute(self):
        """A muted track is silent on its destination and post sends, but a
        pre-fader send still feeds the bus (cue/monitor semantics)."""
        s = random_session(5, rate=RATE, bpm=120.0, n_tracks=1,
                           formats=(AudioFormat.F32,), n_clips=2)
        s.tracks[0].mute = True
        s.add_bus("cue")
        pt = _per_track(s)
        # post-only routing: everything muted -> silence
        ref_silent = reference_routed_finish(pt, s, RATE, 2)
        assert rms(ref_silent) == 0.0
        s.add_send(0, 0, gain_db=0.0, pre_fader=True)
        ref = reference_routed_finish(pt, s, RATE, 2)
        assert rms(ref) > 0.0
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.zeros((T, C), np.float32)  # muted fader
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 2e-5


class TestRoutedBounce:
    def test_bounce_xla_matches_reference(self):
        from whitebox_tpu.render.bounce import bounce

        s = _routed_session(generic=False)
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        pt = _per_track(s)
        ref = reference_routed_finish(pt, s, RATE, 2)
        n = min(res.audio.shape[1], ref.shape[1])
        err = rms(res.audio[:, :n] - ref[:, :n]) / max(rms(ref), 1e-9)
        assert err < 2e-5, f"relative rms err {err}"

    @pytest.mark.slow
    def test_bounce_pallas_matches_xla(self):
        from whitebox_tpu.render.bounce import bounce

        s = _routed_session(generic=False)
        a = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        b = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
        n = min(a.shape[1], b.shape[1])
        assert np.max(np.abs(a[:, :n] - b[:, :n])) < 1e-6

    def test_bounce_with_meters(self):
        from whitebox_tpu.render.bounce import bounce

        s = _routed_session(generic=False)
        res = bounce(s, RATE, engine="xla", chunk_frames=8192, meters=True)
        assert res.stats.track_peak is not None
        assert res.stats.track_peak.shape[0] == len(s.tracks)


class TestRoutedSharded:
    """Routed sessions on the virtual 8-device mesh: routing partials psum
    over the tracks axis; bus chains run frame-sharded like the master."""

    @pytest.mark.slow
    def test_frames_only_mesh_matches_single_chip(self):
        import jax

        from whitebox_tpu.parallel.mesh import make_render_mesh
        from whitebox_tpu.parallel.render_sharded import bounce_sharded
        from whitebox_tpu.render.bounce import bounce

        assert len(jax.devices()) == 8
        mesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
        s = _routed_session(generic=False)
        single = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        multi = bounce_sharded(s, RATE, mesh)
        n = min(single.shape[1], multi.shape[1])
        np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)

    @pytest.mark.slow
    def test_2d_mesh_matches_single_chip(self):
        import jax

        from whitebox_tpu.parallel.mesh import make_render_mesh
        from whitebox_tpu.parallel.render_sharded import bounce_sharded
        from whitebox_tpu.render.bounce import bounce

        assert len(jax.devices()) == 8
        mesh = make_render_mesh(tracks_parallel=2, frames_parallel=4)
        s = _routed_session(generic=False)
        single = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        multi = bounce_sharded(s, RATE, mesh)
        n = min(single.shape[1], multi.shape[1])
        np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)


def _sidechain_session(seed=7, pre_fader=False, gate=False):
    """Track 0 = program routed to bus 0 with a sidechain compressor (or
    gate); track 1 = key, sidechain-sent to bus 0 (classic ducking)."""
    s = random_session(seed, rate=RATE, bpm=120.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=2)
    duck = s.add_bus("duck")
    if gate:
        duck.effects = EffectChain([NoiseGate(-40.0, release_s=0.05, sidechain=True)])
    else:
        duck.effects = EffectChain([Compressor(-30.0, 8.0, attack_s=0.002,
                                               release_s=0.08, sidechain=True)])
    s.set_track_output(0, 0)
    s.add_send(1, 0, gain_db=0.0, pre_fader=pre_fader, sidechain=True)
    return s


class TestSidechain:
    def test_key_matrices(self):
        s = _sidechain_session()
        m = build_routing_matrices(s, 2)
        assert m.k_post[0, 1] == pytest.approx(1.0)
        assert m.k_post[0, 0] == 0.0 and not m.k_pre.any()
        # the key never reaches the bus audio
        assert m.r_post[1, 1] == 0.0 and m.r_pre[0, 1] == 0.0

    @pytest.mark.parametrize("gate", [False, True])
    def test_duck_matches_reference(self, gate):
        s = _sidechain_session(gate=gate)
        pt = _per_track(s)
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        assert rfx.has_key
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_routed_finish(pt, s, RATE, C)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"
        # and the key actually modulates: silent-key render differs
        s.tracks[1].sends = []
        rfx0 = prepare_routed_fx(s, RATE, C)
        if not gate:  # compressor: key gone -> no reduction -> louder bus
            fin0 = make_routed_finisher(rfx0, T, C, chunk=4096)
            got0 = np.asarray(fin0(jnp.asarray(pt), jnp.asarray(tg)))
            assert rms(got0 - got) / max(rms(got), 1e-9) > 1e-3

    def test_sidechain_chunked_equals_oneshot(self):
        s = _sidechain_session()
        pt = _per_track(s).astype(np.float32)
        T, C, F = pt.shape
        Fc = 2048
        F = (F // Fc) * Fc
        pt = pt[:, :, :F]
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=F)
        one = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        step = make_routed_chunk_fn(rfx, T, C, chunk=Fc)
        states = init_routed_states(rfx, C)
        pieces = []
        for start in range(0, F, Fc):
            piece, states = step(jnp.asarray(pt[:, :, start:start + Fc]), states,
                                 jnp.int32(start), jnp.asarray(tg))
            pieces.append(np.asarray(piece))
        assert np.max(np.abs(np.concatenate(pieces, -1) - one)) < 1e-6

    def test_unkeyed_sidechain_comp_is_passthrough(self):
        """sidechain=True with no key send: detector hears silence, audio
        passes at makeup gain."""
        x = (0.1 * np.random.default_rng(3).standard_normal((2, 4096))).astype(np.float32)
        from whitebox_tpu.render.effects_generic import reference_run_chain

        c = EffectChain([Compressor(-30.0, 8.0, sidechain=True)])
        y = reference_run_chain(c, x.astype(np.float64), None, RATE, 2, 0.5)
        np.testing.assert_allclose(y, x, atol=1e-7)

    @pytest.mark.slow
    def test_sidechain_sharded_matches_single_chip(self):
        import jax

        from whitebox_tpu.parallel.mesh import make_render_mesh
        from whitebox_tpu.parallel.render_sharded import bounce_sharded
        from whitebox_tpu.render.bounce import bounce

        assert len(jax.devices()) == 8
        s = _sidechain_session()
        single = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        for tp, fp_ in ((1, 8), (2, 4)):
            mesh = make_render_mesh(tracks_parallel=tp, frames_parallel=fp_)
            multi = bounce_sharded(s, RATE, mesh)
            n = min(single.shape[1], multi.shape[1])
            np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)

    def test_sidechain_wb_roundtrip(self, tmp_path):
        from whitebox_tpu.io import wav
        from whitebox_tpu.session.project import read_project, write_project

        s = _sidechain_session()
        for k, a in s.sample_table.samples.items():
            p = tmp_path / f"{k}.wav"
            wav.write_wav(p, np.stack(a.sample.data), a.sample.sample_rate, AudioFormat.F32)
            a.sample.path = str(p)
        path = tmp_path / "sc.wb"
        write_project(s, path)
        s2 = read_project(path)
        assert s2.tracks[1].sends[0].sidechain is True
        assert s2.buses[0].effects.effects[0].sidechain is True
        m1, m2 = build_routing_matrices(s, 2), build_routing_matrices(s2, 2)
        for a, b in zip(m1, m2):
            np.testing.assert_array_equal(a, b)


class TestRoutingPersistence:
    def test_wb_roundtrip(self, tmp_path):
        from whitebox_tpu.session.project import read_project, write_project

        s = _routed_session(generic=True)
        # write samples so relocation works
        from whitebox_tpu.io import wav

        for k, a in s.sample_table.samples.items():
            p = tmp_path / f"{k}.wav"
            planar = np.stack(a.sample.data)
            wav.write_wav(p, planar, a.sample.sample_rate, AudioFormat.F32)
            a.sample.path = str(p)
        path = tmp_path / "routed.wb"
        write_project(s, path)
        s2 = read_project(path)
        assert len(s2.buses) == 2
        assert s2.buses[0].name == "drums" and s2.buses[0].volume_db == -2.0
        assert s2.buses[0].pan == pytest.approx(0.2)
        assert len(s2.buses[1].effects.effects) == 2
        assert s2.tracks[0].output_bus == 0 and s2.tracks[1].output_bus == 0
        assert s2.tracks[2].sends[0].bus == 1
        assert s2.tracks[2].sends[0].gain_db == pytest.approx(-3.0)
        assert s2.tracks[3].sends[0].pre_fader is True
        r1 = build_routing_matrices(s, 2)
        r2 = build_routing_matrices(s2, 2)
        for a, b in zip(r1, r2):
            np.testing.assert_array_equal(a, b)

    def test_undo_redo(self):
        from whitebox_tpu.session.history import (
            BusAdd, BusDelete, BusSetParam, CommandManager, SendAdd, SendRemove,
            TrackSetOutputBus,
        )

        s = random_session(3, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        mgr = CommandManager(s)
        mgr.execute(BusAdd(bus_name="aux", volume_db=-3.0))
        assert len(s.buses) == 1
        mgr.execute(TrackSetOutputBus(track_idx=0, bus=0))
        mgr.execute(SendAdd(track_idx=1, bus=0, gain_db=-6.0, pre_fader=True))
        mgr.execute(BusSetParam(bus_idx=0, volume_db=-9.0, mute=True))
        assert s.buses[0].volume_db == -9.0 and s.buses[0].mute
        mgr.undo()
        assert s.buses[0].volume_db == -3.0 and not s.buses[0].mute
        mgr.undo()
        assert not s.tracks[1].sends
        mgr.redo()
        assert s.tracks[1].sends[0].pre_fader is True
        mgr.execute(SendRemove(track_idx=1, send_idx=0))
        assert not s.tracks[1].sends
        mgr.undo()
        assert s.tracks[1].sends[0].bus == 0
        mgr.execute(BusDelete(bus_idx=0))
        assert not s.buses and s.tracks[0].output_bus is None
        mgr.undo()
        assert len(s.buses) == 1 and s.tracks[0].output_bus == 0

    def test_edit_stamp_moves(self):
        s = random_session(4, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        st0 = s.edit_stamp()
        s.add_bus("aux")
        st1 = s.edit_stamp()
        assert st1 != st0
        s.add_send(0, 0, -3.0)
        st2 = s.edit_stamp()
        assert st2 != st1
        s.tracks[0].sends[0].gain_db = -9.0  # direct field mutation
        assert s.edit_stamp() != st2


class TestBusAutomation:
    """Bus fader lanes + bus-chain effect-param lanes (Bus.automation)."""

    def _session(self, fx_lane=False):
        from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation

        s = random_session(51, rate=RATE, bpm=120.0, n_tracks=3,
                           formats=(AudioFormat.F32,), n_clips=2)
        b = s.add_bus("ride", volume_db=-2.0)
        b.effects = EffectChain([Biquad("lowpass", 4000.0)])
        s.set_track_output(0, 0)
        s.add_send(1, 0, gain_db=-3.0)
        lanes = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(2.0, 0.1),
            pan=AutomationLane().add(0.0, -0.6).add(2.0, 0.6),
        )
        if fx_lane:
            lanes.effects = {(0, "freq_hz"): AutomationLane().add(0.0, 500.0).add(2.0, 9000.0)}
        b.automation = lanes
        return s

    def _tg(self, s, C=2):
        return np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])

    @pytest.mark.parametrize("fx_lane", [False, True])
    def test_device_matches_reference(self, fx_lane):
        s = self._session(fx_lane=fx_lane)
        pt = _per_track(s)
        T, C, F = pt.shape
        rfx = prepare_routed_fx(s, RATE, C)
        assert rfx.bus_auto is not None
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(self._tg(s, C))))
        ref = reference_routed_finish(pt, s, RATE, C)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"
        # the lanes actually move the mix vs the static fader
        s.buses[0].automation = None
        rfx0 = prepare_routed_fx(s, RATE, C)
        fin0 = make_routed_finisher(rfx0, T, C, chunk=4096)
        got0 = np.asarray(fin0(jnp.asarray(pt), jnp.asarray(self._tg(s, C))))
        assert rms(got0 - got) / max(rms(got), 1e-9) > 1e-3

    def test_chunked_equals_oneshot(self):
        s = self._session(fx_lane=True)
        pt = _per_track(s).astype(np.float32)
        T, C, F = pt.shape
        Fc = 2048
        F = (F // Fc) * Fc
        pt = pt[:, :, :F]
        rfx = prepare_routed_fx(s, RATE, C)
        tg = self._tg(s, C)
        one = np.asarray(make_routed_finisher(rfx, T, C, chunk=F)(
            jnp.asarray(pt), jnp.asarray(tg)))
        step = make_routed_chunk_fn(rfx, T, C, chunk=Fc)
        states = init_routed_states(rfx, C)
        pieces = []
        for start in range(0, F, Fc):
            piece, states = step(jnp.asarray(pt[:, :, start:start + Fc]), states,
                                 jnp.int32(start), jnp.asarray(tg))
            pieces.append(np.asarray(piece))
        assert np.max(np.abs(np.concatenate(pieces, -1) - one)) < 1e-6

    @pytest.mark.slow
    def test_sharded_matches_single_chip(self):
        import jax

        from whitebox_tpu.parallel.mesh import make_render_mesh
        from whitebox_tpu.parallel.render_sharded import bounce_sharded
        from whitebox_tpu.render.bounce import bounce

        assert len(jax.devices()) == 8
        s = self._session(fx_lane=True)
        single = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        for tp, fp_ in ((1, 8), (2, 4)):
            mesh = make_render_mesh(tracks_parallel=tp, frames_parallel=fp_)
            multi = bounce_sharded(s, RATE, mesh)
            n = min(single.shape[1], multi.shape[1])
            np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)

    def test_wb_roundtrip_and_undo(self, tmp_path):
        from whitebox_tpu.io import wav
        from whitebox_tpu.session.history import CommandManager, SetBusAutomation
        from whitebox_tpu.session.project import read_project, write_project

        s = self._session(fx_lane=True)
        for k, a in s.sample_table.samples.items():
            p = tmp_path / f"{k}.wav"
            wav.write_wav(p, np.stack(a.sample.data), a.sample.sample_rate, AudioFormat.F32)
            a.sample.path = str(p)
        path = tmp_path / "bauto.wb"
        write_project(s, path)
        s2 = read_project(path)
        a2 = s2.buses[0].automation
        assert a2 is not None and a2.volume is not None and a2.pan is not None
        assert (0, "freq_hz") in a2.effects
        assert [(p.x, p.y) for p in a2.volume.points] == \
               [(p.x, p.y) for p in s.buses[0].automation.volume.points]

        mgr = CommandManager(s2)
        st0 = s2.edit_stamp()
        mgr.execute(SetBusAutomation(bus_idx=0, target="volume",
                                     points=[(0.0, 0.5, 1, 0.0)]))
        assert len(s2.buses[0].automation.volume.points) == 1
        assert s2.edit_stamp() != st0
        mgr.undo()
        assert len(s2.buses[0].automation.volume.points) == 2
        mgr.execute(SetBusAutomation(bus_idx=0, target=(0, "freq_hz"), points=None))
        assert not s2.buses[0].automation.effects
        mgr.undo()
        assert (0, "freq_hz") in s2.buses[0].automation.effects


class TestRoutingFuzz:
    @pytest.mark.parametrize("seed", [101, 202, 303])
    def test_random_topology_matches_reference(self, seed):
        """Random routing surfaces (groups/sends/pre/post/sidechain/bus
        chains/bus fader lanes) must match the f64 reference — the
        routing matrices are pure data, so the property should hold for
        any topology the edit API can build."""
        from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation

        rng = np.random.default_rng(seed)
        T = int(rng.integers(3, 7))
        s = random_session(seed, rate=RATE, bpm=120.0, n_tracks=T,
                           formats=(AudioFormat.F32,), n_clips=2)
        B = int(rng.integers(1, 4))
        for b in range(B):
            bus = s.add_bus(f"b{b}", volume_db=float(rng.uniform(-9, 3)),
                            pan=float(rng.uniform(-0.8, 0.8)))
            kind = rng.integers(4)
            if kind == 1:
                bus.effects = EffectChain([Biquad("lowpass", float(rng.uniform(800, 12000)))])
            elif kind == 2:
                bus.effects = EffectChain([Gain(float(rng.uniform(-6, 3))),
                                           Biquad("highpass", float(rng.uniform(40, 400)))])
            elif kind == 3:
                bus.effects = EffectChain([Compressor(-25.0, 4.0, sidechain=bool(rng.random() < 0.5))])
            if rng.random() < 0.4:
                bus.automation = TrackAutomation(
                    volume=AutomationLane().add(0.0, float(rng.uniform(0.3, 1.0)))
                                           .add(2.0, float(rng.uniform(0.1, 1.0))))
        for t in range(T):
            if rng.random() < 0.5:
                s.set_track_output(t, int(rng.integers(B)))
            for _ in range(int(rng.integers(0, 3))):
                s.add_send(t, int(rng.integers(B)),
                           gain_db=float(rng.uniform(-12, 0)),
                           pre_fader=bool(rng.random() < 0.3),
                           sidechain=bool(rng.random() < 0.25))
        pt = _per_track(s)
        C = pt.shape[1]
        rfx = prepare_routed_fx(s, RATE, C)
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt), jnp.asarray(tg)))
        ref = reference_routed_finish(pt, s, RATE, C)
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 5e-5, f"seed {seed}: relative rms err {err}"


class TestMultichannelRouting:
    def test_routed_four_channel_matches_reference(self):
        """channels=4: routing matrices, bus gains (pan wraps c%2), and
        chains must stay shape-consistent beyond stereo."""
        s = _routed_session(generic=False)
        C = 4
        pt4 = np.concatenate([_per_track(s)] * 2, axis=1)  # [T, 4, F]
        T = pt4.shape[0]
        rfx = prepare_routed_fx(s, RATE, C)
        assert rfx.bus_gain.shape == (2, C)
        tg = np.stack([
            np.array([np.float32((np.float32(0.0) if t.mute else t.volume_linear)
                                 * np.float32(t.pan_coeffs[c % 2])) for c in range(C)])
            for t in s.tracks])
        fin = make_routed_finisher(rfx, T, C, chunk=4096)
        got = np.asarray(fin(jnp.asarray(pt4), jnp.asarray(tg)))
        ref = reference_routed_finish(pt4, s, RATE, C)
        assert got.shape[0] == 4 and ref.shape[0] == 4
        err = rms(got - ref) / max(rms(ref), 1e-9)
        assert err < 2e-5, f"relative rms err {err}"


class TestBusStems:
    def test_components_reconstruct_mix(self):
        """direct + sum(bus stems) -> master chain -> clip == full bounce."""
        from whitebox_tpu.effects.base import EffectChain as _EC
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.stems import render_bus_stems

        s = _routed_session(generic=False)
        direct, bus, names = render_bus_stems(s, RATE)
        assert names == ["drums", "fx"] and bus.shape[0] == 2
        total = jnp.asarray(direct + bus.sum(axis=0))
        master = s.master_effects if isinstance(s.master_effects, _EC) else _EC(list(s.master_effects))
        master.prepare(RATE, 2)
        total, _ = master.process(total, master.init_state(2))
        recon = np.clip(np.asarray(total), -1.0, 1.0)
        full = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        n = min(recon.shape[1], full.shape[1])
        err = rms(recon[:, :n] - full[:, :n]) / max(rms(full[:, :n]), 1e-9)
        assert err < 2e-5, f"relative rms err {err}"

    def test_requires_routing(self):
        from whitebox_tpu.render.stems import render_bus_stems

        s = random_session(61, rate=RATE, bpm=120.0, n_tracks=2,
                           formats=(AudioFormat.F32,), n_clips=1)
        with pytest.raises(ValueError, match="buses/sends"):
            render_bus_stems(s, RATE)
