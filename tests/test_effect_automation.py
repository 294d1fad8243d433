"""Timed effect-parameter automation — the native-effects analogue of the
reference's VST3 sample-ranged param queues (src/engine/param_changes.h:56-115
feeding PluginProcessInfo.param_changes, src/plughost/plugin_interface.h:77-90).

Covers: the device TV-biquad machinery vs the f64 block-stepped host
reference, per-frame elementwise param lanes across the whole effect family,
chunk-state exactness, grouping with mixed automated/static tracks, master
chain lanes, .wb round-trip, and the undo command.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.effects import (
    Biquad, Chorus, Compressor, Delay, EffectChain, Gain, Limiter, NoiseGate,
    ParametricEQ, Saturator, StereoWidth,
)
from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
from whitebox_tpu.ops.biquad import (
    PARAM_BLOCK, biquad_scan_blocked_tv, biquad_sequential_tv, design_biquad,
    design_biquad_device, tv_section_params,
)
from whitebox_tpu.render.effects_generic import (
    make_generic_finisher, prepare_generic_fx, reference_generic_finish,
    session_fx_packable,
)

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _noise(shape, seed=0, scale=0.4):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def _track_gain(s, C=2):
    rows = []
    for t in s.tracks:
        vol = np.float32(0.0) if t.mute else t.volume_linear
        pan = t.pan_coeffs
        rows.append([np.float32(vol * np.float32(pan[ch % 2])) for ch in range(C)])
    return jnp.asarray(np.array(rows, np.float32))


def _lane(*pts):
    lane = AutomationLane()
    for p in pts:
        lane.add(*p)
    return lane


def _finish(s, pt, chunk=2048):
    fx = prepare_generic_fx(s, RATE)
    T, C, F = pt.shape
    fin = make_generic_finisher(fx, T, C, chunk=chunk)
    return np.asarray(fin(jnp.asarray(pt), _track_gain(s, C)))


class TestTVBiquadOps:
    """Device blocked TV scan vs the f64 block-stepped sequential reference."""

    @pytest.mark.parametrize("ftype,lo,hi,q,g", [
        ("lowpass", 200.0, 8000.0, 0.7071, 0.0),
        ("highpass", 30.0, 2000.0, 2.0, 0.0),
        ("peak", 500.0, 5000.0, 1.5, 9.0),
        ("lowshelf", 100.0, 1000.0, 0.9, -6.0),
        ("highshelf", 2000.0, 12000.0, 0.7, 7.5),
        ("bandpass", 300.0, 3000.0, 0.3, 0.0),
        ("notch", 100.0, 10000.0, 5.0, 0.0),
        ("allpass", 40.0, 4000.0, 0.45, 0.0),
    ])
    def test_sweep_matches_reference(self, ftype, lo, hi, q, g):
        C, F = 2, PARAM_BLOCK * 24
        K = F // PARAM_BLOCK
        x = _noise((C, F), seed=7)
        freq = np.geomspace(lo, hi, K)
        d = design_biquad_device(
            ftype, jnp.asarray(freq, jnp.float32)[None, :].repeat(C, 0),
            jnp.float32(q), jnp.float32(g), RATE,
        )
        p9, P, Pinv, aux = tv_section_params(d)
        bc = lambda a, tail=(): jnp.broadcast_to(a, (C, K) + tail)
        y, z = biquad_scan_blocked_tv(
            jnp.asarray(x), [bc(p) for p in p9], bc(P, (2, 2)), bc(Pinv, (2, 2)),
            jnp.zeros((C, 2)), aux={k: bc(v) for k, v in aux.items()},
        )
        y_ref, z_ref = biquad_sequential_tv(x, ftype, freq, np.full(K, q), np.full(K, g), RATE)
        scale = max(np.max(np.abs(y_ref)), 1e-9)
        assert np.max(np.abs(np.asarray(y) - y_ref)) / scale < 1e-4
        assert np.max(np.abs(np.asarray(z) - z_ref)) < 1e-4

    def test_constant_coeffs_match_static_design(self):
        """A constant 'sweep' equals the classic static design to f32 noise."""
        C, F = 2, PARAM_BLOCK * 8
        K = F // PARAM_BLOCK
        x = _noise((C, F), seed=8)
        freq = np.full(K, 1200.0)
        y_ref, _ = biquad_sequential_tv(x, "lowpass", freq, np.full(K, 0.9), np.zeros(K), RATE)
        from whitebox_tpu.ops.biquad import biquad_sequential

        c = design_biquad("lowpass", 1200.0, RATE, 0.9)
        y_static, _ = biquad_sequential(x, c)
        np.testing.assert_allclose(y_ref, y_static, atol=1e-12)

    def test_device_design_matches_host_design(self):
        """design_biquad_device coefficients track the f64 RBJ design."""
        for ftype in ("lowpass", "highpass", "bandpass", "notch", "allpass",
                      "peak", "lowshelf", "highshelf"):
            for f, q, g in [(100.0, 0.7071, 3.0), (1000.0, 2.0, -9.0), (12000.0, 0.4, 6.0)]:
                c = design_biquad(ftype, f, RATE, q, g)
                d = design_biquad_device(ftype, jnp.float32(f), jnp.float32(q),
                                         jnp.float32(g), RATE)
                for k, ref in (("b0", c.b0), ("b1", c.b1), ("b2", c.b2),
                               ("a1", c.a1), ("a2", c.a2)):
                    assert abs(float(d[k]) - ref) < 5e-6 * max(abs(ref), 1.0), (ftype, f, k)


def _base_session(seed, n_tracks, F):
    s = random_session(seed, rate=48000, bpm=120.0, n_tracks=n_tracks, n_clips=1)
    return s


class TestEffectLanes:
    """Generic finisher vs the automation-aware f64 host reference."""

    F = PARAM_BLOCK * 16  # 8192 frames, multi-chunk at chunk=2048

    def _check(self, s, pt, tol=2e-4, chunk=2048):
        out = _finish(s, pt, chunk=chunk)
        ref = reference_generic_finish(pt, s, RATE)
        scale = max(rms(ref), 1e-6)
        err = rms(out - ref) / scale
        assert err < tol, f"relative rms err {err}"
        return out, ref

    def test_biquad_cutoff_sweep(self):
        """The headline case: a filter sweep (sampler-era DAWs' bread and
        butter; inexpressible in round 2)."""
        s = _base_session(50, 2, self.F)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 8000.0, 1.2)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "freq_hz"): _lane((0.0, 8000.0), (0.3, 300.0), (0.6, 6000.0))}
        )
        pt = _noise((2, 2, self.F), seed=51)
        out, ref = self._check(s, pt)
        assert rms(out) > 1e-4  # produced audio

    def test_compressor_threshold_ride(self):
        s = _base_session(52, 2, self.F)
        s.tracks[0].effects = EffectChain([Compressor(-18.0, 4.0)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "threshold_db"): _lane((0.0, -6.0), (0.25, -30.0), (0.5, -12.0))}
        )
        pt = _noise((2, 2, self.F), seed=53)
        self._check(s, pt, tol=5e-4)

    def test_eq_band_sweep(self):
        s = _base_session(54, 1, self.F)
        s.tracks[0].effects = EffectChain([ParametricEQ([
            ("lowshelf", 120.0, 0.8, 3.0),
            ("peak", 2000.0, 1.4, -4.0),
        ])])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "b1.freq_hz"): _lane((0.0, 600.0), (0.4, 6000.0)),
                     (0, "b1.gain_db"): _lane((0.0, -12.0), (0.4, 6.0))}
        )
        pt = _noise((1, 2, self.F), seed=55)
        self._check(s, pt)

    def test_gain_db_lane(self):
        s = _base_session(56, 1, self.F)
        s.tracks[0].effects = EffectChain([Gain(0.0)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "gain_db"): _lane((0.0, -80.0), (0.3, 0.0), (0.6, -12.0))}
        )
        pt = _noise((1, 2, self.F), seed=57)
        out, ref = self._check(s, pt, tol=5e-5)
        # the -72 dB silence floor engages at the lane start
        assert np.allclose(out[:, :100], 0.0)

    def test_elementwise_family_lanes(self):
        """wet/dry/drive/width rides across delay, saturator, width, gate."""
        s = _base_session(58, 4, self.F)
        s.tracks[0].effects = EffectChain([Delay(0.02, 0.4, wet=0.5)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "wet"): _lane((0.0, 0.0), (0.5, 0.8))})
        s.tracks[1].effects = EffectChain([Saturator(6.0, mix=1.0)])
        s.tracks[1].automation = TrackAutomation(
            effects={(0, "drive_db"): _lane((0.0, 0.0), (0.4, 14.0)),
                     (0, "mix"): _lane((0.0, 1.0), (0.4, 0.3))})
        s.tracks[2].effects = EffectChain([StereoWidth(1.0)])
        s.tracks[2].automation = TrackAutomation(
            effects={(0, "width"): _lane((0.0, 0.0), (0.5, 1.8))})
        s.tracks[3].effects = EffectChain([NoiseGate(-40.0)])
        s.tracks[3].automation = TrackAutomation(
            effects={(0, "threshold_db"): _lane((0.0, -60.0), (0.5, -10.0))})
        pt = _noise((4, 2, self.F), seed=59)
        self._check(s, pt, tol=5e-4)

    def test_limiter_ceiling_and_ballistics(self):
        s = _base_session(60, 1, self.F)
        s.tracks[0].effects = EffectChain([Limiter(-1.0, lookahead_s=0.002)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "ceiling_db"): _lane((0.0, -0.5), (0.4, -12.0)),
                     (0, "release_s"): _lane((0.0, 0.02), (0.4, 0.2))})
        pt = _noise((1, 2, self.F), seed=61, scale=0.9)
        self._check(s, pt, tol=5e-4)

    def test_chunk_invariance_with_tv_biquad(self):
        """TV state (z coords) carries exactly across chunk boundaries."""
        s = _base_session(62, 1, self.F)
        s.tracks[0].effects = EffectChain([Biquad("highpass", 100.0, 1.5)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "freq_hz"): _lane((0.0, 100.0), (0.5, 4000.0))})
        pt = _noise((1, 2, self.F), seed=63)
        a = _finish(s, pt, chunk=1024)
        b = _finish(s, pt, chunk=8192)
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_mixed_group_splits_by_automation(self):
        """Same chain signature, one automated track: both stay correct."""
        s = _base_session(64, 2, self.F)
        for t in s.tracks:
            t.effects = EffectChain([Biquad("lowpass", 3000.0, 0.9)])
        s.tracks[1].automation = TrackAutomation(
            effects={(0, "freq_hz"): _lane((0.0, 500.0), (0.5, 10000.0))})
        fx = prepare_generic_fx(s, RATE)
        assert len(fx.groups) == 2  # automated and static tracks group apart
        pt = _noise((2, 2, self.F), seed=65)
        self._check(s, pt)

    def test_master_chain_automation(self):
        s = _base_session(66, 2, self.F)
        s.master_effects = EffectChain([Biquad("lowpass", 12000.0, 0.8)])
        s.master_automation = {(0, "freq_hz"): _lane((0.0, 12000.0), (0.4, 800.0))}
        pt = _noise((2, 2, self.F), seed=67)
        self._check(s, pt)

    def test_routing_forces_generic(self):
        s = _base_session(68, 1, self.F)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 1000.0)])
        assert session_fx_packable(s)
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "freq_hz"): _lane((0.0, 500.0))})
        assert not session_fx_packable(s)

    def test_unknown_param_raises(self):
        s = _base_session(69, 1, self.F)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 1000.0)])
        s.tracks[0].automation = TrackAutomation(effects={(0, "cutoff"): _lane((0.0, 1.0))})
        with pytest.raises(ValueError, match="automatable"):
            prepare_generic_fx(s, RATE)

    def test_bad_slot_raises(self):
        s = _base_session(70, 1, self.F)
        s.tracks[0].effects = EffectChain([Gain(0.0)])
        s.tracks[0].automation = TrackAutomation(effects={(3, "gain_db"): _lane((0.0, 1.0))})
        with pytest.raises(ValueError, match="slot"):
            prepare_generic_fx(s, RATE)


class TestPersistence:
    def test_wb_roundtrip(self, tmp_path):
        from whitebox_tpu.session.project import read_project, write_project

        s = random_session(80, rate=48000, bpm=120.0, n_tracks=2, n_clips=1)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 4000.0, 1.1),
                                           Compressor(-18.0, 4.0)])
        s.tracks[0].automation = TrackAutomation(
            volume=_lane((0.0, 0.5), (2.0, 1.0)),
            effects={(0, "freq_hz"): _lane((0.0, 4000.0), (1.5, 500.0)),
                     (1, "threshold_db"): _lane((0.0, -10.0), (2.0, -30.0))},
        )
        s.master_effects = EffectChain([Limiter(-0.5)])
        s.master_automation = {(0, "ceiling_db"): _lane((0.0, -0.5), (1.0, -6.0))}

        p = tmp_path / "auto.wb"
        write_project(s, p)
        s2 = read_project(p)

        a2 = s2.tracks[0].automation
        assert set(a2.effects.keys()) == {(0, "freq_hz"), (1, "threshold_db")}
        lane = a2.effects[(0, "freq_hz")]
        assert [(pt.x, pt.y) for pt in lane.points] == [(0.0, 4000.0), (1.5, 500.0)]
        assert set(s2.master_automation.keys()) == {(0, "ceiling_db")}
        assert a2.volume is not None  # track lanes still round-trip

    def test_undo_command(self):
        from whitebox_tpu.session.history import CommandManager, SetEffectAutomation
        from whitebox_tpu.session.session import Session
        from whitebox_tpu.session.track import Track

        s = Session()
        s.tracks.append(Track(name="t0"))
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 2000.0)])
        mgr = CommandManager(s)
        mgr.execute(SetEffectAutomation(track_idx=0, slot=0, param="freq_hz",
                                        points=[(0.0, 2000.0, 1, 0.0), (1.0, 300.0, 1, 0.0)]))
        assert (0, "freq_hz") in s.tracks[0].automation.effects
        mgr.undo()
        assert s.tracks[0].automation is None or \
            (0, "freq_hz") not in s.tracks[0].automation.effects
        mgr.redo()
        lane = s.tracks[0].automation.effects[(0, "freq_hz")]
        assert [(pt.x, pt.y) for pt in lane.points] == [(0.0, 2000.0), (1.0, 300.0)]
        # clearing is also undoable
        mgr.execute(SetEffectAutomation(track_idx=0, slot=0, param="freq_hz", points=None))
        assert (0, "freq_hz") not in s.tracks[0].automation.effects
        mgr.undo()
        assert (0, "freq_hz") in s.tracks[0].automation.effects


class TestCompilePolicy:
    """auto_chunk_frames closes the 'compressor at 1<<17 compiles >9 min'
    folklore: heavy chains get smaller chunks (more lax.scan iterations in
    the SAME program, no extra dispatches)."""

    def test_auto_chunk_shrinks_for_heavy_chains(self):
        from whitebox_tpu.render.effects_generic import auto_chunk_frames

        s = _base_session(40, 2, 4096)
        s.tracks[0].effects = EffectChain([Gain(-3.0)])
        fx = prepare_generic_fx(s, RATE)
        assert auto_chunk_frames(fx) == 1 << 16  # cheap chain: full chunk

        s.tracks[0].effects = EffectChain([Compressor(-18.0, 4.0)])
        fx = prepare_generic_fx(s, RATE)
        assert auto_chunk_frames(fx) <= 1 << 14  # scan-heavy: capped

        s.tracks[1].effects = EffectChain([Limiter(-1.0), NoiseGate(-40.0),
                                           Compressor(-20.0, 3.0)])
        fx = prepare_generic_fx(s, RATE)
        assert auto_chunk_frames(fx) <= 1 << 13

    def test_generic_compressor_compile_budget(self):
        """A 1<<17-frame compressor render at the auto chunk compiles well
        inside 60 s on CPU (was >9 min at chunk=1<<17)."""
        import time

        s = _base_session(41, 1, 4096)
        s.tracks[0].effects = EffectChain([Compressor(-18.0, 4.0)])
        fx = prepare_generic_fx(s, RATE)
        fin = make_generic_finisher(fx, 1, 2)  # chunk = auto
        pt = jnp.asarray(_noise((1, 2, 1 << 17), seed=42))
        t0 = time.monotonic()
        np.asarray(fin(pt, _track_gain(s, 2)))  # trace + compile + run
        elapsed = time.monotonic() - t0
        assert elapsed < 60.0, f"generic compressor compile took {elapsed:.1f}s"


class TestMidiCC:
    """CC / PolyPressure events (event.h:41-62) + CC -> param-lane routing."""

    def _buf_with_cc(self):
        from whitebox_tpu.midi.notes import MidiCCEvent, MidiNote, MidiNoteBuffer, MidiPolyPressureEvent

        notes = [MidiNote(0.0, 1.0, key=60, velocity=0.8)]
        cc = [MidiCCEvent(0.0, 1, 0.0), MidiCCEvent(1.0, 1, 0.5),
              MidiCCEvent(2.0, 1, 1.0), MidiCCEvent(0.5, 7, 0.3)]
        pp = [MidiPolyPressureEvent(0.25, 60, 0.6)]
        return MidiNoteBuffer(notes, cc=cc, poly_pressure=pp)

    def test_smf_roundtrip_cc(self, tmp_path):
        from whitebox_tpu.midi.smf import load_notes_from_file, write_smf

        buf = self._buf_with_cc()
        p = tmp_path / "cc.mid"
        write_smf(buf, p)
        buf2 = load_notes_from_file(p)
        assert [(e.time, e.controller) for e in buf2.cc] == \
            [(0.0, 1), (0.5, 7), (1.0, 1), (2.0, 1)]
        np.testing.assert_allclose([e.value for e in buf2.cc if e.controller == 1],
                                   [0.0, 0.5, 1.0], atol=1 / 127)
        assert len(buf2.poly_pressure) == 1 and buf2.poly_pressure[0].key == 60
        assert len(buf2.notes) == 1

    def test_cc_lane_mapping_and_render(self):
        """Mod wheel -> Biquad cutoff: the installed lane drives the
        device render and matches the automation-aware host reference."""
        from whitebox_tpu.midi.cc import apply_cc_map
        from whitebox_tpu.session.session import Session
        from whitebox_tpu.session.track import Track
        from whitebox_tpu.session.clip import Clip, ClipType, MidiClipData

        s = Session(bpm=120.0)
        s.tracks.append(Track(name="lead"))
        buf = self._buf_with_cc()
        asset = s.midi_table.create_midi(buf)
        clip = Clip(id=0, type=ClipType.MIDI, min_time=0.0, max_time=2.5)
        clip.midi = MidiClipData(asset=asset, rate=1)
        s.tracks[0].clips.append(clip)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 8000.0, 1.0)])

        installed = apply_cc_map(s, 0, {1: (0, "freq_hz", 200.0, 8000.0)})
        assert installed == [(0, "freq_hz")]
        lane = s.tracks[0].automation.effects[(0, "freq_hz")]
        assert [(pt.x, pt.y) for pt in lane.points] == \
            [(0.0, 200.0), (1.0, 4100.0), (2.0, 8000.0)]

        F = PARAM_BLOCK * 16
        pt = _noise((1, 2, F), seed=95)
        out = _finish(s, pt)
        ref = reference_generic_finish(pt, s, RATE)
        assert rms(out - ref) / max(rms(ref), 1e-6) < 2e-4

    def test_cc_hold_last_before_window(self):
        """An event before the clip window seeds the clip-start value."""
        from whitebox_tpu.midi.cc import cc_lane_for_track
        from whitebox_tpu.midi.notes import MidiCCEvent, MidiNoteBuffer
        from whitebox_tpu.session.session import Session
        from whitebox_tpu.session.track import Track
        from whitebox_tpu.session.clip import Clip, ClipType, MidiClipData

        s = Session(bpm=120.0)
        s.tracks.append(Track())
        buf = MidiNoteBuffer([], cc=[MidiCCEvent(0.2, 1, 0.25), MidiCCEvent(1.5, 1, 0.75)])
        asset = s.midi_table.create_midi(buf)
        clip = Clip(id=0, type=ClipType.MIDI, min_time=4.0, max_time=6.0, start_offset=1.0)
        clip.midi = MidiClipData(asset=asset, rate=1)
        s.tracks[0].clips.append(clip)
        # asset times map to 4.0 - 1.0 + t: 0.2 -> 3.2 (before window, holds
        # at 4.0), 1.5 -> 4.5 (inside)
        lane = cc_lane_for_track(s.tracks[0], 1, lo=0.0, hi=1.0)
        assert [(pt.x, round(pt.y, 4)) for pt in lane.points] == [(4.0, 0.25), (4.5, 0.75)]

    def test_wb_roundtrip_cc(self, tmp_path):
        from whitebox_tpu.session.project import read_project, write_project
        from whitebox_tpu.session.session import Session
        from whitebox_tpu.session.track import Track
        from whitebox_tpu.session.clip import Clip, ClipType, MidiClipData

        s = Session(bpm=120.0)
        s.tracks.append(Track())
        buf = self._buf_with_cc()
        asset = s.midi_table.create_midi(buf)
        clip = Clip(id=0, type=ClipType.MIDI, min_time=0.0, max_time=2.0)
        clip.midi = MidiClipData(asset=asset)
        s.tracks[0].clips.append(clip)
        p = tmp_path / "cc.wb"
        write_project(s, p)
        s2 = read_project(p)
        buf2 = s2.midi_table.midi_assets[0].notes
        assert [(e.time, e.controller, e.value) for e in buf2.cc] == \
            [(e.time, e.controller, e.value) for e in buf.cc]
        assert [(e.time, e.key, e.pressure) for e in buf2.poly_pressure] == \
            [(e.time, e.key, e.pressure) for e in buf.poly_pressure]


class TestShardedAutomation:
    @pytest.mark.slow
    def test_bounce_sharded_with_effect_automation(self):
        """Timed effect-param lanes render identically on the 8-device
        frames mesh: per-frame lanes evaluate at global frame indices;
        TV-biquad z-state hands off across shards (tv_inject)."""
        import jax

        from whitebox_tpu.parallel.mesh import make_render_mesh
        from whitebox_tpu.parallel.render_sharded import bounce_sharded
        from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

        assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
        s = random_session(90, rate=48000, bpm=120.0, n_tracks=3, n_clips=1)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 7000.0, 1.0)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "freq_hz"): _lane((0.0, 7000.0), (1.0, 350.0))})
        s.tracks[1].effects = EffectChain([Compressor(-18.0, 4.0)])
        s.tracks[1].automation = TrackAutomation(
            effects={(0, "threshold_db"): _lane((0.0, -6.0), (1.0, -30.0))})
        s.tracks[2].effects = EffectChain([Gain(0.0)])
        s.tracks[2].automation = TrackAutomation(
            effects={(0, "gain_db"): _lane((0.0, -24.0), (1.0, 0.0))})

        fmesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
        multi = bounce_sharded(s, 48000.0, fmesh)

        table, pool = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        pt = render_segments_per_track_numpy(table, pool, 2)
        Fp = multi.shape[1]
        pt = np.pad(pt, ((0, 0), (0, 0), (0, max(Fp - pt.shape[2], 0))))[:, :, :Fp]
        ref = reference_generic_finish(pt, s, 48000.0)
        scale = max(rms(ref), 1e-6)
        err = rms(multi - ref) / scale
        assert err < 5e-4, f"sharded automation rel err {err}"


class TestBounceIntegration:
    @pytest.mark.slow
    def test_bounce_with_effect_automation(self):
        """End to end through bounce(): carve -> render -> automated chains."""
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

        s = random_session(71, rate=48000, bpm=120.0, n_tracks=3, n_clips=1)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 6000.0, 1.1)])
        s.tracks[0].automation = TrackAutomation(
            effects={(0, "freq_hz"): _lane((0.0, 6000.0), (1.0, 400.0))})
        s.tracks[1].effects = EffectChain([Compressor(-20.0, 3.0)])
        s.tracks[1].automation = TrackAutomation(
            effects={(0, "threshold_db"): _lane((0.0, -8.0), (1.0, -28.0))})
        res = bounce(s, RATE, engine="xla", chunk_frames=8192)
        table, pool = carve_session(s, RATE, buffer_size=512)
        pt = render_segments_per_track_numpy(table, pool)
        ref = reference_generic_finish(pt, s, RATE)
        scale = max(rms(ref), 1e-6)
        err = rms(res.audio[:, : ref.shape[1]] - ref) / scale
        assert err < 5e-4, f"relative rms err {err}"
