"""Tempo-map session integration: carve/oracle/bounce/MIDI/automation under
piecewise tempo (framework extension — the reference has one session bpm,
engine.cpp:24; core/tempo.py defines the mapped semantics)."""

import io

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.core.tempo import TempoMap, TempoPoint
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.session import Session
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.carve import carve_session, render_segments_numpy
from whitebox_tpu.timeline.oracle import OracleRenderer

RATE = 48000.0


def _mono_asset(s, n=6000, seed=0, key="a", src_rate=48000):
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal((1, n)) * 0.4).astype(np.float32)
    return s.sample_table.add_sample(
        Sample.from_planar(data, src_rate, AudioFormat.F32, name=key), key=key)


def _render_pair(s, buffer_size=512):
    oracle = OracleRenderer(s, RATE, buffer_size=buffer_size).render()
    table, pool = carve_session(s, RATE, buffer_size=buffer_size,
                                num_blocks=oracle.shape[1] // buffer_size)
    ours = render_segments_numpy(table, pool, s)
    return oracle, ours


class TestMappedParity:
    def test_step_map_carve_matches_oracle_bit_exact(self):
        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        a = _mono_asset(s, 9000)
        tr = s.add_track("t", volume_db=-3.0, pan=0.2)
        # clips before, straddling, and after the tempo change
        s.add_audio_clip(tr, "pre", 0.5, 2.0, asset=a, gain=0.8)
        s.add_audio_clip(tr, "straddle", 3.0, 5.0, asset=a, gain=0.7)
        s.add_audio_clip(tr, "post", 6.0, 7.5, asset=a, gain=0.9)
        oracle, ours = _render_pair(s)
        np.testing.assert_array_equal(ours[:, : oracle.shape[1]], oracle)

    def test_linear_ramp_carve_matches_oracle(self):
        s = Session(bpm=128.0)
        s.set_tempo_point(0.0, 128.0, curve="linear")
        s.set_tempo_point(8.0, 64.0)
        a = _mono_asset(s, 12000, seed=3)
        tr = s.add_track("t", volume_db=0.0)
        s.add_audio_clip(tr, "c0", 0.25, 3.0, asset=a)
        s.add_audio_clip(tr, "c1", 5.0, 9.0, asset=a, gain=0.5)
        oracle, ours = _render_pair(s)
        np.testing.assert_array_equal(ours[:, : oracle.shape[1]], oracle)

    def test_mapped_resampled_clip(self):
        s = Session(bpm=100.0)
        s.set_tempo_point(2.0, 140.0)
        a = _mono_asset(s, 20000, seed=5, src_rate=44100)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.5, 6.0, asset=a, speed=1.25)
        oracle, ours = _render_pair(s)
        # resampled contract: <= 1 ulp between blockwise paths
        d = np.abs(ours[:, : oracle.shape[1]].astype(np.float64) - oracle)
        assert d.max() <= 2.4e-7

    def test_mapped_playhead_start_mid_clip(self):
        s = Session(bpm=120.0)
        s.set_tempo_point(3.0, 90.0)
        a = _mono_asset(s, 30000, seed=7)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 1.0, 8.0, asset=a)
        s.set_playhead_position(2.5)
        oracle, ours = _render_pair(s)
        np.testing.assert_array_equal(ours[:, : oracle.shape[1]], oracle)

    def test_constant_map_demotes_to_legacy_bit_exact(self):
        # one-point map == no map, bit for bit (transport demotion)
        s = random_session(11, rate=48000, bpm=117.0, n_tracks=3)
        ref_oracle = OracleRenderer(s, RATE, buffer_size=512).render()
        s.tempo_map = TempoMap([TempoPoint(0.0, 117.0)])
        got = OracleRenderer(s, RATE, buffer_size=512).render()
        np.testing.assert_array_equal(got, ref_oracle)
        # carve too
        s.tempo_map = None
        t1, p1 = carve_session(s, RATE, buffer_size=512, num_blocks=200)
        s.tempo_map = TempoMap([TempoPoint(0.0, 117.0)])
        t2, p2 = carve_session(s, RATE, buffer_size=512, num_blocks=200)
        np.testing.assert_array_equal(
            render_segments_numpy(t1, p1, s), render_segments_numpy(t2, p2, s))


class TestMappedPositions:
    def test_step_map_event_frame_placement(self):
        # 120 bpm for 4 beats (2.0 s), clip at beat 4 starts at exactly 2.0s
        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        a = _mono_asset(s, 60000, seed=1)  # long enough to reach the stop
        tr = s.add_track("t", volume_db=0.0, pan=0.0)
        s.add_audio_clip(tr, "c", 4.0, 5.0, asset=a, gain=1.0)
        oracle = OracleRenderer(s, RATE, buffer_size=512).render()
        onset = int(np.argmax(np.abs(oracle[0]) > 0))
        assert onset == int(2.0 * RATE)
        # and the clip spans one beat at 60 bpm = exactly 1.0 s (the stop
        # event lands on the exact mapped frame — no %bufsize early wrap)
        tail = int(np.max(np.nonzero(np.abs(oracle[0]) > 0)))
        assert tail - onset + 1 == int(1.0 * RATE)

    def test_clip_length_beats_inversion(self):
        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        # placed straddling the change: beat length reflects the integral
        n = 96000  # 2.0 s
        length = s.clip_length_beats(n, RATE, at_beat=3.0)
        # 1 beat at 120 (0.5 s) + remaining 1.5 s at 60 bpm = 1.5 beats
        assert length == pytest.approx(2.5, abs=1e-12)
        # unmapped keeps the legacy arithmetic
        s2 = Session(bpm=120.0)
        assert s2.clip_length_beats(n, RATE) == pytest.approx(4.0, abs=0)

    def test_midi_voice_events_mapped(self):
        from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
        from whitebox_tpu.midi.voice import carve_midi_events

        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        buf = MidiNoteBuffer([MidiNote(min_time=0.0, max_time=1.0, key=60, velocity=0.9),
                              MidiNote(min_time=4.5, max_time=5.0, key=64, velocity=0.9)])
        asset = s.midi_table.create_midi(buf)
        tr = s.add_track("m")
        s.add_midi_clip(tr, "mc", 0.0, 8.0, asset=asset)
        ev = carve_midi_events(s, RATE, buffer_size=512)[0]
        on_frames = {e.key: e.frame for e in ev if e.on}
        assert on_frames[60] == 0
        # beat 4.5 = 2.0 s + 0.5 beat at 60 bpm = 2.5 s
        assert on_frames[64] == int(2.5 * RATE)

    def test_automation_lane_positions_mapped(self):
        from whitebox_tpu.ops.automation import AutomationLane, lane_frame_table

        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        lane = AutomationLane().add(2.0, 0.0).add(6.0, 1.0)
        xs, ys, cv, tn = lane_frame_table(lane, RATE, s.time_base, 2, 0.0)
        assert xs[0] == int(1.0 * RATE)  # beat 2 at 120 bpm
        assert xs[1] == int(4.0 * RATE)  # 2.0 s + 2 beats at 60 bpm


class TestMappedSurface:
    def test_wb_roundtrip_tempo_map(self):
        from whitebox_tpu.session.project import read_project, write_project

        s = Session(bpm=96.0)
        s.set_tempo_point(4.0, 120.0, curve="linear")
        s.set_tempo_point(8.0, 80.0)
        a = _mono_asset(s, 2000)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 2.0, asset=a)
        buf = io.BytesIO()
        # memory-only sample: route through a temp dir instead
        import tempfile
        from pathlib import Path

        from whitebox_tpu.io import wav

        with tempfile.TemporaryDirectory() as d:
            wav_path = Path(d) / "a.wav"
            wav.write_wav(wav_path, np.zeros((1, 100), np.float32), 48000, AudioFormat.F32)
            s2 = Session(bpm=96.0)
            s2.set_tempo_point(4.0, 120.0, curve="linear")
            s2.set_tempo_point(8.0, 80.0)
            asset = s2.sample_table.load_from_file(wav_path)
            tr2 = s2.add_track("t")
            s2.add_audio_clip(tr2, "c", 0.0, 2.0, asset=asset)
            p = Path(d) / "p.wb"
            write_project(s2, p)
            back = read_project(p)
            assert back.tempo_map == s2.tempo_map
            assert back.tempo_map.beats_to_seconds(8.0) == s2.tempo_map.beats_to_seconds(8.0)

    def test_undo_tempo_commands(self):
        from whitebox_tpu.session.history import (
            CommandManager, RemoveTempoPoint, SetBpm, SetTempoPoint,
        )

        s = Session(bpm=120.0)
        mgr = CommandManager(s)
        mgr.execute(SetTempoPoint(beat=4.0, bpm=60.0))
        assert s.tempo_map is not None and s.tempo_map.bpm_at(5.0) == 60.0
        mgr.execute(SetBpm(bpm=100.0))
        assert s.bpm == 100.0 and s.tempo_map.bpm_at(0.0) == 100.0
        mgr.undo()
        assert s.bpm == 120.0 and s.tempo_map.bpm_at(0.0) == 120.0
        mgr.undo()
        assert s.tempo_map is None
        mgr.redo()
        assert s.tempo_map is not None and s.tempo_map.bpm_at(5.0) == 60.0
        mgr.execute(RemoveTempoPoint(beat=4.0))
        assert s.tempo_map is None
        mgr.undo()
        assert s.tempo_map is not None

    def test_set_tempo_point_beat_zero_moves_session_bpm(self):
        s = Session(bpm=120.0)
        s.set_tempo_point(0.0, 90.0)
        assert s.bpm == 90.0
        assert s.beat_duration == pytest.approx(60.0 / 90.0)
        # a single point at beat 0 is a constant map
        assert s.tempo_map.is_constant

    def test_edit_stamp_tracks_tempo_edits(self):
        s = Session(bpm=120.0)
        a = _mono_asset(s, 1000)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 1.0, asset=a)
        st0 = s.edit_stamp()
        s.set_tempo_point(2.0, 80.0)
        st1 = s.edit_stamp()
        assert st1 != st0
        s.remove_tempo_point(2.0)
        assert s.edit_stamp() == st0

    def test_bounce_mapped_matches_oracle(self):
        s = Session(bpm=120.0)
        s.set_tempo_point(2.0, 80.0, curve="linear")
        s.set_tempo_point(6.0, 140.0)
        a = _mono_asset(s, 8000, seed=9)
        tr = s.add_track("t", volume_db=-2.0, pan=-0.4)
        s.add_audio_clip(tr, "c0", 0.0, 3.0, asset=a, gain=0.9)
        s.add_audio_clip(tr, "c1", 4.0, 7.0, asset=a, gain=0.6)
        oracle = OracleRenderer(s, RATE, buffer_size=512).render()
        res = bounce(s, RATE, buffer_size=512, engine="xla")
        np.testing.assert_array_equal(res.audio[:, : oracle.shape[1]], oracle)

    def test_preview_seek_mapped(self):
        from whitebox_tpu.render.preview import PreviewStream

        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        a = _mono_asset(s, 8000, seed=2)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 6.0, asset=a)
        pv = PreviewStream(s, RATE, buffer_size=512)
        pv.seek(5.0)  # 2.0 s + 1 beat at 60 bpm = 3.0 s
        assert pv.position_frames == int(3.0 * RATE)
        assert pv.position_beats == pytest.approx(5.0, abs=1e-9)


class TestMappedFadesAndLoops:
    def test_mapped_fade_lengths_follow_local_tempo(self):
        # clip at beat 4 under 120->60: a 0.5-beat fade-in there = 0.25 s
        # of beats... at 60 bpm a 0.5-beat fade spans 0.5 s = 24000 frames
        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        const = s.sample_table.add_sample(
            __import__("whitebox_tpu.session.sample", fromlist=["Sample"]).Sample.from_planar(
                np.full((1, 96000), 0.5, np.float32), 48000,
                AudioFormat.F32, name="const"), key="const")
        tr = s.add_track("t", volume_db=0.0, pan=0.0)
        s.add_audio_clip(tr, "c", 4.0, 5.5, asset=const, fade_start=0.5)
        res = bounce(s, RATE, buffer_size=512, engine="xla")
        a = res.audio[0]
        onset = int(2.0 * RATE)
        assert a[onset] == 0.0
        # halfway up the 24000-frame ramp at amplitude 0.5 -> 0.25
        assert a[onset + 12000] == pytest.approx(0.25, abs=1e-4)
        assert a[onset + 30000] == np.float32(0.5)  # past the ramp

    def test_mapped_loop_modes_match_oracle(self):
        from whitebox_tpu.session.clip import ClipMode

        for mode in (ClipMode.LOOP_STRAIGHT, ClipMode.LOOP_REVERSE,
                     ClipMode.LOOP_BIDIRECTIONAL):
            s = Session(bpm=120.0)
            s.set_tempo_point(3.0, 75.0)
            a = _mono_asset(s, 3000, seed=int(mode))
            tr = s.add_track("t")
            s.add_audio_clip(tr, "c", 0.5, 6.0, asset=a)
            tr.clips[0].audio.mode = mode
            oracle, ours = _render_pair(s)
            np.testing.assert_array_equal(
                ours[:, : oracle.shape[1]], oracle, err_msg=str(mode))


class TestMappedMidiEdges:
    def test_note_on_exact_block_edge(self):
        from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
        from whitebox_tpu.midi.voice import carve_midi_events

        # 120->60 at beat 4: beat 6.0 == frame 192000 == block 375 exactly
        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        buf = MidiNoteBuffer([MidiNote(min_time=6.0, max_time=6.5, key=60, velocity=0.9)])
        asset = s.midi_table.create_midi(buf)
        tr = s.add_track("m")
        s.add_midi_clip(tr, "mc", 0.0, 8.0, asset=asset)
        ev = carve_midi_events(s, RATE, buffer_size=512)[0]
        ons = [e for e in ev if e.on]
        assert len(ons) == 1  # no double-fire
        assert ons[0].frame == 192000  # exact, not a block early

    def test_clip_start_exact_block_edge_single_emission(self):
        from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
        from whitebox_tpu.midi.voice import carve_midi_events

        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        buf = MidiNoteBuffer([MidiNote(min_time=0.0, max_time=0.5, key=64, velocity=0.9)])
        asset = s.midi_table.create_midi(buf)
        tr = s.add_track("m")
        s.add_midi_clip(tr, "mc", 6.0, 7.0, asset=buf and asset)
        ev = carve_midi_events(s, RATE, buffer_size=512)[0]
        ons = [e for e in ev if e.on]
        offs = [e for e in ev if not e.on]
        assert len(ons) == 1 and len(offs) == 1
        assert ons[0].frame == 192000
        # note off at beat 6.5 = 2.0 s + 2.5 beats at 60 bpm = 4.5 s
        assert offs[0].frame == int(4.5 * RATE)


class TestReviewFixes:
    def test_split_across_tempo_change_is_seamless(self):
        # map 120->60 at beat 4, clip [0,8): splitting at beat 6 must leave
        # the audio identical to the unsplit render (exact integral shift —
        # a single local beat duration would jump the content by 1.0 s)
        s = Session(bpm=120.0)
        s.set_tempo_point(4.0, 60.0)
        a = _mono_asset(s, 48000 * 7, seed=13)
        tr = s.add_track("t", volume_db=0.0, pan=0.0)
        s.add_audio_clip(tr, "c", 0.0, 8.0, asset=a)
        ref = OracleRenderer(s, RATE, buffer_size=512).render()

        s.delete_region(tr, 5.0, 6.0)  # split [0,8) -> [0,5) + [6,8)
        assert len(tr.clips) == 2
        # right clip content anchor: exact mapped span of [0, 6) beats =
        # 2.0 s + 2 beats at 60 bpm = 4.0 s (a single local beat duration
        # would put it at 3.0 s or 6.0 s — a full second of seam)
        assert tr.clips[1].start_offset == pytest.approx(4.0 * RATE, abs=1e-6)
        got = OracleRenderer(s, RATE, buffer_size=512).render()
        n = min(ref.shape[1], got.shape[1])
        f6 = int(4.0 * RATE)  # beat 6 = 4.0 s
        np.testing.assert_array_equal(got[:, f6:n], ref[:, f6:n])
        assert np.all(got[:, int(3.0 * RATE) + 1 : f6] == 0)  # cleared region

    def test_set_bpm_preserves_beat0_linear_curve(self):
        s = Session(bpm=100.0)
        s.set_tempo_point(0.0, 100.0, curve="linear")
        s.set_tempo_point(4.0, 140.0)
        assert s.tempo_map.bpm_at(2.0) == pytest.approx(120.0)
        s.set_bpm(100.0)  # no-op BPM change must not flatten the ramp
        assert s.tempo_map.bpm_at(2.0) == pytest.approx(120.0)
        s.set_bpm(80.0)  # BPM moves, curve stays linear
        assert s.tempo_map.points[0].curve == "linear"
        assert s.tempo_map.bpm_at(2.0) == pytest.approx((80.0 + 140.0) / 2.0)

    def test_smf_equal_tick_tempo_override_later_wins(self):
        import struct

        from whitebox_tpu.midi.smf import parse_smf

        # two Set-Tempo metas at tick 0: 120 bpm then 90 bpm — later wins
        body = (b"\x00\xff\x51\x03\x07\xa1\x20"      # 500000 usec = 120
                b"\x00\xff\x51\x03\x0a\x2c\x2a"      # 666666 usec = 90.00009
                b"\x00\xff\x2f\x00")
        blob = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
                + b"MTrk" + struct.pack(">I", len(body)) + body)
        nb = parse_smf(blob)
        assert len(nb.tempo) == 1
        assert nb.tempo[0][1] == pytest.approx(90.0, abs=1e-3)


class TestMappedFuzz:
    def test_random_sessions_random_maps_bit_parity(self):
        """Randomized mapped parity: random clip layouts (speed 1) under
        random step/linear tempo maps — carve must bit-match the oracle."""
        for seed in range(6):
            rng = np.random.default_rng(100 + seed)
            s = random_session(200 + seed, rate=48000,
                               bpm=float(rng.uniform(70, 180)), n_tracks=3)
            # random map: 1-4 extra points, mixed curves
            for _ in range(int(rng.integers(1, 5))):
                s.set_tempo_point(float(rng.uniform(0.25, 12.0)),
                                  float(rng.uniform(50, 200)),
                                  curve=str(rng.choice(["step", "linear"])))
            oracle, ours = _render_pair(s)
            np.testing.assert_array_equal(
                ours[:, : oracle.shape[1]], oracle,
                err_msg=f"seed {seed} map {s.tempo_map}")

    def test_random_resampled_mapped_within_contract(self):
        for seed in range(3):
            rng = np.random.default_rng(300 + seed)
            s = random_session(400 + seed, rate=48000,
                               bpm=float(rng.uniform(80, 160)), n_tracks=2,
                               speeds=(0.75, 1.31), src_rates=(44100, 48000))
            s.set_tempo_point(float(rng.uniform(0.5, 6.0)), float(rng.uniform(60, 180)))
            oracle, ours = _render_pair(s)
            d = np.abs(ours[:, : oracle.shape[1]].astype(np.float64) - oracle)
            assert d.max() <= 2.4e-7, f"seed {seed}: {d.max()}"
