"""MIDI: voice allocation, event carving, synth rendering, SMF parsing."""

import numpy as np
import pytest

from whitebox_tpu.core.math import note_to_hz
from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer, MidiNoteFlags
from whitebox_tpu.midi.smf import load_notes_from_file, parse_smf, write_smf
from whitebox_tpu.midi.synth import (
    ENV_SPEED, build_slot_segments, pack_slot_tables, render_synth_numpy, step32_for_key,
)
from whitebox_tpu.midi.voice import MAX_VOICES, MidiVoiceState, carve_midi_events
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.session import Session

RATE = 32768.0  # exact grid
BPM = 60.0


def midi_session(notes, *, bpm=BPM, transpose=0, rate=1, clip_span=(0.0, 8.0), start_offset=0.0):
    s = Session(bpm=bpm)
    asset = s.midi_table.create_midi(MidiNoteBuffer(notes))
    tr = s.add_track("m")
    s.add_midi_clip(tr, "c", clip_span[0], clip_span[1], start_offset=start_offset,
                    asset=asset, transpose=transpose, rate=rate)
    return s, tr


class TestVoiceState:
    def test_release_earliest(self):
        st = MidiVoiceState()
        st.add_voice(2.0, 1.0, 60)
        st.add_voice(1.0, 1.0, 62)
        st.add_voice(3.0, 1.0, 64)
        v = st.release_voice(5.0)
        assert v.key == 62  # earliest-ending
        assert st.release_voice(0.5) is None  # none within timeout

    def test_slot_reuse_lowest_free(self):
        st = MidiVoiceState()
        a = st.add_voice(1.0, 1.0, 60)
        b = st.add_voice(2.0, 1.0, 62)
        assert (a.slot, b.slot) == (0, 1)
        st.release_voice(1.5)  # releases a (slot 0)
        c = st.add_voice(3.0, 1.0, 64)
        assert c.slot == 0  # lowest free bit

    def test_overflow(self):
        st = MidiVoiceState()
        for i in range(MAX_VOICES):
            assert st.add_voice(10.0, 1.0, i) is not None
        assert st.add_voice(10.0, 1.0, 99) is None


class TestCarving:
    def test_basic_note_frames(self):
        # note at beat 1 for 1 beat @60bpm/32768: frames 32768..65536
        s, tr = midi_session([MidiNote(1.0, 2.0, key=69, velocity=0.8)])
        evs = carve_midi_events(s, RATE, buffer_size=256)[0]
        ons = [e for e in evs if e.on]
        offs = [e for e in evs if not e.on]
        assert len(ons) == 1 and len(offs) == 1
        # beat 1.0 lands exactly on a block edge: the engine emits the event
        # in the block whose END is the boundary, with offset % block == 0 —
        # one block early (same quirk as audio clip edges; faithful).
        assert ons[0].frame == 32768 - 256 and ons[0].key == 69
        assert offs[0].frame == 65536 - 256
        assert ons[0].slot == 0

    def test_transpose_and_muted(self):
        notes = [MidiNote(0.0, 1.0, key=60, velocity=1.0),
                 MidiNote(1.0, 2.0, key=62, velocity=1.0, flags=int(MidiNoteFlags.MUTED))]
        s, tr = midi_session(notes, transpose=12)
        evs = carve_midi_events(s, RATE, buffer_size=256)[0]
        ons = [e for e in evs if e.on]
        assert len(ons) == 1 and ons[0].key == 72  # transposed; muted skipped

    def test_rate_scales_time(self):
        s, tr = midi_session([MidiNote(2.0, 4.0, key=60, velocity=1.0)], rate=2)
        evs = carve_midi_events(s, RATE, buffer_size=256)[0]
        on = [e for e in evs if e.on][0]
        assert on.frame == 32768 - 256  # note time * (1/2); block-edge quirk

    def test_clip_end_caps_notes(self):
        s, tr = midi_session([MidiNote(0.0, 10.0, key=60, velocity=1.0)], clip_span=(0.0, 2.0))
        evs = carve_midi_events(s, RATE, buffer_size=256)[0]
        off = [e for e in evs if not e.on][0]
        assert off.frame <= 2 * 32768

    def test_polyphony_slots(self):
        notes = [MidiNote(0.0, 4.0, key=60 + i, velocity=1.0) for i in range(4)]
        s, tr = midi_session(notes)
        evs = carve_midi_events(s, RATE, buffer_size=256)[0]
        slots = sorted(e.slot for e in evs if e.on)
        assert slots == [0, 1, 2, 3]

    def test_start_offset_skips_notes(self):
        notes = [MidiNote(0.0, 1.0, key=60, velocity=1.0), MidiNote(2.0, 3.0, key=64, velocity=1.0)]
        s, tr = midi_session(notes, start_offset=1.5)
        evs = carve_midi_events(s, RATE, buffer_size=256)[0]
        ons = [e for e in evs if e.on]
        assert [e.key for e in ons] == [64]


class TestSynth:
    def test_square_wave_shape(self):
        # one A4 voice: square with period rate/440*2... check sign flips + decay
        segs = {"slot": np.array([0]), "start": np.array([0]), "end": np.array([8192]),
                "key": np.array([69]), "vel": np.array([1.0], np.float32)}
        out = render_synth_numpy(segs, 48000.0, 8192, 1)
        assert set(np.sign(out[:100])) <= {-1.0, 1.0}
        assert abs(out[0]) == pytest.approx(0.5, abs=1e-6)  # amp 1 * vel 1 * 0.5
        # decay envelope after 4410 samples: amp = 0.5
        n = 4410
        assert abs(out[n]) == pytest.approx(0.5 * (1 - n * float(ENV_SPEED)), rel=1e-3)

    def test_device_matches_numpy(self):
        import jax.numpy as jnp
        from whitebox_tpu.midi.synth import render_synth_chunk

        rng = np.random.default_rng(0)
        rows = []
        pos = 0
        for i in range(10):
            a = pos + int(rng.integers(0, 400))
            b = a + int(rng.integers(100, 3000))
            rows.append((int(rng.integers(0, 4)), a, b, int(rng.integers(40, 90)), float(rng.uniform(0.3, 1.0))))
            pos = a + 200
        # make per-slot rows non-overlapping: sort and clamp
        by_slot = {}
        segs = {"slot": [], "start": [], "end": [], "key": [], "vel": []}
        for sl, a, b, k, v in sorted(rows):
            if sl in by_slot and a < by_slot[sl]:
                a = by_slot[sl]
            if b <= a:
                continue
            by_slot[sl] = b
            segs["slot"].append(sl); segs["start"].append(a); segs["end"].append(b)
            segs["key"].append(k); segs["vel"].append(v)
        segs = {k: np.asarray(v) for k, v in segs.items()}
        segs["vel"] = segs["vel"].astype(np.float32)

        F = 8192
        ref = render_synth_numpy(segs, 48000.0, F, 4)
        tables = pack_slot_tables(segs, 48000.0, 4)
        got = np.asarray(render_synth_chunk({k: jnp.asarray(v) for k, v in tables.items()}, jnp.int32(0), frames=F))
        # XLA contracts mul/add chains into FMAs: allow 1 ulp, or tiny
        # absolute differences where voice sums cancel
        ulps = np.abs(got.view(np.int32).astype(np.int64) - ref.view(np.int32).astype(np.int64))
        absd = np.abs(got.astype(np.float64) - ref.astype(np.float64))
        bad = (ulps > 1) & (absd > 1e-6)
        assert not bad.any(), f"max ulp {ulps.max()} max abs {absd.max()}"

    def test_step32(self):
        st = step32_for_key(np.array([69]), 48000.0)[0]
        assert st == round(440.0 / 48000.0 * 2**32)


class TestEndToEnd:
    @pytest.mark.slow
    def test_midi_bounce_produces_tone(self):
        s, tr = midi_session([MidiNote(0.0, 2.0, key=69, velocity=1.0)], clip_span=(0.0, 4.0))
        res = bounce(s, RATE, buffer_size=256, engine="xla")
        a = res.audio
        # tone present in first 2 beats, silent after (plus envelope decay)
        assert np.abs(a[:, :2000]).max() > 0.3
        assert np.abs(a[:, 3 * 32768 :]).max() == 0.0
        # both channels identical pre-pan (center pan: equal)
        np.testing.assert_array_equal(a[0], a[1])

    @pytest.mark.slow
    def test_midi_and_audio_mix(self):
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.session.sample import Sample

        s, tr = midi_session([MidiNote(0.0, 1.0, key=60, velocity=0.5)], clip_span=(0.0, 2.0))
        sample = Sample.from_planar(np.full((1, 32768), 0.25, np.float32), int(RATE), AudioFormat.F32)
        asset = s.sample_table.add_sample(sample, key="a")
        tr2 = s.add_track("audio")
        s.add_audio_clip(tr2, "c", 0.0, 1.0, asset=asset)
        res = bounce(s, RATE, buffer_size=256, engine="xla")
        assert np.abs(res.audio).max() > 0.3  # both sources audible


class TestSMF:
    def test_roundtrip(self, tmp_path):
        notes = MidiNoteBuffer([
            MidiNote(0.0, 1.0, key=60, velocity=100 / 127.0),
            MidiNote(0.5, 2.0, key=64, velocity=80 / 127.0),
            MidiNote(2.0, 2.25, key=67, velocity=1.0),
        ])
        p = tmp_path / "t.mid"
        write_smf(notes, p)
        back = load_notes_from_file(p)
        assert len(back) == 3
        got = sorted((n.min_time, n.max_time, n.key) for n in back)
        want = sorted((n.min_time, n.max_time, n.key) for n in notes)
        for g, w in zip(got, want):
            assert g[2] == w[2]
            assert g[0] == pytest.approx(w[0], abs=1 / 480)
            assert g[1] == pytest.approx(w[1], abs=1 / 480)

    def test_running_status_and_vel0_noteoff(self):
        import struct
        # manual SMF with running status and vel-0 note-offs
        body = bytearray()
        body += b"\x00\x90\x3c\x64"  # t=0 note on C4
        body += b"\x60\x3c\x00"      # t=96 running-status vel 0 -> off
        body += b"\x00\xff\x2f\x00"
        blob = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96) + b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
        nb = parse_smf(blob)
        assert len(nb) == 1
        assert nb[0].min_time == 0.0 and nb[0].max_time == 1.0 and nb[0].key == 0x3C


class TestSMFTempo:
    def test_tempo_meta_roundtrip(self, tmp_path):
        from whitebox_tpu.midi.smf import tempo_map_from_smf

        notes = MidiNoteBuffer([MidiNote(0.0, 1.0, key=60, velocity=0.8)])
        p = tmp_path / "t.mid"
        write_smf(notes, p, tempo=[(0.0, 120.0), (4.0, 60.0)])
        back = load_notes_from_file(p)
        assert back.tempo == [(0.0, 120.0), (4.0, 60.0)]
        tm = tempo_map_from_smf(back)
        assert tm is not None
        assert tm.bpm_at(0.0) == pytest.approx(120.0, rel=1e-6)
        assert tm.bpm_at(5.0) == pytest.approx(60.0, rel=1e-6)

    def test_no_tempo_metas_gives_none(self, tmp_path):
        from whitebox_tpu.midi.smf import tempo_map_from_smf

        notes = MidiNoteBuffer([MidiNote(0.0, 1.0, key=60, velocity=0.8)])
        p = tmp_path / "t.mid"
        write_smf(notes, p)
        back = load_notes_from_file(p)
        assert back.tempo == []
        assert tempo_map_from_smf(back) is None

    def test_manual_set_tempo_meta(self):
        import struct
        # FF 51 03 07 A1 20 = 500000 usec/quarter = 120 bpm at t=0,
        # then 0F 42 40 = 1000000 usec = 60 bpm at beat 2 (div 96)
        body = bytearray()
        body += b"\x00\xff\x51\x03\x07\xa1\x20"
        body += b"\x81\x40"  # varlen 192
        body += b"\xff\x51\x03\x0f\x42\x40"
        body += b"\x00\xff\x2f\x00"
        blob = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
                + b"MTrk" + struct.pack(">I", len(body)) + bytes(body))
        nb = parse_smf(blob)
        assert [(b, round(v, 3)) for b, v in nb.tempo] == [(0.0, 120.0), (2.0, 60.0)]
