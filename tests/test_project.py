"""wbpr project round-trip (the reference's own test_project.cpp is an empty
TODO, SURVEY §4 — this is the coverage it never had)."""

import numpy as np

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.io import wav
from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
from whitebox_tpu.session import Session
from whitebox_tpu.session.project import read_project, write_project
from whitebox_tpu.session.sample import Sample


def _make_session(tmp_path):
    wav_path = tmp_path / "kick.wav"
    wav.write_wav(wav_path, (np.sin(np.arange(4800) / 20.0) * 0.5).astype(np.float32)[None, :], 48000, AudioFormat.F32)

    s = Session(bpm=133.5)
    s.project_info.title = "demo"
    s.project_info.author = "wbtpu"
    asset = s.sample_table.load_from_file(wav_path)

    tr = s.add_track("drums", volume_db=-6.0, pan=0.25, mute=False)
    s.add_audio_clip(tr, "kick", 0.0, 4.0, 100.0, asset=asset, gain=0.9, speed=1.5, fade_start=0.5, fade_end=0.25)

    midi = s.midi_table.create_midi(
        MidiNoteBuffer([MidiNote(0.0, 1.0, key=60, velocity=0.8), MidiNote(1.0, 2.0, key=64, velocity=0.5)])
    )
    tr2 = s.add_track("keys", volume_db=0.0, pan=-0.5, mute=True, solo=False)
    s.add_midi_clip(tr2, "chords", 0.0, 8.0, asset=midi, transpose=2, rate=1)
    return s, wav_path


class TestProjectRoundtrip:
    def test_roundtrip(self, tmp_path):
        s, _ = _make_session(tmp_path)
        p = tmp_path / "proj.wb"
        write_project(s, p)
        r = read_project(p)

        assert r.bpm == 133.5
        assert r.project_info.title == "demo" and r.project_info.author == "wbtpu"
        assert [t.name for t in r.tracks] == ["drums", "keys"]
        t0, t1 = r.tracks
        assert t0.volume_db == -6.0 and t0.pan == 0.25
        assert t1.mute is True

        c0 = t0.clips[0]
        assert c0.is_audio()
        assert (c0.min_time, c0.max_time, c0.start_offset) == (0.0, 4.0, 100.0)
        assert np.float32(c0.audio.gain) == np.float32(0.9)
        assert c0.audio.speed == 1.5
        assert c0.audio.fade_start == 0.5 and c0.audio.fade_end == 0.25
        assert c0.audio.asset.sample.count == 4800

        c1 = t1.clips[0]
        assert c1.is_midi()
        assert c1.midi.transpose == 2
        notes = c1.midi.asset.notes
        assert len(notes) == 2
        assert notes[0].key == 60 and notes[1].key == 64
        assert notes[1].velocity == 0.5

    def test_sample_relocation(self, tmp_path):
        s, wav_path = _make_session(tmp_path)
        p = tmp_path / "proj.wb"
        write_project(s, p)
        # Move the sample into a subdirectory; reader must relocate it.
        sub = tmp_path / "sub" / "deep"
        sub.mkdir(parents=True)
        wav_path.rename(sub / "kick.wav")
        r = read_project(p)
        assert r.tracks[0].clips[0].audio.asset is not None
        assert r.tracks[0].clips[0].audio.asset.sample.count == 4800

    def test_missing_sample_is_none(self, tmp_path):
        s, wav_path = _make_session(tmp_path)
        p = tmp_path / "proj.wb"
        write_project(s, p)
        wav_path.unlink()
        r = read_project(p)
        assert r.tracks[0].clips[0].audio is None  # asset_id valid but sample missing -> skipped

    def test_msgpack_layout_keys(self, tmp_path):
        import msgpack

        s, _ = _make_session(tmp_path)
        p = tmp_path / "proj.wb"
        write_project(s, p)
        doc = msgpack.unpackb(p.read_bytes(), raw=False)
        wbpr = doc["wbpr"]
        assert set(wbpr) == {
            "version", "bpm", "playhead_pos", "timeline_view_min", "timeline_view_max",
            "main_vol", "project_info", "sample_table", "midi_table", "tracks",
        }
        track_keys = set(wbpr["tracks"][0])
        assert track_keys == {"name", "col", "height", "vol", "pan", "mute", "solo", "shown", "clips"}
        clip = wbpr["tracks"][0]["clips"][0]
        assert set(clip) == {"type", "name", "col", "active", "start", "end", "ofs", "data"}
        assert wbpr["midi_table"][0]["notes"][0][2] == 60  # [min,max,key,flags,vel]


class TestExtensionPersistence:
    def test_effects_and_automation_roundtrip(self, tmp_path):
        from whitebox_tpu.effects import Biquad, EffectChain, Gain, ParametricEQ
        from whitebox_tpu.ops.automation import AutomationLane, CurveType, TrackAutomation

        s, _ = _make_session(tmp_path)
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 2000.0, q=1.2), Gain(-4.5)])
        s.tracks[1].effects = EffectChain([ParametricEQ([("lowshelf", 100.0, 0.707, 3.0)])])
        s.tracks[0].automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(2.0, 0.5, CurveType.EXP_EASE, 0.8),
            pan=AutomationLane().add(0.0, -1.0).add(4.0, 1.0),
        )
        s.master_effects = EffectChain([Biquad("highpass", 30.0)])
        p = tmp_path / "fx.wb"
        write_project(s, p)
        r = read_project(p)

        fx0 = r.tracks[0].effects.effects
        assert fx0[0].name == "biquad" and fx0[0].freq_hz == 2000.0 and fx0[0].q == 1.2
        assert fx0[1].name == "gain" and fx0[1].gain_db == -4.5
        assert r.tracks[1].effects.effects[0].bands[0][1] == 100.0
        auto = r.tracks[0].automation
        assert auto.volume.points[1].curve == CurveType.EXP_EASE
        assert auto.volume.points[1].tension == 0.8
        assert auto.pan.points[0].y == -1.0
        assert r.master_effects.effects[0].freq_hz == 30.0

    def test_plain_project_has_no_extension_keys(self, tmp_path):
        import msgpack

        s, _ = _make_session(tmp_path)
        p = tmp_path / "plain.wb"
        write_project(s, p)
        doc = msgpack.unpackb(p.read_bytes(), raw=False)
        assert "fx" not in doc["wbpr"]["tracks"][0]
        assert "auto" not in doc["wbpr"]["tracks"][0]
