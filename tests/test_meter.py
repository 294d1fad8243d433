"""Meter (time-signature) map tests — bar|beat addressing (core/meter.py)."""

import numpy as np
import pytest

from whitebox_tpu.core.meter import DEFAULT_METER, MeterMap, MeterPoint
from whitebox_tpu.session import Session


class TestMeterMap:
    def test_default_44(self):
        m = DEFAULT_METER
        assert m.is_default
        assert m.bar_to_beat(3) == 12.0
        assert m.beat_to_bar(12.0) == 3.0
        assert m.signature_at(7) == (4, 4)

    def test_mixed_signatures(self):
        # 4/4 for 2 bars (8 beats), 3/4 for 2 bars (6 beats), then 7/8
        m = MeterMap([MeterPoint(0, 4, 4), MeterPoint(2, 3, 4), MeterPoint(4, 7, 8)])
        assert m.bar_to_beat(2) == 8.0
        assert m.bar_to_beat(4) == 14.0
        assert m.bar_to_beat(5) == pytest.approx(14.0 + 3.5)
        assert m.beat_to_bar(11.0) == pytest.approx(3.0)
        assert m.signature_at(4) == (7, 8)
        # fractional bars
        assert m.bar_to_beat(2.5) == pytest.approx(8.0 + 1.5)

    def test_roundtrip(self):
        m = MeterMap([MeterPoint(0, 4, 4), MeterPoint(3, 6, 8), MeterPoint(8, 5, 4)])
        rng = np.random.default_rng(0)
        bars = rng.uniform(0.0, 20.0, 500)
        rt = np.array([m.beat_to_bar(m.bar_to_beat(b)) for b in bars])
        np.testing.assert_allclose(rt, bars, rtol=0, atol=1e-12)

    def test_label(self):
        m = MeterMap([MeterPoint(0, 4, 4), MeterPoint(2, 3, 4)])
        assert m.label(0.0) == "1|1"
        assert m.label(4.5) == "2|1.5"
        assert m.label(8.0) == "3|1"   # first 3/4 bar
        assert m.label(10.0) == "3|3"  # third quarter of the 3/4 bar
        assert m.label(11.0) == "4|1"

    def test_validation_and_dedup(self):
        with pytest.raises(ValueError):
            MeterPoint(0, 0, 4)
        with pytest.raises(ValueError):
            MeterPoint(0, 4, 3)
        with pytest.raises(ValueError):
            MeterMap([])
        m = MeterMap([MeterPoint(2, 3, 4), MeterPoint(2, 6, 8)])
        assert m.signature_at(2) == (6, 8)

    def test_serialization(self):
        m = MeterMap([MeterPoint(0, 4, 4), MeterPoint(4, 7, 8)])
        assert MeterMap.from_dict(m.as_dict()) == m


class TestSessionMeter:
    def test_set_remove_and_default_demotion(self):
        s = Session(bpm=120.0)
        assert s.meter_map is None
        assert s.bar_to_beat(2) == 8.0
        s.set_meter(2, 3, 4)
        assert s.meter_map is not None
        assert s.bar_to_beat(3) == 11.0
        s.remove_meter(2)
        assert s.meter_map is None  # back to straight 4/4
        s.set_meter(0, 4, 4)
        assert s.meter_map is None  # explicit 4/4 everywhere == default

    def test_wb_roundtrip_and_undo(self, tmp_path):
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.io import wav
        from whitebox_tpu.session.history import CommandManager, RemoveMeter, SetMeter
        from whitebox_tpu.session.project import read_project, write_project

        s = Session(bpm=120.0)
        wav_path = tmp_path / "a.wav"
        wav.write_wav(wav_path, np.zeros((1, 100), np.float32), 48000, AudioFormat.F32)
        a = s.sample_table.load_from_file(wav_path)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 2.0, asset=a)

        mgr = CommandManager(s)
        mgr.execute(SetMeter(bar=4, num=6, den=8))
        assert s.meter_map.signature_at(5) == (6, 8)
        mgr.undo()
        assert s.meter_map is None
        mgr.redo()

        st0 = s.edit_stamp()
        mgr.execute(RemoveMeter(bar=4))
        assert s.meter_map is None and s.edit_stamp() != st0
        mgr.undo()

        p = tmp_path / "p.wb"
        write_project(s, p)
        back = read_project(p)
        assert back.meter_map == s.meter_map

    def test_smf_meter_roundtrip(self, tmp_path):
        from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
        from whitebox_tpu.midi.smf import (
            load_notes_from_file, meter_map_from_smf, write_smf,
        )

        notes = MidiNoteBuffer([MidiNote(0.0, 1.0, key=60, velocity=0.8)])
        p = tmp_path / "t.mid"
        # 4/4 at beat 0, 3/4 from beat 8 (bar 2), 7/8 from beat 14 (bar 4)
        write_smf(notes, p, meter=[(0.0, 4, 4), (8.0, 3, 4), (14.0, 7, 8)])
        back = load_notes_from_file(p)
        assert back.meter == [(0.0, 4, 4), (8.0, 3, 4), (14.0, 7, 8)]
        m = meter_map_from_smf(back)
        assert [(pt.bar, pt.num, pt.den) for pt in m.points] == [
            (0, 4, 4), (2, 3, 4), (4, 7, 8)]

    def test_cli_meter_and_from_bar(self, tmp_path, capsys):
        import json

        from whitebox_tpu import cli
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.io import wav
        from whitebox_tpu.session.project import write_project

        s = Session(bpm=120.0)
        wav_path = tmp_path / "a.wav"
        rng = np.random.default_rng(1)
        wav.write_wav(wav_path, (rng.standard_normal((1, 48000 * 4)) * 0.3).astype(np.float32),
                      48000, AudioFormat.F32)
        a = s.sample_table.load_from_file(wav_path)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 16.0, asset=a)
        p = tmp_path / "p.wb"
        write_project(s, p)

        assert cli.main(["tempo", str(p), "--meter", "1:3/4"]) == 0
        blob = json.loads(capsys.readouterr().out)
        assert blob["meter_map"] == [{"bar": 0, "num": 4, "den": 4},
                                     {"bar": 1, "num": 3, "den": 4}]
        # bar 2 = beat 4 + 3 = 7.0; render [bar1, bar2) = 3 beats at 120 = 1.5 s
        out = tmp_path / "o.wav"
        assert cli.main(["render", str(p), str(out), "--engine", "xla",
                         "--from-bar", "1", "--to-bar", "2"]) == 0
        audio, _ = wav.read_wav(out)
        assert audio.shape[1] == 72000
