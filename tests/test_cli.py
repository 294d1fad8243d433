"""CLI surface tests (render range, tempo editing, inspect) — CPU-forced
by conftest; the TPU leg of the CLI is driven by the verify recipe."""

import json

import numpy as np
import pytest

from whitebox_tpu import cli
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.io import wav
from whitebox_tpu.session import Session
from whitebox_tpu.session.project import read_project, write_project
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.oracle import OracleRenderer

RATE = 48000.0


@pytest.fixture()
def project(tmp_path):
    s = Session(bpm=120.0)
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((1, 48000)) * 0.4).astype(np.float32)
    wav_path = tmp_path / "a.wav"
    wav.write_wav(wav_path, data, 48000, AudioFormat.F32)
    a = s.sample_table.load_from_file(wav_path)
    tr = s.add_track("t", volume_db=-3.0)
    for b in range(8):
        s.add_audio_clip(tr, f"c{b}", float(b), b + 0.9, asset=a)
    p = tmp_path / "p.wb"
    write_project(s, p)
    return p


class TestRenderRange:
    def test_from_to_beat_matches_oracle_window(self, project, tmp_path):
        out = tmp_path / "out.wav"
        rc = cli.main(["render", str(project), str(out), "--engine", "xla",
                       "--from-beat", "2", "--to-beat", "4"])
        assert rc == 0
        audio, info = wav.read_wav(out)
        # 2 beats at 120 bpm = 1.0 s
        assert audio.shape[1] == 48000
        ref = OracleRenderer(read_project(project), RATE, buffer_size=512).render(
            playhead_start=2.0)
        np.testing.assert_array_equal(audio, ref[:, :48000])

    def test_range_with_tempo_map(self, project, tmp_path):
        # set a tempo change, render beats [4, 6): 2 beats at 60 bpm = 2.0 s
        rc = cli.main(["tempo", str(project), "--point", "4:60"])
        assert rc == 0
        out = tmp_path / "out.wav"
        rc = cli.main(["render", str(project), str(out), "--engine", "xla",
                       "--from-beat", "4", "--to-beat", "6"])
        assert rc == 0
        audio, _ = wav.read_wav(out)
        assert audio.shape[1] == 96000

    def test_bad_range_errors(self, project, tmp_path):
        rc = cli.main(["render", str(project), str(tmp_path / "x.wav"),
                       "--from-beat", "4", "--to-beat", "2"])
        assert rc == 2


class TestTempoCommand:
    def test_point_add_remove(self, project, capsys):
        assert cli.main(["tempo", str(project), "--point", "8:90:linear"]) == 0
        blob = json.loads(capsys.readouterr().out)
        assert blob["tempo_map"][-1] == {"beat": 8.0, "bpm": 90.0, "curve": "linear"}
        assert cli.main(["tempo", str(project), "--remove", "8"]) == 0
        blob = json.loads(capsys.readouterr().out)
        assert blob["tempo_map"] == []

    def test_inspect_shows_tempo(self, project, capsys):
        assert cli.main(["tempo", str(project), "--point", "2:140"]) == 0
        capsys.readouterr()
        assert cli.main(["inspect", str(project)]) == 0
        blob = json.loads(capsys.readouterr().out)
        assert blob["tempo_map"][-1]["bpm"] == 140.0


class TestRenderTail:
    def test_tail_extends_delay_decay(self, project, tmp_path):
        from whitebox_tpu.effects import Delay, EffectChain
        from whitebox_tpu.render.bounce import bounce

        s = read_project(project)
        s.tracks[0].effects = EffectChain([Delay(0.25, feedback=0.6, wet=0.8)])
        cut = bounce(s, RATE, buffer_size=512, engine="xla", chunk_frames=1 << 14)
        tailed = bounce(s, RATE, buffer_size=512, engine="xla", chunk_frames=1 << 14,
                        tail_seconds=1.0)
        assert tailed.audio.shape[1] >= cut.audio.shape[1] + 48000 - 512
        # the tail region actually carries delay repeats (nonzero energy)
        tail_region = tailed.audio[:, cut.audio.shape[1]:]
        assert float(np.abs(tail_region).max()) > 1e-4
