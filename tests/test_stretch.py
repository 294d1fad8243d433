"""Phase-vocoder time-stretch / pitch-shift (ops/stretch.py) and the
clip-level integration (Session.stretch_clip). Extension — the reference
only resamples (sampler.cpp:34-59: duration and pitch always coupled)."""

import numpy as np
import pytest

from whitebox_tpu.ops.stretch import pitch_shift, time_stretch

RATE = 48000.0


def sine(freq, seconds, amp=0.5, rate=RATE):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :]


def dominant_freq(x, rate=RATE, skip=8000, n=32768):
    n = min(n, x.shape[1] - skip - 2048)
    seg = np.asarray(x[0, skip:skip + n], np.float64) * np.hanning(n)
    return float(np.argmax(np.abs(np.fft.rfft(seg))) * rate / n)


class TestVocoder:
    def test_identity_reconstruction(self):
        x = sine(440.0, 1.0)
        y = time_stretch(x, 1.0)
        assert y.shape == x.shape
        n = x.shape[1]
        assert np.max(np.abs(y[:, 2048:n - 2048] - x[:, 2048:n - 2048])) < 1e-3

    @pytest.mark.parametrize("ratio", [0.5, 0.75, 1.5, 2.0])
    def test_duration_scales_pitch_constant(self, ratio):
        x = sine(440.0, 1.0)
        y = time_stretch(x, ratio)
        assert y.shape[1] == int(round(x.shape[1] * ratio))
        assert abs(dominant_freq(y) - 440.0) < 3.0
        # energy is preserved in the steady state (windowed OLA normalized)
        mid = y[0, 4096:y.shape[1] - 4096]
        rms_y = float(np.sqrt(np.mean(mid.astype(np.float64) ** 2)))
        # (unlocked PV loses a few % to inter-window phase incoherence at
        # heavy compression; 0.04 abs on an ideal 0.354)
        assert abs(rms_y - 0.5 / np.sqrt(2)) < 0.04

    def test_two_tone_stays_two_tone(self):
        """Chord integrity: both partials survive at their frequencies."""
        x = sine(330.0, 1.0, 0.3) + sine(880.0, 1.0, 0.3)
        y = time_stretch(x, 1.25)
        seg = np.asarray(y[0, 8000:8000 + 32768], np.float64) * np.hanning(32768)
        S = np.abs(np.fft.rfft(seg))
        f = np.arange(S.size) * RATE / 32768
        for target in (330.0, 880.0):
            band = S[(f > target - 20) & (f < target + 20)]
            noise = np.median(S[(f > 2000) & (f < 4000)])
            assert band.max() > 50 * max(noise, 1e-12), target

    @pytest.mark.parametrize("semis", [-12.0, 7.0, 12.0])
    def test_pitch_shift(self, semis):
        x = sine(440.0, 1.0)
        z = pitch_shift(x, semis, RATE)
        assert z.shape == x.shape  # duration constant
        want = 440.0 * 2.0 ** (semis / 12.0)
        assert abs(dominant_freq(z) - want) < 0.01 * want

    def test_bad_ratio(self):
        with pytest.raises(ValueError):
            time_stretch(sine(440.0, 0.1), 0.0)


class TestClipStretch:
    def _session(self):
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        s = Session(bpm=120.0)
        a = s.sample_table.add_sample(
            Sample.from_planar(sine(440.0, 1.0), int(RATE), AudioFormat.F32,
                               name="tone"), key="tone")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 2.0, asset=a)  # 1 s at 120 bpm
        return s

    def test_preserve_pitch_stretch(self):
        from whitebox_tpu.render.bounce import bounce

        s = self._session()
        s.stretch_clip(0, 0, 2.0)
        c = s.tracks[0].clips[0]
        assert c.max_time == pytest.approx(4.0)
        assert c.audio.speed == 1.0
        out = bounce(s, RATE, engine="xla").audio
        # twice the audible duration, same pitch
        assert out.shape[1] >= int(1.9 * RATE)
        assert abs(dominant_freq(out) - 440.0) < 3.0
        tail = out[0, int(1.2 * RATE):int(1.8 * RATE)]
        assert float(np.sqrt(np.mean(tail ** 2))) > 0.2  # still sounding

    def test_resample_mode(self):
        from whitebox_tpu.render.bounce import bounce

        s = self._session()
        s.stretch_clip(0, 0, 2.0, preserve_pitch=False)
        c = s.tracks[0].clips[0]
        assert c.audio.speed == pytest.approx(0.5)
        out = bounce(s, RATE, engine="xla").audio
        assert abs(dominant_freq(out) - 220.0) < 3.0  # pitch follows

    def test_overlap_trims_neighbor(self):
        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.session.sample import Sample

        s = self._session()
        a2 = s.sample_table.add_sample(
            Sample.from_planar(sine(660.0, 1.0), int(RATE), AudioFormat.F32,
                               name="next"), key="next")
        s.add_audio_clip(s.tracks[0], "n", 2.0, 3.0, asset=a2)
        s.stretch_clip(0, 0, 1.25)  # [0,2] -> [0,2.5]: overlaps the neighbor
        clips = sorted(s.tracks[0].clips, key=lambda c: c.min_time)
        assert clips[0].max_time == pytest.approx(2.5)
        assert clips[1].min_time == pytest.approx(2.5)  # trimmed

    def test_undo(self):
        from whitebox_tpu.session.history import CommandManager, StretchClip

        s = self._session()
        mgr = CommandManager(s)
        mgr.execute(StretchClip(track_idx=0, clip_idx=0, ratio=2.0))
        assert s.tracks[0].clips[0].max_time == pytest.approx(4.0)
        mgr.undo()
        assert s.tracks[0].clips[0].max_time == pytest.approx(2.0)
        mgr.redo()
        assert s.tracks[0].clips[0].max_time == pytest.approx(4.0)

    def test_wb_roundtrip_sidecar(self, tmp_path):
        from whitebox_tpu.io import wav
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.session.project import read_project, write_project

        s = self._session()
        for k, a in s.sample_table.samples.items():
            p = tmp_path / f"{k}.wav"
            wav.write_wav(p, np.stack(a.sample.data), a.sample.sample_rate,
                          a.sample.format)
            a.sample.path = str(p)
        s.stretch_clip(0, 0, 1.5)
        mix = bounce(s, RATE, engine="xla").audio
        path = tmp_path / "st.wb"
        write_project(s, path)  # stretched asset -> sidecar WAV
        s2 = read_project(path)
        mix2 = bounce(s2, RATE, engine="xla").audio
        n = min(mix.shape[1], mix2.shape[1])
        np.testing.assert_allclose(mix2[:, :n], mix[:, :n], atol=1e-6)
