"""WAV codec round-trips for every supported PCM format."""

import io

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.io import wav
from whitebox_tpu.session.sample import Sample


def _sine(frames=1000, channels=2, rate=48000):
    t = np.arange(frames) / rate
    chans = [np.sin(2 * np.pi * (220.0 * (c + 1)) * t).astype(np.float32) * 0.8 for c in range(channels)]
    return np.stack(chans)


class TestWavRoundtrip:
    def test_f32(self, tmp_path):
        x = _sine()
        p = tmp_path / "a.wav"
        wav.write_wav(p, x, 48000, AudioFormat.F32)
        y, info = wav.read_wav(p)
        assert info.format == AudioFormat.F32
        assert info.sample_rate == 48000 and info.channels == 2 and info.count == 1000
        np.testing.assert_array_equal(x, y)

    @pytest.mark.parametrize(
        "fmt,dtype,lim",
        [
            (AudioFormat.I16, np.int16, 1 << 15),
            (AudioFormat.I24, np.int32, 1 << 23),
            (AudioFormat.I32, np.int32, 1 << 31),
        ],
    )
    def test_int_native_passthrough(self, tmp_path, fmt, dtype, lim):
        rng = np.random.default_rng(1)
        codes = rng.integers(-lim, lim, size=(2, 777)).astype(dtype)
        p = tmp_path / "b.wav"
        wav.write_wav(p, codes, 44100, fmt)
        y, info = wav.read_wav(p)
        assert info.format == fmt and info.count == 777
        np.testing.assert_array_equal(codes, y)

    def test_f32_to_i16_conversion_on_write(self, tmp_path):
        x = np.array([[1.0, -1.0, 0.5]], dtype=np.float32)
        p = tmp_path / "c.wav"
        wav.write_wav(p, x, 8000, AudioFormat.I16)
        y, info = wav.read_wav(p)
        np.testing.assert_array_equal(y[0], [32767, -32768, 16383])

    def test_bytesio(self):
        x = _sine(64, 1)
        buf = io.BytesIO()
        wav.write_wav(buf, x, 22050, AudioFormat.F32)
        y, info = wav.read_wav(buf.getvalue())
        np.testing.assert_array_equal(x, y)
        assert info.sample_rate == 22050

    def test_odd_data_size_padding(self, tmp_path):
        # 24-bit mono with odd byte count exercises RIFF word alignment.
        codes = np.arange(-5, 6, dtype=np.int32).reshape(1, -1)
        p = tmp_path / "d.wav"
        wav.write_wav(p, codes, 8000, AudioFormat.I24)
        y, info = wav.read_wav(p)
        np.testing.assert_array_equal(codes, y)


class TestSample:
    def test_load_keeps_native_format(self, tmp_path):
        codes = np.array([[0, 100, -32768, 32767]], dtype=np.int16)
        p = tmp_path / "s.wav"
        wav.write_wav(p, codes, 44100, AudioFormat.I16)
        s = Sample.load_file(p)
        assert s.format == AudioFormat.I16
        assert s.data[0].dtype == np.int16
        np.testing.assert_array_equal(s.data[0], codes[0])

    def test_padding_and_normalization(self, tmp_path):
        codes = np.array([[32767, -32768]], dtype=np.int16)
        p = tmp_path / "s.wav"
        wav.write_wav(p, codes, 44100, AudioFormat.I16)
        s = Sample.load_file(p)
        padded = s.padded(0)
        assert padded.size == 2 + 16 and padded[-1] == 0
        norm = s.normalized_f32(0)
        assert norm.dtype == np.float32
        assert norm[0] == np.float32(1.0)
        assert norm[1] < -1.0  # unclamped pool representation

    def test_channel_wraparound(self):
        s = Sample.from_planar(np.zeros((2, 10), dtype=np.float32), 48000, AudioFormat.F32)
        assert s.channel(3) is s.data[1]


class TestDither:
    """TPDF export dither (core.buffers.tpdf_dither + write_wav(dither=))."""

    def test_tpdf_statistics(self):
        from whitebox_tpu.core.buffers import tpdf_dither

        x = np.zeros((1, 200000), np.float32)
        lsb = 2.0 ** -15
        for hp in (False, True):
            d = tpdf_dither(x, 16, highpass=hp) / lsb
            assert abs(float(d.mean())) < 0.01           # zero mean
            assert float(np.abs(d).max()) <= 1.0 + 1e-6  # bounded at 1 LSB
            # TPDF variance = 1/6 (sum/difference of two uniforms)
            assert abs(float(d.var()) - 1.0 / 6.0) < 0.01

    def test_highpass_tilt(self):
        """HF-weighted dither: first-difference noise has ~2x the variance
        above fs/4 than below (white TPDF is flat)."""
        from whitebox_tpu.core.buffers import tpdf_dither

        x = np.zeros((1, 1 << 17), np.float32)
        d = tpdf_dither(x, 16, highpass=True)[0]
        D = np.abs(np.fft.rfft(d)) ** 2
        n = D.size
        lo, hi = D[: n // 2].mean(), D[n // 2 :].mean()
        assert hi / lo > 2.0

    def test_dither_linearizes_low_level(self):
        """A -96 dBFS sine (~0.5 LSB) truncates to digital zero at 16-bit;
        with TPDF dither its fundamental survives quantization."""
        from whitebox_tpu.core.buffers import f32_to_i16, quantize_round, tpdf_dither

        n = 1 << 16
        t = np.arange(n) / 48000.0
        a = 10 ** (-96 / 20.0)  # ~0.5 LSB amplitude
        x = (a * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)[None, :]
        bare = f32_to_i16(x).astype(np.float64) / 32768.0
        dith = quantize_round(np.clip(tpdf_dither(x, 16), -1, 1), 16).astype(np.float64) / 32768.0
        k = int(round(997.0 / 48000.0 * n))
        w = np.hanning(n)

        def bin_mag(y):
            return np.abs(np.fft.rfft(y[0] * w))[k]

        ref = bin_mag(x.astype(np.float64))
        assert bin_mag(bare) < 0.05 * ref         # truncation: digital zero
        assert bin_mag(dith) > 0.7 * ref          # dither preserves it

    def test_write_wav_dither_roundtrip(self, tmp_path):
        from whitebox_tpu.io.wav import read_wav, write_wav

        rng = np.random.default_rng(1)
        x = (0.5 * rng.standard_normal((2, 48000))).astype(np.float32).clip(-1, 1)
        p = tmp_path / "d.wav"
        write_wav(p, x, 48000, AudioFormat.I16, dither="tpdf-hp")
        y, info = read_wav(p)
        assert info.format == AudioFormat.I16
        # dither adds at most ~2 LSB of deviation on top of quantization
        err = np.abs(y.astype(np.float64) / 32768.0 - x)
        assert float(err.max()) < 3.5 / 32768.0
        with pytest.raises(ValueError):
            write_wav(p, x, 48000, AudioFormat.I16, dither="bogus")

    def test_quantize_round_full_scale_i32(self):
        """+1.0 samples must quantize to +2^31-1, not wrap to -2^31
        (float32 scale constants round 2^31-1 UP to 2^31)."""
        from whitebox_tpu.core.buffers import quantize_round

        x = np.array([[1.0, -1.0, 0.999999, 0.0]], np.float32)
        codes = quantize_round(x, 32)
        assert codes[0, 0] == 2**31 - 1
        assert codes[0, 1] == -(2**31)
        assert codes[0, 2] > 0
        c16 = quantize_round(x, 16)
        assert c16[0, 0] == 32767 and c16[0, 1] == -32768
