"""AIFF reader + compressed codec runtime (MP3/Ogg/FLAC) tests.

Covers the decode breadth of Sample::load_file / load_mp3_file /
load_ogg_vorbis_file (sample.cpp:112-320). Codec tests skip when the native
runtime can't build (no libavformat)."""

import struct
import warnings

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.io.aiff import _decode_extended80, read_aiff
from whitebox_tpu.io.wav import load_audio_file
from whitebox_tpu.session.sample import Sample


def _write_aiff_stdlib(path, planar_i16: np.ndarray, rate: int, bits: int = 16):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc

    f = aifc.open(str(path), "wb")
    f.setnchannels(planar_i16.shape[0])
    f.setsampwidth(bits // 8)
    f.setframerate(rate)
    inter = np.ascontiguousarray(planar_i16.T)
    if bits == 16:
        f.writeframes(inter.astype(">i2").tobytes())
    elif bits == 8:
        f.writeframes((inter >> 8).astype(np.int8).tobytes())
    f.close()


class TestAiff:
    def test_extended80_sample_rates(self):
        # the canonical encodings for common audio rates
        for rate, b in [
            (44100, bytes.fromhex("400EAC44000000000000")),
            (48000, bytes.fromhex("400EBB80000000000000")),
            (22050, bytes.fromhex("400DAC44000000000000")),
        ]:
            assert _decode_extended80(b) == float(rate)

    def test_round_trip_16bit(self, tmp_path):
        rng = np.random.default_rng(0)
        planar = rng.integers(-32768, 32768, size=(2, 5000), dtype=np.int64).astype(np.int16)
        p = tmp_path / "x.aiff"
        _write_aiff_stdlib(p, planar, 44100)
        got, info = read_aiff(p)
        assert info.format == AudioFormat.I16 and info.sample_rate == 44100
        np.testing.assert_array_equal(got, planar)
        # and through the generic loader + Sample
        got2, info2 = load_audio_file(p)
        np.testing.assert_array_equal(got2, planar)
        s = Sample.load_file(p)
        assert s.count == 5000 and s.channels == 2

    def test_sowt_little_endian(self, tmp_path):
        """AIFC 'sowt' = little-endian PCM (the classic Mac variant)."""
        planar = np.array([[100, -200, 30000, -30000]], dtype=np.int16)
        frames = planar.shape[1]
        comm = struct.pack(">hLh", 1, frames, 16) + bytes.fromhex("400EAC44000000000000") + b"sowt" + b"\x00\x00"
        ssnd = struct.pack(">LL", 0, 0) + planar.T.astype("<i2").tobytes()
        body = b"AIFC" + b"COMM" + struct.pack(">I", len(comm)) + comm + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        data = b"FORM" + struct.pack(">I", len(body)) + body
        got, info = read_aiff(data)
        assert info.format == AudioFormat.I16
        np.testing.assert_array_equal(got, planar)

    def test_fl32(self):
        planar = np.array([[0.5, -0.25, 1.0, -1.0]], dtype=np.float32)
        frames = planar.shape[1]
        comm = struct.pack(">hLh", 1, frames, 32) + bytes.fromhex("400EBB80000000000000") + b"fl32" + b"\x00\x00"
        ssnd = struct.pack(">LL", 0, 0) + planar.T.astype(">f4").tobytes()
        body = b"AIFC" + b"COMM" + struct.pack(">I", len(comm)) + comm + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        data = b"FORM" + struct.pack(">I", len(body)) + body
        got, info = read_aiff(data)
        assert info.format == AudioFormat.F32 and info.sample_rate == 48000
        np.testing.assert_array_equal(got, planar)

    def test_24bit_big_endian(self):
        vals = np.array([[1, -1, (1 << 23) - 1, -(1 << 23)]], dtype=np.int32)
        raw = b"".join(int(v).to_bytes(3, "big", signed=True) for v in vals[0])
        comm = struct.pack(">hLh", 1, 4, 24) + bytes.fromhex("400EAC44000000000000")
        ssnd = struct.pack(">LL", 0, 0) + raw
        body = b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        data = b"FORM" + struct.pack(">I", len(body)) + body
        got, info = read_aiff(data)
        assert info.format == AudioFormat.I24
        np.testing.assert_array_equal(got, vals)


@pytest.fixture(scope="module")
def codec():
    from whitebox_tpu.io import codec as m

    if m.load() is None:
        pytest.skip("native codec runtime unavailable (libavformat)")
    return m


class TestCompressedCodec:
    def _sig(self, rate=44100, seconds=1.5, channels=2):
        t = np.arange(int(rate * seconds)) / rate
        rows = [np.sin(2 * np.pi * (440.0 + 220.0 * c) * t) * 0.5 for c in range(channels)]
        return np.stack(rows).astype(np.float32)

    def test_flac_round_trip_near_exact(self, codec, tmp_path):
        sig = self._sig()
        p = tmp_path / "x.flac"
        codec.write_compressed(p, sig, 44100)
        dec, info = codec.read_compressed(p)
        assert (info.channels, info.sample_rate, info.format) == (2, 44100, AudioFormat.F32)
        assert dec.shape == sig.shape
        # FLAC is lossless; only the f32->s16/s24 encoder quantization remains
        assert np.abs(dec - sig).max() < 2e-4

    @pytest.mark.parametrize("ext,tol", [("mp3", 0.05), ("ogg", 0.05)])
    def test_lossy_round_trip(self, codec, tmp_path, ext, tol):
        sig = self._sig()
        p = tmp_path / f"x.{ext}"
        codec.write_compressed(p, sig, 44100)
        dec, info = codec.read_compressed(p)
        assert info.channels == 2 and info.sample_rate == 44100
        # align for codec delay, compare rms error
        corr = np.correlate(dec[0][:44100], sig[0][:42000], mode="valid")
        lag = int(np.argmax(corr))
        m = min(sig.shape[1] - 2000, dec.shape[1] - lag)
        err = np.sqrt(np.mean((dec[0][lag : lag + m] - sig[0][:m]) ** 2))
        assert err < tol, f"{ext}: rms err {err}"

    def test_load_audio_file_dispatch(self, codec, tmp_path):
        sig = self._sig(channels=1)
        p = tmp_path / "clip.mp3"
        codec.write_compressed(p, sig, 44100)
        planar, info = load_audio_file(p)
        assert info.format == AudioFormat.F32 and info.sample_rate == 44100
        s = Sample.load_file(p)
        assert s.format == AudioFormat.F32 and s.channels == 1

    def test_session_renders_mp3_asset(self, codec, tmp_path):
        from whitebox_tpu.session import Session
        from whitebox_tpu.timeline.oracle import OracleRenderer

        sig = self._sig(channels=2, rate=48000)
        p = tmp_path / "pad.mp3"
        codec.write_compressed(p, sig, 48000)
        s = Session(bpm=120.0)
        tr = s.add_track("pad")
        a = s.sample_table.load_from_file(p)
        s.add_audio_clip(tr, "c", 0.0, 2.0, asset=a)
        out = OracleRenderer(s, 48000.0, buffer_size=512).render()
        assert np.abs(out).max() > 0.01


class TestEncodeOptions:
    """Export-properties parity (export_prop.h:8-45): bitrate modes,
    VBR quality, FLAC compression/depth, and metadata tags."""

    def _sig(self, rate=44100, seconds=2.0, channels=2, seed=3):
        rng = np.random.default_rng(seed)
        # broadband noise so lossy bitrate actually changes the file size
        # (clipped in-range: integer codecs clamp at +/-1.0)
        sig = rng.standard_normal((channels, int(rate * seconds))) * 0.3
        return np.clip(sig, -0.95, 0.95).astype(np.float32)

    def test_cbr_bitrate_scales_file_size(self, codec, tmp_path):
        from whitebox_tpu.io.codec import EncodeOptions

        sig = self._sig()
        sizes = {}
        for kbps in (64, 320):
            p = tmp_path / f"cbr{kbps}.mp3"
            codec.write_compressed(p, sig, 44100,
                                   options=EncodeOptions(bitrate_mode="cbr", bitrate=kbps))
            dec, info = codec.read_compressed(p)
            assert info.sample_rate == 44100 and dec.shape[0] == 2
            sizes[kbps] = p.stat().st_size
        # 320k must be ~5x the 64k stream (frame headers dominate otherwise)
        assert sizes[320] > 3.5 * sizes[64], sizes

    def test_vbr_quality_scales_file_size(self, codec, tmp_path):
        from whitebox_tpu.io.codec import EncodeOptions

        sig = self._sig()
        sizes = {}
        for q in (0.0, 100.0):
            p = tmp_path / f"vbr{int(q)}.mp3"
            codec.write_compressed(p, sig, 44100,
                                   options=EncodeOptions(bitrate_mode="vbr", vbr_quality=q))
            dec, _ = codec.read_compressed(p)
            assert dec.shape[0] == 2
            sizes[q] = p.stat().st_size
        assert sizes[100.0] > 1.5 * sizes[0.0], sizes

    def test_vorbis_vbr_quality(self, codec, tmp_path):
        from whitebox_tpu.io.codec import EncodeOptions

        sig = self._sig()
        sizes = {}
        for q in (10.0, 95.0):
            p = tmp_path / f"v{int(q)}.ogg"
            codec.write_compressed(p, sig, 44100,
                                   options=EncodeOptions(bitrate_mode="vbr", vbr_quality=q))
            dec, _ = codec.read_compressed(p)
            assert dec.shape[0] == 2
            sizes[q] = p.stat().st_size
        assert sizes[95.0] > 1.3 * sizes[10.0], sizes

    def test_flac_compression_level_and_depth(self, codec, tmp_path):
        from whitebox_tpu.io.codec import EncodeOptions

        # compressible material (noise never shrinks under higher levels)
        rate = 44100
        t = np.arange(rate) / rate
        sig = np.stack([np.sin(2 * np.pi * 440.0 * t) * 0.5,
                        np.sin(2 * np.pi * 660.0 * t) * 0.5]).astype(np.float32)
        p0 = tmp_path / "l0.flac"
        p8 = tmp_path / "l8.flac"
        codec.write_compressed(p0, sig, rate,
                               options=EncodeOptions(flac_compression_level=0, bit_depth=16))
        codec.write_compressed(p8, sig, rate,
                               options=EncodeOptions(flac_compression_level=8, bit_depth=16))
        assert p0.stat().st_size > p8.stat().st_size  # higher level = smaller
        dec, info = codec.read_compressed(p8)
        # lossless at s16 for in-range signals: one quantization step max
        assert np.abs(dec - sig).max() < (1.5 / 32768.0)

    def test_flac_24bit_depth(self, codec, tmp_path):
        """bit_depth=24 must actually deepen the stored samples (the s16
        default would floor the error at one 16-bit step)."""
        from whitebox_tpu.io.codec import EncodeOptions

        rate = 44100
        t = np.arange(rate) / rate
        sig = np.stack([np.sin(2 * np.pi * 440.0 * t) * 0.5,
                        np.sin(2 * np.pi * 660.0 * t) * 0.5]).astype(np.float32)
        p = tmp_path / "d24.flac"
        codec.write_compressed(p, sig, rate, options=EncodeOptions(bit_depth=24))
        dec, _ = codec.read_compressed(p)
        err = np.abs(dec - sig).max()
        assert err < (1.5 / 8388608.0), err  # one 24-bit step, not 16

    def test_encode_options_validation(self):
        from whitebox_tpu.io.codec import EncodeOptions

        with pytest.raises(ValueError, match="vbr_quality"):
            EncodeOptions(vbr_quality=120.0)
        with pytest.raises(ValueError, match="flac_compression_level"):
            EncodeOptions(flac_compression_level=13)
        with pytest.raises(ValueError, match="bitrate"):
            EncodeOptions(bitrate=-1)
        with pytest.raises(ValueError, match="bit_depth"):
            EncodeOptions(bit_depth=20)

    def test_abr_mode_encodes(self, codec, tmp_path):
        from whitebox_tpu.io.codec import EncodeOptions

        sig = self._sig(seconds=1.0)
        p = tmp_path / "abr.mp3"
        codec.write_compressed(p, sig, 44100,
                               options=EncodeOptions(bitrate_mode="abr", bitrate=128,
                                                     min_bitrate=64, max_bitrate=192))
        dec, info = codec.read_compressed(p)
        assert info.sample_rate == 44100 and dec.shape[0] == 2

    def test_metadata_tags_round_trip(self, codec, tmp_path):
        from whitebox_tpu.io.codec import EncodeOptions

        sig = self._sig(seconds=0.5)
        p = tmp_path / "tagged.flac"
        codec.write_compressed(p, sig, 44100,
                               options=EncodeOptions(title="My Song", artist="WB",
                                                     comment="bounced"))
        blob = p.read_bytes()
        # FLAC vorbis-comment block stores tags as KEY=value text
        assert b"My Song" in blob and b"WB" in blob and b"bounced" in blob

    def test_render_cli_passes_tags(self, codec, tmp_path):
        """cli render fills tags from project_info (export_metadata parity)."""
        from whitebox_tpu.cli import main as cli_main
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.project import write_project

        from whitebox_tpu.session.sample import Sample

        s = Session(bpm=120.0)
        tr = s.add_track("t")
        sig = self._sig(rate=48000, seconds=0.5, channels=2)
        a = s.sample_table.add_sample(
            Sample.from_planar(sig, 48000, AudioFormat.F32, name="sig"), key="sig")
        s.add_audio_clip(tr, "c", 0.0, 1.0, asset=a)
        s.project_info.title = "Tagged Project"
        s.project_info.author = "Author X"
        wb = tmp_path / "p.wb"
        write_project(s, wb)
        out = tmp_path / "o.flac"
        rc = cli_main(["render", str(wb), str(out), "--rate", "48000",
                       "--flac-level", "5"])
        assert rc == 0 and out.is_file()
        blob = out.read_bytes()
        assert b"Tagged Project" in blob and b"Author X" in blob
