"""Native C++ host runtime vs the NumPy fallbacks (skipped if no toolchain)."""

import numpy as np
import pytest

from whitebox_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestNormalize:
    @pytest.mark.parametrize("fmt,dtype,lim", [(2, np.int16, 32768), (5, np.int32, 2**31)])
    def test_matches_python(self, fmt, dtype, lim):
        from whitebox_tpu.core.formats import AudioFormat, normalize_unclamped

        rng = np.random.default_rng(0)
        frames, ch = 1000, 2
        inter = rng.integers(-lim, lim - 1, size=frames * ch).astype(dtype)
        out = native.normalize_planar(inter, fmt, ch, frames + 16)
        assert out.shape == (ch, frames + 16)
        planar = inter.reshape(frames, ch).T
        for c in range(ch):
            ref = normalize_unclamped(planar[c], AudioFormat(fmt))
            np.testing.assert_array_equal(out[c, :frames], ref)
            np.testing.assert_array_equal(out[c, frames:], 0.0)


class TestPeaks:
    def test_matches_python_level(self):
        from whitebox_tpu.ops.peaks import _reference_level, level_out_count

        rng = np.random.default_rng(1)
        codes = rng.integers(-32768, 32768, 5000).astype(np.int32)
        for mip in (1, 3, 5):
            oc = level_out_count(5000, mip)
            got = native.peaks_level(codes, mip, oc)
            ref = _reference_level(codes, 5000, mip)
            np.testing.assert_array_equal(got, ref)


class TestPlanBuild:
    def test_matches_python_plan(self, monkeypatch):
        from tests.test_carve import random_session
        from whitebox_tpu.ops import mix_pallas
        from whitebox_tpu.timeline.carve import carve_session

        s = random_session(3, rate=48000, bpm=120.0, n_tracks=6, n_clips=3)
        table, pool = carve_session(s, 48000.0, buffer_size=512)

        plan_native = mix_pallas.build_plan(table, pool, s)
        monkeypatch.setenv("WBTPU_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", False)
        plan_py = mix_pallas.build_plan(table, pool, s)
        monkeypatch.setattr(native, "_TRIED", False)

        for f in ("row_al", "delta", "ms", "me", "gain", "clampf",
                  "fin_start", "fin_inv", "fout_end", "fout_inv", "track_gain"):
            np.testing.assert_array_equal(getattr(plan_native, f), getattr(plan_py, f), err_msg=f)


class TestExportConverters:
    """Native export converters vs the NumPy golden (bit-identical)."""

    def test_f32_to_interleaved_matches_numpy(self):
        from whitebox_tpu.core import buffers
        from whitebox_tpu.io import native

        if native.load() is None:
            import pytest

            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(0)
        planar = np.clip(rng.standard_normal((2, 4099)).astype(np.float32) * 0.7, -1.0, 1.0)
        # exact boundary values too
        planar[0, :6] = [1.0, -1.0, 0.0, -0.0, 0.5, -0.5]
        got16 = native.f32_to_interleaved(planar, "i16")
        ref16 = buffers.interleave(buffers.f32_to_i16(planar))
        np.testing.assert_array_equal(got16, ref16)
        got32 = native.f32_to_interleaved(planar, "i32")
        ref32 = buffers.interleave(buffers.f32_to_i32(planar))
        np.testing.assert_array_equal(got32, ref32)

    def test_wav_write_uses_same_bytes_either_path(self, tmp_path):
        import os

        from whitebox_tpu.core.formats import AudioFormat
        from whitebox_tpu.io import wav

        rng = np.random.default_rng(1)
        planar = np.clip(rng.standard_normal((2, 1000)).astype(np.float32) * 0.8, -1.0, 1.0)
        a, b = tmp_path / "a.wav", tmp_path / "b.wav"
        wav.write_wav(a, planar, 48000, AudioFormat.I16)
        os.environ["WBTPU_NO_NATIVE"] = "1"
        try:
            import importlib

            from whitebox_tpu.io import native as native_mod

            native_mod._LIB = None
            native_mod._TRIED = False
            wav.write_wav(b, planar, 48000, AudioFormat.I16)
        finally:
            del os.environ["WBTPU_NO_NATIVE"]
            native_mod._TRIED = False
        assert a.read_bytes() == b.read_bytes()
