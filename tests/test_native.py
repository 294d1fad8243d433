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
