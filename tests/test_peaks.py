"""Peak mipmap parity: hierarchical JAX pyramid vs the scalar-faithful
oracle port of waveform_visual.cpp, across formats/qualities/tail shapes."""

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.ops import peaks
from whitebox_tpu.session.sample import Sample


def make_sample(data, fmt, rate=48000):
    return Sample.from_planar(np.atleast_2d(data), rate, fmt)


class TestLevelStructure:
    def test_mip_levels(self):
        assert peaks.mip_levels_for(64) == []
        assert peaks.mip_levels_for(65) == [1]
        assert peaks.mip_levels_for(1024) == [1, 3]
        assert peaks.mip_levels_for(100000) == [1, 3, 5, 7, 9, 11]

    def test_out_count_rounds_to_even(self):
        assert peaks.level_out_count(100, 1) == 100
        assert peaks.level_out_count(101, 1) == 102
        assert peaks.level_out_count(100, 3) == 26  # 100//4=25 -> 26


class TestQuantization:
    def test_i16_to_int8_asymmetric(self):
        codes = peaks.quantize_codes(np.array([32767, -32768, 0], dtype=np.int16), AudioFormat.I16, "low")
        np.testing.assert_array_equal(codes, [127, -128, 0])

    def test_f32_scaling(self):
        codes = peaks.quantize_codes(np.array([1.0, -1.0, 0.5], dtype=np.float32), AudioFormat.F32, "high")
        np.testing.assert_array_equal(codes, [32767, -32768, 16383])

    def test_trunc_toward_zero(self):
        codes = peaks.quantize_codes(np.array([0.9999, -0.9999], dtype=np.float32), AudioFormat.F32, "low")
        np.testing.assert_array_equal(codes, [126, -127])


class TestOracleSemantics:
    def test_occurrence_order(self):
        # max before min in the chunk -> (max, min) pair order
        data = np.array([0.5, -0.5] * 50 + [0.1] * 28, dtype=np.float32)
        s = make_sample(data, AudioFormat.F32)
        mm = peaks.reference_mipmaps(s, "high")
        lvl = mm.levels[0]  # mip 1: chunks of 2
        assert lvl.data[0, 0] == peaks.quantize_codes(np.float32([0.5]), AudioFormat.F32, "high")[0]
        assert lvl.data[0, 1] == peaks.quantize_codes(np.float32([-0.5]), AudioFormat.F32, "high")[0]

    def test_tail_drop_semantics(self):
        # count=602, mip 3 (block 4): floor=150 (even) -> tail of 2 dropped
        rng = np.random.default_rng(0)
        data = (rng.standard_normal(602) * 0.4).astype(np.float32)
        s = make_sample(data, AudioFormat.F32)
        mm = peaks.reference_mipmaps(s, "high")
        mip3 = [l for l in mm.levels if l.mip_level == 3][0]
        assert mip3.data.shape[1] == 150


@pytest.mark.parametrize("quality", ["low", "high"])
class TestHierarchicalParity:
    @pytest.mark.parametrize(
        "fmt,gen",
        [
            (AudioFormat.F32, lambda rng, n: (rng.standard_normal(n) * 0.5).astype(np.float32)),
            (AudioFormat.I16, lambda rng, n: rng.integers(-32768, 32768, n).astype(np.int16)),
            (AudioFormat.I32, lambda rng, n: rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32)),
        ],
    )
    @pytest.mark.parametrize("n", [65, 257, 1000, 4097, 20000])
    def test_parity(self, quality, fmt, gen, n):
        rng = np.random.default_rng(n)
        s = make_sample(gen(rng, n), fmt)
        ref = peaks.reference_mipmaps(s, quality)
        ours = peaks.build_mipmaps(s, quality)
        assert len(ref.levels) == len(ours.levels)
        for a, b in zip(ref.levels, ours.levels):
            assert a.mip_level == b.mip_level
            assert a.data.dtype == b.data.dtype
            np.testing.assert_array_equal(a.data, b.data, err_msg=f"mip {a.mip_level}")

    def test_parity_with_ties(self, quality):
        # constant + repeated plateaus exercise first-occurrence tie-breaks
        data = np.concatenate([
            np.full(100, 0.25, np.float32),
            np.tile(np.array([0.5, 0.5, -0.5, -0.5], np.float32), 50),
            np.zeros(77, np.float32),
        ])
        s = make_sample(data, AudioFormat.F32)
        ref = peaks.reference_mipmaps(s, quality)
        ours = peaks.build_mipmaps(s, quality)
        for a, b in zip(ref.levels, ours.levels):
            np.testing.assert_array_equal(a.data, b.data)

    def test_stereo(self, quality):
        rng = np.random.default_rng(5)
        data = (rng.standard_normal((2, 3000)) * 0.5).astype(np.float32)
        s = make_sample(data, AudioFormat.F32)
        ref = peaks.reference_mipmaps(s, quality)
        ours = peaks.build_mipmaps(s, quality)
        for a, b in zip(ref.levels, ours.levels):
            assert a.data.shape[0] == 2
            np.testing.assert_array_equal(a.data, b.data)


class TestPeaksF32:
    def test_basic(self):
        data = np.array([[0.0, 1.0, -1.0, 0.5, 0.2, 0.1]], dtype=np.float32)
        out = peaks.peaks_f32(data, 2)
        assert out.shape == (1, 3, 2)
        np.testing.assert_array_equal(out[0, 0], [0.0, 1.0])
        np.testing.assert_array_equal(out[0, 1], [-1.0, 0.5])
