"""Golden tests for the core math layer vs the C++ formulas.

Expected values hand-derived from /root/reference/src/core/core_math.h and
panning_law.cpp (float64 math, f32 narrowing at documented points).
"""

import math

import numpy as np
import pytest

from whitebox_tpu.core import buffers, formats, math as wbmath
from whitebox_tpu.core.panning import PanningLaw, calculate_panning_coefs


class TestBeatSampleConversion:
    def test_beat_to_samples_identity(self):
        # 1 beat at 120 bpm, 48kHz: 0.5s * 48000 = 24000 samples.
        bd = wbmath.beat_duration_from_bpm(120.0)
        assert wbmath.beat_to_samples(1.0, 48000.0, bd) == 24000.0

    def test_roundtrip(self):
        bd = wbmath.beat_duration_from_bpm(133.7)
        for beats in [0.0, 1.0, 3.14159, 1e6, 0.001]:
            s = wbmath.beat_to_samples(beats, 44100.0, bd)
            assert wbmath.samples_to_beat(s, 44100.0, bd) == pytest.approx(beats, rel=1e-12)

    def test_cxx_op_order(self):
        # beat_to_samples must be (beat*bd) rounded, then (*rate) rounded —
        # NOT fused. Construct a case where order matters and verify exact.
        beat, bd, rate = 0.1, 60.0 / 97.0, 44100.0
        expected = (beat * bd) * rate
        assert wbmath.beat_to_samples(beat, rate, bd) == expected

    def test_array_input(self):
        bd = 0.5
        out = wbmath.beat_to_samples(np.array([0.0, 1.0, 2.0]), 48000.0, bd)
        np.testing.assert_array_equal(out, [0.0, 24000.0, 48000.0])


class TestDbLinear:
    def test_zero_db_is_unity(self):
        assert wbmath.db_to_linear_f32(0.0) == np.float32(1.0)

    def test_minus6db(self):
        expected = np.power(np.float32(10.0), np.float32(-6.0 * 0.05), dtype=np.float32)
        assert wbmath.db_to_linear_f32(-6.0) == expected

    def test_threshold_silence(self):
        # core_math.h:84 — at/below -72 dB returns exactly 0.
        assert wbmath.db_to_linear_f32(-72.0) == 0.0
        assert wbmath.db_to_linear_f32(-100.0) == 0.0
        assert wbmath.db_to_linear_f32(-71.999) > 0.0

    def test_roundtrip(self):
        for db in [-60.0, -12.0, -3.0, 0.0, 6.0]:
            lin = wbmath.db_to_linear_f32(db)
            assert wbmath.linear_to_db(float(lin)) == pytest.approx(db, abs=1e-4)

    def test_array(self):
        out = wbmath.db_to_linear_f32(np.array([-100.0, 0.0]))
        np.testing.assert_array_equal(out, np.array([0.0, 1.0], dtype=np.float32))


class TestPanning:
    def test_constant_power_center(self):
        l, r = calculate_panning_coefs(0.0, PanningLaw.CONSTANT_POWER_3DB)
        # sin(pi/4)*sqrt(2) == 1.0 (within f32).
        expected = np.float32(math.sin(0.25 * math.pi) * math.sqrt(2.0))
        assert l == expected and r == expected
        assert l == pytest.approx(1.0, abs=1e-7)

    def test_constant_power_hard_pan(self):
        l, r = calculate_panning_coefs(-1.0, PanningLaw.CONSTANT_POWER_3DB)
        assert l == np.float32(math.sqrt(2.0)) and r == 0.0
        l, r = calculate_panning_coefs(1.0, PanningLaw.CONSTANT_POWER_3DB)
        assert l == 0.0 and r == np.float32(math.sqrt(2.0))

    def test_linear_law(self):
        l, r = calculate_panning_coefs(0.0, PanningLaw.LINEAR)
        assert l == np.float32(0.5 * 2.0 * 0.5) == np.float32(0.5)
        assert r == np.float32(0.5)
        l, r = calculate_panning_coefs(1.0, PanningLaw.LINEAR)
        assert (l, r) == (0.0, np.float32(1.0))

    def test_f64_exact_path(self):
        # Reproduce the C++ computation manually for an arbitrary pan.
        p = 0.37
        x = 0.5 * (p + 1.0)
        el = np.float32(math.sin(0.5 * math.pi * (1.0 - x)) * math.sqrt(2.0))
        er = np.float32(math.sin(0.5 * math.pi * x) * math.sqrt(2.0))
        l, r = calculate_panning_coefs(p)
        assert l == el and r == er

    def test_array(self):
        l, r = calculate_panning_coefs(np.array([-1.0, 0.0, 1.0]))
        assert l.shape == (3,) and r.shape == (3,)
        assert l[2] == 0.0 and r[0] == 0.0


class TestNormalizers:
    def test_i16_fast_path_clamps_full_scale_negative(self):
        data = np.array([-32768, -32767, 0, 32767], dtype=np.int16)
        out = formats.normalize_fast_path(data, formats.AudioFormat.I16)
        assert out[0] == np.float32(-1.0)  # clamped
        assert out[1] == np.float32(np.float32(-32767.0) * formats.I16_NORM_F32)
        assert out[2] == 0.0
        assert out[3] == np.float32(np.float32(32767.0) * formats.I16_NORM_F32)

    def test_i16_linear_path_does_not_clamp(self):
        data = np.array([-32768], dtype=np.int16)
        out = formats.normalize_unclamped(data, formats.AudioFormat.I16)
        assert out[0] < -1.0  # -32768/32767

    def test_unclamped_plus_f32_clamp_equals_fast_path(self):
        # The invariant the TPU sample-pool design relies on.
        rng = np.random.default_rng(0)
        for fmt, dt, lim in [
            (formats.AudioFormat.I16, np.int16, 32768),
            (formats.AudioFormat.I24, np.int32, 1 << 23),
            (formats.AudioFormat.I32, np.int32, 1 << 31),
        ]:
            data = rng.integers(-lim, lim - 1, size=4096).astype(dt)
            data[:4] = [-lim, -lim + 1, lim - 1, 0]
            unclamped = formats.normalize_unclamped(data, fmt)
            reclamped = np.clip(unclamped, np.float32(-1.0), np.float32(1.0))
            fast = formats.normalize_fast_path(data, fmt)
            np.testing.assert_array_equal(reclamped, fast)

    def test_i24_normalization_is_f64(self):
        data = np.array([(1 << 23) - 1, -(1 << 23)], dtype=np.int32)
        out = formats.normalize_unclamped(data, formats.AudioFormat.I24)
        assert out[0] == np.float32(1.0)
        assert out[1] == np.float32(-(1 << 23) * formats.I24_NORM_F64)

    def test_f32_identity(self):
        data = np.array([-2.0, 1.5], dtype=np.float32)  # out-of-range stays
        out = formats.normalize_fast_path(data, formats.AudioFormat.F32)
        np.testing.assert_array_equal(out, data)


class TestFormatConv:
    def test_i16_asymmetric_scaling(self):
        x = np.array([1.0, -1.0, 0.0, 0.5], dtype=np.float32)
        out = buffers.f32_to_i16(x)
        np.testing.assert_array_equal(out, [32767, -32768, 0, 16383])

    def test_i16_truncates_toward_zero(self):
        assert buffers.f32_to_i16(np.float32(0.99999))[()] == 32766  # 32766.67 -> 32766
        assert buffers.f32_to_i16(np.float32(-0.99999))[()] == -32767

    def test_i24_pack_roundtrip(self):
        codes = np.array([-(1 << 23), -1, 0, 1, (1 << 23) - 1], dtype=np.int32)
        packed = buffers.i24_codes_to_bytes(codes)
        assert len(packed) == 15
        np.testing.assert_array_equal(buffers.i24_bytes_to_codes(packed), codes)

    def test_i32_f64_scaling(self):
        out = buffers.f32_to_i32(np.array([1.0, -1.0], dtype=np.float32))
        np.testing.assert_array_equal(out, [2147483647, -2147483648])

    def test_interleave_roundtrip(self):
        x = np.arange(12, dtype=np.float32).reshape(2, 6)
        inter = buffers.interleave(x)
        assert inter.shape == (6, 2)
        np.testing.assert_array_equal(buffers.deinterleave(inter), x)


class TestMisc:
    def test_cxx_round_half_away(self):
        np.testing.assert_array_equal(
            wbmath.cxx_round(np.array([0.5, -0.5, 1.4, -1.6, 2.5])),
            [1.0, -1.0, 1.0, -2.0, 3.0],
        )

    def test_note_to_hz(self):
        assert wbmath.note_to_hz(69) == 440.0
        assert wbmath.note_to_hz(81) == 880.0

    def test_exponential_ease_linear_region(self):
        assert wbmath.exponential_ease(0.3, 0.0) == 0.3

    def test_lerp(self):
        assert wbmath.lerp(0.25, 0.0, 8.0) == 2.0
