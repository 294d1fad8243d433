"""Fuzz the Python oracle against the COMPILED reference C++.

`native/ref_twin.cpp` compiles the real upstream sources
(/root/reference/src/dsp/sampler.cpp, core/core_math.h,
core/panning_law.cpp) behind a C ABI. These tests drive both the compiled
reference and the Python oracle over randomized inputs and require bit
equality — turning the parity contract from "exact by careful reading" into
"exact by measurement".

Skipped automatically when the reference checkout or toolchain is missing.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.core.math import beat_to_samples, db_to_linear_f32, samples_to_beat
from whitebox_tpu.core.panning import PanningLaw, calculate_panning_coefs
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.oracle import _Sampler

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# audio_format.h enum has U8/U16/U32 slots the repo's enum drops; map by name.
REF_FMT = {
    AudioFormat.I16: 3,
    AudioFormat.I24: 5,
    AudioFormat.I24_X8: 6,
    AudioFormat.I32: 7,
    AudioFormat.F32: 9,
}

# panning_law.h enum order matches PanningLaw (both start at Linear=0).
REF_LAW = {PanningLaw.LINEAR: 0, PanningLaw.CONSTANT_POWER_3DB: 2}

c_float_p = ctypes.POINTER(ctypes.c_float)


@pytest.fixture(scope="module")
def twin():
    if not os.path.isdir(os.path.join(REF, "src")):
        pytest.skip("reference checkout not available")
    build = subprocess.run(
        ["make", "-C", os.path.join(REPO, "native"), "twin"],
        capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"twin build failed: {build.stderr[-400:]}")
    lib = ctypes.CDLL(os.path.join(REPO, "native", "libwbref_twin.so"))

    lib.wbref_sampler_stream.restype = None
    lib.wbref_sampler_stream.argtypes = [
        ctypes.c_int32,  # format (reference enum value)
        ctypes.c_uint32,  # src_channels
        ctypes.c_uint64,  # count
        ctypes.POINTER(ctypes.c_void_p),  # channel_ptrs
        ctypes.POINTER(ctypes.c_double),  # sample_offset (in/out)
        ctypes.c_double,  # playback_speed
        ctypes.c_uint32,  # num_channels
        ctypes.c_uint32,  # num_samples
        ctypes.c_uint32,  # buffer_offset
        ctypes.c_float,  # gain
        ctypes.POINTER(c_float_p),  # dst_buffers
    ]
    lib.wbref_beat_to_samples.restype = ctypes.c_double
    lib.wbref_beat_to_samples.argtypes = [ctypes.c_double] * 3
    lib.wbref_samples_to_beat.restype = ctypes.c_double
    lib.wbref_samples_to_beat.argtypes = [ctypes.c_double] * 3
    lib.wbref_samples_to_beat_u64.restype = ctypes.c_double
    lib.wbref_samples_to_beat_u64.argtypes = [ctypes.c_uint64, ctypes.c_double, ctypes.c_double]
    lib.wbref_db_to_linear.restype = ctypes.c_float
    lib.wbref_db_to_linear.argtypes = [ctypes.c_float]
    lib.wbref_panning_coefs.restype = None
    lib.wbref_panning_coefs.argtypes = [ctypes.c_float, ctypes.c_int32, c_float_p]
    return lib


def _make_sample(rng: np.random.Generator, fmt: AudioFormat, channels: int, count: int) -> Sample:
    if fmt == AudioFormat.I16:
        planar = rng.integers(-32768, 32768, size=(channels, count), dtype=np.int64).astype(np.int16)
    elif fmt in (AudioFormat.I24, AudioFormat.I24_X8):
        planar = rng.integers(-(1 << 23), 1 << 23, size=(channels, count), dtype=np.int64).astype(np.int32)
    elif fmt == AudioFormat.I32:
        planar = rng.integers(-(1 << 31), 1 << 31, size=(channels, count), dtype=np.int64).astype(np.int32)
    else:
        planar = (rng.standard_normal((channels, count)) * 1.5).astype(np.float32)
    return Sample.from_planar(planar, 48000, fmt)


def _ref_stream(lib, sample: Sample, state_offset: float, speed: float, num_samples: int,
                buffer_offset: int, gain: float, out: np.ndarray) -> float:
    """Run Sampler::stream through the compiled reference, matching the
    oracle's calling convention (out[ch] accumulated, modulo channel map)."""
    nch = out.shape[0]
    # Duplicate channel pointers up front (i % channels), exactly what the
    # oracle's padded(i) does, so both paths see identical channel data and
    # the C++ slow path (which indexes channels directly) stays in bounds.
    padded = [np.ascontiguousarray(sample.padded(i)) for i in range(nch)]
    chan_ptrs = (ctypes.c_void_p * nch)(*[p.ctypes.data for p in padded])
    assert out.flags.c_contiguous
    dst_ptrs = (c_float_p * nch)(*[out[i].ctypes.data_as(c_float_p) for i in range(nch)])
    off = ctypes.c_double(state_offset)
    lib.wbref_sampler_stream(
        REF_FMT[sample.format], nch, sample.count, chan_ptrs, ctypes.byref(off),
        speed, nch, num_samples, buffer_offset, np.float32(gain), dst_ptrs,
    )
    return off.value


@pytest.mark.parametrize("fmt", [AudioFormat.I16, AudioFormat.I24, AudioFormat.I32, AudioFormat.F32])
def test_stream_fast_path_bit_exact(twin, fmt):
    """speed == 1.0: normalize + clamp + accumulate, u32 offset truncation."""
    rng = np.random.default_rng(hash(fmt) % (1 << 31))
    for trial in range(40):
        channels = int(rng.integers(1, 3))
        count = int(rng.integers(8, 2000))
        sample = _make_sample(rng, fmt, channels, count)
        block = int(rng.integers(1, 600))
        gain = np.float32(rng.uniform(-2.0, 2.0))
        # fractional start offsets: exercise the (uint32) truncation
        start = float(rng.uniform(0, count * 1.1))

        py = _Sampler()
        py.playback_speed = 1.0
        py.sample_offset = start
        out_py = rng.standard_normal((2, 3 * block)).astype(np.float32)
        out_c = out_py.copy()
        c_off = start
        for blk in range(3):
            boff = blk * block
            py.stream(sample, 2, block, boff, gain, out_py)
            c_off = _ref_stream(twin, sample, c_off, 1.0, block, boff, gain, out_c)
        np.testing.assert_array_equal(out_py, out_c, err_msg=f"{fmt} trial {trial}")
        assert py.sample_offset == c_off


@pytest.mark.parametrize("fmt", [AudioFormat.I16, AudioFormat.I24, AudioFormat.I32, AudioFormat.F32])
def test_stream_linear_path_bit_exact(twin, fmt):
    """speed != 1.0: f64 phase walk + f32 lerp, no clamp, f64 state carry."""
    rng = np.random.default_rng(hash(fmt) % (1 << 31) + 1)
    for trial in range(40):
        channels = int(rng.integers(1, 3))
        count = int(rng.integers(32, 3000))
        sample = _make_sample(rng, fmt, channels, count)
        block = int(rng.integers(1, 400))
        gain = np.float32(rng.uniform(-2.0, 2.0))
        # include the real rate-conversion ratios plus arbitrary speeds
        speed = float(rng.choice([44100.0 / 48000.0, 48000.0 / 44100.0, 0.25,
                                  rng.uniform(0.1, 4.0), rng.uniform(0.9, 1.1)]))
        start = float(rng.uniform(0, count * 0.9))

        py = _Sampler()
        py.playback_speed = speed
        py.sample_offset = start
        out_py = np.zeros((2, 4 * block), dtype=np.float32)
        out_c = np.zeros_like(out_py)
        c_off = start
        for blk in range(4):
            boff = blk * block
            py.stream(sample, 2, block, boff, gain, out_py)
            c_off = _ref_stream(twin, sample, c_off, speed, block, boff, gain, out_c)
        np.testing.assert_array_equal(out_py, out_c, err_msg=f"{fmt} speed={speed} trial {trial}")
        assert py.sample_offset == c_off


def test_stream_end_of_sample_semantics(twin):
    """Crossing count mid-block: num_actual truncation + offset still advances
    past the end by the full block stride (the reference's drift quirk)."""
    rng = np.random.default_rng(7)
    for speed in (1.0, 0.5, 44100.0 / 48000.0, 1.9):
        sample = _make_sample(rng, AudioFormat.F32, 2, 100)
        py = _Sampler()
        py.playback_speed = speed
        py.sample_offset = 90.0
        out_py = np.zeros((2, 128), dtype=np.float32)
        out_c = np.zeros_like(out_py)
        c_off = 90.0
        for blk in range(3):
            py.stream(sample, 2, 32, blk * 32, np.float32(1.0), out_py)
            c_off = _ref_stream(twin, sample, c_off, speed, 32, blk * 32, 1.0, out_c)
            assert py.sample_offset == c_off, f"speed={speed} blk={blk}"
        np.testing.assert_array_equal(out_py, out_c)


def test_beat_sample_conversions_bit_exact(twin):
    rng = np.random.default_rng(11)
    for _ in range(500):
        beat = float(rng.uniform(-16, 4096))
        rate = float(rng.choice([44100.0, 48000.0, 88200.0, 96000.0]))
        bd = 60.0 / float(rng.uniform(20, 300))
        assert beat_to_samples(beat, rate, bd) == twin.wbref_beat_to_samples(beat, rate, bd)
        smp = float(rng.uniform(0, 1e8))
        assert samples_to_beat(smp, rate, bd) == twin.wbref_samples_to_beat(smp, rate, bd)
        u = int(rng.integers(0, 1 << 40))
        assert samples_to_beat(float(u), rate, bd) == twin.wbref_samples_to_beat_u64(u, rate, bd)


def test_db_to_linear_bit_exact(twin):
    vals = np.concatenate([
        np.linspace(-120.0, 24.0, 2001, dtype=np.float32),
        np.array([-72.0, np.nextafter(np.float32(-72.0), np.float32(0.0)), 0.0, 6.0], np.float32),
    ])
    for db in vals:
        assert np.float32(db_to_linear_f32(db)) == np.float32(twin.wbref_db_to_linear(float(db))), db


@pytest.mark.parametrize("law", [PanningLaw.LINEAR, PanningLaw.CONSTANT_POWER_3DB])
def test_panning_coefs_bit_exact(twin, law):
    """Only the laws the reference implements; the rest are stubs upstream
    (panning_law.cpp:21,27-28) and real formulas here by design."""
    out = (ctypes.c_float * 2)()
    for pan in np.concatenate([np.linspace(-1, 1, 4001), np.random.default_rng(3).uniform(-1, 1, 500)]):
        pan32 = np.float32(pan)
        twin.wbref_panning_coefs(float(pan32), REF_LAW[law], out)
        left, right = calculate_panning_coefs(pan32, law)
        assert left == np.float32(out[0]) and right == np.float32(out[1]), (pan, law)
