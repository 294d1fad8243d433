"""Oracle correctness: hand-computed expectations for the block-sequential
reference mixer (C++ parity semantics from engine.cpp/track.cpp/sampler.cpp).

Most tests run on an *exact grid* — sample_rate 32768 Hz at 60 bpm — where
every beat<->frame conversion is a dyadic rational, so event positions are
exact and expectations are bit-precise. The reference's f64 playhead-drift
truncation quirk is exercised separately on the 48 kHz grid.
"""

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat, I16_NORM_F32
from whitebox_tpu.session import Session
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.oracle import OracleRenderer

RATE = 32768.0  # dyadic grid: beats_for_frames is exact in f64
BPM = 60.0


def make_session(bpm=BPM):
    return Session(bpm=bpm)


def add_f32_asset(session, data, rate=int(RATE), key="a"):
    planar = np.atleast_2d(np.asarray(data, dtype=np.float32))
    s = Sample.from_planar(planar, rate, AudioFormat.F32, name=key)
    return session.sample_table.add_sample(s, key=key)


def beats_for_frames(frames, rate=RATE, bpm=BPM):
    return frames / rate / (60.0 / bpm)


class TestBasicPlayback:
    def test_single_clip_unity(self):
        # 1 track, clip from beat 0, gain 1, vol 0dB, pan center (coef==1.0f).
        s = make_session()
        rng = np.random.default_rng(0)
        data = (rng.standard_normal(1000) * 0.2).astype(np.float32)
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(1000), asset=asset)

        out = OracleRenderer(s, RATE, buffer_size=256).render(trim_frames=1200)
        np.testing.assert_array_equal(out[0, :1000], data)
        np.testing.assert_array_equal(out[1, :1000], data)  # mono wraps to both
        np.testing.assert_array_equal(out[:, 1000:], 0.0)

    def test_clip_gain_and_volume(self):
        s = make_session()
        data = np.full(500, 0.25, dtype=np.float32)
        asset = add_f32_asset(s, data)
        tr = s.add_track("t", volume_db=-6.0)
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(500), asset=asset, gain=0.5)

        out = OracleRenderer(s, RATE, buffer_size=128).render(trim_frames=500)
        vol = tr.volume_linear
        pan_l = tr.pan_coeffs[0]
        expected = (np.float32(0.25) * np.float32(0.5)) * (vol * pan_l)
        np.testing.assert_array_equal(out[0], np.full(500, expected, dtype=np.float32))

    def test_pan_hard_left(self):
        s = make_session()
        # 0.5 amplitude: hard-left boost is sqrt(2), stays below the clipper.
        asset = add_f32_asset(s, np.full(100, 0.5, dtype=np.float32))
        tr = s.add_track("t", pan=-1.0)
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(100), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=100)
        assert out[1].max() == 0.0
        expected = np.float32(0.5) * (np.float32(1.0) * tr.pan_coeffs[0])
        np.testing.assert_array_equal(out[0], np.full(100, expected, dtype=np.float32))

    def test_mute_silences(self):
        s = make_session()
        asset = add_f32_asset(s, np.ones(100, dtype=np.float32))
        tr = s.add_track("t", mute=True)
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(100), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=100)
        np.testing.assert_array_equal(out, 0.0)

    def test_mid_block_clip_start(self):
        # Clip starts at frame 100 with buffer 256: sample-accurate offset.
        s = make_session()
        data = np.arange(1, 201, dtype=np.float32) / 200.0
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        start_b = beats_for_frames(100)
        s.add_audio_clip(tr, "c", start_b, start_b + beats_for_frames(200), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=256).render(trim_frames=400)
        np.testing.assert_array_equal(out[0, :100], 0.0)
        np.testing.assert_array_equal(out[0, 100:300], data)
        np.testing.assert_array_equal(out[0, 300:], 0.0)

    def test_start_offset_skips_content(self):
        s = make_session()
        data = np.arange(100, dtype=np.float32) / 128.0
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(50), asset=asset, start_offset=25.0)
        out = OracleRenderer(s, RATE, buffer_size=32).render(trim_frames=50)
        np.testing.assert_array_equal(out[0], data[25:75])

    def test_clip_ends_mid_block(self):
        s = make_session()
        data = np.ones(100, dtype=np.float32)
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(100), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=512).render(num_blocks=1)
        np.testing.assert_array_equal(out[0, :100], 1.0)
        np.testing.assert_array_equal(out[0, 100:], 0.0)

    def test_sample_shorter_than_clip(self):
        # Clip window longer than sample: sampler stops at sample end.
        s = make_session()
        data = np.ones(50, dtype=np.float32)
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(500), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=500)
        np.testing.assert_array_equal(out[0, :50], 1.0)
        np.testing.assert_array_equal(out[0, 50:], 0.0)

    def test_playhead_start_mid_clip(self):
        # Rendering from inside a clip picks up mid-content (partial start).
        s = make_session()
        data = np.arange(400, dtype=np.float32) / 512.0
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(400), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(
            num_blocks=2, playhead_start=beats_for_frames(100)
        )
        np.testing.assert_array_equal(out[0], data[100:228])


class TestReferenceQuirks:
    def test_stop_event_f64_truncation_48k(self):
        # On the 48kHz/120bpm grid the Stop frame for a 1000-frame clip lands
        # at 999.9999999999999 -> (uint64) truncates -> final frame dropped.
        # The oracle must reproduce the C++ engine's behavior exactly.
        s = Session(bpm=120.0)
        data = np.full(1000, 0.5, dtype=np.float32)
        asset = add_f32_asset(s, data, rate=48000)
        tr = s.add_track("t")
        end_beats = 1000 / 48000.0 / 0.5
        s.add_audio_clip(tr, "c", 0.0, end_beats, asset=asset)
        out = OracleRenderer(s, 48000.0, buffer_size=256).render(trim_frames=1000)
        np.testing.assert_array_equal(out[0, :999], 0.5)
        assert out[0, 999] == 0.0  # reference drops it; so do we


class TestReferenceQuirks2:
    def test_block_aligned_clip_end_drops_last_block(self):
        # When a clip's end lands exactly on a block boundary, the engine
        # computes the Stop event's buffer_offset as (end % buffer_size) == 0,
        # which stops playback at the START of the clip's final block — the
        # last buffer of audio is dropped (engine semantics, track.cpp:421-430
        # + the event-segmented render loop). Faithfully reproduced.
        s = make_session()
        asset = add_f32_asset(s, np.full(128, 0.5, dtype=np.float32))
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(128), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=128)
        np.testing.assert_array_equal(out[0, :64], 0.5)   # first block plays
        np.testing.assert_array_equal(out[0, 64:], 0.0)   # final block dropped


class TestMixSemantics:
    def test_track_sum_order_and_clip(self):
        # Two tracks of 0.75 sum to 1.5 -> hard-clipped to 1.0.
        s = make_session()
        asset = add_f32_asset(s, np.full(64, 0.75, dtype=np.float32))
        for name in ("a", "b"):
            tr = s.add_track(name)
            s.add_audio_clip(tr, "c", 0.0, beats_for_frames(64), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=128).render(trim_frames=64)
        np.testing.assert_array_equal(out[0], 1.0)

    def test_two_adjacent_clips(self):
        s = make_session()
        a = add_f32_asset(s, np.full(100, 0.5, dtype=np.float32), key="a")
        b = add_f32_asset(s, np.full(100, -0.5, dtype=np.float32), key="b")
        tr = s.add_track("t")
        e = beats_for_frames(100)
        s.add_audio_clip(tr, "c1", 0.0, e, asset=a)
        s.add_audio_clip(tr, "c2", e, 2 * e, asset=b)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=200)
        np.testing.assert_array_equal(out[0, :100], 0.5)
        np.testing.assert_array_equal(out[0, 100:200], -0.5)

    def test_block_size_invariance_on_grid(self):
        # On the exact grid the render must not depend on buffer size.
        s = make_session()
        rng = np.random.default_rng(1)
        asset = add_f32_asset(s, (rng.standard_normal(2048) * 0.3).astype(np.float32))
        tr = s.add_track("t", volume_db=-3.0, pan=0.3)
        # edges at 513/2047: not multiples of 128 or 512, so no
        # block-boundary-equality quirks fire for either buffer size
        s.add_audio_clip(tr, "c", beats_for_frames(513), beats_for_frames(2047), asset=asset, gain=0.8)
        out1 = OracleRenderer(s, RATE, buffer_size=128).render(trim_frames=2048)
        out2 = OracleRenderer(s, RATE, buffer_size=512).render(trim_frames=2048)
        np.testing.assert_array_equal(out1, out2)


class TestFormats:
    def test_i16_fast_path(self):
        s = make_session()
        codes = np.array([-32768, -32767, 0, 16384, 32767] * 20, dtype=np.int16)
        sample = Sample.from_planar(codes[None, :], int(RATE), AudioFormat.I16, name="i16")
        asset = s.sample_table.add_sample(sample, key="i16")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(100), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=100)
        expected = np.clip(codes.astype(np.float32) * I16_NORM_F32, -1.0, 1.0).astype(np.float32)
        np.testing.assert_array_equal(out[0], expected)
        assert out[0, 0] == -1.0  # clamped full-scale negative

    def test_stereo_sample_channels(self):
        s = make_session()
        planar = np.stack([np.full(80, 0.25, np.float32), np.full(80, -0.5, np.float32)])
        sample = Sample.from_planar(planar, int(RATE), AudioFormat.F32, name="st")
        asset = s.sample_table.add_sample(sample, key="st")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(80), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=80)
        np.testing.assert_array_equal(out[0], 0.25)
        np.testing.assert_array_equal(out[1], -0.5)


class TestResampling:
    def test_speed_2_linear(self):
        s = make_session()
        data = np.arange(100, dtype=np.float32) / 128.0
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(60), asset=asset, speed=2.0)
        out = OracleRenderer(s, RATE, buffer_size=32).render(trim_frames=60)
        # x_j = 2j exactly -> out[j] = data[2j] for 2j < 100
        np.testing.assert_array_equal(out[0, :50], data[::2])
        np.testing.assert_array_equal(out[0, 50:], 0.0)

    def test_fractional_speed_lerp(self):
        s = make_session()
        rng = np.random.default_rng(3)
        data = (rng.standard_normal(400) * 0.25).astype(np.float32)
        asset = add_f32_asset(s, data)
        tr = s.add_track("t")
        speed = 1.5
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(200), asset=asset, speed=speed)
        out = OracleRenderer(s, RATE, buffer_size=64).render(trim_frames=200)

        # manual per-block-accumulated reference
        padded = np.concatenate([data, np.zeros(16, np.float32)])
        pos = 0.0
        expect = np.zeros(200, dtype=np.float32)
        for blk in range(0, 200, 64):
            n = min(64, 200 - blk)
            jj = np.arange(n, dtype=np.float64)
            x = pos + jj * speed
            valid = x < 400.0
            ix = np.trunc(x[valid]).astype(np.int64)
            fx = (x[valid] - ix).astype(np.float32)
            a, b = padded[ix], padded[ix + 1]
            expect[blk : blk + valid.sum()] = a + fx * (b - a)
            pos = pos + float(n) * speed
        np.testing.assert_array_equal(out[0], expect)

    def test_rate_mismatch_44k1(self):
        # 44.1k sample in the session: playback_speed = 44100/RATE.
        s = make_session()
        data = np.sin(np.arange(441) * 0.05).astype(np.float32)
        sample = Sample.from_planar(data[None], 44100, AudioFormat.F32, name="r")
        asset = s.sample_table.add_sample(sample, key="r")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, beats_for_frames(480), asset=asset)
        out = OracleRenderer(s, RATE, buffer_size=128).render(trim_frames=480)
        # spot check first block against direct lerp
        speed = 44100.0 / RATE
        x = np.arange(128, dtype=np.float64) * speed
        ix = np.trunc(x).astype(np.int64)
        fx = (x - ix).astype(np.float32)
        padded = np.concatenate([data, np.zeros(16, np.float32)])
        a, b = padded[ix], padded[ix + 1]
        np.testing.assert_array_equal(out[0, :128], a + fx * (b - a))
