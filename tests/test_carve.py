"""Carve correctness: the timeline-at-once segment compiler must reproduce
the block-sequential oracle bit-for-bit (exact f64 positions + f32 math),
across randomized sessions, formats, speeds, buffer sizes, and both exact
and drifty time grids."""

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.session import Session
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.carve import carve_session, render_segments_numpy
from whitebox_tpu.timeline.oracle import OracleRenderer
from whitebox_tpu.timeline.transport import BlockTransport


def random_session(seed, *, rate, bpm, n_tracks, formats=(AudioFormat.F32,), speeds=(1.0,), n_clips=3, playhead=0.0, src_rates=None):
    rng = np.random.default_rng(seed)
    s = Session(bpm=bpm)
    s.set_playhead_position(playhead)
    bd = s.beat_duration

    for t in range(n_tracks):
        fmt = formats[int(rng.integers(len(formats)))]
        n = int(rng.integers(500, 4000))
        if fmt == AudioFormat.F32:
            data = (rng.standard_normal((int(rng.integers(1, 3)), n)) * 0.3).astype(np.float32)
        elif fmt == AudioFormat.I16:
            data = rng.integers(-32768, 32768, size=(1, n)).astype(np.int16)
        elif fmt == AudioFormat.I24:
            data = rng.integers(-(1 << 23), 1 << 23, size=(1, n)).astype(np.int32)
        else:
            data = rng.integers(-(1 << 31), 1 << 31, size=(2, n)).astype(np.int32)
        src_rate = int(rng.choice(src_rates)) if src_rates else int(rate)
        sample = Sample.from_planar(data, src_rate, fmt, name=f"s{t}")
        asset = s.sample_table.add_sample(sample, key=f"s{t}")

        tr = s.add_track(
            f"t{t}",
            volume_db=float(rng.uniform(-12, 3)),
            pan=float(rng.uniform(-1, 1)),
            mute=bool(rng.random() < 0.1),
        )
        pos = float(rng.uniform(0, 2))
        for c in range(n_clips):
            length = float(rng.uniform(0.2, 3.0))
            speed = float(speeds[int(rng.integers(len(speeds)))])
            start_offset = float(int(rng.integers(0, max(n // 2, 1))))
            s.add_audio_clip(
                tr, f"c{c}", pos, pos + length,
                start_offset=start_offset, asset=asset,
                gain=float(rng.uniform(0.2, 1.2)), speed=speed,
            )
            pos += length + float(rng.uniform(0.0, 1.0))
    return s


def check_parity(session, rate, buffer_size, num_blocks=None, max_ulps=0):
    oracle = OracleRenderer(session, rate, buffer_size=buffer_size).render(num_blocks=num_blocks)
    table, pool = carve_session(session, rate, buffer_size=buffer_size,
                                num_blocks=oracle.shape[1] // buffer_size)
    ours = render_segments_numpy(table, pool, session)
    assert ours.shape == oracle.shape
    if max_ulps == 0:
        np.testing.assert_array_equal(ours, oracle)
    else:
        a = ours.view(np.int32).astype(np.int64)
        b = oracle.view(np.int32).astype(np.int64)
        ulps = np.abs(a - b)
        same_sign = (ours * oracle >= 0)
        assert np.all(same_sign)
        assert ulps.max() <= max_ulps, f"max ulp diff {ulps.max()}"


class TestCarveParityExactGrid:
    """32768 Hz / 60 bpm: dyadic grid, no drift."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("bufsize", [128, 512])
    def test_f32_speed1(self, seed, bufsize):
        s = random_session(seed, rate=32768, bpm=60, n_tracks=4)
        check_parity(s, 32768.0, bufsize)

    @pytest.mark.parametrize("seed", [10, 11])
    def test_all_formats(self, seed):
        s = random_session(
            seed, rate=32768, bpm=60, n_tracks=6,
            formats=(AudioFormat.F32, AudioFormat.I16, AudioFormat.I24, AudioFormat.I32),
        )
        check_parity(s, 32768.0, 256)

    @pytest.mark.parametrize("seed", [20, 21])
    def test_resampled_speeds(self, seed):
        s = random_session(seed, rate=32768, bpm=60, n_tracks=4, speeds=(0.5, 1.0, 1.37, 2.0))
        check_parity(s, 32768.0, 256)


class TestCarveParityDriftGrid:
    """48 kHz / 120-ish bpm: f64 playhead drift, truncation quirks live here."""

    @pytest.mark.parametrize("seed,bpm", [(0, 120.0), (1, 133.7), (2, 97.3)])
    def test_f32_speed1(self, seed, bpm):
        s = random_session(seed, rate=48000, bpm=bpm, n_tracks=4)
        check_parity(s, 48000.0, 512)

    @pytest.mark.parametrize("seed", [5, 6])
    def test_formats_and_rate_conversion(self, seed):
        s = random_session(
            seed, rate=48000, bpm=123.4, n_tracks=6,
            formats=(AudioFormat.F32, AudioFormat.I16, AudioFormat.I24),
            speeds=(1.0, 0.91875, 1.5),
        )
        check_parity(s, 48000.0, 512)

    def test_playhead_start_mid_session(self):
        s = random_session(42, rate=48000, bpm=120.0, n_tracks=3, playhead=1.3)
        check_parity(s, 48000.0, 256)


class TestCarveEdgeCases:
    def test_block_aligned_end_quirk(self):
        # the dropped-final-block quirk must carve identically
        s = Session(bpm=60.0)
        data = np.full((1, 128), 0.5, dtype=np.float32)
        asset = s.sample_table.add_sample(Sample.from_planar(data, 32768, AudioFormat.F32), key="a")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 128 / 32768.0, asset=asset)
        check_parity(s, 32768.0, 64)

    def test_overlap_raises(self):
        s = Session(bpm=60.0)
        data = np.zeros((1, 100), dtype=np.float32)
        asset = s.sample_table.add_sample(Sample.from_planar(data, 32768, AudioFormat.F32), key="a")
        tr = s.add_track("t")
        # bypass the edit API to build an invalid overlapping list
        from whitebox_tpu.session.clip import AudioClipData, Clip, ClipType

        tr.clips = [
            Clip(type=ClipType.AUDIO, min_time=0.0, max_time=1.0, audio=AudioClipData(asset=asset)),
            Clip(type=ClipType.AUDIO, min_time=0.5, max_time=1.5, audio=AudioClipData(asset=asset)),
        ]
        with pytest.raises(ValueError, match="overlapping"):
            carve_session(s, 32768.0, 64)

    def test_empty_session(self):
        s = Session()
        s.add_track("t")
        table, pool = carve_session(s, 48000.0, 512, num_blocks=4)
        assert len(table) == 0
        out = render_segments_numpy(table, pool, s)
        np.testing.assert_array_equal(out, 0.0)

    def test_segment_table_sorted(self):
        s = random_session(7, rate=48000, bpm=120.0, n_tracks=3)
        table, _ = carve_session(s, 48000.0, 512)
        order = np.lexsort((table.dst_start, table.track))
        np.testing.assert_array_equal(order, np.arange(len(table)))


class TestSlowEmitRuns:
    """slow_emit="runs": closed-form run rows for non-exhausting resampled
    passes — must render identically to the blockwise table through the
    Pallas path (whose plan merges blocks into the same closed-form runs)."""

    def _long_sample_session(self):
        # samples long enough that no pass exhausts -> run rows eligible
        from whitebox_tpu.core.formats import AudioFormat as AF
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        rng = np.random.default_rng(61)
        s = Session(bpm=120.0)
        for t in range(3):
            x = (rng.standard_normal((1, 44100 * 3)) * 0.3).astype(np.float32)
            a = s.sample_table.add_sample(Sample.from_planar(x, 44100, AF.F32), key=f"s{t}")
            tr = s.add_track(f"t{t}", volume_db=float(rng.uniform(-6, 0)))
            pos = float(rng.uniform(0, 1))
            for c in range(2):
                ln = float(rng.uniform(0.5, 1.5))
                s.add_audio_clip(tr, f"c{c}", pos, pos + ln, asset=a,
                                 speed=float(rng.choice([0.5, 0.91875, 1.37])),
                                 start_offset=float(int(rng.integers(0, 1000))))
                pos += ln + 0.3
        return s

    def test_pallas_render_bit_identical(self):
        from whitebox_tpu.ops.mix_pallas import render_timeline_pallas

        s = self._long_sample_session()
        tb, pb = carve_session(s, 48000.0, buffer_size=512)
        tr, pr = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        assert len(tr) < len(tb)
        a = render_timeline_pallas(tb, pb, s, tile=2048, interpret=True)
        b = render_timeline_pallas(tr, pr, s, tile=2048, interpret=True)
        np.testing.assert_array_equal(a, b)

    def test_exhausting_pass_stays_blockwise_exact(self):
        # a clip that outruns its sample: the runs mode must fall back to
        # the per-block exhaust math -> identical tables
        from whitebox_tpu.core.formats import AudioFormat as AF
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.sample import Sample

        rng = np.random.default_rng(0)
        s = Session(bpm=60.0)
        short = (rng.standard_normal(2000) * 0.4).astype(np.float32)
        a = s.sample_table.add_sample(Sample.from_planar(short[None], 44100, AF.F32), key="s")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 2.0, asset=a)  # far longer than 2000 frames
        tb, pb = carve_session(s, 48000.0, buffer_size=512)
        trn, prn = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        # the exhaust (wrap) frame is bit-identical: the final audible frame
        # must agree exactly between the modes
        eb = tb.dst_start + tb.length
        er = trn.dst_start + trn.length
        assert int(eb.max()) == int(er.max())
        # pallas render identical (the plan evaluates both as the same runs)
        from whitebox_tpu.ops.mix_pallas import render_timeline_pallas

        a_ = render_timeline_pallas(tb, pb, s, tile=1024, interpret=True)
        b_ = render_timeline_pallas(trn, prn, s, tile=1024, interpret=True)
        np.testing.assert_array_equal(a_, b_)

    def test_loop_modes_identical_tables(self):
        # loop wraps always exhaust -> runs mode must produce the same rows
        from whitebox_tpu.core.formats import AudioFormat as AF
        from whitebox_tpu.session import Session
        from whitebox_tpu.session.clip import ClipMode
        from whitebox_tpu.session.sample import Sample

        rng = np.random.default_rng(1)
        s = Session(bpm=60.0)
        x = (rng.standard_normal(3000) * 0.4).astype(np.float32)
        a = s.sample_table.add_sample(Sample.from_planar(x[None], 44100, AF.F32), key="s")
        tr = s.add_track("t")
        s.add_audio_clip(tr, "c", 0.0, 1.5, asset=a)
        c = tr.clips[0]
        for mode in (ClipMode.LOOP_STRAIGHT, ClipMode.LOOP_REVERSE, ClipMode.LOOP_BIDIRECTIONAL):
            c.audio.mode = mode
            tb, pb = carve_session(s, 48000.0, buffer_size=512)
            trn, prn = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
            # wrap points (pass boundaries) are bit-identical: every runs-mode
            # pass start must exist among the blockwise pass starts
            starts_b = set(map(int, tb.dst_start))
            assert set(map(int, trn.dst_start)) <= starts_b, mode
            assert int((tb.dst_start + tb.length).max()) == int((trn.dst_start + trn.length).max()), mode
            # host renders agree within the resampling phase contract
            a_ = render_segments_numpy(tb, pb, s)
            b_ = render_segments_numpy(trn, prn, s)
            np.testing.assert_allclose(a_, b_, atol=2.4e-7)
