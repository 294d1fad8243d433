"""Native C++ carve (native/wb_carve.cpp) vs the Python reference walk.

The native carve is a bit-parity port of timeline/carve._carve_track_audio;
these tests fuzz the two implementations against each other column-by-column
across all clip modes, speeds, fades, offsets, playheads and both slow_emit
forms. Any divergence — one f64 rounding, one row, one flag — fails."""

import numpy as np
import pytest

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.io import native
from whitebox_tpu.session import Session
from whitebox_tpu.session.clip import ClipMode
from whitebox_tpu.session.sample import Sample
from whitebox_tpu.timeline.carve import carve_session

pytestmark = pytest.mark.skipif(not native.has_carve(),
                                reason="native carve runtime unavailable")

COLS = ("track", "dst_start", "length", "sample_id", "src_int", "src_frac",
        "speed", "gain", "fast", "clamp", "clip_id", "fin_start", "fin_inv",
        "fout_end", "fout_inv")

SPEEDS = (1.0, 0.5, 2.0, 44100.0 / 48000.0, 1.088435374149660, 0.333,
          1.0000001, 3.7)
MODES = tuple(ClipMode)


def _rand_session(rng: np.random.Generator) -> Session:
    s = Session(bpm=float(rng.uniform(40.0, 220.0)))
    n_samples = int(rng.integers(1, 4))
    assets = []
    for i in range(n_samples):
        n = int(rng.integers(8, 6000))
        rate = int(rng.choice([32768, 44100, 48000, 96000]))
        if rng.random() < 0.5:
            data = rng.uniform(-1, 1, (2, n)).astype(np.float32)
            smp = Sample.from_planar(data, rate, AudioFormat.F32)
        else:
            data = rng.integers(-32768, 32768, (2, n)).astype(np.int16)
            smp = Sample.from_planar(data, rate, AudioFormat.I16)
        assets.append(s.sample_table.add_sample(smp, key=f"s{i}"))
    for t in range(int(rng.integers(1, 5))):
        tr = s.add_track(f"t{t}")
        pos = float(rng.uniform(0.0, 0.5))
        for c in range(int(rng.integers(0, 6))):
            length = float(rng.uniform(0.05, 2.5))
            asset = assets[int(rng.integers(0, n_samples))]
            kw = {}
            if rng.random() < 0.4:
                kw["fade_start"] = float(rng.uniform(0.0, length * 0.4))
            if rng.random() < 0.4:
                kw["fade_end"] = float(rng.uniform(0.0, length * 0.4))
            s.add_audio_clip(
                tr, f"c{c}", pos, pos + length,
                start_offset=float(rng.choice([0.0, 1.0, 7.25,
                                               rng.uniform(0, 8000)])),
                asset=asset,
                speed=float(rng.choice(SPEEDS)),
                gain=float(rng.uniform(0.1, 1.5)),
                **kw,
            )
            clip = tr.clips[-1]
            clip.audio.mode = ClipMode(int(rng.choice(MODES)))
            pos += length + float(rng.uniform(0.0, 0.8))
    return s


def _assert_tables_equal(t1, t2, ctx):
    assert len(t1.track) == len(t2.track), f"{ctx}: row count {len(t1.track)} != {len(t2.track)}"
    for f in COLS:
        a, b = getattr(t1, f), getattr(t2, f)
        if not np.array_equal(a, b):
            bad = np.nonzero(a != b)[0][:4]
            raise AssertionError(f"{ctx}: column {f} differs at rows {bad}: "
                                 f"{a[bad]} vs {b[bad]}")
    assert t1.num_tracks == t2.num_tracks
    assert t1.total_frames == t2.total_frames


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    s = _rand_session(rng)
    rate = float(rng.choice([44100.0, 48000.0]))
    bs = int(rng.choice([128, 256, 512]))
    playhead = float(rng.choice([0.0, 0.0, rng.uniform(0.0, 1.5)]))
    s.playhead_start = playhead
    for emit in ("runs", "blocks"):
        t_py, pool = carve_session(s, rate, buffer_size=bs, slow_emit=emit,
                                   native=False)
        t_nat, _ = carve_session(s, rate, buffer_size=bs, slow_emit=emit,
                                 native=True, pool=pool)
        _assert_tables_equal(t_py, t_nat, f"seed={seed} emit={emit} bs={bs}")


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_native_matches_python_mapped(seed):
    """Tempo-mapped sessions on the native walk (v3 ABI: event positions
    precomputed host-side with the TempoMap closed forms) must bit-match
    the Python walk column-by-column, exactly like the unmapped fuzz."""
    rng = np.random.default_rng(10_000 + seed)
    s = _rand_session(rng)
    for _ in range(int(rng.integers(1, 4))):
        kw = {}
        curve = str(rng.choice(["step", "linear"]))
        if curve == "linear" and rng.random() < 0.5:
            kw["bpm_end"] = float(rng.uniform(50, 200))
        s.set_tempo_point(float(rng.uniform(0.1, 8.0)),
                          float(rng.uniform(50, 200)), curve=curve, **kw)
    rate = float(rng.choice([44100.0, 48000.0]))
    bs = int(rng.choice([128, 256, 512]))
    s.playhead_start = float(rng.choice([0.0, 0.0, rng.uniform(0.0, 1.5)]))
    for emit in ("runs", "blocks"):
        t_py, pool = carve_session(s, rate, buffer_size=bs, slow_emit=emit,
                                   native=False)
        t_nat, _ = carve_session(s, rate, buffer_size=bs, slow_emit=emit,
                                 native=True, pool=pool)
        _assert_tables_equal(t_py, t_nat, f"mapped seed={seed} emit={emit} bs={bs}")


def test_degenerate_speed_exceeds_count():
    """speed > count-1 exhausts the source within one frame; the stall-retry
    logic in bidirectional mode must agree between the two walks."""
    s = Session(bpm=60.0)
    data = np.linspace(-0.5, 0.5, 4, dtype=np.float32)[None].repeat(2, 0).copy()
    asset = s.sample_table.add_sample(Sample.from_planar(data, 48000, AudioFormat.F32), key="a")
    tr = s.add_track("t")
    s.add_audio_clip(tr, "c", 0.0, 1.0, asset=asset, speed=8.0)
    for mode in MODES:
        tr.clips[0].audio.mode = mode
        for emit in ("runs", "blocks"):
            t_py, pool = carve_session(s, 48000.0, buffer_size=256, slow_emit=emit,
                                       native=False)
            t_nat, _ = carve_session(s, 48000.0, buffer_size=256, slow_emit=emit,
                                     native=True, pool=pool)
            _assert_tables_equal(t_py, t_nat, f"mode={mode} emit={emit}")


def test_overlap_raises_same_error():
    s = Session(bpm=120.0)
    data = np.zeros((2, 64), dtype=np.float32)
    asset = s.sample_table.add_sample(Sample.from_planar(data, 48000, AudioFormat.F32), key="a")
    tr = s.add_track("t")
    s.add_audio_clip(tr, "a", 0.0, 1.0, asset=asset)
    s.add_audio_clip(tr, "b", 2.0, 3.0, asset=asset)
    tr.clips[1].min_time = 0.5  # direct mutation bypassing the edit API
    with pytest.raises(ValueError, match="overlapping clips"):
        carve_session(s, 48000.0, native=False)
    with pytest.raises(ValueError, match="overlapping clips"):
        carve_session(s, 48000.0, native=True)


def test_mid_window_playhead_and_long_offsets():
    """Mid-clip render starts (first_mid_start path) with fades + offsets."""
    rng = np.random.default_rng(123)
    s = Session(bpm=97.3)
    n = 40000
    data = rng.uniform(-1, 1, (2, n)).astype(np.float32)
    asset = s.sample_table.add_sample(Sample.from_planar(data, 44100, AudioFormat.F32), key="a")
    tr = s.add_track("t")
    s.add_audio_clip(tr, "c", 0.0, 6.0, start_offset=12345.0, asset=asset,
                     speed=44100.0 / 48000.0, fade_start=0.8, fade_end=1.1)
    for playhead in (0.0, 0.4, 2.77):
        s.playhead_start = playhead
        for emit in ("runs", "blocks"):
            t_py, pool = carve_session(s, 48000.0, buffer_size=512, slow_emit=emit,
                                       native=False)
            t_nat, _ = carve_session(s, 48000.0, buffer_size=512, slow_emit=emit,
                                     native=True, pool=pool)
            _assert_tables_equal(t_py, t_nat, f"playhead={playhead} emit={emit}")
