"""In-kernel automation gains (ops/mix_pallas.py _lane_eval_kernel):
automation-only sessions render in the ONE fused Pallas pass — per-frame
volume/pan lane evaluation inside the kernel must match the XLA
finisher path (_frame_gains) it replaces."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.ops.automation import AutomationLane, CurveType, TrackAutomation
from whitebox_tpu.render.bounce import bounce

RATE = 48000.0


def _auto_session(seed=3, n_tracks=4, curves=False, fades=False):
    s = random_session(seed, rate=RATE, bpm=120.0, n_tracks=n_tracks,
                       formats=(AudioFormat.F32,), n_clips=2)
    for i, tr in enumerate(s.tracks[:-1]):  # last track stays constant-gain
        vol = AutomationLane().add(0.0, 1.0)
        if curves and i % 2 == 0:
            vol.add(1.5, 0.3, curve=CurveType.EXP_SINGLE, tension=2.0)
            vol.add(3.0, 0.9, curve=CurveType.POW_DUAL, tension=-1.0)
            vol.add(4.0, 0.5, curve=CurveType.HOLD)
        else:
            vol.add(2.0, 0.4).add(5.0, 0.9)
        pan = (AutomationLane().add(0.0, -0.8 + 0.2 * i).add(4.0, 0.8 - 0.2 * i)
               if i % 2 == 0 else None)
        tr.automation = TrackAutomation(volume=vol, pan=pan)
    if fades:
        for tr in s.tracks:
            for c in tr.clips:
                if c.is_audio() and c.audio is not None:
                    c.audio.fade_in = 0.1
                    c.audio.fade_out = 0.15
    return s


@pytest.mark.parametrize("curves", [False, True])
def test_kernel_gains_match_xla(curves):
    s = _auto_session(curves=curves)
    a = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
    b = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_allclose(a[:, :n], b[:, :n], atol=3e-6, rtol=1e-5)


def test_kernel_gains_with_fades():
    s = _auto_session(seed=5, fades=True)
    a = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
    b = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_allclose(a[:, :n], b[:, :n], atol=3e-6, rtol=1e-5)


def test_non_automated_tracks_stay_bit_exact():
    """Tracks without lanes must keep the constant-gain bit parity even
    when the session routes through the in-kernel automation path."""
    s = _auto_session(seed=7, n_tracks=3)
    # mute the automated tracks so only the constant-gain track sounds
    for tr in s.tracks[:-1]:
        tr.mute = True
    a = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
    s2 = _auto_session(seed=7, n_tracks=3)
    for tr in s2.tracks[:-1]:
        tr.mute = True
        tr.automation = None  # plain constant-gain fast path
    b = bounce(s2, RATE, engine="pallas", chunk_frames=8192).audio
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_array_equal(a[:, :n], b[:, :n])


def test_meters_still_use_finisher():
    """meters=True needs per-track signals: the session must take the
    finisher path (and agree with the kernel path on the mix)."""
    s = _auto_session(seed=9)
    res = bounce(s, RATE, engine="pallas", chunk_frames=8192, meters=True)
    assert res.stats.track_peak is not None
    a = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
    n = min(a.shape[1], res.audio.shape[1])
    np.testing.assert_allclose(a[:, :n], res.audio[:, :n], atol=3e-6, rtol=1e-5)
