"""Stems export: per-track post-fader renders that sum to the pre-master mix."""

import numpy as np

from tests.test_carve import random_session
from tests.test_effects_pipeline import add_effects
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.render.stems import render_stems

RATE = 48000.0


class TestStems:
    def test_stems_sum_to_premaster_mix(self):
        s = add_effects(random_session(20, rate=48000, bpm=120.0, n_tracks=3, n_clips=2),
                        master=False)
        stems, names = render_stems(s, RATE)
        assert stems.shape[0] == 3 and len(names) == 3
        mix = bounce(s, RATE).audio
        total = np.clip(stems.astype(np.float64).sum(axis=0), -1.0, 1.0).astype(np.float32)
        n = min(total.shape[1], mix.shape[1])
        # relaxed-association sum + scan-vs-scan chains: tiny float skew only
        np.testing.assert_allclose(total[:, :n], mix[:, :n], atol=5e-5)

    def test_stem_content_isolated(self):
        s = random_session(21, rate=48000, bpm=120.0, n_tracks=2, n_clips=1)
        stems, _ = render_stems(s, RATE)
        solo = []
        for t in range(2):
            keep_mute = [tr.mute for tr in s.tracks]
            for i, tr in enumerate(s.tracks):
                tr.mute = i != t
            solo.append(bounce(s, RATE).audio)
            for tr, m in zip(s.tracks, keep_mute):
                tr.mute = m
        for t in range(2):
            n = min(stems.shape[2], solo[t].shape[1])
            np.testing.assert_allclose(stems[t][:, :n],
                                       np.clip(solo[t][:, :n], -1.0, 1.0), atol=5e-5)


class TestStemsInterpolation:
    def test_stems_quality_modes(self):
        # stems carry the bounce interpolation modes; speed-1 rows bit-match
        from tests.test_carve import random_session
        from whitebox_tpu.render.stems import render_stems

        s = random_session(81, rate=48000, bpm=120.0, n_tracks=2, n_clips=2,
                           speeds=(44100.0 / 48000.0,), src_rates=(44100,))
        lin, names = render_stems(s, 48000.0)
        for mode in ("catmull", "sinc"):
            q, names2 = render_stems(s, 48000.0, interpolation=mode)
            assert names2 == names and q.shape == lin.shape
            assert np.abs(q - lin).max() > 0  # resampled rows differ

    def test_stems_sinc_matches_bounce_form(self):
        # stems play the SAME sinc quality form as bounce (the exact/Taylor
        # polyphase prerender): a solo'd sinc bounce == that track's stem
        from tests.test_carve import random_session
        from whitebox_tpu.render.bounce import bounce
        from whitebox_tpu.render.stems import render_stems

        s = random_session(82, rate=48000, bpm=120.0, n_tracks=2, n_clips=2,
                           speeds=(44100.0 / 48000.0,), src_rates=(44100,))
        stems, _ = render_stems(s, 48000.0, interpolation="sinc")
        for t in range(2):
            keep = [tr.mute for tr in s.tracks]
            for i, tr in enumerate(s.tracks):
                tr.mute = i != t
            solo = bounce(s, 48000.0, interpolation="sinc").audio
            for tr, m in zip(s.tracks, keep):
                tr.mute = m
            n = min(stems.shape[2], solo.shape[1])
            np.testing.assert_allclose(np.clip(stems[t][:, :n], -1.0, 1.0),
                                       solo[:, :n], atol=5e-5)
