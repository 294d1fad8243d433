"""Track freeze / bounce-in-place (Session.freeze_track): render parity,
restore, undo, and .wb persistence with sidecar WAVs for the in-memory
frozen render. Extension — the reference has no freeze (its export path
is a stub, SURVEY §2.9)."""

import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.effects import Biquad, EffectChain, Gain
from whitebox_tpu.render.bounce import bounce

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _fx_session(seed=41):
    s = random_session(seed, rate=RATE, bpm=120.0, n_tracks=3,
                       formats=(AudioFormat.F32,), n_clips=2)
    s.tracks[0].effects = EffectChain([Biquad("lowpass", 6000.0), Gain(-2.0)])
    s.tracks[0].volume_db = -4.0
    s.tracks[0].pan = 0.3
    return s


class TestFreeze:
    def test_frozen_mix_matches_live(self):
        s = _fx_session()
        live = bounce(s, RATE, engine="xla").audio
        s.freeze_track(0, RATE)
        assert s.tracks[0].frozen is not None
        assert not s.tracks[0].effects  # chain baked
        assert len(s.tracks[0].clips) == 1
        assert s.tracks[0].clips[0].audio.speed == 1.0
        frozen = bounce(s, RATE, engine="xla").audio
        n = min(live.shape[1], frozen.shape[1])
        err = rms(frozen[:, :n] - live[:, :n]) / max(rms(live[:, :n]), 1e-9)
        assert err < 1e-6, f"relative rms err {err}"

    def test_fader_stays_live_after_freeze(self):
        s = _fx_session()
        s.freeze_track(0, RATE)
        a = bounce(s, RATE, engine="xla").audio
        s.tracks[0].volume_db = -18.0  # ride the fader on the frozen track
        b = bounce(s, RATE, engine="xla").audio
        assert rms(b) < rms(a)  # gain change took effect without re-freezing

    def test_effect_lanes_bake(self):
        from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation

        s = _fx_session()
        s.tracks[0].automation = TrackAutomation(effects={
            (0, "freq_hz"): AutomationLane().add(0.0, 500.0).add(1.0, 8000.0)})
        live = bounce(s, RATE, engine="xla").audio
        s.freeze_track(0, RATE)
        assert not s.tracks[0].automation.effects  # lanes baked
        frozen = bounce(s, RATE, engine="xla").audio
        n = min(live.shape[1], frozen.shape[1])
        err = rms(frozen[:, :n] - live[:, :n]) / max(rms(live[:, :n]), 1e-9)
        assert err < 1e-6

    def test_unfreeze_restores(self):
        s = _fx_session()
        orig_clips = list(s.tracks[0].clips)
        orig_fx = s.tracks[0].effects
        s.freeze_track(0, RATE)
        s.unfreeze_track(0)
        assert s.tracks[0].clips == orig_clips
        assert s.tracks[0].effects is orig_fx
        assert s.tracks[0].frozen is None
        with pytest.raises(ValueError):
            s.unfreeze_track(0)

    def test_double_freeze_and_empty_raise(self):
        s = _fx_session()
        s.freeze_track(0, RATE)
        with pytest.raises(ValueError):
            s.freeze_track(0, RATE)
        s.add_track("empty")
        with pytest.raises(ValueError):
            s.freeze_track(len(s.tracks) - 1, RATE)

    def test_undo_redo(self):
        from whitebox_tpu.session.history import CommandManager, FreezeTrack, UnfreezeTrack

        s = _fx_session()
        live = bounce(s, RATE, engine="xla").audio
        mgr = CommandManager(s)
        mgr.execute(FreezeTrack(track_idx=0, sample_rate=RATE))
        assert s.tracks[0].frozen is not None
        mgr.undo()
        assert s.tracks[0].frozen is None
        back = bounce(s, RATE, engine="xla").audio
        n = min(live.shape[1], back.shape[1])
        np.testing.assert_array_equal(back[:, :n], live[:, :n])
        mgr.redo()
        assert s.tracks[0].frozen is not None
        mgr.execute(UnfreezeTrack(track_idx=0))
        assert s.tracks[0].frozen is None


class TestFreezePersistence:
    def test_wb_roundtrip_with_sidecar(self, tmp_path):
        from whitebox_tpu.io import wav
        from whitebox_tpu.session.project import read_project, write_project

        s = _fx_session()
        for k, a in s.sample_table.samples.items():
            p = tmp_path / f"{k}.wav"
            wav.write_wav(p, np.stack(a.sample.data), a.sample.sample_rate, AudioFormat.F32)
            a.sample.path = str(p)
        s.freeze_track(0, RATE)
        mix = bounce(s, RATE, engine="xla").audio

        path = tmp_path / "frozen.wb"
        write_project(s, path)
        # the in-memory frozen render got a sidecar WAV next to the project
        sidecars = list(tmp_path.glob("frozen_*frozen*.wav"))
        assert sidecars, list(tmp_path.iterdir())

        s2 = read_project(path)
        assert s2.tracks[0].frozen is not None
        assert len(s2.tracks[0].frozen["clips"]) == 2
        assert len(s2.tracks[0].frozen["effects"].effects) == 2
        mix2 = bounce(s2, RATE, engine="xla").audio
        n = min(mix.shape[1], mix2.shape[1])
        err = rms(mix2[:, :n] - mix[:, :n]) / max(rms(mix[:, :n]), 1e-9)
        assert err < 1e-6
        # unfreeze after reload restores the live arrangement
        s2.unfreeze_track(0)
        assert len(s2.tracks[0].clips) == 2
        live2 = bounce(s2, RATE, engine="xla").audio
        s3 = _fx_session()
        live = bounce(s3, RATE, engine="xla").audio
        n = min(live.shape[1], live2.shape[1])
        err = rms(live2[:, :n] - live[:, :n]) / max(rms(live[:, :n]), 1e-9)
        assert err < 1e-6


class TestReviewRegressions:
    def test_unfreeze_evicts_render_asset(self):
        s = _fx_session()
        n0 = len(s.sample_table.samples)
        s.freeze_track(0, RATE)
        assert len(s.sample_table.samples) == n0 + 1
        s.unfreeze_track(0)
        assert len(s.sample_table.samples) == n0  # no orphaned render

    def test_snapshot_isolates_frozen_stash(self):
        """Edits made after a session snapshot must not leak into the
        snapshot's freeze stash (undo would restore corrupted clips)."""
        from whitebox_tpu.session.history import BusAdd, CommandManager

        s = _fx_session()
        s.freeze_track(0, RATE)
        mgr = CommandManager(s)
        mgr.execute(BusAdd(bus_name="aux"))  # session snapshot while frozen
        s.unfreeze_track(0)
        orig = s.tracks[0].clips[0].min_time
        s.tracks[0].clips[0].min_time = orig + 7.0  # post-snapshot edit
        mgr.undo()  # back to frozen state
        assert s.tracks[0].frozen is not None
        assert s.tracks[0].frozen["clips"][0].min_time == pytest.approx(orig)
