"""Cross-feature interaction fuzz (round-3 features composed in ONE
session): tempo maps (step + linear ramps) x meter maps x bus routing
(groups/sends/sidechain) x track/bus automation x PDC x freeze x bus stems
x HBM streaming, asserted against the composed f64/oracle references.

The reference integrates every feature in one process loop
(engine.cpp:1576-1654); each round-3 feature was validated against its own
reference in isolation — this suite proves the same composition property
for the rebuilt pipeline: a random draw over the full feature surface must
match carve(oracle-exact per-track) -> reference_routed_finish(f64).

Seeds: 50 topologies total; a fast slice runs in the default loop, the
rest are slow-marked (full-suite only).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.effects import (
    Biquad, Compressor, EffectChain, Gain, Limiter, ParametricEQ,
)
from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
from whitebox_tpu.render.bounce import bounce
from whitebox_tpu.render.routing import reference_routed_finish
from whitebox_tpu.timeline.carve import (
    carve_session, render_segments_per_track_numpy,
)

RATE = 48000.0
FAST_SEEDS = [0, 1, 2]
SLOW_SEEDS = list(range(3, 50))


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def build_session(seed):
    """One random draw over the composed feature surface.

    Track count and the chain vocabulary are intentionally small/fixed so
    chunked-render programs share signatures across seeds (compile reuse
    keeps 50 topologies affordable); the *topology* — map points, routing
    edges, lane shapes, PDC — is what varies.
    """
    rng = np.random.default_rng(1000 + seed)
    s = random_session(seed, rate=RATE, bpm=float(rng.uniform(80, 160)),
                       n_tracks=4, formats=(AudioFormat.F32,), n_clips=2)
    return s, _dress_topology(s, rng)


def _dress_topology(s, rng):
    """Apply the shared composition vocabulary (tempo/meter maps, bus
    routing + sends + sidechain, track/bus chains, fader/pan lanes,
    master + PDC) to an existing session; returns the drawn pdc flag."""
    # tempo map: 1-3 extra points, mixed step/linear, sometimes ramp targets
    for _ in range(int(rng.integers(1, 4))):
        kw = {}
        curve = str(rng.choice(["step", "linear"]))
        if curve == "linear" and rng.random() < 0.5:
            kw["bpm_end"] = float(rng.uniform(60, 180))
        s.set_tempo_point(float(rng.uniform(0.25, 10.0)),
                          float(rng.uniform(60, 180)), curve=curve, **kw)
    # meter map: bar|beat addressing must coexist with the tempo map
    if rng.random() < 0.5:
        s.set_meter(int(rng.integers(1, 4)), int(rng.integers(2, 8)),
                    int(rng.choice([4, 8])))

    # routing topology
    B = int(rng.integers(1, 3))
    for b in range(B):
        bus = s.add_bus(f"b{b}", volume_db=float(rng.uniform(-9, 3)),
                        pan=float(rng.uniform(-0.6, 0.6)))
        kind = int(rng.integers(4))
        if kind == 1:
            bus.effects = EffectChain([Biquad("lowpass", float(rng.uniform(900, 11000)))])
        elif kind == 2:
            bus.effects = EffectChain([Gain(float(rng.uniform(-6, 3))),
                                       Biquad("highpass", float(rng.uniform(40, 300)))])
        elif kind == 3:
            bus.effects = EffectChain([
                Compressor(-24.0, 4.0, sidechain=bool(rng.random() < 0.5))])
        if rng.random() < 0.4:
            bus.automation = TrackAutomation(
                volume=AutomationLane().add(0.0, float(rng.uniform(0.3, 1.0)))
                                       .add(3.0, float(rng.uniform(0.1, 1.0))))
    for t in range(4):
        if rng.random() < 0.5:
            s.set_track_output(t, int(rng.integers(B)))
        for _ in range(int(rng.integers(0, 2))):
            s.add_send(t, int(rng.integers(B)),
                       gain_db=float(rng.uniform(-12, 0)),
                       pre_fader=bool(rng.random() < 0.3),
                       sidechain=bool(rng.random() < 0.25))
    # track chains + automation lanes (fader + pan)
    for t in range(4):
        if rng.random() < 0.4:
            s.tracks[t].effects = EffectChain([
                Biquad("lowpass", float(rng.uniform(2000, 14000)))])
        if rng.random() < 0.5:
            s.tracks[t].automation = TrackAutomation(
                volume=AutomationLane().add(0.0, 1.0)
                                       .add(2.0, float(rng.uniform(0.2, 1.0)))
                                       .add(5.0, float(rng.uniform(0.4, 1.0))),
                pan=(AutomationLane().add(0.0, float(rng.uniform(-0.8, 0.0)))
                                     .add(4.0, float(rng.uniform(0.0, 0.8)))
                     if rng.random() < 0.5 else None),
            )
    # master chain; a lookahead limiter exercises PDC's head trim
    pdc = bool(rng.random() < 0.4)
    if rng.random() < 0.6:
        fx = [Biquad("highpass", float(rng.uniform(20, 60)))]
        if pdc and rng.random() < 0.5:
            fx.append(Limiter(-0.5))
        s.master_effects = EffectChain(fx)
    return pdc


def _composed_reference(s, pdc):
    """carve (oracle-contract exact) -> routed f64 finish."""
    table, pool = carve_session(s, RATE, buffer_size=512)
    pt = render_segments_per_track_numpy(table, pool)
    return reference_routed_finish(pt, s, RATE, 2, pdc=pdc)


def _check_seed(seed):
    s, pdc = build_session(seed)
    from whitebox_tpu.session.bus import session_has_routing

    if not session_has_routing(s):
        # the draw produced a flat session: still a valid composition
        # (tempo map + lanes + chains through the scan/generic path)
        pdc = False
    res = bounce(s, RATE, engine="xla", chunk_frames=8192, pdc=pdc)
    ref = _composed_reference(s, pdc)
    n = min(res.audio.shape[1], ref.shape[1])
    r = max(rms(ref[:, :n]), 1e-9)
    err = rms(res.audio[:, :n] - ref[:, :n]) / r
    assert err < 8e-5, f"seed {seed} (pdc={pdc}): relative rms err {err}"


class TestComposedTopologies:
    @pytest.mark.parametrize("seed", FAST_SEEDS)
    def test_composed_render_matches_reference(self, seed):
        _check_seed(seed)

    @pytest.mark.slow
    @pytest.mark.parametrize("seed", SLOW_SEEDS)
    def test_composed_render_matches_reference_slow(self, seed):
        _check_seed(seed)


# ---------------------------------------------------------------------------
# Full-surface fuzz through the PRODUCTION engine (VERDICT r4 #4): the same
# composed topologies PLUS resampled clips (rational + irrational speeds),
# loop modes (reverse/bidirectional/straight), interpolation="sinc" (the
# Taylor/exact prerender), and MIDI clips with CC->param lanes — asserted
# through engine="pallas" (the in-kernel lane path + fused mix kernel), not
# the XLA mirror. The reference composes carve(+host prerender mirror) ->
# synth numpy -> routed f64 finish.
# ---------------------------------------------------------------------------

# seed 111's draw (sinc + Taylor prerender + MIDI + chains + buses, no
# PDC) is the cheapest full-vocabulary composition (~70 s CPU, compile-
# dominated); the PDC+sinc+routed draws compile >100 s and live in the
# slow tier with the rest
FULL_FAST_SEEDS = [111]
FULL_SLOW_SEEDS = [s for s in range(100, 130) if s not in FULL_FAST_SEEDS]

_SPEED_MENU = (0.5, 160.0 / 147.0, 2.0 ** (1.0 / 12.0), 1.0881922865173543)
_LOOPABLE = ("ONE_SHOT_REVERSE", "LOOP_STRAIGHT", "LOOP_REVERSE",
             "LOOP_BIDIRECTIONAL")


def build_session_full(seed):
    """v2 draw: the v1 topology vocabulary + resampled material + loop
    modes + MIDI/CC + a sinc-interpolation coin."""
    from whitebox_tpu.midi.cc import apply_cc_map
    from whitebox_tpu.midi.notes import MidiCCEvent, MidiNote, MidiNoteBuffer
    from whitebox_tpu.session.clip import ClipMode

    rng = np.random.default_rng(2000 + seed)
    speeds = [1.0]
    if rng.random() < 0.8:
        speeds += list(rng.choice(_SPEED_MENU, size=int(rng.integers(1, 3)),
                                  replace=False))
    s = random_session(seed, rate=RATE, bpm=float(rng.uniform(80, 160)),
                       n_tracks=4, formats=(AudioFormat.F32,), n_clips=2,
                       speeds=tuple(float(x) for x in speeds))

    # loop modes on a slice of the audio clips (all five carve passes)
    for tr in s.tracks:
        for c in tr.clips:
            if c.is_audio() and c.audio is not None and rng.random() < 0.35:
                c.audio.mode = ClipMode[str(rng.choice(_LOOPABLE))]

    pdc = _dress_topology(s, rng)

    # a MIDI track: random notes through the built-in synth; sometimes a
    # CC lane driving its chain's Biquad cutoff (midi/cc.py routing)
    if rng.random() < 0.7:
        n_notes = int(rng.integers(2, 6))
        t0s = np.sort(rng.uniform(0.0, 6.0, n_notes))
        notes = [MidiNote(float(t), float(t + rng.uniform(0.2, 1.5)),
                          key=int(rng.integers(40, 90)),
                          velocity=float(rng.uniform(0.3, 1.0)))
                 for t in t0s]
        cc = []
        if rng.random() < 0.6:
            cc = [MidiCCEvent(float(x), 1, float(rng.uniform(0, 1)))
                  for x in np.sort(rng.uniform(0.0, 6.0, 3))]
        asset = s.midi_table.create_midi(MidiNoteBuffer(notes, cc=cc))
        mt = s.add_track("midi", volume_db=float(rng.uniform(-9, 0)),
                         pan=float(rng.uniform(-0.5, 0.5)))
        s.add_midi_clip(mt, "mc", 0.0, float(rng.uniform(4.0, 8.0)), asset=asset)
        mi = s.tracks.index(mt)
        if rng.random() < 0.6:
            mt.effects = EffectChain([Biquad("lowpass", 6000.0, 0.9)])
            if cc:
                apply_cc_map(s, mi, {1: (0, "freq_hz", 500.0, 9000.0)})
        if s.buses and rng.random() < 0.5:
            s.set_track_output(mi, int(rng.integers(len(s.buses))))

    table, _ = carve_session(s, RATE, buffer_size=512)
    has_slow = bool(len(table)) and not table.fast.all()
    interpolation = "sinc" if (has_slow and rng.random() < 0.6) else "linear"
    return s, pdc, interpolation


def _add_synth_numpy(s, pt):
    """Host mirror of bounce._add_synth: the built-in synth's numpy
    reference added to each MIDI track's per-track rows."""
    from whitebox_tpu.midi.synth import build_slot_segments, render_synth_numpy
    from whitebox_tpu.midi.voice import carve_midi_events

    F = pt.shape[2]
    events = carve_midi_events(s, RATE, 512, F // 512)
    pt = pt.copy()
    for t, evs in events.items():
        ns, segs = build_slot_segments(evs)
        if segs is None:
            continue
        pt[t] += render_synth_numpy(segs, RATE, F, ns)[None, :]
    return pt


def _composed_reference_full(s, pdc, interpolation):
    """carve (+ host prerender mirror under sinc) -> synth numpy ->
    routed f64 finish."""
    from whitebox_tpu.timeline.prerender import apply_prerender_host, plan_prerender

    if interpolation == "sinc":
        table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
        plan = plan_prerender(table, pool, partial=True)
        if plan is not None:
            assert plan.uncovered_rows is None, "fuzz speeds must be coverable"
            table, pool = apply_prerender_host(table, pool, plan)
    else:
        table, pool = carve_session(s, RATE, buffer_size=512)
    pt = render_segments_per_track_numpy(table, pool)
    pt = _add_synth_numpy(s, pt)
    return reference_routed_finish(pt, s, RATE, 2, pdc=pdc)


def _check_seed_full(seed):
    s, pdc, interpolation = build_session_full(seed)
    from whitebox_tpu.session.bus import session_has_routing

    if not session_has_routing(s):
        pdc = False
    res = bounce(s, RATE, engine="pallas", chunk_frames=8192, pdc=pdc,
                 interpolation=interpolation)
    ref = _composed_reference_full(s, pdc, interpolation)
    n = min(res.audio.shape[1], ref.shape[1])
    r = max(rms(ref[:, :n]), 1e-9)
    err = rms(res.audio[:, :n] - ref[:, :n]) / r
    assert err < 8e-5, (
        f"seed {seed} (pdc={pdc}, interp={interpolation}): rel rms err {err}")


class TestComposedFullSurfacePallas:
    @pytest.mark.parametrize("seed", FULL_FAST_SEEDS)
    def test_full_surface_pallas_matches_reference(self, seed):
        _check_seed_full(seed)

    @pytest.mark.slow
    @pytest.mark.parametrize("seed", FULL_SLOW_SEEDS)
    def test_full_surface_pallas_matches_reference_slow(self, seed):
        _check_seed_full(seed)


@pytest.mark.slow
class TestComposedFreeze:
    @pytest.mark.parametrize("seed", [3, 7])
    def test_freeze_under_map_and_routing(self, seed):
        """Freezing a track must not change the composed mix (post-chain
        pre-fader bake must commute with tempo maps + routing)."""
        s, _ = build_session(seed)
        live = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        # freeze a track that has a chain if any, else track 0
        slot = next((i for i, t in enumerate(s.tracks) if t.effects is not None), 0)
        s.freeze_track(slot, RATE)
        frozen = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        n = min(live.shape[1], frozen.shape[1])
        err = rms(frozen[:, :n] - live[:, :n]) / max(rms(live[:, :n]), 1e-9)
        assert err < 5e-5, f"seed {seed}: freeze divergence {err}"


@pytest.mark.slow
class TestComposedStreaming:
    @pytest.mark.parametrize("seed", [1, 4])
    def test_streamed_matches_bounce(self, seed):
        """HBM-streamed render == one-shot bounce for the composed session
        (window split must preserve routing state handoff + mapped lanes)."""
        from whitebox_tpu.render.stream_pool import bounce_streamed

        s, _ = build_session(seed)
        full = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        streamed = bounce_streamed(s, RATE, max_pool_bytes=1 << 20,
                                   window_frames=1 << 15)
        n = min(full.shape[1], streamed.shape[1])
        d = float(np.abs(full[:, :n] - streamed[:, :n]).max())
        assert d <= 2.4e-7, f"seed {seed}: streamed divergence {d}"


@pytest.mark.slow
class TestComposedStems:
    def test_stems_reconstruct_under_map(self):
        """direct + sum(bus stems) -> master == full bounce, with a tempo
        ramp + sidechain in play."""
        from whitebox_tpu.render.stems import render_bus_stems

        s, _ = build_session(2)
        from whitebox_tpu.session.bus import session_has_routing

        if not session_has_routing(s):
            s.set_track_output(0, 0)
        direct, bus, names = render_bus_stems(s, RATE)
        total = jnp.asarray(direct + bus.sum(axis=0))
        master = s.master_effects
        if master is not None:
            mc = master if isinstance(master, EffectChain) else EffectChain(list(master))
            mc.prepare(RATE, 2)
            total, _ = mc.process(total, mc.init_state(2))
        recon = np.clip(np.asarray(total), -1.0, 1.0)
        full = bounce(s, RATE, engine="xla", chunk_frames=8192).audio
        n = min(recon.shape[1], full.shape[1])
        err = rms(recon[:, :n] - full[:, :n]) / max(rms(full[:, :n]), 1e-9)
        assert err < 5e-5, f"relative rms err {err}"
