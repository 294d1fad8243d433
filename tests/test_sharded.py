"""Multi-chip sharded render on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.ops.mix import pack_device_tables, render_chunk
from whitebox_tpu.parallel.mesh import make_render_mesh
from whitebox_tpu.parallel.render_sharded import render_chunk_sharded, shard_tables
from whitebox_tpu.timeline.carve import carve_session


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh (see conftest)"
    return make_render_mesh(tracks_parallel=2, frames_parallel=4)


def test_mesh_defaults():
    m = make_render_mesh()
    assert m.shape["tracks"] * m.shape["frames"] == len(jax.devices())


def test_sharded_matches_single_chip(mesh):
    s = random_session(3, rate=48000, bpm=120.0, n_tracks=8, n_clips=2)
    table, pool = carve_session(s, 48000.0, buffer_size=512)
    dev = pack_device_tables(table, pool, s, pad_tracks_to=8)
    jt = dev.as_jax()
    pool_dev = jnp.asarray(pool.data)

    frames = 8192
    single = render_chunk(pool_dev, jt, jnp.int32(0), frames=frames)
    sharded_tables = shard_tables(jt, mesh)
    multi = render_chunk_sharded(pool_dev, sharded_tables, jnp.int32(0), frames=frames, mesh=mesh)

    # psum association differs from the flat scan; tolerance, not bit-equal.
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single), atol=2e-6, rtol=1e-5)


def test_sharded_output_sharding(mesh):
    s = random_session(4, rate=48000, bpm=120.0, n_tracks=4, n_clips=1)
    table, pool = carve_session(s, 48000.0, buffer_size=512)
    dev = pack_device_tables(table, pool, s, pad_tracks_to=8)
    jt = shard_tables(dev.as_jax(), mesh)
    out = render_chunk_sharded(jnp.asarray(pool.data), jt, jnp.int32(0), frames=4096, mesh=mesh)
    assert out.shape == (2, 4096)
    # output is sharded along frames
    assert len(out.sharding.device_set) == 8


@pytest.mark.slow
def test_bounce_sharded_end_to_end(mesh):
    # the session-level multi-chip pipeline: carve -> shard -> mix+psum ->
    # sharded master chain; matches the single-chip XLA bounce
    from whitebox_tpu.effects import Compressor, NoiseGate
    from whitebox_tpu.parallel.render_sharded import bounce_sharded
    from whitebox_tpu.render.bounce import bounce

    s = random_session(6, rate=48000, bpm=120.0, n_tracks=8, n_clips=2)
    single = bounce(s, 48000.0, engine="xla").audio
    multi = bounce_sharded(s, 48000.0, mesh)
    n = min(single.shape[1], multi.shape[1])
    np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=2e-6, rtol=1e-5)

    # with a master chain: reference = single-chip chain over the mix
    chain = [NoiseGate(-50.0), Compressor(-18.0, 4.0)]
    multi_fx = bounce_sharded(s, 48000.0, mesh, master_effects=chain)
    ref = jnp.asarray(np.pad(single, ((0, 0), (0, multi_fx.shape[1] - single.shape[1]))))
    for e in [NoiseGate(-50.0), Compressor(-18.0, 4.0)]:
        e.prepare(48000.0, 2)
        ref, _ = e.process(ref, e.init_state(2))
    scale = max(float(np.max(np.abs(np.asarray(ref)))), 1e-6)
    err = np.max(np.abs(multi_fx - np.asarray(ref))) / scale
    assert err < 5e-5, f"sharded master chain rel err {err:.2e}"


@pytest.mark.slow
def test_bounce_sharded_with_track_chains(mesh):
    # per-track chains frame-shard on a frames-only mesh; must match the
    # single-chip generic pipeline
    from whitebox_tpu.effects import Biquad, Compressor, EffectChain, Gain
    from whitebox_tpu.parallel.render_sharded import bounce_sharded
    from whitebox_tpu.timeline.carve import carve_session, render_segments_per_track_numpy

    s = random_session(8, rate=48000, bpm=120.0, n_tracks=4, n_clips=2)
    s.tracks[0].effects = EffectChain([Gain(-2.0), Biquad("lowpass", 5000.0)])
    s.tracks[1].effects = EffectChain([Compressor(-20.0, 3.0)])
    s.tracks[2].effects = EffectChain([Gain(-2.0), Biquad("lowpass", 6500.0)])  # groups w/ track 0
    s.master_effects = EffectChain([Biquad("highpass", 30.0)])

    fmesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
    multi = bounce_sharded(s, 48000.0, fmesh)

    # single-chip reference built directly from the pipeline order
    # (chains -> gains -> ordered sum -> master -> clip) with one-shot
    # Effect.process — sidesteps the generic scan's huge XLA-CPU compile
    table, pool = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
    pt = render_segments_per_track_numpy(table, pool, 2)  # [T, C, F]
    F = pt.shape[-1]
    pad = multi.shape[1] - F
    ref = np.zeros((2, multi.shape[1]), dtype=np.float32)
    for t, track in enumerate(s.tracks):
        y = jnp.asarray(np.pad(pt[t], ((0, 0), (0, pad))))
        if track.effects:
            for e in track.effects.effects:
                e.prepare(48000.0, 2)
                y, _ = e.process(y, e.init_state(2))
        vol = np.float32(0.0) if track.mute else track.volume_linear
        pan = track.pan_coeffs
        g = np.asarray([vol * np.float32(pan[c % 2]) for c in range(2)], np.float32)
        ref = ref + np.asarray(y) * g[:, None]
    m = jnp.asarray(ref)
    for e in s.master_effects.effects:
        e.prepare(48000.0, 2)
        m, _ = e.process(m, e.init_state(2))
    ref = np.clip(np.asarray(m), -1.0, 1.0)

    scale = max(float(np.max(np.abs(ref))), 1e-6)
    err = np.max(np.abs(multi - ref)) / scale
    assert err < 5e-5, f"sharded effectful bounce rel err {err:.2e}"

    # 2-D mesh with per-track chains: chains shard over 'tracks' while
    # frames keep the state handoff (round-3 feature — this used to raise)
    multi2d = bounce_sharded(s, 48000.0, mesh)
    n = min(multi2d.shape[1], ref.shape[1])
    err2d = np.max(np.abs(multi2d[:, :n] - ref[:, :n])) / scale
    assert err2d < 5e-5, f"2-D sharded effectful bounce rel err {err2d:.2e}"


@pytest.mark.slow
def test_bounce_sharded_automation_and_midi(mesh):
    # automation + synth are pure functions of the global frame index:
    # the frames-only sharded render must match the single-chip bounce
    from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
    from whitebox_tpu.parallel.render_sharded import bounce_sharded
    from whitebox_tpu.render.bounce import bounce

    s = random_session(9, rate=48000, bpm=120.0, n_tracks=3, n_clips=1)
    s.tracks[0].automation = TrackAutomation(
        volume=AutomationLane().add(0.0, 0.2).add(4.0, 1.0),
        pan=AutomationLane().add(0.0, -1.0).add(4.0, 1.0),
    )
    from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer

    asset = s.midi_table.create_midi(MidiNoteBuffer([
        MidiNote(min_time=0.0, max_time=1.0, key=60, velocity=0.9),
        MidiNote(min_time=1.0, max_time=2.0, key=64, velocity=0.7),
    ]))
    tr = s.add_track("keys")
    s.add_midi_clip(tr, "m", 0.0, 2.0, asset=asset)

    fmesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
    single = bounce(s, 48000.0, engine="xla", chunk_frames=1 << 14).audio
    multi = bounce_sharded(s, 48000.0, fmesh)
    n = min(single.shape[1], multi.shape[1])
    scale = max(float(np.max(np.abs(single))), 1e-6)
    err = np.max(np.abs(multi[:, :n] - single[:, :n])) / scale
    assert err < 5e-5, f"sharded automation+midi rel err {err:.2e}"


@pytest.mark.slow
def test_frame_sharded_biquad_matches_single(mesh):
    import functools
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from whitebox_tpu.ops import biquad as bq
    from whitebox_tpu.parallel.biquad_sharded import biquad_shard_framewise

    c = bq.design_biquad("highpass", 30.0, 48000.0)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 8192)) * 0.3).astype(np.float32)
    ref, _ = bq.biquad_scan(jnp.asarray(x), c)

    pa = bq.eig_section_params(c)
    params = [jnp.full((2, 1), v, jnp.float32) for v in pa]
    fp = mesh.shape["frames"]

    fn = shard_map(
        functools.partial(biquad_shard_framewise, axis_name="frames", num_shards=fp),
        mesh=mesh,
        in_specs=(P(None, "frames"), [P()] * 9),
        out_specs=P(None, "frames"),
    )
    got = fn(jnp.asarray(x), params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_bounce_sharded_fx_2d_mesh_matches_frames_only(mesh):
    """Per-track chains/automation/MIDI on a full 2-D mesh (the tracks axis
    shards the chain groups; frames keep the state handoff) must match the
    frames-only path — closes render_sharded's former NotImplementedError."""
    from whitebox_tpu.effects import Biquad, Compressor, EffectChain, Gain
    from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer
    from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
    from whitebox_tpu.parallel.render_sharded import bounce_sharded
    from whitebox_tpu.session.clip import Clip, ClipType, MidiClipData
    from whitebox_tpu.session.track import Track

    s = random_session(21, rate=48000, bpm=120.0, n_tracks=4, n_clips=1)
    s.tracks[0].effects = EffectChain([Gain(-2.0), Biquad("lowpass", 5000.0)])
    s.tracks[1].effects = EffectChain([Compressor(-20.0, 3.0)])
    s.tracks[2].effects = EffectChain([Gain(-2.0), Biquad("lowpass", 6500.0)])
    s.tracks[1].automation = TrackAutomation(
        volume=AutomationLane().add(0.0, 1.0).add(4.0, 0.3))
    s.tracks[3].effects = EffectChain([Biquad("lowpass", 7000.0, 1.0)])
    s.tracks[3].automation = TrackAutomation(
        effects={(0, "freq_hz"): AutomationLane().add(0.0, 7000.0).add(2.0, 500.0)})
    s.master_effects = EffectChain([Biquad("highpass", 30.0)])
    mt = Track(name="midi")
    s.tracks.append(mt)  # 5 tracks on tp=2: exercises the padded track row
    buf = MidiNoteBuffer([MidiNote(0.0, 1.0, key=60, velocity=0.7),
                          MidiNote(1.0, 2.0, key=64, velocity=0.6)])
    clip = Clip(id=0, type=ClipType.MIDI, min_time=0.0, max_time=2.0)
    clip.midi = MidiClipData(asset=s.midi_table.create_midi(buf))
    mt.clips.append(clip)

    ref = bounce_sharded(s, 48000.0, make_render_mesh(tracks_parallel=1, frames_parallel=8))
    for tp, fp in ((2, 4), (4, 2)):
        got = bounce_sharded(s, 48000.0, make_render_mesh(tracks_parallel=tp, frames_parallel=fp))
        n = min(got.shape[1], ref.shape[1])
        assert np.max(np.abs(got[:, :n] - ref[:, :n])) < 2e-6, (tp, fp)


@pytest.mark.slow
def test_bounce_sharded_scale(mesh):
    """Scale test (VERDICT r2 #8): a multi-second 32-track session with
    heterogeneous chains on the 8-device mesh vs the single-chip generic
    pipeline — multi-chip correctness beyond the dryrun's toy shapes."""
    from whitebox_tpu.effects import (
        Biquad, Compressor, Delay, EffectChain, Gain, NoiseGate, Saturator,
    )
    from whitebox_tpu.parallel.render_sharded import bounce_sharded
    from whitebox_tpu.render.effects_generic import reference_generic_finish
    from whitebox_tpu.timeline.carve import render_segments_per_track_numpy

    s = random_session(77, rate=48000, bpm=120.0, n_tracks=32, n_clips=2)
    chains = [
        EffectChain([Compressor(-18.0, 4.0)]),
        EffectChain([Biquad("lowpass", 6000.0)]),
        EffectChain([Gain(-2.0), Saturator(6.0, mix=0.5)]),
        EffectChain([NoiseGate(-45.0)]),
        EffectChain([Delay(0.05, 0.4, wet=0.3)]),
        None,
    ]
    for i, t in enumerate(s.tracks):
        c = chains[i % len(chains)]
        if c is not None:
            import copy

            t.effects = copy.deepcopy(c)
    s.master_effects = EffectChain([Biquad("highpass", 25.0)])

    fmesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
    multi = bounce_sharded(s, 48000.0, fmesh)
    assert multi.shape[1] / 48000.0 > 3.0, "session must be multi-second"

    table, pool = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
    pt = render_segments_per_track_numpy(table, pool, 2)
    Fp = multi.shape[1]
    pt = np.pad(pt, ((0, 0), (0, 0), (0, max(Fp - pt.shape[2], 0))))[:, :, :Fp]
    ref = reference_generic_finish(pt, s, 48000.0)
    scale = max(float(np.max(np.abs(ref))), 1e-6)
    err = np.max(np.abs(multi - ref)) / scale
    assert err < 1e-4, f"sharded scale rel err {err:.2e}"
