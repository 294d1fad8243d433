"""Fast-tier mesh smoke tests (round-3 verdict: the fast loop never touched
a mesh, letting stale expectations hide in the 28-minute slow tier).

Tiny shapes — each case must stay <10 s on the 8-virtual-device CPU mesh —
touching every sharded pipeline family: plain mix+psum, routed finisher,
and the full-surface 2-D mesh. Deep/scale coverage stays in the slow tier
(test_sharded.py, test_effects_sharded.py, test_routing.py)."""

import jax
import numpy as np
import pytest

from tests.test_carve import random_session
from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.effects import Biquad, EffectChain, Gain
from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
from whitebox_tpu.parallel.mesh import make_render_mesh
from whitebox_tpu.parallel.render_sharded import bounce_sharded
from whitebox_tpu.render.bounce import bounce

RATE = 48000.0


def _tiny_session(seed, routed=False, lanes=False):
    s = random_session(seed, rate=RATE, bpm=160.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=1)
    if routed:
        bus = s.add_bus("b", volume_db=-3.0)
        bus.effects = EffectChain([Gain(-1.5)])
        s.set_track_output(0, 0)
        s.add_send(1, 0, gain_db=-6.0)
    if lanes:
        s.tracks[0].effects = EffectChain([Biquad("lowpass", 8000.0)])
        s.tracks[0].automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(2.0, 0.4))
    return s


def test_routed_sharded_smoke():
    """Routed finisher on the frames-only mesh (smoke for the slow
    TestRoutedSharded scale cases)."""
    assert len(jax.devices()) == 8
    mesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
    s = _tiny_session(5, routed=True)
    single = bounce(s, RATE, engine="xla", chunk_frames=4096).audio
    multi = bounce_sharded(s, RATE, mesh)
    n = min(single.shape[1], multi.shape[1])
    np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)


def test_full_surface_2d_mesh_smoke():
    """Chains + automation + routing on the 2-D ('tracks','frames') mesh
    (smoke for the slow full-surface 2-D cases)."""
    assert len(jax.devices()) == 8
    mesh = make_render_mesh(tracks_parallel=2, frames_parallel=4)
    s = _tiny_session(6, routed=True, lanes=True)
    single = bounce(s, RATE, engine="xla", chunk_frames=4096).audio
    multi = bounce_sharded(s, RATE, mesh)
    n = min(single.shape[1], multi.shape[1])
    np.testing.assert_allclose(multi[:, :n], single[:, :n], atol=3e-6, rtol=1e-4)


@pytest.mark.slow
def test_sharded_pdc_smoke():
    """bounce_sharded(pdc=True): latent track chain fetch-ahead + master
    head trim must match the single-chip streaming PDC render. (Slow: the
    limiter-chain compile x two meshes; the multichip dryrun also covers
    routed PDC on both mesh shapes.)"""
    from whitebox_tpu.effects import Limiter

    assert len(jax.devices()) == 8
    s = _tiny_session(9, routed=True)
    s.tracks[0].effects = EffectChain([Biquad("lowpass", 9000.0), Limiter(-1.0)])
    s.master_effects = EffectChain([Biquad("highpass", 30.0), Limiter(-0.5)])
    single = bounce(s, RATE, engine="xla", chunk_frames=4096, pdc=True).audio
    for tp, fp in ((1, 8), (2, 4)):
        mesh = make_render_mesh(tracks_parallel=tp, frames_parallel=fp)
        multi = bounce_sharded(s, RATE, mesh, pdc=True)
        n = min(single.shape[1], multi.shape[1])
        np.testing.assert_allclose(multi[:, :n], single[:, :n],
                                   atol=3e-6, rtol=1e-4,
                                   err_msg=f"mesh {tp}x{fp}")


def test_streamed_smoke():
    """HBM-streamed bounce == one-shot bounce on a tiny speed-1 session
    (bit-exact contract; smoke for the slow composed-streaming cases)."""
    from whitebox_tpu.render.stream_pool import bounce_streamed

    s = _tiny_session(8)
    full = bounce(s, RATE, engine="xla", chunk_frames=4096).audio
    streamed = bounce_streamed(s, RATE, max_pool_bytes=1 << 18,
                               window_frames=1 << 14)
    n = min(full.shape[1], streamed.shape[1])
    np.testing.assert_array_equal(streamed[:, :n], full[:, :n])


def test_plain_mix_mesh_smoke():
    """Plain mix + psum on the 2-D mesh (no chains) — the fastest mesh
    round trip; catches mesh/pack regressions in seconds."""
    import jax.numpy as jnp

    from whitebox_tpu.ops.mix import pack_device_tables, render_chunk
    from whitebox_tpu.parallel.render_sharded import (
        render_chunk_sharded, shard_tables,
    )
    from whitebox_tpu.timeline.carve import carve_session

    assert len(jax.devices()) == 8
    mesh = make_render_mesh(tracks_parallel=2, frames_parallel=4)
    s = _tiny_session(7)
    table, pool = carve_session(s, RATE, buffer_size=512)
    dev = pack_device_tables(table, pool, s, pad_tracks_to=8)
    jt = dev.as_jax()
    pool_dev = jnp.asarray(pool.data)
    single = render_chunk(pool_dev, jt, jnp.int32(0), frames=4096)
    multi = render_chunk_sharded(pool_dev, shard_tables(jt, mesh),
                                 jnp.int32(0), frames=4096, mesh=mesh)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=2e-6, rtol=1e-5)


def test_sinc_sharded_smoke():
    """interpolation="sinc" on the mesh: the host prerender rewrite plays
    resampled clips (forward rational + irrational + reverse) at exact
    polyphase quality through the linear sharded mix. Reference = the
    single-chip host mirror of the same rewrite."""
    from whitebox_tpu.timeline.carve import (
        carve_session, render_segments_per_track_numpy,
    )
    from whitebox_tpu.timeline.prerender import apply_prerender_host, plan_prerender
    from whitebox_tpu.session.clip import ClipMode

    assert len(jax.devices()) == 8
    mesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
    s = random_session(31, rate=RATE, bpm=160.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=1,
                       speeds=(0.5, 2.0 ** (1.0 / 12.0)),
                       src_rates=(48000.0,))
    for c in s.tracks[0].clips:
        c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
    table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
    if table.fast.all():
        pytest.skip("carved fast-only")
    plan = plan_prerender(table, pool, partial=True)
    assert plan is not None and plan.uncovered_rows is None
    t2, p2 = apply_prerender_host(table, pool, plan)
    pt = render_segments_per_track_numpy(t2, p2)
    ref = np.zeros((2, pt.shape[2]))
    for t, tr in enumerate(s.tracks):
        vol = np.float32(0.0) if tr.mute else tr.volume_linear
        pan = tr.pan_coeffs
        for ch in range(2):
            ref[ch] += pt[t][ch] * float(np.float32(vol * np.float32(pan[ch])))
    ref = np.clip(ref, -1, 1).astype(np.float32)
    multi = bounce_sharded(s, RATE, mesh, interpolation="sinc")
    n = min(ref.shape[1], multi.shape[1])
    np.testing.assert_allclose(multi[:, :n], ref[:, :n], atol=3e-6, rtol=1e-4)


def test_sharded_sinc_pathological_contract():
    """The documented residue-class contract (VERDICT r4 #8): speeds the
    exact/Taylor prerender can't cover (|speed| > 8) raise loudly from
    bounce_sharded(interpolation="sinc") with the single-chip hint instead
    of silently degrading — the oversample fallback is a single-chip
    kernel mode."""
    assert len(jax.devices()) == 8
    mesh = make_render_mesh(tracks_parallel=1, frames_parallel=8)
    s = random_session(33, rate=RATE, bpm=160.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=1,
                       speeds=(9.3,), src_rates=(48000.0,))
    with pytest.raises(NotImplementedError, match="single-chip"):
        bounce_sharded(s, RATE, mesh, interpolation="sinc")
    # the same session renders single-chip through the oversample fallback
    res = bounce(s, RATE, interpolation="sinc", prerender=False)
    assert np.isfinite(res.audio).all()


def test_oversample_device_pool_cache_identity():
    """device_pool_cached returns THE SAME resident array for
    byte-identical pools (no re-upload) and a different one as soon as
    the content changes (exact hash — no fingerprint aliasing)."""
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.oversample import (
        device_pool_cached, oversample_slow_rows,
    )

    s = random_session(34, rate=RATE, bpm=160.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=1,
                       speeds=(9.3,), src_rates=(48000.0,))
    table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
    _, p1 = oversample_slow_rows(table, pool)
    _, p2 = oversample_slow_rows(table, pool)  # fresh host rebuild, same bytes
    a1 = device_pool_cached(p1)
    a2 = device_pool_cached(p2)
    assert a1 is a2
    p3_data = p1.data.copy()
    p3_data[7] += 0.25
    from dataclasses import replace

    p3 = replace(p1, data=p3_data)
    assert device_pool_cached(p3) is not a1
