"""Run all five BASELINE.json benchmark configs on the attached TPU.

Usage: python benchmarks/run_all.py [--duration 60] [--json]

Timing methodology: each config times the full host+device pipeline
(carve + plan + upload + device render, execution forced via an on-device
checksum — device->host readback over this sandbox's relay tunnel is
excluded and reported separately where relevant; on production hosts it is
PCIe-speed). Compiles are warmed first.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _rtf_pallas(session, rate, effects_mode=None, runs=3, auto_kernel=False):
    import jax
    import jax.numpy as jnp

    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer
    from whitebox_tpu.timeline.carve import carve_session

    if auto_kernel:
        # automation-only sessions ride the fused kernel with in-kernel
        # lane evaluation (ops/mix_pallas._lane_eval_kernel): same
        # resident-pool protocol as the plain configs — carve + lane pack
        # + plan + render per iteration
        from whitebox_tpu.render.effects_pipeline import prepare_automation_tables_host

        @jax.jit
        def checksum(x):
            return x.sum()

        t, p = carve_session(session, rate, buffer_size=512, slow_emit="runs")
        auto_t = prepare_automation_tables_host(session, rate)
        r0 = PallasMixRenderer(t, p, session, auto_tables=auto_t)
        float(checksum(r0.render_device()))  # warm
        pool_dev = r0.pool_device
        best = None
        frames = None
        for _ in range(runs):
            t0 = time.perf_counter()
            t, _ = carve_session(session, rate, buffer_size=512, slow_emit="runs", pool=p)
            auto_t = prepare_automation_tables_host(session, rate)
            r = PallasMixRenderer(t, p, session, pool_device=pool_dev,
                                  auto_tables=auto_t)
            float(checksum(r.render_device()))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            frames = r.plan.total_frames
        return frames / rate / best

    if effects_mode is not None:
        r = bounce(session, rate, effects_mode=effects_mode)  # warm compile
        best = None
        for _ in range(runs):
            r = bounce(session, rate, effects_mode=effects_mode)
            w = r.stats.carve_seconds + r.stats.device_seconds
            best = w if best is None else min(best, w)
        if r.stats.cost is not None and r.stats.device_seconds > 0:
            print(f"  roofline: {r.stats.cost.summary(r.stats.device_seconds)}",
                  flush=True)
        return r.stats.audio_seconds / best

    @jax.jit
    def checksum(x):
        return x.sum()

    t, p = carve_session(session, rate, buffer_size=512, slow_emit="runs")
    r0 = PallasMixRenderer(t, p, session)
    float(checksum(r0.render_device()))  # warm
    pool_dev = r0.pool_device  # samples stay device-resident across renders
    best = None
    frames = None
    for _ in range(runs):
        t0 = time.perf_counter()
        t, _ = carve_session(session, rate, buffer_size=512, slow_emit="runs", pool=p)
        r = PallasMixRenderer(t, p, session, pool_device=pool_dev)
        float(checksum(r.render_device()))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        frames = r.plan.total_frames
    return frames / rate / best


def config1(duration):
    """8-track stereo WAV mix, static gain/pan, offline bounce @48kHz."""
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=8, duration_seconds=duration, sample_rate=48000, seed=1)
    return _rtf_pallas(s, 48000.0)


def config2(duration):
    """32-track mix + sample-accurate gain/pan automation + clip fades."""
    from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=32, duration_seconds=duration, sample_rate=48000, seed=2, fades=True)
    beats = duration / s.beat_duration
    for i, tr in enumerate(s.tracks):
        tr.automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(beats * 0.5, 0.4).add(beats, 0.9),
            pan=AutomationLane().add(0.0, -0.8 + 0.05 * i).add(beats, 0.8 - 0.05 * i),
        )
    return _rtf_pallas(s, 48000.0, auto_kernel=True)


def _config3_session(duration):
    from whitebox_tpu.render.demo import make_demo_session

    return make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=44100,
                             seed=7, clip_speeds=(1.0, 1.088435374149660, 0.5))


def config3(duration):
    """Clip-rate SINC resampling (44.1k clips -> 48k session), 128 trk.

    BASELINE names config 3 as the *sinc* quality mode: every resampled
    run pre-renders with the exact polyphase matmul (timeline/prerender)
    and the mix runs the pure fast path. Protocol matches the other
    configs: carve + prerender + plan + device render per iteration,
    sample pool device-resident across renders."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.prerender import apply_prerender_device, plan_prerender

    s = _config3_session(duration)

    @jax.jit
    def checksum(x):
        return x.sum()

    t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
    flat = p.data
    if flat.shape[0] % 128:
        flat = np.pad(flat, (0, 128 - flat.shape[0] % 128))
    pool_dev = jax.device_put(jnp.asarray(flat.reshape(-1, 128)))

    def render():
        # full pipeline per iteration: carve + prerender (one async device
        # dispatch: polyphase matmuls + pool assembly) + mix plan + Pallas
        # fast-path mix; the checksum syncs the whole pipelined chain
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        pplan = plan_prerender(t, p)
        assert pplan is not None, "config3 speeds must prerender"
        t2, p2, pool2d = apply_prerender_device(t, p, pplan, pool_device=pool_dev)
        plan = build_plan(t2, p2, s, channels=2)
        r = PallasMixRenderer(t2, p2, s, plan=plan, pool_device=pool2d)
        float(checksum(r.render_device()))
        return r

    render()  # warm compile
    best = None
    frames = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = render()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        frames = r.plan.total_frames
    return frames / 48000.0 / best


def config3_linear(duration):
    """config 3's session under linear interpolation (the slow-path
    grouped-gather kernel) — continuity metric for earlier rounds."""
    return _rtf_pallas(_config3_session(duration), 48000.0)


def config4():
    """Waveform min/max peak mipmaps for 1h audio -> Gsamples/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whitebox_tpu.ops.peaks import _pyramid_single_channel

    N = 48000 * 3600
    codes = np.random.default_rng(0).integers(-32768, 32768, N).astype(np.int32)
    fn = jax.jit(lambda c: sum(f.sum() + s.sum() for f, s in _pyramid_single_channel(c, N)))
    cd = jnp.asarray(codes)
    float(fn(cd))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(cd))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return N / best / 1e9


def config5(duration):
    """128-track session with per-track EQ chains + master bus."""
    from whitebox_tpu.effects import Biquad, EffectChain, ParametricEQ
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=48000, seed=7)
    for i, tr in enumerate(s.tracks):
        tr.effects = EffectChain([ParametricEQ([
            ("lowshelf", 100.0, 0.707, 2.0), ("peak", 1000.0 + 37.0 * i, 1.0, -1.5),
            ("highshelf", 8000.0, 0.707, 1.0),
        ])])
    s.master_effects = EffectChain([Biquad("highpass", 25.0)])
    return _rtf_pallas(s, 48000.0, effects_mode="fir")


def extra_sinc(duration):
    """FORCED oversample fallback: config 3's session pushed through the
    4x-oversampled pool + LS-optimal 6-tap Pallas path. NOT the production
    sinc form — `bounce(interpolation="sinc")` routes every coverable run
    (all rational AND irrational/off-grid ratios via the Taylor-corrected
    prerender, reverse runs as mirrored forward ramps) onto the exact
    polyphase matmul path measured by config 3 / extra_sinc_irrational;
    this fallback only serves speeds > 8 and pathological near-simple-
    fraction ratios. Kept as a floor metric for that residue class."""
    import jax
    import jax.numpy as jnp

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan
    from whitebox_tpu.render.demo import make_demo_session
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.oversample import resolve_interpolation

    s = make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=44100,
                          seed=7, clip_speeds=(1.0, 1.088435374149660, 0.5))

    @jax.jit
    def checksum(x):
        return x.sum()

    def prep():
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        t, p, interp = resolve_interpolation(t, p, "sinc")
        plan = build_plan(t, p, s, channels=2, max_slots=16)
        return t, p, interp, plan

    t, p, interp, plan = prep()
    r0 = PallasMixRenderer(t, p, s, plan=plan, interp=interp)
    float(checksum(r0.render_device()))  # warm compile
    pool_dev = r0.pool_device
    best = None
    frames = None
    for _ in range(3):
        t0 = time.perf_counter()
        t, p, interp, plan = prep()
        r = PallasMixRenderer(t, p, s, plan=plan, interp=interp, pool_device=pool_dev)
        float(checksum(r.render_device()))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        frames = r.plan.total_frames
    return frames / 48000.0 / best


def extra_sinc_irrational(duration):
    """128 tracks at IRRATIONAL clip speeds (semitone up/down, golden
    ratio) under interpolation="sinc": every run rides the Taylor-
    corrected prerender (timeline/prerender.py) — same protocol as
    config 3, with the plan asserted to cover everything (the round-3
    35x oversample fallback handled this entire class)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan
    from whitebox_tpu.render.demo import make_demo_session
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.prerender import apply_prerender_device, plan_prerender

    s = make_demo_session(
        n_tracks=128, duration_seconds=duration, sample_rate=48000, seed=7,
        clip_speeds=(2.0 ** (1.0 / 12.0), 2.0 ** (-1.0 / 12.0), 1.6180339887498949))

    @jax.jit
    def checksum(x):
        return x.sum()

    t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
    flat = p.data
    if flat.shape[0] % 128:
        flat = np.pad(flat, (0, 128 - flat.shape[0] % 128))
    pool_dev = jax.device_put(jnp.asarray(flat.reshape(-1, 128)))

    def render():
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        pplan = plan_prerender(t, p, partial=True)
        assert pplan is not None and pplan.uncovered_rows is None, \
            "irrational speeds must ride the Taylor prerender"
        render.fallback_runs = 0  # VERDICT r3 #3: 0% of runs on the 35x path
        t2, p2, pool2d = apply_prerender_device(t, p, pplan, pool_device=pool_dev)
        plan = build_plan(t2, p2, s, channels=2)
        r = PallasMixRenderer(t2, p2, s, plan=plan, pool_device=pool2d)
        float(checksum(r.render_device()))
        return r

    render()  # warm compile
    n_pre = len(plan_prerender(*carve_session(s, 48000.0, buffer_size=512,
                                              slow_emit="runs"), partial=True).runs)
    print(f" sinc fallback coverage: 0/{n_pre} runs on the oversample path "
          "(100% Taylor/exact prerender)", flush=True)
    best = None
    frames = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = render()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        frames = r.plan.total_frames
    return frames / 48000.0 / best


def extra_reverse(duration):
    """128 tracks of LOOP_BIDIRECTIONAL resampled clips — reverse rows on
    the Pallas fast path (formerly a hard SlowRowsPresent -> XLA cliff)."""
    from whitebox_tpu.render.demo import make_demo_session
    from whitebox_tpu.session.clip import ClipMode

    s = make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=44100,
                          seed=7, clip_speeds=(1.0, 1.088435374149660, 0.5))
    for t in s.tracks:
        for c in t.clips:
            if c.is_audio() and c.audio is not None:
                c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
    return _rtf_pallas(s, 48000.0)


def config6_routed(duration):
    """128 tracks -> 8 buses with chains + sidechain ducking + master —
    the round-3 routed finisher (render/routing.py) under load. Tracks
    group 16-to-a-bus; bus 1 hosts a sidechain compressor keyed by the
    last track's send; master runs an EQ + limiter."""
    from whitebox_tpu.effects import (
        Biquad, Compressor, EffectChain, Limiter, ParametricEQ,
    )
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=128, duration_seconds=duration,
                          sample_rate=48000, seed=9)
    for i in range(8):
        b = s.add_bus(f"grp{i}", volume_db=-1.5, pan=0.05 * (i - 4))
        if i == 1:
            b.effects = EffectChain([Compressor(-24.0, 4.0, sidechain=True)])
        elif i % 2 == 0:
            b.effects = EffectChain([ParametricEQ([
                ("lowshelf", 90.0, 0.707, 1.5), ("peak", 900.0 + 200.0 * i, 1.0, -2.0),
            ])])
        else:
            b.effects = EffectChain([Compressor(-18.0, 3.0)])
    for t in range(128):
        s.set_track_output(t, t // 16)
    s.add_send(127, 1, gain_db=0.0, sidechain=True)  # duck grp1 off track 127
    s.add_send(3, 5, gain_db=-6.0)
    s.add_send(40, 7, gain_db=-9.0, pre_fader=True)
    s.master_effects = EffectChain([Biquad("highpass", 25.0), Limiter(-0.5)])
    return _rtf_pallas(s, 48000.0, effects_mode="routed")


def config7_tempo_mapped(duration):
    """128-track session under a piecewise tempo map (step + linear ramp)
    with fader automation — mapped carve + lane packing + mix
    (core/tempo.py through the full pipeline)."""
    from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=128, duration_seconds=duration,
                          sample_rate=48000, seed=11)
    beats = duration / s.beat_duration
    s.set_tempo_point(0.0, 120.0)
    s.set_tempo_point(beats * 0.25, 90.0, curve="linear", bpm_end=140.0)
    s.set_tempo_point(beats * 0.6, 128.0)
    for i, tr in enumerate(s.tracks):
        tr.automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(beats * 0.5, 0.5).add(beats, 0.9),
        )
    return _rtf_pallas(s, 48000.0, auto_kernel=True)


def headline(duration):
    """128-track 48 kHz bounce (the bench.py metric)."""
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=48000, seed=7)
    return _rtf_pallas(s, 48000.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    try:  # reuse compiled programs across bench invocations when possible
        from whitebox_tpu.config import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    results = {}
    for name, fn in [
        ("config1_8trk_mix_rtf", lambda: config1(args.duration)),
        ("config2_32trk_automation_fades_rtf", lambda: config2(args.duration)),
        ("config3_sinc_resampling_128trk_rtf", lambda: config3(args.duration)),
        ("config4_peaks_gsamples_per_s", config4),
        ("config5_128trk_eq_master_rtf", lambda: config5(args.duration)),
        ("extra_config3_linear_128trk_rtf", lambda: config3_linear(args.duration)),
        ("extra_sinc_oversample_128trk_rtf", lambda: extra_sinc(args.duration)),
        ("extra_sinc_irrational_128trk_rtf", lambda: extra_sinc_irrational(args.duration)),
        ("extra_reverse_bidir_128trk_rtf", lambda: extra_reverse(args.duration)),
        ("config6_routed_sidechain_128trk_rtf", lambda: config6_routed(args.duration)),
        ("config7_tempo_mapped_128trk_rtf", lambda: config7_tempo_mapped(args.duration)),
        ("headline_128trk_bounce_rtf", lambda: headline(args.duration)),
    ]:
        t0 = time.perf_counter()
        failed = False
        try:
            results[name] = round(float(fn()), 1)
        except Exception as e:  # keep going; report the failure
            results[name] = f"ERROR: {e}"
            failed = True
        print(f"{name}: {results[name]}  ({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)
        if failed:
            # isolate configs: the failure's traceback (and any stray
            # reference) must not pin GBs of HBM for the remaining configs
            # — one OOM used to cascade RESOURCE_EXHAUSTED through every
            # config after it. Drop every live array (cached device
            # constants re-upload lazily) and the jit caches that may bake
            # big constants into executables.
            import gc

            import jax

            gc.collect()
            for a in jax.live_arrays():
                try:
                    a.delete()
                except Exception:
                    pass
            jax.clear_caches()
            gc.collect()

    if args.json:
        print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
