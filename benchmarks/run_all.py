"""Run all BASELINE.json benchmark configs on the attached TPU.

Usage: python benchmarks/run_all.py [--duration 60] [--iters 5]
                                    [--only name,name] [--out results.json]

Timing methodology (VERDICT r4 #1-#3: variance-robust + device-fenced):

- Every config runs ``--iters`` (default 5) timed iterations after a warm
  compile and reports BEST and MEDIAN realtime factors. Each iteration
  covers the full host+device pipeline (carve + plan + upload + device
  render, execution forced via an on-device checksum scalar fetch).
- Per iteration the HOST leg (carve + table/plan build, before the first
  device dispatch) is timed separately; ``devleg_s`` = e2e - host is the
  dispatch+upload+device remainder.
- ``device_s`` is the checksum-FENCED device window: median time of
  re-dispatching the already-warm program on resident inputs, minus the
  measured dispatch baseline (median round-trip of a trivial checksum on
  a resident array — ~34 ms through this sandbox's relay tunnel, ~10 us
  on a production host). This isolates true device execution per config,
  which the roofline fractions (``ach_dev_pct``) are computed against.
- Device->host readback of rendered audio is excluded throughout (the
  relay tunnel moves ~25 MB/s; production hosts are PCIe-speed).

The JSON artifact (--out) captures everything per config plus the
platform, dispatch baseline, and timestamp, so round-over-round perf is
auditable (VERDICT r4 weak #6).
"""

from __future__ import annotations

import argparse
import datetime
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_CS = None
_DISPATCH = None


def _checksum():
    global _CS
    if _CS is None:
        import jax

        _CS = jax.jit(lambda x: x.sum())
    return _CS


def dispatch_baseline() -> float:
    """Median round-trip of a trivial dispatch + scalar fetch on a resident
    array — the per-dispatch constant every fenced window subtracts."""
    global _DISPATCH
    if _DISPATCH is None:
        import jax
        import jax.numpy as jnp

        cs = _checksum()
        x = jax.device_put(jnp.ones((128, 128), jnp.float32))
        float(cs(x))  # warm
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            float(cs(x))
            ts.append(time.perf_counter() - t0)
        _DISPATCH = statistics.median(ts)
    return _DISPATCH


def _fence_device(fn, n=5) -> float:
    """Fenced device window of a warm program: median of
    t(checksum(fn())) minus the dispatch baseline."""
    cs = _checksum()
    float(cs(fn()))  # ensure warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(cs(fn()))
        ts.append(time.perf_counter() - t0)
    return max(statistics.median(ts) - dispatch_baseline(), 0.0)


def _fence_device_looped(renderer, loop_n=16, n=5) -> float:
    """Per-render device window of a PLAIN mix whose single execution
    hides under the dispatch round-trip: one dispatch runs ``loop_n``
    kernel executions inside the program (mix_pallas.render_device_looped
    — runtime-scaled gains defeat CSE/hoisting), so the window resolves
    even when one render is ~100 us against a ~40 ms relay dispatch."""
    cs = _checksum()
    fn = lambda: renderer.render_device_looped(loop_n)
    float(cs(fn()))  # warm (one extra compile, cached per loop_n)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(cs(fn()))
        ts.append(time.perf_counter() - t0)
    return max(statistics.median(ts) - dispatch_baseline(), 0.0) / loop_n


def _result(rate, frames, hosts, e2es, device_s=None, sol_s=None, extra=None):
    audio_s = frames / rate
    best = min(e2es)
    med = statistics.median(e2es)
    r = {
        "rtf": round(audio_s / best, 1),
        "rtf_median": round(audio_s / med, 1),
        "iters": len(e2es),
        "audio_s": round(audio_s, 2),
        "e2e_best_s": round(best, 4),
        "e2e_median_s": round(med, 4),
        "host_s": round(statistics.median(hosts), 4),
        "devleg_s": round(statistics.median(e2es) - statistics.median(hosts), 4),
        "dispatch_ms": round(dispatch_baseline() * 1e3, 1),
    }
    if device_s is not None:
        r["device_s"] = round(device_s, 4)
    if sol_s is not None:
        r["sol_ms"] = round(sol_s * 1e3, 2)
        if device_s is not None and device_s > 0:
            r["ach_dev_pct"] = round(100.0 * sol_s / device_s, 1)
        r["ach_e2e_pct"] = round(100.0 * sol_s / best, 1)
    if extra:
        r.update(extra)
    return r


def _rtf_pallas(session, rate, effects_mode=None, iters=5, auto_kernel=False,
                routed_chunk=None):
    import jax

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.render.roofline import mix_cost
    from whitebox_tpu.timeline.carve import carve_session

    cs = _checksum()

    if effects_mode is not None:
        # mirror bounce's Pallas plan path, but build every jitted program
        # (mix kernel, finisher) ONCE and iterate carve + tables + render
        # through the SAME objects: calling bounce() per iteration creates
        # fresh jit closures whose relay compiles don't reuse (the sweep
        # that taught this burned 90 min on 3 configs). The timed quantity
        # is unchanged: carve + plan + upload + device render per iteration.
        import jax.numpy as jnp

        from whitebox_tpu.ops.mix_pallas import build_plan
        from whitebox_tpu.render.effects_pipeline import prepare_automation_tables
        from whitebox_tpu.render.roofline import estimate_bounce_cost

        def prep():
            t, p = carve_session(session, rate, buffer_size=512, slow_emit="runs")
            plan = build_plan(t, p, session, channels=2)
            return t, p, plan

        t, p, plan = prep()
        T, F_pad = plan.num_tracks, plan.n_tiles * plan.tile
        tg = jnp.asarray(plan.track_gain)
        auto = prepare_automation_tables(session, rate)
        if effects_mode == "routed":
            from whitebox_tpu.render.routing import (
                make_routed_finisher, prepare_routed_fx,
            )

            rfx = prepare_routed_fx(session, rate, 2)
            finish = make_routed_finisher(rfx, T, 2, chunk=routed_chunk,
                                          valid_frames=plan.total_frames)
        elif effects_mode == "fir":
            from whitebox_tpu.render.effects_fir import prepare_fir_finish

            fir = prepare_fir_finish(session, rate, tg, auto, 2)
            finish = lambda pt, _tg, _auto: fir(pt)
        else:
            raise ValueError(effects_mode)

        def run_fx(renderer):
            pt = renderer.render_device_per_track().reshape(T, 2, F_pad)
            return finish(pt, tg, auto)

        r0 = PallasMixRenderer(t, p, session, plan=plan)
        float(cs(run_fx(r0)))  # warm compile (mix kernel + finisher)
        pool_dev = r0.pool_device
        hosts, e2es = [], []
        r = r0
        for _ in range(iters):
            t0 = time.perf_counter()
            t, _ = carve_session(session, rate, buffer_size=512,
                                 slow_emit="runs", pool=p)
            plan_i = build_plan(t, p, session, channels=2)
            r = PallasMixRenderer(t, p, session, plan=plan_i, pool_device=pool_dev)
            hosts.append(time.perf_counter() - t0)
            float(cs(run_fx(r)))
            e2es.append(time.perf_counter() - t0)
        device_s = _fence_device(lambda: run_fx(r))
        sol = estimate_bounce_cost(t, session, plan.total_frames, 2).sol_seconds()
        return _result(rate, plan.total_frames, hosts, e2es, device_s, sol)

    auto_tables = None
    if auto_kernel:
        from whitebox_tpu.render.effects_pipeline import prepare_automation_tables_host

        auto_tables = prepare_automation_tables_host(session, rate)

    t, p = carve_session(session, rate, buffer_size=512, slow_emit="runs")
    r0 = PallasMixRenderer(t, p, session, auto_tables=auto_tables)
    float(cs(r0.render_device()))  # warm
    pool_dev = r0.pool_device  # samples stay device-resident across renders
    hosts, e2es = [], []
    frames = None
    r = r0
    for _ in range(iters):
        t0 = time.perf_counter()
        t, _ = carve_session(session, rate, buffer_size=512, slow_emit="runs", pool=p)
        if auto_kernel:
            auto_tables = prepare_automation_tables_host(session, rate)
        r = PallasMixRenderer(t, p, session, pool_device=pool_dev,
                              auto_tables=auto_tables)
        hosts.append(time.perf_counter() - t0)
        float(cs(r.render_device()))
        e2es.append(time.perf_counter() - t0)
        frames = r.plan.total_frames
    device_s = _fence_device(r.render_device)
    extra = None
    if device_s < 0.010:
        # the one-shot fence can't resolve a sub-dispatch window: re-fence
        # with loop_n in-program executions per dispatch
        device_s = _fence_device_looped(r)
        extra = {"device_fence": "in-program loop x16"}
    sol = mix_cost(t, frames, 2).sol_seconds()
    return _result(rate, frames, hosts, e2es, device_s, sol, extra=extra)


def config1(duration, iters):
    """8-track stereo WAV mix, static gain/pan, offline bounce @48kHz."""
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=8, duration_seconds=duration, sample_rate=48000, seed=1)
    return _rtf_pallas(s, 48000.0, iters=iters)


def config2(duration, iters):
    """32-track mix + sample-accurate gain/pan automation + clip fades —
    volume/pan lanes evaluate INSIDE the fused Pallas kernel."""
    from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=32, duration_seconds=duration, sample_rate=48000, seed=2, fades=True)
    beats = duration / s.beat_duration
    for i, tr in enumerate(s.tracks):
        tr.automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(beats * 0.5, 0.4).add(beats, 0.9),
            pan=AutomationLane().add(0.0, -0.8 + 0.05 * i).add(beats, 0.8 - 0.05 * i),
        )
    return _rtf_pallas(s, 48000.0, iters=iters, auto_kernel=True)


def _config3_session(duration):
    from whitebox_tpu.render.demo import make_demo_session

    return make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=44100,
                             seed=7, clip_speeds=(1.0, 1.088435374149660, 0.5))


def _rtf_prerender(s, iters):
    """Shared protocol for the exact-sinc prerender configs (3 + irrational):
    carve + prerender plan on host, polyphase matmuls + pool assembly + mix
    on device, sample pool device-resident across renders."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan
    from whitebox_tpu.render.roofline import mix_cost, prerender_cost
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.prerender import apply_prerender_device, plan_prerender

    cs = _checksum()
    t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
    flat = p.data
    if flat.shape[0] % 128:
        flat = np.pad(flat, (0, 128 - flat.shape[0] % 128))
    pool_dev = jax.device_put(jnp.asarray(flat.reshape(-1, 128)))

    def render():
        t0 = time.perf_counter()
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        pplan = plan_prerender(t, p, partial=True)
        assert pplan is not None and pplan.uncovered_rows is None, \
            "these speeds must ride the exact/Taylor prerender"
        host_s = time.perf_counter() - t0
        t2, p2, pool2d = apply_prerender_device(t, p, pplan, pool_device=pool_dev)
        plan = build_plan(t2, p2, s, channels=2)
        r = PallasMixRenderer(t2, p2, s, plan=plan, pool_device=pool2d)
        float(cs(r.render_device()))
        return r, host_s, t2, pplan

    render()  # warm compile
    hosts, e2es = [], []
    frames = None
    for _ in range(iters):
        t0 = time.perf_counter()
        r, host_s, t2, pplan = render()
        e2es.append(time.perf_counter() - t0)
        hosts.append(host_s)
        frames = r.plan.total_frames
    # fenced device window: the fast-path MIX of the final (already
    # prerendered) tables; the prerender einsum dispatch stays in devleg_s
    device_s = _fence_device(r.render_device)
    cost = mix_cost(t2, frames, 2)
    pc = prerender_cost(pplan, 2)
    sol = cost.sol_seconds() + pc.sol_seconds()
    return _result(48000.0, frames, hosts, e2es, device_s, sol,
                   extra={"note": "device_s fences the mix only; the "
                                  "prerender einsum dispatch rides devleg_s"})


def config3(duration, iters):
    """Clip-rate SINC resampling (44.1k clips -> 48k session), 128 trk:
    every resampled run pre-renders with the exact polyphase matmul
    (timeline/prerender) and the mix runs the pure fast path."""
    return _rtf_prerender(_config3_session(duration), iters)


def config3_linear(duration, iters):
    """config 3's session under linear interpolation (the slow-path
    grouped-gather kernel) — continuity metric for earlier rounds."""
    return _rtf_pallas(_config3_session(duration), 48000.0, iters=iters)


def config4(iters):
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
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(cd))
        ts.append(time.perf_counter() - t0)
    best, med = min(ts), statistics.median(ts)
    dev = max(med - dispatch_baseline(), 0.0)
    return {
        "gsps": round(N / best / 1e9, 2),
        "gsps_median": round(N / med / 1e9, 2),
        "gsps_device": round(N / dev / 1e9, 2) if dev > 0 else None,
        "iters": iters,
        "dispatch_ms": round(dispatch_baseline() * 1e3, 1),
    }


def config5(duration, iters):
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
    return _rtf_pallas(s, 48000.0, iters=iters, effects_mode="fir")


def extra_sinc(duration, iters):
    """FORCED oversample fallback floor: config 3's session pushed through
    the 4x-oversampled pool + LS-optimal 6-tap Pallas path. Production
    sinc routes everything coverable onto the exact/Taylor prerender
    (config 3 / extra_sinc_irrational); this fallback only serves
    |speed| > 8 and pathological near-simple-fraction ratios. The
    oversampled pool is device-resident across renders (the host rebuild
    of the 4x pool stays in host_s — prep cost, not device traffic)."""
    import jax

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan
    from whitebox_tpu.render.demo import make_demo_session
    from whitebox_tpu.render.roofline import mix_cost
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline.oversample import resolve_interpolation

    s = make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=44100,
                          seed=7, clip_speeds=(1.0, 1.088435374149660, 0.5))
    cs = _checksum()

    def prep():
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        t, p, interp = resolve_interpolation(t, p, "sinc")
        plan = build_plan(t, p, s, channels=2, max_slots=16)
        return t, p, interp, plan

    t, p, interp, plan = prep()
    r0 = PallasMixRenderer(t, p, s, plan=plan, interp=interp)
    float(cs(r0.render_device()))  # warm compile
    pool_dev = r0.pool_device  # 4x pool device-resident across renders
    hosts, e2es = [], []
    frames = None
    r = r0
    for _ in range(iters):
        t0 = time.perf_counter()
        t, p, interp, plan = prep()
        hosts.append(time.perf_counter() - t0)
        r = PallasMixRenderer(t, p, s, plan=plan, interp=interp, pool_device=pool_dev)
        float(cs(r.render_device()))
        e2es.append(time.perf_counter() - t0)
        frames = r.plan.total_frames
    device_s = _fence_device(r.render_device)
    sol = mix_cost(t, frames, 2).sol_seconds()
    return _result(48000.0, frames, hosts, e2es, device_s, sol)


def extra_sinc_irrational(duration, iters):
    """128 tracks at IRRATIONAL clip speeds (semitone up/down, golden
    ratio) under interpolation="sinc": every run rides the Taylor-
    corrected prerender with canonical matrices cached DEVICE-SIDE —
    the round-4 35.9x number predated that cache (VERDICT r4 weak #2)."""
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(
        n_tracks=128, duration_seconds=duration, sample_rate=48000, seed=7,
        clip_speeds=(2.0 ** (1.0 / 12.0), 2.0 ** (-1.0 / 12.0), 1.6180339887498949))
    return _rtf_prerender(s, iters)


def extra_reverse(duration, iters):
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
    return _rtf_pallas(s, 48000.0, iters=iters)


def _config6_session(duration):
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
    return s


def config6_routed(duration, iters, routed_chunk=None):
    """128 tracks -> 8 buses with chains + sidechain ducking + master —
    the routed finisher (render/routing.py) under load. Tracks group
    16-to-a-bus; bus 1 hosts a sidechain compressor keyed by the last
    track's send; master runs an EQ + limiter. ``routed_chunk`` overrides
    the compile-cost-weighted auto chunk (1<<13 for this chain weight) —
    see benchmarks/routed_chunk_sweep.py for the measured sweep."""
    return _rtf_pallas(_config6_session(duration), 48000.0, iters=iters,
                       effects_mode="routed", routed_chunk=routed_chunk)


def config7_tempo_mapped(duration, iters):
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
    return _rtf_pallas(s, 48000.0, iters=iters, auto_kernel=True)


def config8_preview(duration, iters):
    """Real-time budget gauge for the interactive preview path (VERDICT r4
    missing #1): steady-state per-block cost of PreviewStream.next_block()
    as a duty cycle against the reference's budget (512 frames @ 48 kHz =
    10.67 ms per block, src/core/timing.h:54-67). The session carries the
    reference-shaped load: 32 tracks with EQ chains + fader automation +
    a master bus. Reported:

    - duty_e2e_pct:    host-pull duty incl. relay dispatch + window
                       readback, amortized over the 64-block lookahead
    - duty_device_pct: fenced device duty (dispatch-excluded) via
                       fetch_window_device — what a production host's
                       callback thread would actually wait on
    - seek_ms / edit_ms: worst-case latency of a seek re-render and an
                       edit-stamp invalidation (re-carve + re-render)
    """
    from whitebox_tpu.effects import Biquad, EffectChain, ParametricEQ
    from whitebox_tpu.ops.automation import AutomationLane, TrackAutomation
    from whitebox_tpu.render.demo import make_demo_session
    from whitebox_tpu.render.preview import PreviewStream

    rate, bs, look = 48000.0, 512, 64
    s = make_demo_session(n_tracks=32, duration_seconds=duration,
                          sample_rate=48000, seed=2, fades=True)
    beats = duration / s.beat_duration
    for i, tr in enumerate(s.tracks):
        tr.effects = EffectChain([ParametricEQ([
            ("lowshelf", 100.0, 0.707, 2.0), ("peak", 1000.0 + 37.0 * i, 1.0, -1.5),
        ])])
        tr.automation = TrackAutomation(
            volume=AutomationLane().add(0.0, 1.0).add(beats, 0.6))
    s.master_effects = EffectChain([Biquad("highpass", 25.0)])

    ps = PreviewStream(s, rate, buffer_size=bs, lookahead_blocks=look)
    assert ps.next_block() is not None  # warm: first window compiles
    budget_s = bs / rate

    # steady-state e2e: pull `pull_windows` windows' worth of blocks
    pull_windows = max(iters, 4)
    n_blocks = look * pull_windows
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        if ps.next_block() is None:
            break
    t_e2e = time.perf_counter() - t0
    per_block_e2e = t_e2e / n_blocks

    # fenced device window (state commits like a real pull; sequential
    # windows from the current position)
    cs = _checksum()
    pos = ps.position_frames
    float(cs(ps.fetch_window_device(pos)))  # warm this entry point
    ts = []
    for k in range(iters):
        t0 = time.perf_counter()
        float(cs(ps.fetch_window_device(pos + (k + 1) * ps.lookahead)))
        ts.append(time.perf_counter() - t0)
    win_dev = max(statistics.median(ts) - dispatch_baseline(), 0.0)
    per_block_dev = win_dev / look

    # seek: window drop + re-render at the new position
    t0 = time.perf_counter()
    ps.seek(1.0)
    assert ps.next_block() is not None
    seek_s = time.perf_counter() - t0

    # edit invalidation: a live mutation forces re-carve + re-render
    s.tracks[0].volume_db = -3.0
    t0 = time.perf_counter()
    assert ps.next_block() is not None
    edit_s = time.perf_counter() - t0

    return {
        "budget_ms": round(budget_s * 1e3, 2),
        "block_e2e_ms": round(per_block_e2e * 1e3, 3),
        "duty_e2e_pct": round(100.0 * per_block_e2e / budget_s, 1),
        "block_device_ms": round(per_block_dev * 1e3, 3),
        "duty_device_pct": round(100.0 * per_block_dev / budget_s, 1),
        "window_device_ms": round(win_dev * 1e3, 1),
        "seek_ms": round(seek_s * 1e3, 1),
        "edit_invalidate_ms": round(edit_s * 1e3, 1),
        "dispatch_ms": round(dispatch_baseline() * 1e3, 1),
        "lookahead_blocks": look,
    }


def headline(duration, iters):
    """128-track 48 kHz bounce (the bench.py metric)."""
    from whitebox_tpu.render.demo import make_demo_session

    s = make_demo_session(n_tracks=128, duration_seconds=duration, sample_rate=48000, seed=7)
    return _rtf_pallas(s, 48000.0, iters=iters)


CONFIGS = [
    ("config1_8trk_mix_rtf", lambda a: config1(a.duration, a.iters)),
    ("config2_32trk_automation_fades_rtf", lambda a: config2(a.duration, a.iters)),
    ("config3_sinc_resampling_128trk_rtf", lambda a: config3(a.duration, a.iters)),
    ("config4_peaks_gsamples_per_s", lambda a: config4(a.iters)),
    ("config5_128trk_eq_master_rtf", lambda a: config5(a.duration, a.iters)),
    ("extra_config3_linear_128trk_rtf", lambda a: config3_linear(a.duration, a.iters)),
    ("extra_sinc_oversample_128trk_rtf", lambda a: extra_sinc(a.duration, a.iters)),
    ("extra_sinc_irrational_128trk_rtf", lambda a: extra_sinc_irrational(a.duration, a.iters)),
    ("extra_reverse_bidir_128trk_rtf", lambda a: extra_reverse(a.duration, a.iters)),
    ("config6_routed_sidechain_128trk_rtf",
     lambda a: config6_routed(a.duration, a.iters, routed_chunk=a.routed_chunk)),
    ("config7_tempo_mapped_128trk_rtf", lambda a: config7_tempo_mapped(a.duration, a.iters)),
    ("config8_preview_duty", lambda a: config8_preview(a.duration, a.iters)),
    ("headline_128trk_bounce_rtf", lambda a: headline(a.duration, a.iters)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filters on config names")
    ap.add_argument("--routed-chunk", type=int, default=None,
                    help="explicit routed-finisher chunk for config6")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None, help="write the results artifact JSON here")
    ap.add_argument("--merge-into", default=None,
                    help="update these configs inside an existing artifact "
                         "(stamps a per-config refresh timestamp) instead of "
                         "writing a fresh --out")
    args = ap.parse_args()

    try:  # reuse compiled programs across bench invocations when possible
        from whitebox_tpu.config import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax

    results = {}
    selected = CONFIGS
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        selected = [(n, f) for (n, f) in CONFIGS if any(p in n for p in pats)]
    for name, fn in selected:
        t0 = time.perf_counter()
        failed = False
        try:
            results[name] = fn(args)
        except Exception as e:  # keep going; report the failure
            results[name] = {"error": repr(e)}
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
    if args.merge_into:
        with open(args.merge_into) as f:
            artifact = json.load(f)
        stamp = (datetime.datetime.now(datetime.timezone.utc)
                 .isoformat(timespec="seconds"))
        for name, res in results.items():
            if isinstance(res, dict) and "error" not in res:
                res = dict(res)
                res["refreshed_utc"] = stamp
                artifact["results"][name] = res
        with open(args.merge_into, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"merged {len(results)} config(s) into {args.merge_into}", flush=True)
    if args.out:
        artifact = {
            "timestamp_utc": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
            "devices": [str(d) for d in jax.devices()],
            "platform": jax.devices()[0].platform,
            "duration_s": args.duration,
            "iters": args.iters,
            "dispatch_baseline_ms": round(dispatch_baseline() * 1e3, 2)
            if _DISPATCH is not None else None,
            "methodology": "best+median of N iters; host=carve+plan; "
                           "device_s=checksum-fenced warm re-dispatch minus "
                           "dispatch baseline; readback excluded (relay)",
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
