"""Phased devleg breakdown for extra_sinc_irrational (VERDICT r4 #1a/#3).

Splits the config's e2e into: host carve+plan, group-args staging
(host->device uploads), fenced ext-render window, rewrite+build_plan
host cost, fenced mix window, and the e2e loop's residual dispatch
overhead — so the optimization target is measured, not guessed.
Optionally times the FUSED single-dispatch path (--fused) whose relay
compile was pathological in round 3.

Usage: python benchmarks/profile_irrational.py [--duration 60] [--fused]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from run_all import _checksum, dispatch_baseline  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whitebox_tpu.ops.mix_pallas import PallasMixRenderer, build_plan
    from whitebox_tpu.render.demo import make_demo_session
    from whitebox_tpu.render.roofline import mix_cost, prerender_cost
    from whitebox_tpu.timeline.carve import carve_session
    from whitebox_tpu.timeline import prerender as pr

    s = make_demo_session(
        n_tracks=128, duration_seconds=args.duration, sample_rate=48000, seed=7,
        clip_speeds=(2.0 ** (1.0 / 12.0), 2.0 ** (-1.0 / 12.0), 1.6180339887498949))
    cs = _checksum()
    disp = dispatch_baseline()
    print(f"dispatch baseline {disp*1e3:.1f} ms", flush=True)

    t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
    flat = p.data
    if flat.shape[0] % 128:
        flat = np.pad(flat, (0, 128 - flat.shape[0] % 128))
    pool_dev = jax.device_put(jnp.asarray(flat.reshape(-1, 128)))
    pool_len = int(np.prod(pool_dev.shape))

    def timeit(fn, n=args.iters, sync=False):
        fn()  # warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            if sync:
                float(cs(r if not isinstance(r, tuple) else r[0]))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts), min(ts)

    # phase 1: host carve + plan
    def host_phase():
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        return t, p, pr.plan_prerender(t, p, partial=True)

    med, best = timeit(host_phase)
    t, p, plan = host_phase()
    n_plans = len(plan.runs)
    n_sub = sum(g[4] for g in plan.groups)
    rendered = sum(g[2] * g[4] for g in plan.groups)
    useful = sum(rp.L for rp in plan.runs)
    print(f"carve+plan host: med {med*1e3:.0f} ms (best {best*1e3:.0f})  "
          f"plans={n_plans} sub_runs={n_sub} rendered={rendered} "
          f"useful={useful} pad={100*(rendered-useful)/max(rendered,1):.0f}%",
          flush=True)
    for g in plan.groups:
        print(f"  group kind={g[0]} P'={g[1]} Q'={g[2]} n_sub={g[4]} "
              f"outputs={g[2]*g[4]}", flush=True)

    # phase 2: group args staging (uploads; forced via checksum on starts)
    def stage():
        ga, lg = pr._device_group_args(plan, p)
        return ga[0][0]

    med, best = timeit(stage, sync=True)
    print(f"group-args staging (+1 fetch): med {med*1e3:.0f} ms", flush=True)

    # phase 3: fenced ext-render window
    if pr._render_ext_fn is None:
        pr._render_ext_fn = pr._render_ext_jit()
    group_args, layout_groups = pr._device_group_args(plan, p)
    C = p.channel_base.shape[1]
    layout = (C, plan.guard, layout_groups, plan.taps)
    t0 = time.perf_counter()
    ext = pr._render_ext_fn(pool_dev, group_args, layout=layout)
    float(cs(ext))
    print(f"ext compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    med, best = timeit(
        lambda: pr._render_ext_fn(pool_dev, group_args, layout=layout),
        sync=True)
    print(f"ext render fenced: med {med*1e3:.0f} ms -> device "
          f"{(med-disp)*1e3:.0f} ms  (prerender sol "
          f"{prerender_cost(plan, C).sol_seconds()*1e3:.1f} ms)", flush=True)

    # phase 4: rewrite + build_plan host
    def rewrite_phase():
        t2, p2 = pr._rewrite(t, p, plan, ext_origin=pool_len)
        return t2, p2, build_plan(t2, p2, s, channels=2)

    med, best = timeit(rewrite_phase)
    t2, p2, mixplan = rewrite_phase()
    print(f"rewrite+build_plan host: med {med*1e3:.0f} ms "
          f"(rows={len(t2)})", flush=True)

    # phase 5: fenced mix window
    pool2d = pr._render_ext_fn(pool_dev, group_args, layout=layout)
    r = PallasMixRenderer(t2, p2, s, plan=mixplan, pool_device=pool2d)
    float(cs(r.render_device()))
    med, best = timeit(r.render_device, sync=True)
    frames = r.plan.total_frames
    print(f"mix fenced: med {med*1e3:.0f} ms -> device {(med-disp)*1e3:.0f} ms"
          f"  (mix sol {mix_cost(t2, frames, 2).sol_seconds()*1e3:.1f} ms)",
          flush=True)

    # phase 6: full e2e iteration (the bench's loop)
    def e2e():
        t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
        plan = pr.plan_prerender(t, p, partial=True)
        t2, p2, pool2d = pr.apply_prerender_device(t, p, plan, pool_device=pool_dev)
        mp = build_plan(t2, p2, s, channels=2)
        r = PallasMixRenderer(t2, p2, s, plan=mp, pool_device=pool2d)
        float(cs(r.render_device()))

    med, best = timeit(e2e)
    audio = frames / 48000.0
    print(f"e2e: med {med:.3f} s best {best:.3f} s -> RTF best "
          f"{audio/best:.0f}x med {audio/med:.0f}x", flush=True)

    if args.fused:
        t0 = time.perf_counter()
        out = pr.render_prerendered_fused(plan, p, r, pool_dev)
        float(cs(out))
        print(f"fused compile+first: {time.perf_counter()-t0:.1f} s", flush=True)

        def e2e_fused():
            t, p = carve_session(s, 48000.0, buffer_size=512, slow_emit="runs")
            plan = pr.plan_prerender(t, p, partial=True)
            t2, p2 = pr.prerender_tables(t, p, plan, pool_dev)
            mp = build_plan(t2, p2, s, channels=2)
            rr = PallasMixRenderer(t2, p2, s, plan=mp, pool_device=pool_dev)
            float(cs(pr.render_prerendered_fused(plan, p, rr, pool_dev)))

        med, best = timeit(e2e_fused)
        print(f"e2e FUSED: med {med:.3f} s best {best:.3f} s -> RTF best "
              f"{audio/best:.0f}x med {audio/med:.0f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
