"""Sharded timeline mix: shard_map over a ('tracks', 'frames') mesh.

Each device renders its track-shard x frame-shard tile with the same
per-track contribution program as the single-chip path (ops.mix), locally
sums its tracks in index order, then ``psum`` over the 'tracks' axis rides
ICI to produce the mix; the hard clip applies post-reduction. Frame shards
are fully independent (no halo: the mix is a gather, not a stencil).

Sum ordering: within a shard tracks add sequentially in index order; across
shards psum applies — deterministic, but a different association than the
engine's flat order (use the single-chip strict path for bit-parity work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from whitebox_tpu.ops.mix import _track_contrib

_TABLE_SPECS = {
    "dst_start": P("tracks", None),
    "length": P("tracks", None),
    "src_base": P("tracks", None, None),
    "frac_hi": P("tracks", None),
    "frac_lo": P("tracks", None),
    "speed_hi": P("tracks", None),
    "speed_lo": P("tracks", None),
    "gain": P("tracks", None),
    "fast": P("tracks", None),
    "clamp": P("tracks", None),
    "fin_start": P("tracks", None),
    "fin_inv": P("tracks", None),
    "fout_end": P("tracks", None),
    "fout_inv": P("tracks", None),
    "track_gain": P("tracks", None),
}


def shard_tables(tables: dict, mesh: Mesh) -> dict:
    """Place packed device tables with the tracks axis sharded, rest replicated."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, _TABLE_SPECS[k]))
        for k, v in tables.items()
    }


def _tile_contribs(pool, tables, chunk_start, f_local: int):
    """Per-track contributions [T_local, C, f_local] for this frame shard."""
    fidx = jax.lax.axis_index("frames")
    g = chunk_start + fidx * f_local + jnp.arange(f_local, dtype=jnp.int32)
    return jax.vmap(
        lambda d, l, sb, fh, fl, sh, sl, gn, fs, cl, f0, f1, f2, f3: _track_contrib(
            pool, g, d, l, sb, fh, fl, sh, sl, gn, fs, cl, f0, f1, f2, f3
        )
    )(
        tables["dst_start"], tables["length"], tables["src_base"],
        tables["frac_hi"], tables["frac_lo"], tables["speed_hi"], tables["speed_lo"],
        tables["gain"], tables["fast"], tables["clamp"],
        tables["fin_start"], tables["fin_inv"], tables["fout_end"], tables["fout_inv"],
    )


@functools.partial(jax.jit, static_argnames=("frames", "mesh"))
def render_chunk_sharded(pool, tables, chunk_start, frames: int, mesh: Mesh):
    """Render ``frames`` output frames starting at ``chunk_start``.

    ``tables`` track dim must be divisible by mesh.shape['tracks'];
    ``frames`` by mesh.shape['frames']. Returns [C, frames] sharded over
    the frames axis.
    """
    fp = mesh.shape["frames"]
    assert frames % fp == 0, "frames must divide over the frames mesh axis"
    f_local = frames // fp

    def tile(pool, tables, chunk_start):
        contribs = _tile_contribs(pool, tables, chunk_start, f_local)
        scaled = contribs * tables["track_gain"][:, :, None]

        def body(carry, x):
            return carry + x, None

        # zeros_like keeps shard_map's varying-axes annotation on the carry
        local, _ = jax.lax.scan(body, jnp.zeros_like(scaled[0]), scaled)
        total = jax.lax.psum(local, "tracks")
        total = jnp.where(total > 1.0, jnp.float32(1.0), total)
        total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
        return total

    fn = shard_map(
        tile,
        mesh=mesh,
        in_specs=(P(), _TABLE_SPECS, P()),
        out_specs=P(None, "frames"),
    )
    return fn(pool, tables, chunk_start)


def _resolve_sinc_host(table, pool, interpolation: str):
    """Quality-mode front-end for mesh renders.

    ``interpolation="sinc"`` rewrites the table with the HOST prerender
    (timeline/prerender.py apply_prerender_host): every resampled run —
    forward or reverse, rational or Taylor-corrected irrational — becomes
    a speed ±1.0 row over exactly-rendered polyphase content, which the
    linear sharded mix plays exactly (integer phases degenerate linear
    interpolation to the sample). Requires full coverage; the pathological
    residue class (speeds > 8, near-simple fractions) has no sharded
    fallback — render single-chip for the oversample form.
    """
    if interpolation == "linear":
        return table, pool
    if interpolation != "sinc":
        raise NotImplementedError(
            f"bounce_sharded supports interpolation='linear'/'sinc', got "
            f"{interpolation!r} (catmull is a single-chip kernel mode)")
    if not len(table) or table.fast.all():
        return table, pool
    from whitebox_tpu.timeline.prerender import apply_prerender_host, plan_prerender

    plan = plan_prerender(table, pool, partial=True)
    if plan is None or plan.uncovered_rows is not None:
        raise NotImplementedError(
            "bounce_sharded(interpolation='sinc') needs full prerender "
            "coverage (|speed| <= 8, non-pathological ratios); render "
            "single-chip for the oversample fallback")
    return apply_prerender_host(table, pool, plan)


def bounce_sharded(
    session,
    sample_rate: float,
    mesh: Mesh,
    *,
    buffer_size: int = 512,
    channels: int = 2,
    master_effects=None,
    pdc: bool = False,
    interpolation: str = "linear",
):
    """Render a whole session over a ('tracks','frames') device mesh.

    The multi-chip composition of the full offline pipeline: carve (host,
    closed-form run rows), pack, shard the segment tables over the tracks
    axis, one sharded mix dispatch over the frames axis (psum over ICI for
    the track sum), then an optional master-bus effect chain applied with
    exact cross-shard state handoff (effects_sharded.apply_chain_sharded).

    Returns [channels, frames] np.float32. Sum association is
    shard-deterministic but differs from the single-chip flat order (see
    module docstring); use the single-chip strict path for bit-parity work.

    ``interpolation="sinc"`` renders resampled clips at exact polyphase
    quality on the mesh via the host prerender rewrite (the rewritten
    rows play at speed ±1.0, which the linear sharded mix reproduces
    exactly); see ``_resolve_sinc_host`` for the coverage contract.

    ``master_effects`` defaults to the session's own master chain.
    Per-track effect chains, automation lanes, and MIDI synth all render
    sharded too (chains frame-shard with exact cross-shard state handoff
    via effects_sharded.chain_shard; automation and synth are pure
    functions of the global frame index) — those sessions require a
    frames-only mesh (``tracks_parallel == 1``), since each device must
    hold every track of its frame shard to apply per-track processing
    before the sum. Plain mixes run on full 2-D meshes.
    """
    import numpy as np

    from whitebox_tpu.ops.automation import session_has_automation
    from whitebox_tpu.ops.mix import pack_device_tables
    from whitebox_tpu.render.bounce import _session_has_midi
    from whitebox_tpu.timeline.carve import carve_session

    from whitebox_tpu.session.bus import session_has_routing

    needs_per_track = (any(t.effects for t in session.tracks)
                       or session_has_automation(session) or _session_has_midi(session)
                       or bool(getattr(session, "master_automation", None))
                       or session_has_routing(session))
    if needs_per_track and mesh.shape["tracks"] != 1:
        # 2-D mesh: tracks are the natural parallel axis for independent
        # per-track chains — shard each chain group over 'tracks' while the
        # frames axis keeps the sequence-parallel state handoff
        return _bounce_sharded_fx_2d(session, sample_rate, mesh,
                                     buffer_size=buffer_size, channels=channels,
                                     master_effects=master_effects, pdc=pdc,
                                     interpolation=interpolation)
    if needs_per_track:
        return _bounce_sharded_fx(session, sample_rate, mesh,
                                  buffer_size=buffer_size, channels=channels,
                                  master_effects=master_effects, pdc=pdc,
                                  interpolation=interpolation)
    if master_effects is None and session.master_effects:
        ch = session.master_effects
        master_effects = list(ch.effects) if hasattr(ch, "effects") else list(ch)

    tp = mesh.shape["tracks"]
    fp = mesh.shape["frames"]
    table, pool = carve_session(session, sample_rate, buffer_size=buffer_size,
                                out_channels=channels, slow_emit="runs")
    table, pool = _resolve_sinc_host(table, pool, interpolation)
    T = max(table.num_tracks, 1)
    dev = pack_device_tables(table, pool, session, channels=channels,
                             pad_tracks_to=-(-T // tp) * tp)
    tables = shard_tables(dev.as_jax(), mesh)
    pool_dev = jax.device_put(jnp.asarray(pool.data), NamedSharding(mesh, P()))

    frames = -(-max(table.total_frames, 1) // (fp * 128)) * (fp * 128)
    out = render_chunk_sharded(pool_dev, tables, jnp.int32(0), frames=frames, mesh=mesh)

    if master_effects:
        from whitebox_tpu.parallel.effects_sharded import apply_chain_sharded

        out = apply_chain_sharded(master_effects, out, mesh, float(sample_rate),
                                  channels=channels)
    return np.asarray(out)[:, : table.total_frames]


def _pdc_latencies(fx, rfx, pdc: bool):
    """(per-group chain latency, master latency) for PDC fetch-ahead;
    zeros when pdc is off. Latent BUS chains raise: the sharded pipeline
    streams bus chains framewise and does not carry their delay lines
    (same contract as the single-chip streaming path, render/bounce.py)."""
    if not pdc:
        return [0] * len(fx.groups), 0
    from whitebox_tpu.render.effects_generic import fx_latencies, stage_latency_frames

    glat, mlat = fx_latencies(fx)
    if rfx is not None and any(
            stage_latency_frames(g.stages) > 0 for g in rfx.bus_groups):
        raise ValueError(
            "sharded PDC does not carry bus-chain latency; move lookahead "
            "chains to tracks or the master, or render single-chip with "
            "engine='auto'/'pallas' (the routed finisher compensates bus "
            "latency)")
    return glat, mlat


def _pad_auto_tables(auto, Tp: int):
    """Pad automation tables' track axis to ``Tp`` (padded rows: no lanes,
    muted — their contribs are zero anyway)."""
    import numpy as np
    import jax.numpy as jnp

    if auto is None:
        return None
    volj, panj, mute, use_auto = auto
    T = mute.shape[0]
    if T == Tp:
        return auto
    padn = Tp - T

    def padt(d):
        return {k: jnp.concatenate(
            [v, jnp.zeros((padn,) + v.shape[1:], v.dtype)]) for k, v in d.items()}

    return (padt(volj), padt(panj),
            jnp.concatenate([mute, jnp.zeros(padn, mute.dtype)]),
            jnp.concatenate([use_auto, jnp.zeros(padn, use_auto.dtype)]))


def _bounce_sharded_fx_2d(session, sample_rate: float, mesh: Mesh, *,
                          buffer_size: int, channels: int, master_effects=None,
                          pdc: bool = False, interpolation: str = "linear"):
    """Effectful sharded bounce on a full 2-D ('tracks','frames') mesh.

    Chains are per-track independent, so the tracks axis shards them
    naturally (SURVEY §5's "tracks-axis x frames-axis" mandate):

    1. per-track contributions render on the 2-D mesh (tracks-sharded
       segment tables; MIDI synth voices add on whichever shard owns the
       track);
    2. each chain group gathers its tracks (a GSPMD reshard), pads to the
       tracks-axis size, and runs frame-sharded with the exact cross-shard
       state handoff (effects_sharded.chain_shard) — every device
       processes B_group/tp tracks;
    3. per-frame automation/fader gains apply on local rows, the track sum
       psums over 'tracks', the master chain runs frame-sharded, and the
       hard clip finishes.

    Bit/tolerance-matches the frames-only path (same per-track programs;
    sum association is shard-deterministic)."""
    import numpy as np

    from whitebox_tpu.ops.mix import pack_device_tables
    from whitebox_tpu.parallel.effects_sharded import chain_shard
    from whitebox_tpu.render.bounce import _prepare_synth_tables, _session_has_midi
    from whitebox_tpu.render.effects_generic import device_params, prepare_generic_fx
    from whitebox_tpu.render.effects_pipeline import _frame_gains, prepare_automation_tables
    from whitebox_tpu.timeline.carve import carve_session

    from whitebox_tpu.session.bus import session_has_routing

    tp = mesh.shape["tracks"]
    fp = mesh.shape["frames"]
    rate = float(sample_rate)
    routed = session_has_routing(session)
    if routed:
        from whitebox_tpu.render.routing import prepare_routed_fx, routed_device_params

        rfx = prepare_routed_fx(session, sample_rate, channels)
        fx = rfx.fx
    else:
        rfx = None
        fx = prepare_generic_fx(session, sample_rate, channels)
    if master_effects is not None:
        from whitebox_tpu.render.effects_generic import _Group, _stage_kind, _stage_params

        for e in master_effects:
            e.prepare(rate, channels)
        stages = []
        for e in master_effects:
            kind, static = _stage_kind(e)
            stages.append((kind, static, {k: np.stack([v]) for k, v in _stage_params(e, kind).items()}))
        fx.master = _Group(np.asarray([0], np.int64), stages) if stages else None
    if routed:
        gparams, bparams, mparams, _ = routed_device_params(rfx)
    else:
        gparams, mparams = device_params(fx)
        bparams = []

    glat, mlat = _pdc_latencies(fx, rfx, pdc)

    table, pool = carve_session(session, sample_rate, buffer_size=buffer_size,
                                out_channels=channels, slow_emit="runs")
    table, pool = _resolve_sinc_host(table, pool, interpolation)
    T = max(table.num_tracks, 1)
    Tp = -(-T // tp) * tp
    T_local = Tp // tp
    dev = pack_device_tables(table, pool, session, channels=channels, pad_tracks_to=Tp)
    tables = shard_tables(dev.as_jax(), mesh)
    pool_dev = jax.device_put(jnp.asarray(pool.data), NamedSharding(mesh, P()))
    frames = -(-(max(table.total_frames, 1) + mlat) // (fp * 512)) * (fp * 512)
    f_local = frames // fp

    auto = _pad_auto_tables(prepare_automation_tables(session, sample_rate), Tp)
    synth_tables = (
        _prepare_synth_tables(session, sample_rate, buffer_size,
                              max(table.total_frames // buffer_size, 1))
        if _session_has_midi(session) else {}
    )

    rep = lambda tree: jax.tree.map(lambda _: P(), tree)
    track_spec = P("tracks", None, "frames")

    # ---- stage 1: per-track contribs (+ synth) on the 2-D mesh ----
    def tile_contrib(pool, tables, synth_t, off):
        from whitebox_tpu.midi.synth import render_synth_chunk

        base_f = jax.lax.axis_index("frames") * f_local
        contribs = _tile_contribs(pool, tables, off, f_local)
        ti = jax.lax.axis_index("tracks")
        for t in sorted(synth_t.keys()):
            sy = render_synth_chunk(synth_t[t], base_f + off, frames=f_local)
            row = t - ti * T_local
            valid = (row >= 0) & (row < T_local)
            rowc = jnp.clip(row, 0, T_local - 1)
            contribs = contribs.at[rowc].add(jnp.where(valid, sy[None, :], 0.0))
        return contribs

    contrib_fn = jax.jit(shard_map(
        tile_contrib, mesh=mesh,
        in_specs=(P(), _TABLE_SPECS, rep(synth_tables), P()),
        out_specs=track_spec,
    ))
    contribs = contrib_fn(pool_dev, tables, synth_tables,
                          jnp.int32(0))  # [Tp, C, frames] sharded 2-D
    # PDC fetch-ahead: latent groups read from a shifted contribution pass
    # (one extra sharded mix dispatch per distinct latency class)
    shifted = {lat: contrib_fn(pool_dev, tables, synth_tables, jnp.int32(lat))
               for lat in sorted({l for l in glat if l > 0})}

    # ---- stage 2: chain groups, tracks axis sharded ----
    # per-effect parameters shard WITH their tracks (leading dim B), so a
    # device only applies the params of the rows it holds
    group_sharding = NamedSharding(mesh, track_spec)
    for g, pl, lat in zip(fx.groups, gparams, glat):
        stages = tuple((k, s) for (k, s, _) in g.stages)
        B = len(g.track_idx)
        Bpad = -(-B // tp) * tp
        fill = Tp - 1 if Tp > T else int(g.track_idx[0])
        idx_pad = np.concatenate([g.track_idx, np.full(Bpad - B, fill, np.int64)])

        def pad_b(v):
            if Bpad == B:
                return v
            return jnp.concatenate([v, jnp.repeat(v[:1], Bpad - B, axis=0)])

        pl_pad = jax.tree.map(pad_b, pl)
        pspec = jax.tree.map(
            lambda v: P(*(("tracks",) + (None,) * (v.ndim - 1))), pl_pad)

        def chain_tile(xg_local, plist):
            return chain_shard(list(stages), plist, xg_local, "frames", fp, rate)

        fn_g = shard_map(chain_tile, mesh=mesh,
                         in_specs=(track_spec, pspec), out_specs=track_spec)
        src = shifted[lat] if lat > 0 else contribs
        xg = jax.device_put(src[jnp.asarray(idx_pad)], group_sharding)
        yg = jax.jit(fn_g)(xg, pl_pad)
        contribs = contribs.at[jnp.asarray(g.track_idx)].set(yg[:B])
        contribs = jax.device_put(contribs, group_sharding)

    # ---- stage 3: gains -> routing/psum track sum -> buses -> master ----
    master_stages = tuple((k, s) for (k, s, _) in fx.master.stages) if fx.master else ()
    bus_group_stages = ([tuple((k, s) for (k, s, _) in g.stages) for g in rfx.bus_groups]
                        if routed else [])
    bus_group_idx = [jnp.asarray(g.track_idx) for g in rfx.bus_groups] if routed else []
    if routed:
        # routing weight columns shard with their tracks (pad cols are 0)
        padT = lambda a: jnp.asarray(np.pad(a, ((0, 0), (0, Tp - T))))
        routing_dev = (padT(rfx.r_post), padT(rfx.r_pre), jnp.asarray(rfx.bus_gain),
                       padT(rfx.k_post), padT(rfx.k_pre))
        routing_spec = (P(None, "tracks"), P(None, "tracks"), P(),
                        P(None, "tracks"), P(None, "tracks"))
        has_key = rfx.has_key
        bauto = rfx.bus_auto
    else:
        routing_dev, routing_spec = (), ()
        has_key = False
        bauto = None
    bauto_spec = None if bauto is None else jax.tree.map(lambda _: P(), bauto)

    def finish_tile(contribs_l, tg_l, auto_l, bpar, mpar, routing_c, bauto_l):
        base_f = jax.lax.axis_index("frames") * f_local
        gidx = base_f + jnp.arange(f_local, dtype=jnp.int32)
        gains = _frame_gains(auto_l, tg_l, gidx, T_local, channels)
        y = contribs_l * gains

        if routed:
            # local routing partials over this track shard, psum'd over
            # 'tracks' (render/routing.py; HIGHEST keeps f32 quality)
            r_post_l, r_pre_l, bus_gain, k_post_l, k_pre_l = routing_c
            hp = jax.lax.Precision.HIGHEST
            total = jax.lax.psum(
                jnp.einsum("t,tcf->cf", r_post_l[0], y, precision=hp,
                           preferred_element_type=jnp.float32), "tracks")
            bus_sig = jax.lax.psum(
                jnp.einsum("bt,tcf->bcf", r_post_l[1:], y, precision=hp,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("bt,tcf->bcf", r_pre_l, contribs_l, precision=hp,
                             preferred_element_type=jnp.float32), "tracks")
            key_sig = None
            if has_key:
                key_sig = jax.lax.psum(
                    jnp.einsum("bt,tcf->bcf", k_post_l, y, precision=hp,
                               preferred_element_type=jnp.float32)
                    + jnp.einsum("bt,tcf->bcf", k_pre_l, contribs_l, precision=hp,
                                 preferred_element_type=jnp.float32), "tracks")
            for idx, stages, pl in zip(bus_group_idx, bus_group_stages, bpar):
                yb = chain_shard(list(stages), pl, bus_sig[idx], "frames", fp, rate,
                                 key=None if key_sig is None else key_sig[idx])
                bus_sig = bus_sig.at[idx].set(yb)
            B = bus_sig.shape[0]
            total = total + jnp.sum(
                bus_sig * _frame_gains(bauto_l, bus_gain, gidx, B, channels), axis=0)
        else:
            def add(acc, row):
                return acc + row, None

            local, _ = jax.lax.scan(add, jnp.zeros_like(y[0]), y)
            total = jax.lax.psum(local, "tracks")
        if master_stages:
            total = chain_shard(list(master_stages), mpar, total[None], "frames", fp, rate)[0]
        total = jnp.where(total > 1.0, jnp.float32(1.0), total)
        total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
        return total

    auto_spec = None if auto is None else (
        jax.tree.map(lambda _: P("tracks"), auto[0]),
        jax.tree.map(lambda _: P("tracks"), auto[1]),
        P("tracks"), P("tracks"),
    )
    out = jax.jit(shard_map(
        finish_tile, mesh=mesh,
        in_specs=(track_spec, P("tracks", None), auto_spec, rep(bparams),
                  rep(mparams), routing_spec, bauto_spec),
        out_specs=P(None, "frames"),
    ))(contribs, tables["track_gain"], auto, bparams, mparams, routing_dev, bauto)
    return np.asarray(out)[:, mlat : mlat + table.total_frames]


def _bounce_sharded_fx(session, sample_rate: float, mesh: Mesh, *,
                       buffer_size: int, channels: int, master_effects=None,
                       pdc: bool = False, interpolation: str = "linear"):
    """Effectful sharded bounce on a frames-only mesh, mirroring the
    single-chip pipeline order (render/effects_generic._chunk_step):
    per-track mix (+ synth voices) -> per-track chains (grouped by
    signature, frame-sharded with exact cross-shard state handoff) ->
    per-frame automation/fader gains -> ordered track sum -> master chain
    -> hard clip. Automation and synth are pure functions of the global
    frame index, so they shard trivially; only the chains need the
    sequence-parallel handoff.

    ``pdc``: latent track chains get their per-track input re-rendered
    that many frames ahead (one extra sharded mix pass per distinct
    latency class), master latency is absorbed by rendering further and
    trimming the head — the sharded form of bounce's streaming PDC."""
    import numpy as np

    from whitebox_tpu.ops.mix import pack_device_tables
    from whitebox_tpu.parallel.effects_sharded import chain_shard
    from whitebox_tpu.render.bounce import _prepare_synth_tables, _session_has_midi
    from whitebox_tpu.render.effects_generic import device_params, prepare_generic_fx
    from whitebox_tpu.render.effects_pipeline import _frame_gains, prepare_automation_tables
    from whitebox_tpu.timeline.carve import carve_session

    from whitebox_tpu.session.bus import session_has_routing

    fp = mesh.shape["frames"]
    rate = float(sample_rate)
    routed = session_has_routing(session)
    if routed:
        from whitebox_tpu.render.routing import prepare_routed_fx, routed_device_params

        rfx = prepare_routed_fx(session, sample_rate, channels)
        fx = rfx.fx
    else:
        rfx = None
        fx = prepare_generic_fx(session, sample_rate, channels)
    if master_effects is not None:
        # explicit master list overrides the session's chain
        from whitebox_tpu.render.effects_generic import _stage_kind, _stage_params
        from whitebox_tpu.render.effects_generic import _Group

        for e in master_effects:
            e.prepare(rate, channels)
        stages = []
        for e in master_effects:
            kind, static = _stage_kind(e)
            stages.append((kind, static, {k: np.stack([v]) for k, v in _stage_params(e, kind).items()}))
        fx.master = _Group(np.asarray([0], np.int64), stages) if stages else None
    if routed:
        gparams, bparams, mparams, routing_dev = routed_device_params(rfx)
    else:
        gparams, mparams = device_params(fx)
        bparams, routing_dev = [], ()

    glat, mlat = _pdc_latencies(fx, rfx, pdc)

    table, pool = carve_session(session, sample_rate, buffer_size=buffer_size,
                                out_channels=channels, slow_emit="runs")
    table, pool = _resolve_sinc_host(table, pool, interpolation)
    dev = pack_device_tables(table, pool, session, channels=channels)
    tables = shard_tables(dev.as_jax(), mesh)
    pool_dev = jax.device_put(jnp.asarray(pool.data), NamedSharding(mesh, P()))
    # shards pad to PARAM_BLOCK multiples so timed-coefficient (TV biquad)
    # param blocks stay aligned with the single-chip 512-frame grid; master
    # latency renders further and trims the head (PDC)
    frames = -(-(max(table.total_frames, 1) + mlat) // (fp * 512)) * (fp * 512)
    f_local = frames // fp
    T = max(table.num_tracks, 1)

    auto = prepare_automation_tables(session, sample_rate)
    synth_tables = (
        _prepare_synth_tables(session, sample_rate, buffer_size,
                              max(table.total_frames // buffer_size, 1))
        if _session_has_midi(session) else {}
    )

    group_stages = [tuple((k, s) for (k, s, _) in g.stages) for g in fx.groups]
    group_tracks = [jnp.asarray(g.track_idx) for g in fx.groups]
    master_stages = tuple((k, s) for (k, s, _) in fx.master.stages) if fx.master else ()
    bus_group_stages = ([tuple((k, s) for (k, s, _) in g.stages) for g in rfx.bus_groups]
                        if routed else [])
    bus_group_idx = [jnp.asarray(g.track_idx) for g in rfx.bus_groups] if routed else []

    def tile(pool, tables, gpar, bpar, mpar, auto_t, synth_t, routing_c, bauto_t):
        from whitebox_tpu.midi.synth import render_synth_chunk

        base = jax.lax.axis_index("frames") * f_local

        def contribs_at(off: int):
            c = _tile_contribs(pool, tables, jnp.int32(off), f_local)
            for t in sorted(synth_t.keys()):
                sy = render_synth_chunk(synth_t[t], base + off, frames=f_local)
                c = c.at[t].add(sy[None, :])
            return c

        contribs = contribs_at(0)
        shifted = {}  # PDC fetch-ahead: one extra mix pass per latency class
        for tracks, stages, pl, lat in zip(group_tracks, group_stages, gpar, glat):
            if lat > 0 and lat not in shifted:
                shifted[lat] = contribs_at(lat)
            xg = (shifted[lat] if lat > 0 else contribs)[tracks]
            yg = chain_shard(list(stages), pl, xg, "frames", fp, rate)
            contribs = contribs.at[tracks].set(yg)
        gidx = base + jnp.arange(f_local, dtype=jnp.int32)
        y = contribs * _frame_gains(auto_t, tables["track_gain"], gidx, T, channels)

        if routed:
            # bus routing replaces the ordered sum (render/routing.py):
            # HIGHEST keeps the matmul at f32 quality
            r_post, r_pre, bus_gain, k_post, k_pre = routing_c
            hp = jax.lax.Precision.HIGHEST
            total = jnp.einsum("t,tcf->cf", r_post[0], y, precision=hp,
                               preferred_element_type=jnp.float32)
            bus_sig = (jnp.einsum("bt,tcf->bcf", r_post[1:], y, precision=hp,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum("bt,tcf->bcf", r_pre, contribs, precision=hp,
                                    preferred_element_type=jnp.float32))
            total = jax.lax.psum(total, "tracks")
            bus_sig = jax.lax.psum(bus_sig, "tracks")
            key_sig = None
            if rfx.has_key:
                key_sig = jax.lax.psum(
                    jnp.einsum("bt,tcf->bcf", k_post, y, precision=hp,
                               preferred_element_type=jnp.float32)
                    + jnp.einsum("bt,tcf->bcf", k_pre, contribs, precision=hp,
                                 preferred_element_type=jnp.float32), "tracks")
            for idx, stages, pl in zip(bus_group_idx, bus_group_stages, bpar):
                yb = chain_shard(list(stages), pl, bus_sig[idx], "frames", fp, rate,
                                 key=None if key_sig is None else key_sig[idx])
                bus_sig = bus_sig.at[idx].set(yb)
            B = bus_sig.shape[0]
            total = total + jnp.sum(
                bus_sig * _frame_gains(bauto_t, bus_gain, gidx, B, channels), axis=0)
        else:
            def add(acc, row):
                return acc + row, None

            total, _ = jax.lax.scan(add, jnp.zeros_like(y[0]), y)
            # tracks axis is size 1 here (asserted by the caller); the psum
            # is a numeric no-op that marks the output replicated
            total = jax.lax.psum(total, "tracks")
        if master_stages:
            total = chain_shard(list(master_stages), mpar, total[None], "frames", fp, rate)[0]
        total = jnp.where(total > 1.0, jnp.float32(1.0), total)
        total = jnp.where(total < -1.0, jnp.float32(-1.0), total)
        return total

    bauto = rfx.bus_auto if routed else None
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)
    fn = shard_map(
        tile, mesh=mesh,
        in_specs=(P(), _TABLE_SPECS, rep(gparams), rep(bparams), rep(mparams),
                  rep(auto), rep(synth_tables), rep(routing_dev), rep(bauto)),
        out_specs=P(None, "frames"),
    )
    out = jax.jit(fn)(pool_dev, tables, gparams, bparams, mparams, auto, synth_tables,
                      routing_dev, bauto)
    return np.asarray(out)[:, mlat : mlat + table.total_frames]
