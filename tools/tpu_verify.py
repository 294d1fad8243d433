"""On-device verification of the round-3+ feature surface.

Runs the routed finisher (buses + sends + sidechain), PDC, tempo maps
(step + linear ramp, resampled), R128 loudness, linear-phase EQ, track
freeze, phase-vocoder stretch, and the partial sinc prerender against
their host f64 / oracle references ON THE ATTACHED JAX DEVICE (the axon
TPU in this sandbox; CPU when forced). VERDICT r3 weak #1: these features
shipped while the relay was down and had only CPU-backend validation.

Usage: python tools/tpu_verify.py [--json PATH]
Prints one PASS/FAIL line per check + a JSON summary; exit 1 on failure.
``--json PATH`` also writes the summary (plus device/platform and a
timestamp) to PATH so each round can commit the on-silicon log as an
artifact (VERDICT r4 #7). Sessions are tiny so each relay compile stays
in the ~10 s class.
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RATE = 48000.0


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _routed_session(seed=11, sidechain=True, latent=False):
    from tests.test_carve import random_session
    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.effects import (
        Biquad, Compressor, EffectChain, Gain, Limiter, ParametricEQ,
    )

    s = random_session(seed, rate=RATE, bpm=120.0, n_tracks=6,
                       formats=(AudioFormat.F32,), n_clips=2)
    drums = s.add_bus("drums", volume_db=-2.0, pan=0.2)
    fxb = s.add_bus("fx", volume_db=-6.0)
    drums.effects = EffectChain([ParametricEQ([
        ("lowshelf", 120.0, 0.707, 2.5), ("peak", 2500.0, 1.2, -2.0)])])
    if sidechain:
        fxb.effects = EffectChain([Compressor(-24.0, 4.0, sidechain=True)])
    else:
        fxb.effects = EffectChain([Biquad("highpass", 300.0), Gain(-1.5)])
    if latent:
        from whitebox_tpu.effects import LinearPhaseEQ

        drums.effects = EffectChain([LinearPhaseEQ([
            ("lowshelf", 120.0, 0.707, 2.5)], taps=255)])
    s.set_track_output(0, 0)
    s.set_track_output(1, 0)
    s.add_send(2, 1, gain_db=-3.0, sidechain=sidechain)
    s.add_send(3, 1, gain_db=-4.5, pre_fader=True)
    s.master_effects = EffectChain([Biquad("highpass", 30.0), Limiter(-0.5)])
    return s


def _routed_ref(s, pdc=False):
    from whitebox_tpu.render.routing import reference_routed_finish
    from whitebox_tpu.timeline.carve import (
        carve_session, render_segments_per_track_numpy,
    )

    table, pool = carve_session(s, RATE, buffer_size=512)
    pt = render_segments_per_track_numpy(table, pool)
    return reference_routed_finish(pt, s, RATE, 2, pdc=pdc)


def check_routed_sidechain():
    """Buses + post/pre sends + sidechain compressor + master limiter."""
    from whitebox_tpu.render.bounce import bounce

    s = _routed_session(sidechain=True)
    res = bounce(s, RATE, engine="pallas", chunk_frames=8192,
                 effects_mode="routed")
    ref = _routed_ref(s)
    n = min(res.audio.shape[1], ref.shape[1])
    err = rms(res.audio[:, :n] - ref[:, :n]) / max(rms(ref), 1e-9)
    assert err < 5e-5, f"relative rms err {err}"
    return {"rel_rms": err}


def check_routed_pdc():
    """PDC fetch-ahead + head trim under a latent linear-phase bus chain."""
    from whitebox_tpu.render.bounce import bounce

    s = _routed_session(seed=13, sidechain=False, latent=True)
    res = bounce(s, RATE, engine="pallas", chunk_frames=8192,
                 effects_mode="routed", pdc=True)
    ref = _routed_ref(s, pdc=True)
    n = min(res.audio.shape[1], ref.shape[1])
    err = rms(res.audio[:, :n] - ref[:, :n]) / max(rms(ref), 1e-9)
    assert err < 5e-5, f"relative rms err {err}"
    return {"rel_rms": err}


def check_tempo_step_ramp():
    """Mapped speed-1 carve through the device mix: bit-exact vs oracle."""
    from tests.test_tempo_session import _mono_asset
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.session import Session
    from whitebox_tpu.timeline.oracle import OracleRenderer

    s = Session(bpm=128.0)
    s.set_tempo_point(0.0, 128.0, curve="linear")
    s.set_tempo_point(6.0, 64.0)
    s.set_tempo_point(10.0, 150.0)
    a = _mono_asset(s, 12000, seed=3)
    tr = s.add_track("t", volume_db=-3.0, pan=0.3)
    s.add_audio_clip(tr, "c0", 0.25, 3.0, asset=a)
    s.add_audio_clip(tr, "c1", 5.0, 9.0, asset=a, gain=0.5)
    s.add_audio_clip(tr, "c2", 9.5, 12.0, asset=a, gain=0.8)
    oracle = OracleRenderer(s, RATE, buffer_size=512).render()
    res = bounce(s, RATE, engine="pallas", buffer_size=512)
    n = min(res.audio.shape[1], oracle.shape[1])
    exact = bool((res.audio[:, :n] == oracle[:, :n]).all())
    assert exact, "mapped speed-1 render must be bit-exact vs oracle"
    return {"bit_exact": exact}


def check_tempo_resampled():
    """Mapped resampled clip: <=1 ulp blockwise contract on device."""
    from tests.test_tempo_session import _mono_asset
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.session import Session
    from whitebox_tpu.timeline.oracle import OracleRenderer

    s = Session(bpm=100.0)
    s.set_tempo_point(2.0, 140.0)
    a = _mono_asset(s, 20000, seed=5, src_rate=44100)
    tr = s.add_track("t")
    s.add_audio_clip(tr, "c", 0.5, 6.0, asset=a, speed=1.25)
    oracle = OracleRenderer(s, RATE, buffer_size=512).render()
    res = bounce(s, RATE, engine="pallas", buffer_size=512)
    n = min(res.audio.shape[1], oracle.shape[1])
    d = float(np.abs(res.audio[:, :n].astype(np.float64) - oracle[:, :n]).max())
    assert d <= 2.4e-7, f"resampled max err {d}"
    return {"max_abs": d}


def check_loudness():
    """BS.1770-4 K-filter + gating + true peak: device vs host f64."""
    from whitebox_tpu.ops.loudness import measure_loudness

    rng = np.random.default_rng(7)
    n = int(RATE * 8)
    t = np.arange(n) / RATE
    sig = np.stack([
        0.3 * np.sin(2 * np.pi * 997.0 * t) * (t < 5.0),
        0.25 * np.sin(2 * np.pi * 1409.0 * t),
    ]) + 0.01 * rng.standard_normal((2, n))
    sig = sig.astype(np.float32)
    dev = measure_loudness(sig, RATE, device=True)
    host = measure_loudness(sig, RATE, device=False)
    d_lufs = abs(dev.integrated_lufs - host.integrated_lufs)
    d_tp = abs(dev.true_peak_dbtp - host.true_peak_dbtp)
    d_lra = abs(dev.lra_lu - host.lra_lu)
    assert d_lufs < 1e-3 and d_tp < 1e-3 and d_lra < 1e-2, (
        d_lufs, d_tp, d_lra)
    return {"d_lufs": d_lufs, "d_true_peak": d_tp, "d_lra": d_lra}


def check_linphase():
    """Linear-phase EQ through the generic device pipeline vs f64 ref."""
    from tests.test_carve import random_session
    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.effects import EffectChain, LinearPhaseEQ
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.timeline.carve import (
        carve_session, render_segments_per_track_numpy,
    )

    from whitebox_tpu.render.effects_generic import reference_generic_finish

    s = random_session(21, rate=RATE, bpm=120.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=2)
    eq = LinearPhaseEQ([("lowshelf", 150.0, 0.707, 3.0),
                        ("peak", 3000.0, 1.0, -2.5)], taps=511)
    s.tracks[0].effects = EffectChain([eq])
    res = bounce(s, RATE, engine="pallas", chunk_frames=8192)

    table, pool = carve_session(s, RATE, buffer_size=512)
    pt = render_segments_per_track_numpy(table, pool)
    ref = reference_generic_finish(pt, s, RATE, 2)
    n = min(res.audio.shape[1], ref.shape[1])
    err = rms(res.audio[:, :n] - ref[:, :n]) / max(rms(ref), 1e-9)
    assert err < 5e-5, f"relative rms err {err}"
    return {"rel_rms": err}


def check_freeze():
    """freeze_track on the device: frozen bounce == live bounce."""
    from tests.test_carve import random_session
    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.effects import Biquad, EffectChain
    from whitebox_tpu.render.bounce import bounce

    s = random_session(31, rate=RATE, bpm=120.0, n_tracks=3,
                       formats=(AudioFormat.F32,), n_clips=2)
    s.tracks[1].effects = EffectChain([Biquad("lowpass", 5000.0)])
    live = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
    s.freeze_track(1, RATE)
    frozen = bounce(s, RATE, engine="pallas", chunk_frames=8192).audio
    n = min(live.shape[1], frozen.shape[1])
    d = float(np.abs(live[:, :n] - frozen[:, :n]).max())
    assert d < 3e-6, f"freeze divergence {d}"
    return {"max_abs": d}


def check_stretch():
    """Phase-vocoder identity reconstruction error on device."""
    from whitebox_tpu.ops.stretch import time_stretch

    t = np.arange(int(RATE * 2)) / RATE
    sig = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    out = np.asarray(time_stretch(sig, 1.0))
    n = min(sig.shape[1], out.shape[1])
    lo, hi = 4096, n - 4096
    err = rms(out[:, lo:hi] - sig[:, lo:hi])
    assert err < 2e-4, f"identity stretch rms {err}"
    return {"identity_rms": err}


def check_sinc_partial():
    """Mixed rational+irrational sinc session: exact prerender + oversample
    fallback composing in ONE device render; SNR floors per path."""
    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.session import Session
    from whitebox_tpu.session.sample import Sample

    s = Session(bpm=120.0)
    n = 48000 * 2
    t = np.arange(n) / 48000.0
    sine = (0.5 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)[None]
    a = s.sample_table.add_sample(
        Sample.from_planar(sine, 48000, AudioFormat.F32, name="sine"), key="s")
    tr = s.add_track("rat")
    s.add_audio_clip(tr, "c", 0.0, 3.0, asset=a, speed=160.0 / 147.0)
    tr2 = s.add_track("irr")
    s.add_audio_clip(tr2, "c", 0.0, 3.0, asset=a, speed=float(2 ** (1 / 12)))
    res = bounce(s, RATE, interpolation="sinc", chunk_frames=1 << 16)
    audio = np.asarray(res.audio, np.float64)
    x = audio[:, 4096:48000].sum(axis=0)
    # project out BOTH expected sines at once; residue = resampling error
    cols = []
    for sp in (160.0 / 147.0, float(2 ** (1 / 12))):
        f = 997.0 * sp  # playback at `sp` raises the pitch by `sp`
        ph = 2 * np.pi * f * np.arange(x.shape[0]) / RATE
        cols += [np.cos(ph), np.sin(ph)]
    basis = np.stack(cols, axis=1)
    coef, *_ = np.linalg.lstsq(basis, x, rcond=None)
    resid = rms(x - basis @ coef)
    sig = rms(x)
    snr = 20 * np.log10(max(sig, 1e-12) / max(resid, 1e-12))
    assert snr > 70.0, f"mixed sinc SNR {snr:.1f} dB"
    return {"snr_db": float(snr)}


def check_sinc_reverse():
    """Reverse/bidirectional runs through the sinc prerender (mirrored
    forward ramps, speed -1.0 backward reads): device render matches the
    host mirror of the same rewrite."""
    from tests.test_carve import random_session
    from whitebox_tpu.core.formats import AudioFormat
    from whitebox_tpu.render.bounce import bounce
    from whitebox_tpu.session.clip import ClipMode
    from whitebox_tpu.timeline.carve import (
        carve_session, render_segments_per_track_numpy,
    )
    from whitebox_tpu.timeline.prerender import apply_prerender_host, plan_prerender

    s = random_session(15, rate=RATE, bpm=120.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=2,
                       speeds=(0.5, float(2 ** (1 / 12))), src_rates=(48000.0,))
    for c in s.tracks[0].clips:
        c.audio.mode = ClipMode.LOOP_BIDIRECTIONAL
    table, pool = carve_session(s, RATE, buffer_size=512, slow_emit="runs")
    plan = plan_prerender(table, pool, partial=True)
    assert plan is not None and plan.uncovered_rows is None
    assert any(p.rev for p in plan.runs), "session must exercise reverse runs"
    t2, p2 = apply_prerender_host(table, pool, plan)
    pt = render_segments_per_track_numpy(t2, p2)
    ref = np.zeros((2, pt.shape[2]))
    for t, tr in enumerate(s.tracks):
        vol = np.float32(0.0) if tr.mute else tr.volume_linear
        pan = tr.pan_coeffs
        for ch in range(2):
            ref[ch] += pt[t][ch] * float(np.float32(vol * np.float32(pan[ch])))
    ref = np.clip(ref, -1, 1)
    res = bounce(s, RATE, interpolation="sinc", engine="pallas")
    audio = np.asarray(res.audio, np.float64)
    n = min(ref.shape[1], audio.shape[1])
    err = float(np.max(np.abs(audio[:, :n] - ref[:, :n])))
    assert err < 3e-6, f"reverse sinc device vs host mirror: {err}"
    return {"max_abs_err": err}


def check_record_preview():
    """Streaming record ingestion finalize == concatenated chunks."""
    from tests.test_carve import random_session
    from whitebox_tpu.core.formats import AudioFormat

    s = random_session(41, rate=RATE, bpm=120.0, n_tracks=2,
                       formats=(AudioFormat.F32,), n_clips=1)
    tr = s.add_track("rec")
    rng = np.random.default_rng(0)
    take = s.start_recording(tr, 48000.0, at_beat=0.0, channels=1)
    chunks = [rng.standard_normal((1, 4801)).astype(np.float32) * 0.2
              for _ in range(5)]
    for c in chunks:
        take.append(c)
    clip = take.finalize()
    full = np.concatenate(chunks, axis=1)
    got = np.asarray(clip.audio.asset.sample.data)
    assert got.shape == full.shape and (got == full).all()
    return {"frames": int(full.shape[1])}


CHECKS = [
    ("routed_sidechain", check_routed_sidechain),
    ("routed_pdc", check_routed_pdc),
    ("tempo_step_ramp", check_tempo_step_ramp),
    ("tempo_resampled", check_tempo_resampled),
    ("loudness_r128", check_loudness),
    ("linphase_eq", check_linphase),
    ("freeze", check_freeze),
    ("stretch", check_stretch),
    ("sinc_partial", check_sinc_partial),
    ("sinc_reverse", check_sinc_reverse),
    ("record_ingest", check_record_preview),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", metavar="PATH", default=None,
                    help="also write the summary JSON to PATH")
    args = ap.parse_args()

    import jax

    devices = [str(d) for d in jax.devices()]
    print(f"devices: {devices}", flush=True)
    results = {}
    failed = []
    for name, fn in CHECKS:
        t0 = time.perf_counter()
        try:
            info = fn()
            dt = time.perf_counter() - t0
            results[name] = {"ok": True, "seconds": round(dt, 1), **info}
            print(f"PASS {name} ({dt:.1f}s) {info}", flush=True)
        except Exception as e:
            dt = time.perf_counter() - t0
            results[name] = {"ok": False, "seconds": round(dt, 1),
                             "error": repr(e)}
            failed.append(name)
            print(f"FAIL {name} ({dt:.1f}s): {e!r}", flush=True)
            traceback.print_exc()
    print(json.dumps(results))
    if args.json:
        summary = {
            "timestamp_utc": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
            "devices": devices,
            "platform": jax.devices()[0].platform,
            "n_checks": len(CHECKS),
            "n_pass": len(CHECKS) - len(failed),
            "failed": failed,
            "checks": results,
        }
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.json}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
