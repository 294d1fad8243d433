"""Sample-accurate track automation — a framework extension.

The reference edits envelope curves (src/ui/env_editor.cpp over
envelope_storage.h's 9 curve types) but its audio thread only ever sees
whole-block parameter changes (SURVEY §2.9). Here automation lanes evaluate
*per frame* on the device.

Model: a lane is a sorted list of (x beats, y value, curve, tension)
breakpoints; value holds before the first and after the last point. Curves:
LINEAR and EXP_EASE (the rational exponential_ease2 from core_math.h:78,
cheap on the VPU). Lanes attach to tracks as
``track.automation = TrackAutomation(volume=..., pan=...)``:

- volume lane: linear gain, replaces the track fader (mute still silences);
- pan lane: pan position in [-1, 1], fed through the ConstantPower -3 dB law
  per frame (f32 sin on device — automation is an extension, its spec *is*
  the f32 evaluation; the no-automation path keeps bit-parity).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from whitebox_tpu.core.math import beat_to_samples

_SENTINEL = np.int32(2**31 - 1)


class CurveType(enum.IntEnum):
    LINEAR = 0
    EXP_EASE = 1  # exponential_ease2(u, tension)


@dataclass
class EnvelopePoint:
    x: float  # beats
    y: float
    curve: CurveType = CurveType.LINEAR
    tension: float = 0.0


@dataclass
class AutomationLane:
    points: list[EnvelopePoint] = field(default_factory=list)

    def __post_init__(self):
        self.points.sort(key=lambda p: p.x)

    def add(self, x: float, y: float, curve: CurveType = CurveType.LINEAR, tension: float = 0.0):
        self.points.append(EnvelopePoint(x, y, curve, tension))
        self.points.sort(key=lambda p: p.x)
        return self


@dataclass
class TrackAutomation:
    volume: AutomationLane | None = None  # linear gain
    pan: AutomationLane | None = None  # [-1, 1]


def lane_frame_table(lane: AutomationLane | None, sample_rate: float, beat_duration: float,
                     max_points: int, default: float):
    """Lane -> fixed-size frame-domain breakpoint arrays (xs, ys, curve, tension).

    Frame positions use the exact beat->frame map (f64, rounded to nearest
    frame). A None lane becomes a single point holding ``default``.
    """
    if lane is None or not lane.points:
        pts = [EnvelopePoint(0.0, default)]
    else:
        pts = lane.points
    P = max_points
    xs = np.full(P, _SENTINEL, dtype=np.int32)
    ys = np.zeros(P, dtype=np.float32)
    cv = np.zeros(P, dtype=np.int32)
    tn = np.zeros(P, dtype=np.float32)
    for i, p in enumerate(pts[:P]):
        xs[i] = int(round(beat_to_samples(p.x, sample_rate, beat_duration)))
        ys[i] = np.float32(p.y)
        cv[i] = int(p.curve)
        tn[i] = np.float32(p.tension)
    n = min(len(pts), P)
    ys[n:] = ys[n - 1]  # hold last value in padded slots
    return xs, ys, cv, tn


def eval_lane_device(xs, ys, cv, tn, g):
    """Evaluate one lane at frames ``g`` [F] -> f32 [F] (jnp).

    Static unrolled sweep over the (few) breakpoints with elementwise
    selects — per-frame gathers of tiny tables lower catastrophically on
    TPU (~20M gathers/s), while P passes of VPU ops are free.
    """
    P = xs.shape[0]
    val = jnp.full(g.shape, ys[0], dtype=jnp.float32)
    for i in range(P - 1):
        x0 = xs[i]
        x1 = xs[i + 1]
        span = jnp.maximum(x1 - x0, 1)
        u = jnp.clip((g - x0).astype(jnp.float32) / span.astype(jnp.float32), 0.0, 1.0)
        u = jnp.where(x1 == _SENTINEL, jnp.float32(0.0), u)  # hold after last point
        t = tn[i]
        eased = (u - t * u) / (t - 2.0 * t * jnp.abs(u) + 1.0)  # exponential_ease2
        u = jnp.where(cv[i] == int(CurveType.EXP_EASE), eased, u)
        seg = ys[i] + u * (ys[i + 1] - ys[i])
        val = jnp.where(g >= x0, seg, val)
    return val


def eval_lane_numpy(xs, ys, cv, tn, g):
    """Host f32 mirror of eval_lane_device (the extension's test reference)."""
    P = xs.shape[0]
    i = np.clip(np.searchsorted(xs, g, side="right") - 1, 0, P - 1)
    i1 = np.clip(i + 1, 0, P - 1)
    x0, x1 = xs[i], xs[i1]
    y0, y1 = ys[i], ys[i1]
    span = np.maximum(x1 - x0, 1)
    u = np.clip((g - x0).astype(np.float32) / span.astype(np.float32), 0.0, 1.0)
    u = np.where(x1 == _SENTINEL, np.float32(0.0), u)
    t = tn[i]
    eased = (u - t * u) / (t - 2.0 * t * np.abs(u) + 1.0)
    u = np.where(cv[i] == int(CurveType.EXP_EASE), eased, u).astype(np.float32)
    return (y0 + u * (y1 - y0)).astype(np.float32)


def pan_coef_f32(p, channel: int):
    """ConstantPower -3 dB pan law in f32 (device form of panning_law.cpp)."""
    mod = jnp if isinstance(p, jnp.ndarray) else np
    x = 0.5 * (p + 1.0)
    arg = (1.0 - x) if channel == 0 else x
    return (mod.sin(np.float32(0.5 * np.pi) * arg) * np.float32(np.sqrt(2.0))).astype(
        jnp.float32 if mod is jnp else np.float32
    )


def session_has_automation(session) -> bool:
    return any(t.automation is not None for t in session.tracks)


def pack_session_automation(session, sample_rate: float, channels: int = 2):
    """All track lanes -> fixed-size arrays [T, P] (+ has-lane masks).

    Tracks without lanes get constant lanes at their fader values, so the
    finish stage can evaluate every track uniformly.
    """
    bd = session.beat_duration
    T = len(session.tracks)
    P = 1
    for t in session.tracks:
        a = t.automation
        if a is not None:
            for lane in (a.volume, a.pan):
                if lane is not None:
                    P = max(P, len(lane.points))

    vol = {k: [] for k in ("xs", "ys", "cv", "tn")}
    pan = {k: [] for k in ("xs", "ys", "cv", "tn")}
    for t in session.tracks:
        a = t.automation
        vol_lane = a.volume if a is not None else None
        pan_lane = a.pan if a is not None else None
        # default volume: the track fader's *linear* gain (f32, as the
        # engine computes it); mute applies in the finish stage
        vx, vy, vc, vt = lane_frame_table(vol_lane, sample_rate, bd, P, float(t.volume_linear))
        px, py, pc, pt_ = lane_frame_table(pan_lane, sample_rate, bd, P, float(t.pan))
        for k, v in zip(("xs", "ys", "cv", "tn"), (vx, vy, vc, vt)):
            vol[k].append(v)
        for k, v in zip(("xs", "ys", "cv", "tn"), (px, py, pc, pt_)):
            pan[k].append(v)

    mute = np.array([0.0 if t.mute else 1.0 for t in session.tracks], dtype=np.float32)
    return (
        {k: np.stack(v) for k, v in vol.items()},
        {k: np.stack(v) for k, v in pan.items()},
        mute,
    )
