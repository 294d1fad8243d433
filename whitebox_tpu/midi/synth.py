"""The built-in polyphonic synth — spec'd from the reference's TestSynth.

TestSynth (test_synth.cpp:33-58) is a 64-voice square-wave synth with a
linear decay envelope: per sample, each voice adds
``osc * amp * velocity * 0.5f`` where ``osc = phase >= 1 ? 1 : -1``
(period-2 phase), ``phase += freq/rate`` (wrap at 2), and
``amp = max(amp - 5/44100, 0)``. Notably the reference never actually
renders it — the call is commented out (track.cpp:726) — so this framework
defines the production numerics:

- phase: a 32-bit fixed-point accumulator — ``phase32(n) = n * step32 mod
  2^32`` with ``step32 = round(freq/rate * 2^32)``; the square output is
  the top bit. Deterministic, drift-free over arbitrary lengths, and
  identical between the NumPy reference and the TPU path (closed form
  replaces TestSynth's sequential f64 adds; worst-case detune is
  2^-32 relative). NOTE: TestSynth's period-2 phase makes it sound an
  octave below the note's nominal pitch — since its render call is dead
  code, we fix the octave so note 69 plays 440 Hz.
- envelope: ``amp(n) = max(1 - n * (5/44100), 0)`` in f32.
- per-frame voice sum in slot order (matching TestSynth's LSB-first bit
  scan), added equally to every output channel, before track volume/pan.

Timeline-at-once: voice events channelize into <= 64 slots with
non-overlapping per-slot segments (midi.voice), so rendering is the same
segment-table pattern as the audio mix — evaluated per (track, slot, frame)
and summed over slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.core.math import note_to_hz
from whitebox_tpu.midi.voice import VoiceEvent

ENV_SPEED = np.float32(5.0 / 44100.0)


def build_slot_segments(events: list[VoiceEvent], num_slots: int = 64):
    """Voice events -> per-slot non-overlapping segments.

    Returns (num_slots_used, dict of arrays): seg_slot, seg_start, seg_end,
    seg_step32 (uint32), seg_vel (f32), sorted by (slot, start).
    """
    opens: dict[int, VoiceEvent] = {}
    rows = []
    max_slot = -1
    for ev in events:
        if ev.on:
            prev = opens.pop(ev.slot, None)
            if prev is not None and ev.frame > prev.frame:  # defensive close
                rows.append((prev.slot, prev.frame, ev.frame, prev.key, prev.velocity))
            opens[ev.slot] = ev
            max_slot = max(max_slot, ev.slot)
        else:
            on = opens.pop(ev.slot, None)
            if on is not None and ev.frame > on.frame:
                rows.append((on.slot, on.frame, ev.frame, on.key, on.velocity))
    for slot, on in opens.items():  # unterminated: ring to +inf (caller clips)
        rows.append((slot, on.frame, 2**31 - 1, on.key, on.velocity))
    rows.sort(key=lambda r: (r[0], r[1]))
    if not rows:
        return 0, None
    seg_slot = np.array([r[0] for r in rows], dtype=np.int32)
    seg_start = np.array([r[1] for r in rows], dtype=np.int32)
    seg_end = np.array([r[2] for r in rows], dtype=np.int32)
    seg_key = np.array([r[3] for r in rows], dtype=np.int32)
    seg_vel = np.array([r[4] for r in rows], dtype=np.float32)
    return max_slot + 1, {
        "slot": seg_slot, "start": seg_start, "end": seg_end,
        "key": seg_key, "vel": seg_vel,
    }


def step32_for_key(key, sample_rate: float) -> np.ndarray:
    """Fixed-point phase step: round(note_hz/rate * 2^32) as uint32."""
    freq = note_to_hz(np.asarray(key, dtype=np.float64))
    step = np.round(freq / sample_rate * 4294967296.0)
    return (step.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)


def pack_slot_tables(segs: dict, sample_rate: float, num_slots: int, max_per_slot: int | None = None):
    """Per-slot padded arrays [num_slots, S] for the device renderer."""
    counts = np.bincount(segs["slot"], minlength=num_slots)
    S = max(int(counts.max()), 1) if max_per_slot is None else max_per_slot
    start = np.full((num_slots, S), np.int32(2**31 - 1), dtype=np.int32)
    end = np.zeros((num_slots, S), dtype=np.int32)
    step = np.zeros((num_slots, S), dtype=np.uint32)
    vel = np.zeros((num_slots, S), dtype=np.float32)
    pos = np.zeros(num_slots, dtype=np.int64)
    st32 = step32_for_key(segs["key"], sample_rate)
    for i in range(segs["slot"].shape[0]):
        sl = int(segs["slot"][i])
        j = int(pos[sl])
        pos[sl] += 1
        start[sl, j] = segs["start"][i]
        end[sl, j] = segs["end"][i]
        step[sl, j] = st32[i]
        vel[sl, j] = segs["vel"][i]
    return {"start": start, "end": end, "step": step, "vel": vel}


def _bisect_right(a, v):
    S = a.shape[0]
    lo = jnp.zeros(v.shape, dtype=jnp.int32)
    hi = jnp.full(v.shape, S, dtype=jnp.int32)
    steps = max(int(np.ceil(np.log2(S + 1))), 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        pred = a[jnp.clip(mid, 0, S - 1)] <= v
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def _slot_contrib(g, start, end, step, vel):
    """One slot's synth output at frames g [F] -> f32 [F]."""
    idx = jnp.clip(_bisect_right(start, g) - 1, 0, start.shape[0] - 1)
    s0 = start[idx]
    valid = (g >= s0) & (g < end[idx])
    n = jnp.where(valid, g - s0, 0)
    phase = n.astype(jnp.uint32) * step[idx]  # mod 2^32 wrap
    osc = jnp.where(phase >= jnp.uint32(0x80000000), jnp.float32(1.0), jnp.float32(-1.0))
    amp = jnp.maximum(jnp.float32(1.0) - n.astype(jnp.float32) * ENV_SPEED, jnp.float32(0.0))
    return jnp.where(valid, (osc * amp) * (vel[idx] * jnp.float32(0.5)), jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("frames",))
def render_synth_chunk(tables, chunk_start, frames: int):
    """Synth output for one track -> [F] f32 (sum over slots, slot order)."""
    g = chunk_start + jnp.arange(frames, dtype=jnp.int32)
    contribs = jax.vmap(lambda s, e, st, v: _slot_contrib(g, s, e, st, v))(
        tables["start"], tables["end"], tables["step"], tables["vel"]
    )  # [slots, F]

    def add(acc, row):
        return acc + row, None

    # zeros_like keeps shard_map's varying-axes annotation on the carry
    # (frame-sharded renders call this inside a mesh tile)
    total, _ = jax.lax.scan(add, jnp.zeros_like(contribs[0]), contribs)
    return total


def render_synth_numpy(segs: dict, sample_rate: float, total_frames: int, num_slots: int) -> np.ndarray:
    """Host reference (bit-identical spec) -> [total_frames] f32."""
    out = np.zeros(total_frames, dtype=np.float32)
    st32 = step32_for_key(segs["key"], sample_rate)
    order = np.lexsort((segs["start"], segs["slot"]))
    for sl in range(num_slots):
        acc = np.zeros(total_frames, dtype=np.float32)
        for i in order:
            if segs["slot"][i] != sl:
                continue
            a = int(segs["start"][i])
            b = min(int(segs["end"][i]), total_frames)
            if b <= a or a >= total_frames:
                continue
            n = np.arange(b - a, dtype=np.int64)
            phase = (n.astype(np.uint64) * np.uint64(st32[i])) & np.uint64(0xFFFFFFFF)
            osc = np.where(phase >= 0x80000000, np.float32(1.0), np.float32(-1.0))
            amp = np.maximum(np.float32(1.0) - n.astype(np.float32) * ENV_SPEED, np.float32(0.0))
            acc[a:b] += (osc * amp) * (np.float32(segs["vel"][i]) * np.float32(0.5))
        out += acc
    return out
