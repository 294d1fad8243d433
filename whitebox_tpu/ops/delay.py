"""Delay lines — TPU-parallel feedback combs and modulated taps.

The reference hosts delays as binary VST3 plugins (src/plughost), so this
module defines the framework's delay numerics with frame-parallel designs:

- Feedback comb (echo): w[n] = x[n-D] + fb * w[n-D]. Reshaping the frame
  axis into [blocks of D] turns the lag-D recurrence into a *first-order*
  recurrence over blocks, batched across the D in-block lanes — evaluated
  with ``jax.lax.associative_scan`` in O(log(F/D)) depth. Ping-pong feeds
  back through a channel swap, which makes the block recurrence a 2x2
  scaled-permutation map; its k-step composition is closed-form
  (fb^k * swap^(k odd)), so even that stays a pair of scalar scans.
- Modulated fractional taps (chorus/flanger): pure gathers with linear
  interpolation at an LFO-swept delay — no recurrence at all (the
  feedforward forms; flanger feedback is documented out).

Chunk-boundary state (the last D wet samples) carries exactly, so chunked
processing equals one-shot. Sequential f64 references live alongside.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _blockify(x, D: int):
    """[..., F] -> ([..., nblk, D], F, nblk) padding F up to a multiple of D."""
    F = x.shape[-1]
    nblk = -(-F // D)
    pad = nblk * D - F
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return xp.reshape(x.shape[:-1] + (nblk, D)), F, nblk


@partial(jax.jit, static_argnames=("D",))
def comb_feedback(x, fb, w0, x0, *, D: int):
    """Wet line w[n] = x[n-D] + fb*w[n-D] for x [..., F] (per-lane comb).

    ``w0``/``x0`` [..., D]: the last D wet / dry samples *before* this chunk
    (zeros at stream start). Returns (w [..., F], w_last, x_last)."""
    xb, F, nblk = _blockify(x, D)  # [..., nblk, D]
    fb = jnp.asarray(fb, jnp.float32)
    # w[jD+i] = x[(j-1)D+i] + fb*w[(j-1)D+i]: block recurrence
    # wb[j] = fb*wb[j-1] + xb[j-1], with block -1 supplied by the carries.
    inj = jnp.concatenate([x0[..., None, :], xb[..., :-1, :]], axis=-2)

    def comb(l, r):  # affine composition over the block axis
        return l[0] * r[0], r[0] * l[1] + r[1]

    m = jnp.broadcast_to(fb, inj.shape)
    mm, bb = jax.lax.associative_scan(comb, (m, inj), axis=-2)
    wb = mm * w0[..., None, :] + bb
    w = wb.reshape(x.shape[:-1] + (nblk * D,))[..., :F]
    # carries = last D wet / dry samples of the (unpadded) stream
    w_last = jnp.concatenate([w0, w], axis=-1)[..., F : F + D]
    x_last = jnp.concatenate([x0, x], axis=-1)[..., F : F + D]
    return w, w_last, x_last


def _parity_scan(inj, fb, w0):
    """Closed-form scan for wb[j] = fb * swap(wb[j-1]) + inj[j-1] on [.., nblk, 2, D].

    Because the map is fb * swap each step, the composition over k steps is
    fb^k * swap^(k&1): split the contribution of each source block by the
    parity of its distance and run two plain affine scans."""
    # decompose into same-channel and swapped-channel accumulations by
    # scanning pairs of blocks: group j into macro steps of 2 where the
    # 2-step map is fb^2 * identity (swap^2 = I).
    orig_nblk = nblk = inj.shape[-3]
    if nblk % 2:  # pad one zero block so pairs are whole
        pad = [(0, 0)] * inj.ndim
        pad[-3] = (0, 1)
        inj = jnp.pad(inj, pad)
        nblk += 1
    fb2 = fb * fb
    swap = lambda v: v[..., ::-1, :]
    a = inj[..., 0::2, :, :]  # injections landing at even offsets within the pair
    b = inj[..., 1::2, :, :]
    # macro recurrence over pairs p: W[p] = fb2*W[p-1] + (fb*swap(a[p]) + b[p])
    # where W[p] = wb at the odd block of pair p; even block derived after.
    even_inj = a  # wb_even[p] = fb*swap(wb_odd[p-1]) + a[p]
    odd_inj = fb * swap(a) + b

    def comb(l, r):
        return l[0] * r[0], r[0] * l[1] + r[1]

    m = jnp.broadcast_to(fb2, odd_inj.shape)  # fb2 may be scalar or [B,1,1,1]
    mm, bb = jax.lax.associative_scan(comb, (m, odd_inj), axis=-3)
    w_odd = mm * w0[..., None, :, :] + bb  # [..., npair, 2, D]
    w_prev_odd = jnp.concatenate([w0[..., None, :, :], w_odd[..., :-1, :, :]], axis=-3)
    w_even = fb * swap(w_prev_odd) + even_inj
    npair = w_even.shape[-3]
    # interleave even/odd blocks back into stream order: stack(axis=-3)
    # places parity right after the pair axis -> [..., npair, 2(parity), C, D]
    wb = jnp.stack([w_even, w_odd], axis=-3)
    wb = wb.reshape(w_even.shape[:-3] + (2 * npair, 2, w_even.shape[-1]))
    return wb[..., :orig_nblk, :, :]


@partial(jax.jit, static_argnames=("D",))
def comb_feedback_pingpong(x, fb, w0, x0, *, D: int):
    """Ping-pong comb for stereo x [..., 2, F]: the wet line feeds back into
    the *opposite* channel: w[c, n] = x[c, n-D] + fb * w[1-c, n-D].

    w0/x0 [..., 2, D] carry the last D wet/dry samples.
    Returns (w, w_last, x_last)."""
    xb, F, nblk = _blockify(x, D)  # [..., 2, nblk, D]
    xb = jnp.swapaxes(xb, -3, -2)  # [..., nblk, 2, D]
    fb = jnp.asarray(fb, jnp.float32)
    inj = jnp.concatenate([x0[..., None, :, :], xb[..., :-1, :, :]], axis=-3)
    wb = _parity_scan(inj, fb, w0)
    w = jnp.swapaxes(wb, -3, -2).reshape(x.shape[:-1] + (nblk * D,))[..., :F]
    w_last = jnp.concatenate([w0, w], axis=-1)[..., F : F + D]
    x_last = jnp.concatenate([x0, x], axis=-1)[..., F : F + D]
    return w, w_last, x_last


@partial(jax.jit, static_argnames=("max_delay",))
def modulated_tap(x, delay_frames, xtail, *, max_delay: int):
    """Fractional-delay tap: y[n] = x[n - delay_frames[n]] (linear interp).

    x [..., F]; delay_frames [..., F] f32 in [1, max_delay-1];
    xtail [..., max_delay]: the last max_delay dry samples before this
    chunk. Returns (tap, new_xtail). Pure gather — fully parallel."""
    F = x.shape[-1]
    ext = jnp.concatenate([xtail, x], axis=-1)  # index n+max_delay == x[n]
    # exact position split: n - d = (n - di - 1) + (1 - fd). Keeping the
    # integer part in int32 avoids the f32 absolute-position ulp (0.25 at
    # n ~ 3M frames) that would corrupt the interpolation fraction.
    di = jnp.floor(delay_frames)
    fd = (delay_frames - di).astype(jnp.float32)
    i0 = jnp.arange(F, dtype=jnp.int32) + (max_delay - 1) - di.astype(jnp.int32)
    i0 = jnp.clip(i0, 0, F + max_delay - 2)
    frac = 1.0 - fd
    a = jnp.take_along_axis(ext, jnp.broadcast_to(i0, ext.shape[:-1] + (F,)), axis=-1)
    b = jnp.take_along_axis(ext, jnp.broadcast_to(i0 + 1, ext.shape[:-1] + (F,)), axis=-1)
    tap = a + frac * (b - a)
    return tap, ext[..., -max_delay:]


def lfo_rate_splits(rate_hz, sample_rate) -> np.ndarray:
    """HOST: split an LFO rate into exact-product phase constants [..., 6].

    The LFO phase is ``2*pi * frac(n * r)`` with r = rate/fs cycles per
    frame. A plain f32 ``w*n`` loses the phase entirely past n ~ 2^24
    (~6 min @ 48 kHz) because n itself stops being representable. Instead
    n is split into exact 13-bit digits (n = n2*2^26 + n1*2^13 + n0) and
    each digit multiplies a per-digit cycle increment C_k = frac(2^(13k)*r),
    itself split into an 8-bit coarse part (digit*coarse is exact in f32,
    so its mod-1 is exact) plus an f32 residue. Total phase error stays
    ~2e-5 cycles out to n = 2^31 (~12 h @ 48 kHz).
    """
    r = np.asarray(rate_hz, np.float64) / float(sample_rate)
    parts = []
    for shift in (26, 13, 0):
        c = np.mod(np.ldexp(r, shift), 1.0)
        a = np.floor(c * 256.0) / 256.0
        parts.append(a.astype(np.float32))
        parts.append((c - a).astype(np.float32))
    return np.stack(parts, axis=-1)  # [..., 6]


def lfo_delay_frames(start_frame, F: int, *, rate_hz=None, depth_frames, center_frames,
                     sample_rate=None, phase=0.0, rate_splits=None):
    """Sine-LFO swept delay, phase-exact from the absolute frame index (so
    chunked processing stays identical).

    ``rate_splits``: precomputed ``lfo_rate_splits`` constants (required
    when the rate is a traced array — split on host where the f64 rate is
    known); otherwise ``rate_hz``/``sample_rate`` must be host values."""
    if rate_splits is None:
        rate_splits = lfo_rate_splits(rate_hz, sample_rate)
    s = jnp.asarray(rate_splits, jnp.float32)
    n = jnp.asarray(start_frame, jnp.int32) + jnp.arange(F, dtype=jnp.int32)
    n2 = (n >> 26).astype(jnp.float32)
    n1 = ((n >> 13) & 0x1FFF).astype(jnp.float32)
    n0 = (n & 0x1FFF).astype(jnp.float32)

    def frac(x):
        return x - jnp.floor(x)

    cyc = (frac(n2 * s[..., 0]) + n2 * s[..., 1]
           + frac(n1 * s[..., 2]) + n1 * s[..., 3]
           + frac(n0 * s[..., 4]) + n0 * s[..., 5])
    cyc = cyc - jnp.round(cyc)  # [-0.5, 0.5] cycles
    arg = jnp.float32(2.0 * np.pi) * cyc + phase
    return center_frames + depth_frames * jnp.sin(arg)


# ---------------------------------------------------------------------------
# float64 sequential references
# ---------------------------------------------------------------------------


def comb_feedback_ref(x: np.ndarray, fb: float, D: int) -> np.ndarray:
    """w[n] = x[n-D] + fb*w[n-D], zero initial history. x [..., F]."""
    x = np.asarray(x, np.float64)
    w = np.zeros_like(x)
    F = x.shape[-1]
    for n in range(F):
        if n >= D:
            w[..., n] = x[..., n - D] + fb * w[..., n - D]
    return w


def comb_pingpong_ref(x: np.ndarray, fb: float, D: int) -> np.ndarray:
    """w[c,n] = x[c,n-D] + fb*w[1-c,n-D]. x [2, F]."""
    x = np.asarray(x, np.float64)
    w = np.zeros_like(x)
    F = x.shape[-1]
    for n in range(D, F):
        w[0, n] = x[0, n - D] + fb * w[1, n - D]
        w[1, n] = x[1, n - D] + fb * w[0, n - D]
    return w


def modulated_tap_ref(x: np.ndarray, delay: np.ndarray) -> np.ndarray:
    """y[n] = x[n - delay[n]] linear-interp, zero history. x [..., F]."""
    x = np.asarray(x, np.float64)
    F = x.shape[-1]
    y = np.zeros_like(x)
    for n in range(F):
        p = n - float(delay[..., n] if delay.ndim else delay[n])
        i0 = int(np.floor(p))
        frac = p - i0
        a = x[..., i0] if i0 >= 0 else 0.0
        b = x[..., i0 + 1] if i0 + 1 >= 0 else 0.0
        y[..., n] = a + frac * (b - a)
    return y
