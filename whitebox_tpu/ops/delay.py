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


def lfo_delay_frames(start_frame, F: int, *, rate_hz, depth_frames, center_frames,
                     sample_rate, phase=0.0):
    """Sine-LFO swept delay, phase-exact from the absolute frame index (so
    chunked processing stays identical)."""
    n = start_frame + jnp.arange(F, dtype=jnp.float32)
    w = 2.0 * np.pi * rate_hz / sample_rate
    return center_frames + depth_frames * jnp.sin(w * n + phase)


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
