"""Waveform min/max peak mipmaps — replaces gfx/waveform_visual.cpp.

The reference builds, per channel, a pyramid of (min, max) pairs over
non-overlapping chunks, one level per odd mip (block = 2^(mip-1), chunk =
2 blocks), quantized to int8 (Low) or int16 (High) with asymmetric
positive/negative scaling, pairs ordered by *occurrence* (whichever of
min/max appears first in the chunk comes first) —
waveform_visual.cpp:9-248. Levels step x4 until the sample count falls to
<= 64.

Two implementations:
- ``reference_mipmaps``: NumPy scalar-faithful port (the parity oracle).
- ``build_mipmaps``: hierarchical JAX pyramid — one quantize pass + an
  O(N * 4/3) (value, index) min/max reduction tree with first-occurrence
  tie-breaks, bit-identical to the oracle. Runs on TPU; this replaces the
  reference's per-level CPU rescan (O(N log N)).

Semantics notes (faithfully kept):
- per level, out_count = floor(N / block) rounded UP to even; chunks cover
  [0, out_count*block) — a sub-block tail is *dropped* when floor(N/block)
  is even and *included* (partial chunk) when odd;
- quantization truncates toward zero (C cast);
- first occurrence wins ties (strict < / > scans).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from whitebox_tpu.core.formats import AudioFormat
from whitebox_tpu.session.sample import Sample

_I32_MAX = np.int32(2**31 - 1)


def _conv_ratios(src_fmt: AudioFormat, tmax: int, tmin: int, as_double: bool):
    """The reference's per-format positive/negative scale constants."""
    if src_fmt == AudioFormat.I8:
        return np.float32(tmax / 127.0), np.float32(tmin / -128.0)
    if src_fmt == AudioFormat.I16:
        return np.float32(tmax / 32767.0), np.float32(tmin / -32768.0)
    if src_fmt in (AudioFormat.I24, AudioFormat.I24_X8, AudioFormat.I32):
        # waveform_visual.cpp treats I24-in-int32 via the I32 branch (double)
        return np.float64(tmax / 2147483647.0), np.float64(tmin / -2147483648.0)
    if src_fmt == AudioFormat.F32:
        return np.float32(tmax), np.float32(-tmin)
    raise ValueError(f"unsupported peak source format {src_fmt!r}")


def quantize_codes(data: np.ndarray, src_fmt: AudioFormat, quality: str) -> np.ndarray:
    """Native channel data -> int32 codes in the target range (trunc toward 0).

    quality 'low' -> int8 range, 'high' -> int16 range
    (waveform_visual.cpp:188-192).
    """
    if quality == "low":
        tmax, tmin = 127, -128
    elif quality == "high":
        tmax, tmin = 32767, -32768
    else:
        raise ValueError("quality must be 'low' or 'high'")

    pos, neg = _conv_ratios(src_fmt, tmax, tmin, False)
    if src_fmt == AudioFormat.F32:
        x = np.asarray(data, dtype=np.float32)
        conv = np.where(x >= 0.0, x * pos, x * neg)
    elif src_fmt in (AudioFormat.I24, AudioFormat.I24_X8, AudioFormat.I32):
        x = np.asarray(data)
        conv = np.where(x >= 0, x.astype(np.float64) * pos, x.astype(np.float64) * neg)
    else:
        x = np.asarray(data)
        conv = np.where(x >= 0, x.astype(np.float32) * pos, x.astype(np.float32) * neg)
    # C-style trunc-toward-zero; saturate instead of UB on out-of-range floats
    return np.clip(np.trunc(conv), tmin, tmax).astype(np.int32)


def mip_levels_for(count: int) -> list[int]:
    """waveform_visual.cpp:194-243 — odd mips 1,3,5,... while count > 64."""
    levels = []
    mip = 1
    c = count
    while c > 64:
        levels.append(mip)
        c //= 4
        mip += 2
    return levels


def level_out_count(count: int, mip: int) -> int:
    block = 1 << (mip - 1)
    out = count // block
    return out + (out % 2)


@dataclass
class MipLevel:
    mip_level: int
    #: [channels, out_count] interleaved (first, second) occurrence-ordered
    #: min/max codes, int8 (low) or int16 (high)
    data: np.ndarray


@dataclass
class WaveformMipmaps:
    sample_count: int
    channels: int
    sample_rate: int
    quality: str
    levels: list[MipLevel]


def _reference_level(codes: np.ndarray, count: int, mip: int) -> np.ndarray:
    """Scalar-faithful single-level port of summarize_for_mipmaps_impl."""
    block = 1 << (mip - 1)
    chunk = 1 << mip
    out_count = level_out_count(count, mip)
    out = np.zeros(out_count, dtype=np.int32)
    for i in range(0, out_count, 2):
        idx = i * block
        chunk_length = min(chunk, count - idx)
        min_val, max_val = _I32_MAX, -_I32_MAX - 1
        min_idx = max_idx = 0
        for j in range(chunk_length):
            v = codes[idx + j]
            if v < min_val:
                min_val, min_idx = v, j
            if v > max_val:
                max_val, max_idx = v, j
        if max_idx < min_idx:
            out[i], out[i + 1] = max_val, min_val
        else:
            out[i], out[i + 1] = min_val, max_val
    return out


def reference_mipmaps(sample: Sample, quality: str = "high") -> WaveformMipmaps:
    """NumPy parity oracle (slow, scalar-faithful)."""
    out_dtype = np.int8 if quality == "low" else np.int16
    levels = []
    for mip in mip_levels_for(sample.count):
        per_ch = []
        for c in range(sample.channels):
            codes = quantize_codes(sample.data[c], sample.format, quality)
            per_ch.append(_reference_level(codes, sample.count, mip))
        levels.append(MipLevel(mip, np.stack(per_ch).astype(out_dtype)))
    return WaveformMipmaps(sample.count, sample.channels, sample.sample_rate, quality, levels)


# ---------------------------------------------------------------------------
# Device pyramid (TPU-layout-aware)
#
# Small chunks (2..128, mips 1/3/5/7) reduce within lanes of a [rows, 128]
# layout using value-index packing: pack = v*2^b + idx orders
# lexicographically, so a plain reduce_window min/max yields both the
# extremum and its first-occurrence index without gathers or tiny-minor-dim
# reshapes (which tile-pad up to 64x on TPU). Larger chunks build from
# 256-element block summaries; by then arrays are N/256 so ordinary
# reshape-combines are cheap.
# ---------------------------------------------------------------------------

_SENT_MIN = np.int32(2**31 - 1)
_SENT_MAX = np.int32(-(2**31) )


def _rw_min(x, window):
    return jax.lax.reduce_window(x, _SENT_MIN, jax.lax.min, window, window, "VALID")


def _rw_max(x, window):
    return jax.lax.reduce_window(x, _SENT_MAX, jax.lax.max, window, window, "VALID")


def _min_first(va, ia, vb, ib):
    """Merge two blocks (a before b); value ties keep the earlier index."""
    m = jnp.minimum(va, vb)
    mi = jnp.where(vb < va, ib, ia)
    return m, mi


def _max_first(va, ia, vb, ib):
    M = jnp.maximum(va, vb)
    Mi = jnp.where(vb > va, ib, ia)
    return M, Mi


def _order_pairs(vmin, mi, vmax, Mi):
    first = jnp.where(Mi < mi, vmax, vmin)
    second = jnp.where(Mi < mi, vmin, vmax)
    return first, second


def _pyramid_single_channel(codes: jnp.ndarray, count: int):
    """codes [count] int32 -> list of (first, second) per-level arrays.

    Outputs are flat row-major chunk sequences (possibly longer than the
    level's out_count; the host slices). Pair order and values are
    bit-identical to the reference scan.
    """
    levels = mip_levels_for(count)
    if not levels:
        return []

    R = -(-count // 128)
    pad = R * 128 - count
    x = jnp.pad(codes, (0, pad))
    x2 = x.reshape(R, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    flatpos = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128 + lane
    real = flatpos < count

    outs = []
    small = [m for m in levels if (1 << m) <= 128]
    big = [m for m in levels if (1 << m) > 128]

    for mip in small:
        chunk = 1 << mip
        idxl = lane % chunk
        pmin = jnp.where(real, x2 * 256 + idxl, _SENT_MIN)
        pmax = jnp.where(real, x2 * 256 + (chunk - 1 - idxl), _SENT_MAX)
        pm = _rw_min(pmin, (1, chunk))
        pM = _rw_max(pmax, (1, chunk))
        vmin, mi = pm >> 8, pm & 255
        vmax, Mi = pM >> 8, (chunk - 1) - (pM & 255)
        first, second = _order_pairs(vmin, mi, vmax, Mi)
        outs.append((first.reshape(-1), second.reshape(-1)))

    if big:
        # 256-block summaries: window (2, 128) over row pairs, 9-bit local idx
        R2 = R + (R % 2)
        if R2 != R:
            padrow_min = jnp.full((1, 128), _SENT_MIN, jnp.int32)
            padrow_max = jnp.full((1, 128), _SENT_MAX, jnp.int32)
        local = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) % 2) * 128 + lane
        p9min = jnp.where(real, x2 * 512 + local, _SENT_MIN)
        p9max = jnp.where(real, x2 * 512 + (255 - local), _SENT_MAX)
        if R2 != R:
            p9min = jnp.concatenate([p9min, padrow_min])
            p9max = jnp.concatenate([p9max, padrow_max])
        bm = _rw_min(p9min, (2, 128)).reshape(-1)  # [nb]
        bM = _rw_max(p9max, (2, 128)).reshape(-1)
        nb = bm.shape[0]
        base = jnp.arange(nb, dtype=jnp.int32) * 256
        vmin, imin = bm >> 9, base + (bm & 511)
        vmax, imax = bM >> 9, base + (255 - (bM & 511))
        # sentinel blocks must never win and never corrupt indices
        empty_min = bm == _SENT_MIN
        empty_max = bM == _SENT_MAX
        vmin = jnp.where(empty_min, _SENT_MIN, vmin)
        imin = jnp.where(empty_min, _SENT_MIN, imin)
        vmax = jnp.where(empty_max, _SENT_MAX, vmax)
        imax = jnp.where(empty_max, _SENT_MIN, imax)

        cur_block = 256
        for mip in big:
            block = 1 << (mip - 1)
            while cur_block < block:
                n4 = -(-vmin.shape[0] // 4) * 4
                padn = n4 - vmin.shape[0]
                vmin = jnp.pad(vmin, (0, padn), constant_values=_SENT_MIN)
                imin = jnp.pad(imin, (0, padn), constant_values=_SENT_MIN)
                vmax = jnp.pad(vmax, (0, padn), constant_values=_SENT_MAX)
                imax = jnp.pad(imax, (0, padn), constant_values=_SENT_MIN)
                rv, ri = vmin.reshape(-1, 4), imin.reshape(-1, 4)
                Rv, Ri = vmax.reshape(-1, 4), imax.reshape(-1, 4)
                m, mi = _min_first(rv[:, 0], ri[:, 0], rv[:, 1], ri[:, 1])
                m, mi = _min_first(m, mi, rv[:, 2], ri[:, 2])
                m, mi = _min_first(m, mi, rv[:, 3], ri[:, 3])
                M, Mi = _max_first(Rv[:, 0], Ri[:, 0], Rv[:, 1], Ri[:, 1])
                M, Mi = _max_first(M, Mi, Rv[:, 2], Ri[:, 2])
                M, Mi = _max_first(M, Mi, Rv[:, 3], Ri[:, 3])
                vmin, imin, vmax, imax = m, mi, M, Mi
                cur_block *= 4
            n2 = -(-vmin.shape[0] // 2) * 2
            padn = n2 - vmin.shape[0]
            a_vmin = jnp.pad(vmin, (0, padn), constant_values=_SENT_MIN)
            a_imin = jnp.pad(imin, (0, padn), constant_values=_SENT_MIN)
            a_vmax = jnp.pad(vmax, (0, padn), constant_values=_SENT_MAX)
            a_imax = jnp.pad(imax, (0, padn), constant_values=_SENT_MIN)
            rv, ri = a_vmin.reshape(-1, 2), a_imin.reshape(-1, 2)
            Rv, Ri = a_vmax.reshape(-1, 2), a_imax.reshape(-1, 2)
            m, mi = _min_first(rv[:, 0], ri[:, 0], rv[:, 1], ri[:, 1])
            M, Mi = _max_first(Rv[:, 0], Ri[:, 0], Rv[:, 1], Ri[:, 1])
            first, second = _order_pairs(m, mi, M, Mi)
            outs.append((first, second))

    return outs


def build_mipmaps(sample: Sample, quality: str = "high") -> WaveformMipmaps:
    """Device-accelerated peak pyramid, bit-identical to reference_mipmaps."""
    out_dtype = np.int8 if quality == "low" else np.int16
    mips = mip_levels_for(sample.count)
    if not mips:
        return WaveformMipmaps(sample.count, sample.channels, sample.sample_rate, quality, [])

    fn = jax.jit(lambda c: _pyramid_single_channel(c, sample.count))
    per_level: list[list[np.ndarray]] = [[] for _ in mips]
    for c in range(sample.channels):
        codes = quantize_codes(sample.data[c], sample.format, quality)
        outs = fn(jnp.asarray(codes))
        for li, (first, second) in enumerate(outs):
            oc = level_out_count(sample.count, mips[li])
            f = np.asarray(first)[: oc // 2]
            s = np.asarray(second)[: oc // 2]
            inter = np.empty(oc, dtype=np.int32)
            inter[0::2] = f
            inter[1::2] = s
            per_level[li].append(inter)

    levels = [
        MipLevel(mip, np.stack(chs).astype(out_dtype)) for mip, chs in zip(mips, per_level)
    ]
    return WaveformMipmaps(sample.count, sample.channels, sample.sample_rate, quality, levels)


def peaks_f32(data: np.ndarray, block: int) -> np.ndarray:
    """Extension: unquantized f32 (min, max) pairs over `block`-sized windows
    for display/export pipelines; [channels, n_blocks, 2]."""
    data = np.atleast_2d(np.asarray(data, dtype=np.float32))
    C, N = data.shape
    nb = -(-N // block)
    padded = np.pad(data, ((0, 0), (0, nb * block - N)), constant_values=0.0)
    r = padded.reshape(C, nb, block)
    return np.stack([r.min(axis=2), r.max(axis=2)], axis=-1)
