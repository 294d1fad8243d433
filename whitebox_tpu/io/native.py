"""ctypes bindings for the native C++ host runtime (native/libwbtpu.so).

Builds on demand with make/g++ if the library is missing; every call site
has a NumPy fallback, so the native layer is a host-side accelerator
(decode/normalize/plan loops), never a requirement. Set WBTPU_NO_NATIVE=1
to force the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> Path | None:
    so = _NATIVE_DIR / "libwbtpu.so"
    try:
        # always invoke make: it no-ops when up to date and rebuilds a stale
        # .so when the sources are newer (cheap, runs once per process)
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        pass  # no toolchain: fall through to any existing build
    return so if so.is_file() else None


def load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("WBTPU_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    if lib.wb_native_version() not in (1, 2, 3):
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")

    lib.wb_normalize_planar.restype = ctypes.c_int32
    lib.wb_normalize_planar.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
        f32p, ctypes.c_int64,
    ]
    lib.wb_i24_bytes_to_codes.argtypes = [u8p, ctypes.c_int64, i32p]
    lib.wb_f32_to_i16_interleaved.restype = None
    lib.wb_f32_to_i16_interleaved.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int16, flags="C"),
    ]
    lib.wb_f32_to_i32_interleaved.restype = None
    lib.wb_f32_to_i32_interleaved.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int32, ctypes.c_int64, i32p,
    ]
    lib.wb_peaks_level.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int64]
    lib.wb_build_mix_plan.restype = ctypes.c_int32
    lib.wb_build_mix_plan.argtypes = [
        ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p, f32p, u8p, i32p, f32p, i32p, f32p,
        i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, i32p, f32p, i32p, i32p, f32p, i32p, f32p, i32p,
    ]
    # carve: the v3 ABI takes host-precomputed per-clip event positions
    # (tempo-map-aware); an older .so would misread the call, so gate on
    # the version, not just the symbol
    if hasattr(lib, "wb_carve_audio") and lib.wb_native_version() >= 3:
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        lib.wb_carve_audio.restype = ctypes.c_void_p
        lib.wb_carve_audio.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            i64p, i64p,
            f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p, f32p,
            i32p, i32p, i32p, u8p, u8p,
            i64p, f64p, i64p, f64p, f64p, i64p, i64p, i64p, i64p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _p = lambda t: np.ctypeslib.ndpointer(t, flags="C")  # noqa: E731
        lib.wb_carve_copy.restype = None
        lib.wb_carve_copy.argtypes = [ctypes.c_void_p] + [
            _p(np.int32), _p(np.int32), _p(np.int32), _p(np.int32), _p(np.int32),
            f64p, f64p, f32p, u8p, u8p, _p(np.int32),
            _p(np.int32), f32p, _p(np.int32), f32p,
        ] + [
            _p(np.int32), _p(np.int32), _p(np.int32), _p(np.int32), _p(np.int32),
            f64p, f64p, f32p, _p(np.int32),
            _p(np.int32), f32p, _p(np.int32), f32p,
        ]
        lib.wb_carve_free.restype = None
        lib.wb_carve_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def has_carve() -> bool:
    lib = load()
    return (lib is not None and hasattr(lib, "wb_carve_audio")
            and lib.wb_native_version() >= 3)


def carve_audio(P, S, num_blocks, bs, rate, bd, runs, clip_begin, ci0, cols):
    """Native timeline carve (native/wb_carve.cpp). ``cols`` is the dict of
    flattened per-clip column arrays incl. the host-precomputed event
    positions (v3 ABI — tempo-map-aware). Returns (fast_cols, slow_cols)
    tuples matching the Python carve's assembly layout, or None on
    fallback (lib absent / unknown clip mode)."""
    lib = load()
    if not has_carve():
        return None
    n_fast = ctypes.c_int64(0)
    n_slow = ctypes.c_int64(0)
    h = lib.wb_carve_audio(
        P, S, int(num_blocks), int(bs), float(rate), float(bd), int(bool(runs)),
        int(clip_begin.shape[0] - 1), clip_begin, ci0,
        cols["min_time"], cols["max_time"], cols["start_offset"], cols["clip_speed"],
        cols["fade_start"], cols["fade_end"], cols["count"], cols["srate"],
        cols["gain"], cols["mode"], cols["clip_id"], cols["sid"],
        cols["clampf"], cols["skip"],
        cols["ev_ka"], cols["ev_so_start"], cols["ev_ke"], cols["ev_so_stop"],
        cols["pos0"], cols["elapsed0"], cols["clip_frames"],
        cols["fin_frames"], cols["fout_frames"],
        ctypes.byref(n_fast), ctypes.byref(n_slow),
    )
    if not h:
        return None
    try:
        nf, ns = n_fast.value, n_slow.value
        fa = (
            np.empty(nf, np.int32), np.empty(nf, np.int32), np.empty(nf, np.int32),
            np.empty(nf, np.int32), np.empty(nf, np.int32), np.empty(nf, np.float64),
            np.empty(nf, np.float64), np.empty(nf, np.float32),
            np.empty(nf, np.uint8), np.empty(nf, np.uint8), np.empty(nf, np.int32),
            np.empty(nf, np.int32), np.empty(nf, np.float32),
            np.empty(nf, np.int32), np.empty(nf, np.float32),
        )
        sa = (
            np.empty(ns, np.int32), np.empty(ns, np.int32), np.empty(ns, np.int32),
            np.empty(ns, np.int32), np.empty(ns, np.int32), np.empty(ns, np.float64),
            np.empty(ns, np.float64), np.empty(ns, np.float32), np.empty(ns, np.int32),
            np.empty(ns, np.int32), np.empty(ns, np.float32),
            np.empty(ns, np.int32), np.empty(ns, np.float32),
        )
        lib.wb_carve_copy(h, *fa, *sa)
    finally:
        lib.wb_carve_free(h)
    return fa, sa


def available() -> bool:
    return load() is not None


def normalize_planar(interleaved: np.ndarray, fmt: int, channels: int, stride: int) -> np.ndarray | None:
    """Interleaved native PCM -> [channels, stride] normalized f32 (padded)."""
    lib = load()
    if lib is None:
        return None
    frames = interleaved.shape[0] // channels if interleaved.ndim == 1 else interleaved.shape[0]
    flat = np.ascontiguousarray(interleaved).reshape(-1)
    out = np.zeros(channels * stride, dtype=np.float32)
    rc = lib.wb_normalize_planar(
        flat.ctypes.data_as(ctypes.c_void_p), int(fmt), int(frames), int(channels), out, int(stride)
    )
    if rc != 0:
        return None
    return out.reshape(channels, stride)


def f32_to_interleaved(planar: np.ndarray, fmt: str) -> np.ndarray | None:
    """Planar f32 [C, F] -> interleaved i16/i32 codes (export conversion,
    audio_format_conv.cpp semantics); None when the native lib is absent."""
    lib = load()
    if lib is None:
        return None
    planar = np.ascontiguousarray(np.atleast_2d(planar), dtype=np.float32)
    C, F = planar.shape
    chan_ptrs = (ctypes.c_void_p * C)(*[planar[c].ctypes.data for c in range(C)])
    if fmt == "i16":
        out = np.empty(C * F, dtype=np.int16)
        lib.wb_f32_to_i16_interleaved(chan_ptrs, C, F, out)
    elif fmt == "i32":
        out = np.empty(C * F, dtype=np.int32)
        lib.wb_f32_to_i32_interleaved(chan_ptrs, C, F, out)
    else:
        return None
    return out.reshape(F, C)


def peaks_level(codes: np.ndarray, mip: int, out_count: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    out = np.zeros(out_count, dtype=np.int32)
    lib.wb_peaks_level(codes, codes.shape[0], int(mip), out, out_count)
    return out


def build_mix_plan(table, pool, channels: int, tile: int, n_tiles: int, T: int, K: int):
    """Native row expansion for ops.mix_pallas.build_plan; None on fallback."""
    lib = load()
    if lib is None or len(table) == 0:
        return None
    nt, t_, k_ = n_tiles, T, K
    row_al = np.zeros((nt, t_, k_, channels), dtype=np.int32)
    delta = np.zeros((nt, t_, k_, channels), dtype=np.int32)
    ms = np.zeros((nt, t_, k_), dtype=np.int32)
    me = np.zeros((nt, t_, k_), dtype=np.int32)
    gain = np.zeros((nt, t_, k_), dtype=np.float32)
    clampf = np.zeros((nt, t_, k_), dtype=np.int32)
    fis = np.full((nt, t_, k_), -(1 << 30), dtype=np.int32)
    fii = np.ones((nt, t_, k_), dtype=np.float32)
    foe = np.full((nt, t_, k_), 1 << 30, dtype=np.int32)
    foi = np.ones((nt, t_, k_), dtype=np.float32)
    cursor = np.zeros(nt * t_, dtype=np.int32)

    rc = lib.wb_build_mix_plan(
        len(table),
        np.ascontiguousarray(table.track, np.int32),
        np.ascontiguousarray(table.dst_start, np.int32),
        np.ascontiguousarray(table.length, np.int32),
        np.ascontiguousarray(table.sample_id, np.int32),
        np.ascontiguousarray(table.src_int, np.int32),
        np.ascontiguousarray(table.gain, np.float32),
        np.ascontiguousarray(table.clamp, np.uint8),
        np.ascontiguousarray(table.fin_start, np.int32),
        np.ascontiguousarray(table.fin_inv, np.float32),
        np.ascontiguousarray(table.fout_end, np.int32),
        np.ascontiguousarray(table.fout_inv, np.float32),
        np.ascontiguousarray(pool.channel_base[:, :channels], np.int32), channels,
        tile, nt, t_, k_,
        row_al.reshape(-1), delta.reshape(-1), ms.reshape(-1), me.reshape(-1),
        gain.reshape(-1), clampf.reshape(-1),
        fis.reshape(-1), fii.reshape(-1), foe.reshape(-1), foi.reshape(-1),
        cursor,
    )
    if rc != 0:
        return None
    return row_al, delta, ms, me, gain, clampf, fis, fii, foe, foi
