"""Roofline cost model — upgrades the reference's duty-cycle gauge
(src/core/timing.h:54-67) to a hardware-utilization metric.

For a render we estimate the *speed-of-light* device time: the minimum
HBM traffic the render must move and the matmul FLOPs it must execute,
divided by the chip's peak bandwidth / peak throughput. The achieved
fraction (sol_seconds / measured device_seconds) says how close a config
runs to the hardware ceiling — and, when it's low, whether the gap is
roofline (the model says we're already at the bandwidth bound) or waste.

Model assumptions (estimates, not profiles — documented so numbers can
be read honestly):

- The timeline mix is DMA-bound (ops/mix_pallas.py): every *touched*
  source-pool sample is read at least once (resampled rows touch
  ``length x |speed|`` source frames), and the output is written once.
  Gains/fades/interpolation ride the VPU for free next to the DMA.
- Per-track finishing reads the [T, C, F] per-track buffer at least once
  (the sum), and each non-fused effect stage streams its block in + out.
  XLA fuses elementwise neighbors, so the per-stage term is an upper
  bound on traffic but a fair model of the scan/dynamics stages (which
  carry state and cannot fuse away).
- Matmul stages (routing, prerender polyphase, FIR FFTs) count
  ``2*M*N*K`` FLOPs at f32-on-MXU throughput (Precision.HIGHEST = 6
  bf16 passes, the framework's audio floor — see prerender.py).

Hardware constants default to TPU v5e (one chip): 819 GB/s HBM,
197 bf16 TFLOP/s MXU.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

#: TPU v5e single-chip peaks.
V5E_HBM_BYTES_S = 819e9
V5E_BF16_FLOPS = 197e12
#: Precision.HIGHEST f32 matmuls decompose into 6 bf16 passes (bf16_6x).
V5E_F32_FLOPS = V5E_BF16_FLOPS / 6.0


@dataclass
class CostEstimate:
    """Bytes/FLOPs a render must spend; speed-of-light seconds vs a chip."""

    hbm_bytes: float = 0.0
    mxu_flops: float = 0.0  # f32-precision matmul FLOPs (HIGHEST)
    terms: dict = field(default_factory=dict)  # name -> (bytes, flops)

    def add(self, name: str, hbm_bytes: float = 0.0, mxu_flops: float = 0.0) -> None:
        self.hbm_bytes += hbm_bytes
        self.mxu_flops += mxu_flops
        b, f = self.terms.get(name, (0.0, 0.0))
        self.terms[name] = (b + hbm_bytes, f + mxu_flops)

    def sol_seconds(self, hbm_bytes_s: float = V5E_HBM_BYTES_S,
                    f32_flops: float = V5E_F32_FLOPS) -> float:
        """Speed-of-light device time: bandwidth and MXU overlap, so the
        bound is the max of the two budgets."""
        return max(self.hbm_bytes / hbm_bytes_s, self.mxu_flops / f32_flops)

    def utilization(self, device_seconds: float, **hw) -> float:
        """Fraction of the roofline achieved (1.0 = at the hardware bound)."""
        if device_seconds <= 0:
            return float("nan")
        return self.sol_seconds(**hw) / device_seconds

    def bound(self, hbm_bytes_s: float = V5E_HBM_BYTES_S,
              f32_flops: float = V5E_F32_FLOPS) -> str:
        """Which resource sets the floor: "hbm" or "mxu"."""
        return ("hbm" if self.hbm_bytes / hbm_bytes_s >= self.mxu_flops / f32_flops
                else "mxu")

    def summary(self, device_seconds: float | None = None) -> str:
        parts = [f"~{self.hbm_bytes / 1e6:.1f} MB HBM"]
        if self.mxu_flops > 0:
            parts.append(f"{self.mxu_flops / 1e9:.2f} GFLOP")
        s = ", ".join(parts) + f" -> sol {self.sol_seconds() * 1e3:.2f} ms ({self.bound()}-bound)"
        if device_seconds and device_seconds > 0:
            s += f"; achieved {100.0 * self.utilization(device_seconds):.0f}% of v5e roofline"
        return s


def mix_cost(table, frames: int, channels: int) -> CostEstimate:
    """Timeline-mix traffic from a carve SegmentTable: touched pool frames
    read once per output channel + the mixed output written once."""
    est = CostEstimate()
    if len(table):
        length = np.asarray(table.length, np.float64)
        speed = np.abs(np.asarray(table.speed, np.float64))
        touched = float(np.sum(length * np.maximum(speed, 1.0)))
        est.add("mix.pool_read", hbm_bytes=touched * channels * 4.0)
    est.add("mix.out_write", hbm_bytes=float(frames) * channels * 4.0)
    return est


#: Per-frame-per-channel VPU-ish stage kinds that XLA fuses into their
#: neighbors when stateless — charged a single stream (read+write) only
#: when they carry scan state that forces materialization.
_FUSED_KINDS = frozenset({"gain", "saturator", "width"})


def _stage_cost(est: CostEstimate, kind: str, static: tuple, B: int,
                channels: int, frames: int) -> None:
    """One chain stage over [B, C, F]."""
    block = float(B) * channels * frames * 4.0
    if kind in _FUSED_KINDS:
        return  # fused into the surrounding elementwise stream
    if kind in ("convreverb", "linphase"):
        # overlap-save FFT: stream in/out + 5*N*log2(N) real-FFT flops per
        # block pair (forward + inverse), N ~ 2*ir_len
        L = int(static[0]) if static else 1024
        n = max(float(2 * L), 1024.0)
        nblocks = max(frames / max(L, 1), 1.0)
        est.add(f"fx.{kind}", hbm_bytes=2.0 * block,
                mxu_flops=B * channels * nblocks * 5.0 * n * np.log2(n))
        return
    # stateful scan stages (biquad/eq/dynamics/delay/chorus): stream the
    # block in and out of the scan
    est.add(f"fx.{kind}", hbm_bytes=2.0 * block)


def _stages_for_cost(chain, sample_rate: float):
    """(kind, static) per stage, tolerating UNPREPARED effects.

    The cost estimate runs before the finishing pipeline prepares its
    chains, and some ``static_config``s legitimately require ``prepare``
    (a designed-room ConvolutionReverb's ir_len depends on the sample
    rate). Infer what the cost model needs without mutating the user's
    effect; degrade to a generic scan stream when we can't."""
    from whitebox_tpu.effects.base import EffectChain
    from whitebox_tpu.render.effects_generic import _kind_of, _stage_kind

    effs = chain.effects if isinstance(chain, EffectChain) else list(chain)
    out = []
    for e in effs:
        try:
            kind, static = _stage_kind(e)
        except Exception:
            kind = _kind_of(e)
            ir = getattr(e, "ir_host", None)
            if ir is not None:
                static = (int(np.asarray(ir).shape[-1]),)
            elif getattr(e, "room_seconds", None) is not None:
                static = (max(int(float(e.room_seconds) * sample_rate), 1),)
            else:
                static = ()
        out.append((kind, static))
    return out


def fx_cost(session, frames: int, channels: int) -> CostEstimate:
    """Finishing traffic: per-track buffer read for the sum + per-stage
    streams for every track/bus/master chain (grouped widths)."""
    from whitebox_tpu.render.effects_generic import _chains_of

    est = CostEstimate()
    T = len(session.tracks)
    sr = float(getattr(session, "sample_rate", 48000.0))
    est.add("finish.pt_read", hbm_bytes=float(T) * channels * frames * 4.0)

    chains, master = _chains_of(session)
    for c in chains:
        if c is None:
            continue
        for (kind, static) in _stages_for_cost(c, sr):
            _stage_cost(est, kind, static, 1, channels, frames)
    if master is not None:
        for (kind, static) in _stages_for_cost(master, sr):
            _stage_cost(est, kind, static, 1, channels, frames)
    for b in getattr(session, "buses", []) or []:
        if getattr(b, "effects", None):
            for (kind, static) in _stages_for_cost(b.effects, sr):
                _stage_cost(est, kind, static, 1, channels, frames)
    est.add("finish.out_write", hbm_bytes=float(frames) * channels * 4.0)
    return est


def routing_cost(session, frames: int, channels: int) -> CostEstimate:
    """The routed finisher's two MXU matmuls (render/routing.py):
    [NB+1+K, T] @ [T, C*F] partials and the bus->master recombine."""
    est = CostEstimate()
    buses = getattr(session, "buses", []) or []
    if not buses:
        return est
    T = len(session.tracks)
    NB = len(buses)
    cf = float(channels) * frames
    # r_post [1+NB, T] + r_pre [NB, T] against [T, C*F] partials
    est.add("route.matmul",
            mxu_flops=2.0 * (1 + 2 * NB) * T * cf,
            hbm_bytes=(T + 2 * NB + 1) * cf * 4.0)
    return est


def prerender_cost(pplan, channels: int = 2) -> CostEstimate:
    """Sinc prerender polyphase einsum (timeline/prerender.py): the
    rendered extension (ext_len samples per channel) is produced by one
    banded matmul row of ``taps`` coefficients per output sample, written
    to the pool extension and read back by the fast-path mix."""
    est = CostEstimate()
    if pplan is None:
        return est
    out = float(pplan.ext_len) * channels
    taps = float(pplan.taps)
    est.add("prerender.einsum", mxu_flops=2.0 * out * taps,
            hbm_bytes=2.0 * out * 4.0)
    return est


def estimate_bounce_cost(table, session, frames: int, channels: int) -> CostEstimate:
    """Whole-render estimate from the carve table + session structure.
    Called once per bounce; stored on RenderStats.cost."""
    from whitebox_tpu.ops.automation import session_has_automation
    from whitebox_tpu.render.effects_pipeline import session_has_effects
    from whitebox_tpu.session.bus import session_has_routing

    est = mix_cost(table, frames, channels)
    has_fx = (session_has_effects(session) or session_has_automation(session)
              or session_has_routing(session))
    if has_fx:
        sub = fx_cost(session, frames, channels)
        for name, (b, f) in sub.terms.items():
            est.add(name, b, f)
        sub = routing_cost(session, frames, channels)
        for name, (b, f) in sub.terms.items():
            est.add(name, b, f)
    return est
