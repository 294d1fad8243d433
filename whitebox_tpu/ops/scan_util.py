"""Inclusive prefix scans shaped for the TPU lane layout.

``jax.lax.associative_scan`` lowers to a Blelloch up/down sweep whose
every level slices the operands at stride 2^k along the FRAME axis — on
TPU that axis is the 128-lane minor dimension, so each level is a
cross-lane relayout of the full array. Measured on v5e that relayout
traffic (not the math) is what made dynamics/biquad chains the device
wall of the routed pipelines: a 6-tuple eigenbasis biquad scan moved
~45 array-passes per chunk.

``hillis_scan`` computes the same inclusive prefix with Hillis-Steele
doubling: ceil(log2 F) steps, each combining the array with a CONTIGUOUS
shifted copy (identity-padded concat + slice — no strided lane gathers,
and XLA fuses the shift into the combine's elementwise pass). Work is
O(F log F) elementwise either way; traffic per step is one read + one
write of each tuple element in natural layout.

The combine must be associative with (left, right) argument order —
``left`` is the EARLIER span. Semantics (including time-varying
coefficients) are identical to associative_scan; only the floating-point
grouping differs, same rounding class the chunked==oneshot contracts
already tolerate.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["hillis_scan"]


def hillis_scan(combine, elems: tuple, identity: tuple):
    """Inclusive prefix of ``elems`` (tuple of same-shape arrays) along the
    last axis under ``combine((l0, l1, ...), (r0, r1, ...)) -> tuple``.

    ``identity``: scalar per tuple element such that
    ``combine(identity, r) == r`` (left identity is all the padding
    needs). Shapes/dtypes are preserved.
    """
    n = elems[0].shape[-1]
    elems = tuple(jnp.asarray(e) for e in elems)
    k = 1
    while k < n:
        shifted = tuple(
            jnp.concatenate(
                [jnp.full(e.shape[:-1] + (k,), idv, e.dtype), e[..., :-k]],
                axis=-1)
            for e, idv in zip(elems, identity))
        elems = combine(shifted, elems)
        k *= 2
    return elems
