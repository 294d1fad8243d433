"""Frame-sharded biquad: exact IIR state across frame shards.

This is the project's sequence-parallel state handoff (SURVEY §5): each
frame shard scans locally from a zero state, shards exchange their affine
transitions (A_total, v_total) with one all_gather over the 'frames' axis,
every shard folds its predecessors to obtain its exact incoming state, and
injects it through the per-position cumulative transition — bit-correct up
to f32 rounding of the injection term, with one tiny collective (fp x [B,6])
instead of a sequential dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whitebox_tpu.ops.biquad import biquad_scan_with_transition


def biquad_shard_framewise(x_local, params, axis_name: str, num_shards: int):
    """Apply one biquad section to a frame shard [B, F_local] inside
    shard_map; returns the corrected local output."""
    B = x_local.shape[0]
    state0 = jnp.zeros((B, 2), dtype=jnp.float32)
    # from a zero init, the scan's final state IS the shard's v_total
    y0, v_total, acum, A_total = biquad_scan_with_transition(x_local, params, state0)
    m11, m12, m21, m22, bv1, bv2, p11, p12, b0 = params

    # exchange shard transitions: [fp, B, 2, 2] and [fp, B, 2]
    A_all = jax.lax.all_gather(A_total, axis_name)
    v_all = jax.lax.all_gather(v_total, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def fold(j, z):
        zn = jnp.einsum("bij,bj->bi", A_all[j], z) + v_all[j]
        return jnp.where(j < idx, zn, z)

    # zeros_like(v_total) keeps shard_map varying-axes metadata on the carry
    z_in = jax.lax.fori_loop(0, num_shards, fold, jnp.zeros_like(v_total))

    a11s, a12s, a21s, a22s = acum
    corr1 = a11s * z_in[:, 0:1] + a12s * z_in[:, 1:2]
    corr2 = a21s * z_in[:, 0:1] + a22s * z_in[:, 1:2]
    return y0 + (p11 * corr1 + p12 * corr2)
