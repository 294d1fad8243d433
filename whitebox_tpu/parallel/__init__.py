"""Multi-chip rendering: device meshes, sharded mix, collective design.

The reference is single-node (SURVEY §5: no NCCL/MPI; its "parallelism" is
four threads and SIMD loops). The TPU-native scaling model replaces that
with SPMD over a ``jax.sharding.Mesh`` with two axes:

- ``tracks`` — the reduction axis: each device renders a track shard, the
  final mix is a ``psum`` over ICI (the engine's sequential track sum,
  engine.cpp:1600-1617, becomes a collective reduction; ordering is
  shard-deterministic, associativity documented as relaxed vs strict mode).
- ``frames`` — the data-parallel axis (this project's "sequence
  parallelism"): the timeline-at-once design makes output frames
  independent in the mix, so frame shards never communicate; IIR effect
  state crosses frame shards via the blocked-scan boundary fixup
  (ops.biquad), not via sequential dependencies.
"""

from whitebox_tpu.parallel.mesh import make_render_mesh  # noqa: F401
from whitebox_tpu.parallel.render_sharded import bounce_sharded  # noqa: F401
