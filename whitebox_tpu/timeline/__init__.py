"""Timeline layer: block transport math, event carving, parity oracle.

This is where the reference's *stateful, block-sequential* render model
(engine.cpp:1576 / track.cpp:258,587 / sampler.cpp:88) is (a) reproduced
exactly as a NumPy oracle for 1-ulp parity testing, and (b) inverted into
*timeline-at-once* per-clip segment tables that the TPU kernels consume.
"""

from whitebox_tpu.timeline.transport import BlockTransport  # noqa: F401
