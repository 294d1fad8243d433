"""Routed-finisher chunk sweep for config 6 (VERDICT r4 weak #3).

The routed scan chunk is auto-capped at 1<<13 for config 6's chain weight
(effects_generic.auto_chunk_frames — a cap sized for CPU compile cost,
where a compressor chain traced at 1<<17 compiles >9 min). On TPU the
compile budget is different; this sweep measures config 6 end-to-end at
the auto cap and at 2x/4x chunks so the production default can be chosen
from data instead of folklore.

Usage: python benchmarks/routed_chunk_sweep.py [--duration 60] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from run_all import config6_routed  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunks", default="auto,16384,32768")
    args = ap.parse_args()

    results = {}
    for tok in args.chunks.split(","):
        chunk = None if tok.strip() == "auto" else int(tok)
        label = tok.strip()
        t0 = time.perf_counter()
        try:
            results[label] = config6_routed(args.duration, args.iters,
                                            routed_chunk=chunk)
        except Exception as e:
            results[label] = {"error": repr(e)}
        print(f"chunk={label}: {results[label]} "
              f"({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
