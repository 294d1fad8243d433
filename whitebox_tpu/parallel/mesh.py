"""Mesh construction for sharded rendering."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_render_mesh(tracks_parallel: int | None = None, frames_parallel: int | None = None, devices=None) -> Mesh:
    """Build a ('tracks', 'frames') mesh over the available devices.

    Defaults split devices as evenly as possible, favoring the frames axis
    (frame shards never communicate; the tracks axis pays one psum).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tracks_parallel is None and frames_parallel is None:
        tracks_parallel = 1
        frames_parallel = n
        # prefer a modest tracks axis when the device count allows a 2-D mesh
        for tp in (2, 4):
            if n % tp == 0 and n // tp >= 2:
                tracks_parallel, frames_parallel = tp, n // tp
                break
    elif tracks_parallel is None:
        tracks_parallel = n // frames_parallel
    elif frames_parallel is None:
        frames_parallel = n // tracks_parallel
    if tracks_parallel * frames_parallel != n:
        raise ValueError(f"mesh {tracks_parallel}x{frames_parallel} != {n} devices")
    grid = np.asarray(devices).reshape(tracks_parallel, frames_parallel)
    return Mesh(grid, axis_names=("tracks", "frames"))
