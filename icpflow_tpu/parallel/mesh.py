"""Device mesh construction for the scene-flow engine.

The reference is explicitly single-GPU (`main.py:141-142`). The TPU framework
scales along the two natural data axes of the method (SURVEY §2 table,
"TPU-native equivalent"):

  * ``dp`` — scan pairs (frame pairs): embarrassingly parallel across hosts
    (DCN) and chips; each device runs whole frame pairs.
  * ``cp`` — cluster pairs: the inner batch axis of hist+ICP; sharding it
    across chips on one host keeps the collective (a min-reduction for the
    assignment step) on ICI.

Metric reduction is a psum of (value*count, count) sums — the distributed
form of the reference's AverageMeter accumulation (`utils_eval.py:82-135`).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_dp: int, n_cp: int = 1, devices=None) -> Mesh:
    """Build a (dp, cp) mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    need = n_dp * n_cp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_dp, n_cp)
    return Mesh(grid, axis_names=("dp", "cp"))
