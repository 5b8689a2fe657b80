"""Host-side loading helpers.

Numpy equivalents of `utils_loading.py:11-48`: natural sort keys, GT ego
compensation and GT sequence reconstruction via per-instance transforms.
"""

from __future__ import annotations

import re

import numpy as np


def natural_key(s: str):
    """Sort strings by embedded numbers. Ref utils_loading.py:11-15."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def ego_motion_compensation(points, time_indice, tsfm):
    """Apply per-frame ego pose to each point. Ref utils_loading.py:21-31."""
    T = tsfm[time_indice.astype(int)]
    return np.einsum("nij,nj->ni", T[:, :3, :3], points[:, :3]) + T[:, :3, 3]


def reconstruct_sequence(points, time_indice, inst_labels, tsfm, n_frames):
    """Apply per-(instance, frame) transforms. Ref utils_loading.py:33-48."""
    assert n_frames == tsfm.shape[1]
    idx = (inst_labels * n_frames + time_indice).astype(int)
    T = tsfm.reshape(-1, 4, 4)[idx]
    return np.einsum("nij,nj->ni", T[:, :3, :3], points[:, :3]) + T[:, :3, 3]
