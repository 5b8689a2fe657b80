"""High-level frame-pair pipeline: cluster -> track -> flow in one call.

The TPU equivalent of the reference's demo path (`demo.py:198-259`): inputs
are two ego-aligned, ground-removed host clouds; output is per-point flow for
the source cloud plus the match tables.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .models.icp_flow import SceneFlowEngine, TrackOutput


class FramePairResult(NamedTuple):
    flow: np.ndarray          # (n_src, 3)
    pairs: np.ndarray         # (K, 10) reference-layout pairs table
    transforms: np.ndarray    # (L, 4, 4) per-label transforms
    labels_src: np.ndarray    # (n_src,)
    labels_dst: np.ndarray    # (n_dst,)
    overflow: int


def run_frame_pair(
    engine: SceneFlowEngine,
    point_src: np.ndarray,
    point_dst: np.ndarray,
    *,
    translation_frame: Optional[float] = None,
    pose: Optional[np.ndarray] = None,
) -> FramePairResult:
    """Estimate flow src->dst for one ego-aligned frame pair.

    Mirrors `demo.py:205-226`: joint clustering of dst u src (shared labels),
    track, vectorised flow assembly with the given ego pose (identity for
    pre-compensated input).
    """
    cfg = engine.cfg
    if translation_frame is None:
        translation_frame = cfg.speed * 2.0            # demo.py:205
    if pose is None:
        pose = np.eye(4, dtype=np.float32)

    p_src, v_src = engine.pad_cloud(point_src)
    p_dst, v_dst = engine.pad_cloud(point_dst)
    j_src = jnp.asarray(p_src)
    j_dst = jnp.asarray(p_dst)
    jv_src = jnp.asarray(v_src)
    jv_dst = jnp.asarray(v_dst)

    if engine.cfg.use_hdbscan:
        # hdbscan has a host-side stage; run the staged dispatches
        lab_dst, lab_src = engine.cluster_joint(j_dst, jv_dst, j_src, jv_src)
        out: TrackOutput = engine.track_pair(
            j_src, jv_src, lab_src, j_dst, jv_dst, lab_dst,
            translation_frame)
        flow = engine.flow(j_src, lab_src, out.result.transforms, pose,
                           seg_pidx=out.seg_src.pidx,
                           identity_pt=out.result.identity_pt)
    else:
        fused = engine.run_pair(j_src, jv_src, j_dst, jv_dst,
                                translation_frame, pose)
        flow, out = fused.flow, fused.track
        lab_src, lab_dst = fused.lab_src, fused.lab_dst

    n_src = len(point_src)
    n_dst = len(point_dst)
    return FramePairResult(
        flow=np.asarray(flow)[:n_src],
        pairs=engine.pairs_array(out.result),
        transforms=np.asarray(out.result.transforms),
        labels_src=np.asarray(lab_src)[:n_src],
        labels_dst=np.asarray(lab_dst)[:n_dst],
        overflow=int(out.result.overflow),
    )
