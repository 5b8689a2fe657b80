"""SceneFlowEngine: the flagship "model" — the full learning-free pipeline.

Orchestrates clustering -> segment extraction -> two-stage matching -> flow
assembly as jitted device programs over static buckets. This is the
``track``/``flow_estimation`` surface of the reference (`utils_track.py:31-35`,
`utils_flow.py:23-69`) re-packaged as one engine object whose methods are pure
functions of (config, arrays).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..flow import flow_from_transforms
from ..match.matcher import MatchResult, match_frame_pair
from ..ops import cluster as _cluster
from ..ops.segments import SegmentBatch, extract_segments


class TrackOutput(NamedTuple):
    result: MatchResult
    seg_src: SegmentBatch
    seg_dst: SegmentBatch


@functools.partial(jax.jit, static_argnames=("cfg",))
def _track_pair_impl(pts_src, valid_src, labels_src,
                     pts_dst, valid_dst, labels_dst,
                     translation_frame, cfg: PipelineConfig) -> TrackOutput:
    seg_src = extract_segments(pts_src, labels_src, valid_src,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    seg_dst = extract_segments(pts_dst, labels_dst, valid_dst,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    result = match_frame_pair(seg_src, seg_dst, translation_frame, cfg)
    return TrackOutput(result, seg_src, seg_dst)


class FusedPairOutput(NamedTuple):
    flow: jnp.ndarray         # (N_src, 3)
    track: "TrackOutput"
    lab_src: jnp.ndarray      # (N_src,) int32
    lab_dst: jnp.ndarray      # (N_dst,) int32


def _joint_dbscan(pts, valid, cfg: PipelineConfig):
    """Config-routed clusterer: raw-cloud dbscan, or the voxel-dedup form
    (cluster_dedup_voxel > 0) with weighted counts + in-graph fallback."""
    kw = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
              num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
              max_iters=cfg.cluster_max_iters,
              eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)
    if cfg.cluster_dedup_voxel > 0:
        return _cluster.dbscan_dedup(
            pts, valid, dedup_voxel=cfg.cluster_dedup_voxel,
            rep_cap=cfg.cluster_rep_cap, **kw)
    return _cluster.dbscan(pts, valid, **kw)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _run_pair_fused_impl(pts_src, valid_src, pts_dst, valid_dst,
                         translation_frame, pose,
                         cfg: PipelineConfig) -> "FusedPairOutput":
    """Whole per-pair pipeline (joint DBSCAN -> match -> flow) as ONE XLA
    program. Separate cluster/track/flow dispatches cost ~0.1 ms of launch
    overhead each through the tunnel-attached runtime (~25% of the per-pair
    budget at demo scale); one program amortises that and lets XLA overlap
    the stage boundaries."""
    pts = jnp.concatenate([pts_dst, pts_src], axis=0)
    valid = jnp.concatenate([valid_dst, valid_src], axis=0)
    labels = _joint_dbscan(pts, valid, cfg)
    n0 = pts_dst.shape[0]
    lab_dst = labels[:n0]
    lab_src = labels[n0:].astype(jnp.int32)
    out = _track_pair_impl(pts_src, valid_src, lab_src,
                           pts_dst, valid_dst, lab_dst,
                           translation_frame, cfg)
    from ..flow import flow_with_identity_override
    flow = flow_with_identity_override(
        pts_src, lab_src, out.result.transforms, pose,
        out.seg_src.pidx, out.result.identity_pt)
    return FusedPairOutput(flow, out, lab_src, lab_dst)


def _enable_compilation_cache():
    """Persist XLA compilations across processes (first compiles of the big
    matcher/cluster programs run minutes; cached reloads are seconds)."""
    import os
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.environ.get("ICPFLOW_JAX_CACHE", "/tmp/icpflow_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


class SceneFlowEngine:
    """End-to-end ICP-Flow-equivalent pipeline on TPU."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        # device programs are jitted on the canonicalised config: engines
        # differing only in host-side fields (dataset, crop, ego knobs...)
        # share jit cache entries and persistent-cache programs instead of
        # recompiling identical HLO (see PipelineConfig.device_canonical)
        self._dev_cfg = cfg.device_canonical()
        self._scalar_cache = {}
        _enable_compilation_cache()

    def _dev_scalar(self, v):
        """Device-resident f32 scalar, memoized by value.

        ``translation_frame`` takes one of ~num_frames distinct values per
        run; converting it per call would ship a fresh host->device transfer
        each pair (milliseconds through a tunnel-attached chip)."""
        if isinstance(v, jnp.ndarray):
            return v
        key = float(v)
        cached = self._scalar_cache.get(key)
        if cached is None:
            cached = jnp.float32(key)
            self._scalar_cache[key] = cached
        return cached

    # -- clustering (joint over the ego-aligned frame pair,
    #    dataset_pca.py:164-201 semantics) --------------------------------
    def cluster_joint(self, pts_dst: jnp.ndarray, valid_dst: jnp.ndarray,
                      pts_src_ego: jnp.ndarray, valid_src: jnp.ndarray):
        """Cluster dst u src jointly so static objects share labels.

        Returns (labels_dst, labels_src) in the shared label space.
        """
        cfg = self.cfg
        pts = jnp.concatenate([pts_dst, pts_src_ego], axis=0)
        valid = jnp.concatenate([valid_dst, valid_src], axis=0)
        if cfg.use_hdbscan:
            from ..ops.hdbscan import hdbscan
            labels = jnp.asarray(hdbscan(pts, valid, cfg))
        else:
            labels = _joint_dbscan(pts, valid, cfg)
        n0 = pts_dst.shape[0]
        return labels[:n0], labels[n0:]

    def run_pair(self, pts_src, valid_src, pts_dst, valid_dst,
                 translation_frame, pose=None) -> FusedPairOutput:
        """Fused demo-style pipeline: joint clustering + matching + flow in
        one device program (ego-aligned inputs, `demo.py:198-259` path).

        Requires the DBSCAN clusterer; the hdbscan path has a host-side
        stage and falls back to the staged dispatches.
        """
        if pose is None:
            pose = np.eye(4, dtype=np.float32)
        if self.cfg.use_hdbscan:
            lab_dst, lab_src = self.cluster_joint(
                pts_dst, valid_dst, pts_src, valid_src)
            out = self.track_pair(pts_src, valid_src, lab_src,
                                  pts_dst, valid_dst, lab_dst,
                                  translation_frame)
            flow = self.flow(pts_src, lab_src, out.result.transforms, pose,
                             seg_pidx=out.seg_src.pidx,
                             identity_pt=out.result.identity_pt)
            return FusedPairOutput(flow, out, lab_src.astype(jnp.int32),
                                   lab_dst)
        return _run_pair_fused_impl(
            pts_src, valid_src, pts_dst, valid_dst,
            self._dev_scalar(translation_frame),
            jnp.asarray(pose, jnp.float32), self._dev_cfg)

    def track_pair(self, pts_src, valid_src, labels_src,
                   pts_dst, valid_dst, labels_dst,
                   translation_frame) -> TrackOutput:
        """Match all cluster pairs of one (ego-aligned) frame pair."""
        return _track_pair_impl(
            pts_src, valid_src, labels_src.astype(jnp.int32),
            pts_dst, valid_dst, labels_dst.astype(jnp.int32),
            self._dev_scalar(translation_frame), self._dev_cfg)

    def flow(self, raw_src_points, labels_src, transforms, pose,
             seg_pidx=None, identity_pt=None):
        """Per-point flow from per-cluster transforms (utils_flow.py:57-69).

        With ``seg_pidx``/``identity_pt`` (from TrackOutput), the matcher's
        per-point ego-only overrides are applied (config.per_point_identity).
        """
        if seg_pidx is not None and identity_pt is not None:
            from ..flow import flow_with_identity_override
            return flow_with_identity_override(
                raw_src_points, labels_src.astype(jnp.int32), transforms,
                jnp.asarray(pose, jnp.float32), seg_pidx, identity_pt)
        return flow_from_transforms(
            raw_src_points, labels_src.astype(jnp.int32), transforms,
            jnp.asarray(pose, jnp.float32))

    # -- host-friendly helpers -------------------------------------------
    def pad_cloud(self, pts: np.ndarray, labels: Optional[np.ndarray] = None,
                  bucket="auto"):
        """Pad an (n,3) host cloud to a static scene bucket.

        ``bucket="auto"`` (default) picks the smallest power-of-two bucket
        that holds the cloud (floor 2048, cap ``cfg.max_points_scene``):
        every device stage downstream scales with the padded size, and a
        fixed worst-case bucket wastes its slack on EVERY cloud (the demo
        fixture: 63k valid points in a 131k bucket = 52% of the cluster
        stage spent on padding). Distinct bucket sizes compile distinct
        programs — the persistent compilation cache amortises that.
        ``bucket=None`` pads to ``cfg.max_points_scene``; an int pads to
        exactly that size. Callers must size companion arrays from the
        RETURNED arrays, not from the config.
        """
        n = len(pts)
        hard_cap = self.cfg.max_points_scene
        if n > hard_cap:
            raise ValueError(f"cloud of {n} points exceeds bucket {hard_cap}")
        if bucket == "auto":
            cap = 2048
            while cap < n:
                cap *= 2
            cap = min(cap, hard_cap)
        elif bucket is None:
            cap = hard_cap
        else:
            cap = int(bucket)
            if n > cap:
                raise ValueError(f"cloud of {n} points exceeds bucket {cap}")
        out = np.zeros((cap, 3), np.float32)
        out[:n] = pts[:, :3]
        valid = np.zeros((cap,), bool)
        valid[:n] = True
        if labels is None:
            return out, valid
        lab = np.full((cap,), -1, np.int32)
        lab[:n] = labels
        return out, valid, lab

    def pairs_array(self, result: MatchResult) -> np.ndarray:
        """Host (K,10) pairs table in the reference layout.

        Columns: src_label, dst_label, error x2, inlier x2, ratio x2, iou x2
        (`utils_match.py:123-128`).
        """
        matched = np.asarray(result.matched)
        idx = np.flatnonzero(matched)
        stats = np.asarray(result.stats)[idx]
        dst = np.asarray(result.dst_label)[idx]
        return np.concatenate(
            [idx[:, None].astype(np.float32),
             dst[:, None].astype(np.float32),
             stats.astype(np.float32)], axis=1)
