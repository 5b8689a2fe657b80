"""HDBSCAN: hybrid device/native implementation.

The reference's primary clusterer is hdbscan with ``min_cluster_size`` and
``min_samples=None`` (`utils_cluster.py:10-29`, enabled by every main.sh
preset). Here the algorithm is split along its natural parallel/sequential
boundary:

  * device (`ops/cluster.py`): k-core distances and the lightest
    mutual-reachability kNN edges — the O(N * candidates) data-parallel
    work. The default path first collapses the cloud to one representative
    per fine voxel (`voxel_dedup_compact`, ``hdbscan_dedup_voxel``), carrying
    integer multiplicities so core distances and condensed-tree masses still
    count POINTS — ~16x less exact-kNN work at raw-cloud semantics;
  * native C++ (`native/: ifh_hdbscan_labels[_weighted]`): Kruskal MST ->
    condensed tree (min_cluster_size over weighted masses) -> excess-of-mass
    stability selection -> labels — the O(N log N) sequential work,
    microseconds at this scale.

Falls back to (a) the full exact graph when a scene occupies more voxels
than ``hdbscan_rep_cap`` (counted, never silently truncated), and (b)
range-adaptive DBSCAN (`ops/cluster.py`) when the native library is
unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from . import cluster as _cluster


def _native_labels(edge_dst: np.ndarray, edge_w: np.ndarray,
                   min_cluster_size: int,
                   node_w: Optional[np.ndarray] = None
                   ) -> Optional[np.ndarray]:
    from ..data.native_loader import get_lib
    lib = get_lib()
    if lib is None:
        return None
    n, e = edge_dst.shape
    ed = np.ascontiguousarray(edge_dst, np.int32)
    ew = np.ascontiguousarray(edge_w, np.float32)
    out = np.empty((n,), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    if node_w is not None:
        if not hasattr(lib, "ifh_hdbscan_labels_weighted"):
            return None
        fn = lib.ifh_hdbscan_labels_weighted
        fn.restype = ctypes.c_int64
        fn.argtypes = [i32p, ctypes.POINTER(ctypes.c_float), i32p,
                       ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p]
        nw = np.ascontiguousarray(node_w, np.int32)
        fn(ed.ctypes.data_as(i32p),
           ew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           nw.ctypes.data_as(i32p),
           n, e, min_cluster_size, out.ctypes.data_as(i32p))
        return out
    if not hasattr(lib, "ifh_hdbscan_labels"):
        return None
    lib.ifh_hdbscan_labels.restype = ctypes.c_int64
    lib.ifh_hdbscan_labels.argtypes = [
        i32p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.ifh_hdbscan_labels(
        ed.ctypes.data_as(i32p),
        ew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, e, min_cluster_size, out.ctypes.data_as(i32p))
    return out


# how often scenes overflowed hdbscan_rep_cap and fell back to the full
# exact graph (observability: the invariant is count-and-report, never
# silent truncation)
DEDUP_OVERFLOWS = 0


def _finish_labels(labels: np.ndarray, valid_h: np.ndarray,
                   edge_dst: np.ndarray, edge_w: np.ndarray,
                   cfg: PipelineConfig,
                   sizes_w: Optional[np.ndarray] = None) -> np.ndarray:
    """Shared tail: border reclaim + size-ranked top-K dense relabel.

    ``sizes_w``: optional per-node weights for the size ranking (dedup path:
    a representative counts its multiplicity, `utils_cluster.py:26-27`
    ranks by point count).
    """
    labels = labels.copy()
    labels[~valid_h] = -1

    if cfg.hdbscan_reclaim > 0:
        # border reclaim: EOM selection sheds low-density cluster fringes;
        # re-attach noise points whose lightest mutual-reachability edge to a
        # labelled point is within the reclaim distance (two passes to chain)
        ed = np.asarray(edge_dst)
        ew = np.asarray(edge_w)
        in_range = ed < len(labels)
        ed_c = np.minimum(ed, len(labels) - 1)
        for _ in range(2):
            nbr_lab = np.where(in_range, labels[ed_c], -1)
            cand = (nbr_lab >= 0) & (ew <= cfg.hdbscan_reclaim) & in_range
            w_masked = np.where(cand, ew, np.inf)
            best = np.argmin(w_masked, axis=1)
            has = np.isfinite(w_masked[np.arange(len(labels)), best])
            adopt = (labels < 0) & valid_h & has
            labels = np.where(
                adopt, nbr_lab[np.arange(len(labels)), best], labels)
    # keep top num_clusters by size, relabel densely (utils_cluster.py:26-27)
    pos = labels >= 0
    if not pos.any():
        return labels.astype(np.int32)
    w = sizes_w if sizes_w is not None else np.ones(len(labels), np.int64)
    counts = np.bincount(labels[pos], weights=w[pos])
    labs = np.flatnonzero(counts)
    order = labs[np.argsort(-counts[labs])][: cfg.num_clusters]
    remap = np.full(labels.max() + 1, -1, np.int32)
    remap[order] = np.arange(len(order), dtype=np.int32)
    out = np.where(pos, remap[np.maximum(labels, 0)], -1)
    return out.astype(np.int32)


def hdbscan(xyz, valid, cfg: PipelineConfig) -> np.ndarray:
    """Labels (N,) int32, size-ranked 0..C-1 / -1 noise (host array).

    k (min_samples) follows the reference's ``min_samples=None`` semantics:
    equal to min_cluster_size, capped for the candidate neighborhood.
    """
    global DEDUP_OVERFLOWS
    k_core = min(cfg.min_cluster_size, 30)
    xyz = jnp.asarray(xyz)
    valid = jnp.asarray(valid)

    if cfg.hdbscan_exact and cfg.hdbscan_dedup_voxel > 0:
        rep_xyz, rep_valid, rep_mult, point_rep, n_unique = (
            _cluster.voxel_dedup_compact(
                xyz, valid, voxel=cfg.hdbscan_dedup_voxel,
                cap=cfg.hdbscan_rep_cap))
        # dispatch the rep graph WITHOUT waiting for n_unique: the overflow
        # branch is rare (counted below), and syncing on the scalar first
        # costs a full tunnel round-trip before the graph can start. All
        # host values then come back in ONE batched device_get instead of
        # four serialized fetches (round-5 split: host fetches were ~0.7 s
        # of the 1.2 s call).
        core, edge_dst, edge_w = _cluster.exact_knn_mutual_reachability(
            rep_xyz, rep_valid, rep_mult, k=k_core,
            knn_recall=cfg.hdbscan_knn_recall)
        n_rep = int(edge_dst.shape[0])
        compress = cfg.hdbscan_fetch_f16 and n_rep <= 65534
        if compress:
            # tunnel-bandwidth compression (see config.hdbscan_fetch_f16):
            # the no-edge sentinel (dst == n_rep, weight 1e9) is restored
            # host-side from the index, so the weight clamp is lossless
            # for real edges (scene distances << 6e4)
            edge_dst = jnp.minimum(edge_dst, 65535).astype(jnp.uint16)
            edge_w = jnp.minimum(edge_w, 6.0e4).astype(jnp.float16)
        (ed, ew, mult_h, point_rep_h, n_unique_h, rep_valid_h,
         valid_h) = jax.device_get(
            (edge_dst, edge_w, rep_mult, point_rep, n_unique, rep_valid,
             valid))
        if compress:
            ed = ed.astype(np.int32)
            ew = ew.astype(np.float32)
            ew[ed >= n_rep] = 1e9
        if int(n_unique_h) <= cfg.hdbscan_rep_cap:
            rep_labels = _native_labels(ed, ew, cfg.min_cluster_size,
                                        node_w=mult_h)
            if rep_labels is not None:
                rep_labels = _finish_labels(
                    rep_labels, rep_valid_h, ed, ew, cfg,
                    sizes_w=mult_h.astype(np.int64))
                # broadcast representative labels back to every point
                lab_pad = np.concatenate(
                    [rep_labels, np.full((1,), -1, np.int32)])
                out = lab_pad[np.minimum(point_rep_h, cfg.hdbscan_rep_cap)]
                out[~valid_h] = -1
                return out.astype(np.int32)
        else:
            DEDUP_OVERFLOWS += 1

    if cfg.hdbscan_exact:
        core, edge_dst, edge_w = _cluster.exact_knn_mutual_reachability(
            xyz, valid, k=k_core, knn_recall=cfg.hdbscan_knn_recall)
    else:
        core, edge_dst, edge_w = _cluster.mutual_reachability_edges(
            xyz, valid,
            k_core=k_core,
            edges_per_point=cfg.hdbscan_edges,
            cell_sizes=cfg.hdbscan_cells,
            cell_cap=cfg.hdbscan_cell_cap)
    ed, ew, valid_h = jax.device_get((edge_dst, edge_w, valid))
    labels = _native_labels(ed, ew, cfg.min_cluster_size)
    if labels is None:   # native lib unavailable: adaptive DBSCAN fallback
        lab = _cluster.dbscan(
            xyz, valid,
            eps=cfg.epsilon, min_points=cfg.min_cluster_size,
            num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
            max_iters=cfg.cluster_max_iters,
            eps_scale_per_m=max(cfg.eps_scale_per_m, 0.012),
            eps_max=cfg.eps_max)
        return np.asarray(lab)
    return _finish_labels(labels, valid_h, ed, ew, cfg)
