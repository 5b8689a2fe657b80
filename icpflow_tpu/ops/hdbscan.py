"""HDBSCAN: hybrid device/native implementation.

The reference's primary clusterer is hdbscan with ``min_cluster_size`` and
``min_samples=None`` (`utils_cluster.py:10-29`, enabled by every main.sh
preset). Here the algorithm is split along its natural parallel/sequential
boundary:

  * device (`ops/cluster.py: mutual_reachability_edges`): k-core distances
    and the lightest mutual-reachability kNN edges — the O(N * candidates)
    data-parallel work;
  * native C++ (`native/: ifh_hdbscan_labels`): Kruskal MST -> condensed
    tree (min_cluster_size) -> excess-of-mass stability selection -> labels —
    the O(N log N) sequential work, microseconds at this scale.

Falls back to range-adaptive DBSCAN (`ops/cluster.py`) when the native
library is unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import PipelineConfig
from . import cluster as _cluster


def _native_labels(edge_dst: np.ndarray, edge_w: np.ndarray,
                   min_cluster_size: int) -> Optional[np.ndarray]:
    from ..data.native_loader import get_lib
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "ifh_hdbscan_labels"):
        return None
    lib.ifh_hdbscan_labels.restype = ctypes.c_int64
    lib.ifh_hdbscan_labels.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    n, e = edge_dst.shape
    ed = np.ascontiguousarray(edge_dst, np.int32)
    ew = np.ascontiguousarray(edge_w, np.float32)
    out = np.empty((n,), np.int32)
    lib.ifh_hdbscan_labels(
        ed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, e, min_cluster_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def hdbscan(xyz, valid, cfg: PipelineConfig) -> np.ndarray:
    """Labels (N,) int32, size-ranked 0..C-1 / -1 noise (host array).

    k (min_samples) follows the reference's ``min_samples=None`` semantics:
    equal to min_cluster_size, capped for the candidate neighborhood.
    """
    k_core = min(cfg.min_cluster_size, 30)
    if cfg.hdbscan_exact:
        core, edge_dst, edge_w = _cluster.exact_knn_mutual_reachability(
            jnp.asarray(xyz), jnp.asarray(valid), k=k_core)
    else:
        core, edge_dst, edge_w = _cluster.mutual_reachability_edges(
            jnp.asarray(xyz), jnp.asarray(valid),
            k_core=k_core,
            edges_per_point=cfg.hdbscan_edges,
            cell_sizes=cfg.hdbscan_cells,
            cell_cap=cfg.hdbscan_cell_cap)
    labels = _native_labels(np.asarray(edge_dst), np.asarray(edge_w),
                            cfg.min_cluster_size)
    if labels is None:   # native lib unavailable: adaptive DBSCAN fallback
        lab = _cluster.dbscan(
            jnp.asarray(xyz), jnp.asarray(valid),
            eps=cfg.epsilon, min_points=cfg.min_cluster_size,
            num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
            max_iters=cfg.cluster_max_iters,
            eps_scale_per_m=max(cfg.eps_scale_per_m, 0.012),
            eps_max=cfg.eps_max)
        return np.asarray(lab)

    valid_h = np.asarray(valid)
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
    labs, counts = np.unique(labels[labels >= 0], return_counts=True)
    if len(labs) == 0:
        return labels
    order = np.argsort(-counts)[: cfg.num_clusters]
    remap = np.full(labels.max() + 1, -1, np.int32)
    remap[labs[order]] = np.arange(len(order), dtype=np.int32)
    out = np.where(labels >= 0, remap[np.maximum(labels, 0)], -1)
    return out.astype(np.int32)
