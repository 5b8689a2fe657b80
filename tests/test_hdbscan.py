"""Hybrid HDBSCAN: device edges + native condensed-tree labels."""

import numpy as np
import jax.numpy as jnp
import pytest

from icpflow_tpu import DEMO
from icpflow_tpu.data.native_loader import get_lib
from icpflow_tpu.ops.cluster import mutual_reachability_edges
from icpflow_tpu.ops.hdbscan import hdbscan

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")

CFG = DEMO.replace(min_cluster_size=10, num_clusters=50)


def blob(rng, center, n, scale):
    return (center + rng.normal(scale=scale, size=(n, 3))).astype(np.float32)


def test_edges_core_distance():
    rng = np.random.default_rng(0)
    pts = blob(rng, [0, 0, 0], 200, 0.1)
    valid = np.ones(len(pts), bool)
    core, edst, ew = mutual_reachability_edges(
        jnp.asarray(pts), jnp.asarray(valid), k_core=5, edges_per_point=4,
        cell_sizes=(0.8,))
    core = np.asarray(core)
    # brute-force k-th neighbor distance (blob spans << one 0.8 m cell ring,
    # so the level sees every candidate and the bound is exact)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    kth = np.sort(d, axis=1)[:, 4]
    np.testing.assert_allclose(core, kth, atol=1e-4)
    # edge weights respect mutual reachability >= both core distances
    ew = np.asarray(ew)
    edst = np.asarray(edst)
    for i in range(0, 200, 17):
        for e in range(4):
            j = edst[i, e]
            if j >= len(pts):
                continue
            w = ew[i, e]
            assert w >= max(core[i], core[j]) - 1e-5


def test_multiscale_core_is_tight_upper_bound():
    """Mixed densities: fine cells bound dense points, coarse cells reach the
    k-th neighbor of sparse points; min over levels ~= exact d_k for both."""
    rng = np.random.default_rng(4)
    dense = blob(rng, [0, 0, 0], 400, 0.08)          # d_5 ~ 0.03
    sparse = blob(rng, [40, 0, 0], 60, 1.2)          # d_5 ~ 1.0 > fine reach
    pts = np.concatenate([dense, sparse])
    valid = np.ones(len(pts), bool)
    core, _, _ = mutual_reachability_edges(
        jnp.asarray(pts), jnp.asarray(valid), k_core=5, edges_per_point=4,
        cell_sizes=(0.35, 1.0, 3.0))
    core = np.asarray(core)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    kth = np.sort(d, axis=1)[:, 4]
    assert (core >= kth - 1e-4).all()                # upper bound everywhere
    # and tight wherever the true d_k is within some level's guaranteed reach
    reachable = kth <= 3.0
    np.testing.assert_allclose(core[reachable], kth[reachable], atol=1e-4)


def test_sparse_far_cluster_survives():
    """Round-1 failure mode: a far sparse mover (point spacing beyond the old
    single 0.8 m cell) fragmented to noise; the coarse level must keep it."""
    rng = np.random.default_rng(5)
    dense = blob(rng, [0, 0, 0], 500, 0.1)
    far = blob(rng, [45, 45, 0], 40, 0.9)            # 40 pts, ~1 m spacing
    pts = np.concatenate([dense, far])
    valid = np.ones(len(pts), bool)
    lab = hdbscan(jnp.asarray(pts), jnp.asarray(valid),
                  CFG.replace(min_cluster_size=10))
    far_lab = lab[500:]
    vals, cnt = np.unique(far_lab[far_lab >= 0], return_counts=True)
    assert len(vals) >= 1 and cnt.max() >= 0.8 * len(far_lab), (vals, cnt)


def test_varying_density_clusters():
    """The scenario hdbscan exists for: clusters at very different densities
    that no single eps separates."""
    rng = np.random.default_rng(1)
    dense_a = blob(rng, [0, 0, 0], 300, 0.05)
    dense_b = blob(rng, [2, 0, 0], 250, 0.05)
    sparse = blob(rng, [30, 30, 0], 120, 0.6)     # 12x sparser
    noise = rng.uniform(-40, 60, size=(60, 3)).astype(np.float32)
    pts = np.concatenate([dense_a, dense_b, sparse, noise])
    valid = np.ones(len(pts), bool)
    lab = hdbscan(jnp.asarray(pts), jnp.asarray(valid), CFG)
    la = lab[:300]
    lb = lab[300:550]
    lc = lab[550:670]
    # each group coherent and distinct
    for grp in (la, lb, lc):
        vals, cnt = np.unique(grp[grp >= 0], return_counts=True)
        assert cnt.max() > 0.85 * len(grp), (vals, cnt, len(grp))
    assert len({np.bincount(g[g >= 0]).argmax() for g in (la, lb, lc)}) == 3
    # scattered noise stays unlabelled mostly
    assert (lab[670:] == -1).mean() > 0.7


def test_labels_size_ranked_and_capped():
    rng = np.random.default_rng(2)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 400, 0.1),
        blob(rng, [5, 0, 0], 200, 0.1),
        blob(rng, [10, 0, 0], 50, 0.1),
    ])
    valid = np.ones(len(pts), bool)
    cfg = CFG.replace(num_clusters=2)
    lab = hdbscan(jnp.asarray(pts), jnp.asarray(valid), cfg)
    assert np.bincount(lab[:400][lab[:400] >= 0]).argmax() == 0
    assert np.bincount(lab[400:600][lab[400:600] >= 0]).argmax() == 1
    assert (lab[600:] == -1).all()      # third cluster dropped by cap


def test_invalid_points_are_noise():
    rng = np.random.default_rng(3)
    pts = blob(rng, [0, 0, 0], 100, 0.1)
    valid = np.zeros(len(pts), bool)
    valid[:50] = True
    lab = hdbscan(jnp.asarray(pts), jnp.asarray(valid),
                  CFG.replace(min_cluster_size=5))
    assert (lab[~valid] == -1).all()


def test_exact_knn_mutual_reachability_parity():
    """Brute-force parity of the exact kNN graph (core distances, neighbor
    identities, mutual-reachability weights, invalid handling)."""
    from icpflow_tpu.ops.cluster import exact_knn_mutual_reachability
    rng = np.random.default_rng(9)
    pts = (rng.normal(size=(500, 3)) * 3).astype(np.float32)
    valid = np.ones(500, bool)
    valid[450:] = False
    core, ed, ew = exact_knn_mutual_reachability(
        jnp.asarray(pts), jnp.asarray(valid), k=5, src_tile=128,
        dst_tile=256)
    core, ed, ew = np.asarray(core), np.asarray(ed), np.asarray(ew)
    d = np.linalg.norm(pts[:450, None] - pts[None, :450], axis=-1)
    np.fill_diagonal(d, np.inf)
    kth = np.sort(d, axis=1)[:, 4]
    np.testing.assert_allclose(core[:450], kth, atol=2e-3)
    for i in range(0, 450, 37):
        assert set(ed[i].tolist()) == set(np.argsort(d[i])[:5]), i
    for i in range(0, 450, 51):
        for e in range(5):
            assert ew[i, e] >= max(core[i], core[ed[i, e]]) - 2e-3
    assert (core[450:] > 1e8).all() and (ed[450:] == 500).all()


def test_exact_graph_consistent_across_translation():
    """The motivating property: the exact graph (unlike the voxel-hash one)
    gives the two displaced copies of an object identical cluster structure."""
    from icpflow_tpu.ops.hdbscan import hdbscan
    rng = np.random.default_rng(10)
    obj = (rng.normal(size=(600, 3)) * [1.0, 0.4, 0.3]).astype(np.float32)
    far = (rng.normal(size=(200, 3)) * 0.5 + [30, 0, 0]).astype(np.float32)
    copy_a = obj + np.array([5.3, 2.7, 0.0], np.float32)   # odd offsets vs
    copy_b = obj + np.array([-4.1, -1.9, 0.0], np.float32)  # any voxel grid
    pts = np.concatenate([copy_a, copy_b, far])
    valid = np.ones(len(pts), bool)
    lab = hdbscan(jnp.asarray(pts), jnp.asarray(valid),
                  CFG.replace(min_cluster_size=10))
    la, lb = lab[:600], lab[600:1200]
    # each copy must be one coherent cluster (no fragmentation), and the two
    # copies must not share a label (they are disjoint in space)
    for grp in (la, lb):
        vals, cnt = np.unique(grp[grp >= 0], return_counts=True)
        assert cnt.max() > 0.95 * len(grp), (vals, cnt)
    assert np.bincount(la[la >= 0]).argmax() != np.bincount(
        lb[lb >= 0]).argmax()
