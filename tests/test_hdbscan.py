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


def test_voxel_dedup_compact_invariants():
    from icpflow_tpu.ops.cluster import voxel_dedup_compact
    rng = np.random.default_rng(7)
    pts = rng.uniform(-5, 5, size=(800, 3)).astype(np.float32)
    valid = np.ones(800, bool)
    valid[700:] = False
    cap = 4096
    rx, rv, rm, pr, nu = voxel_dedup_compact(
        jnp.asarray(pts), jnp.asarray(valid), voxel=0.5, cap=cap)
    rx, rv, rm, pr, nu = map(np.asarray, (rx, rv, rm, pr, nu))
    # representative count == occupied voxels of the valid points
    ids = np.floor(pts[:700] / 0.5).astype(np.int64)
    key = ids[:, 0] * 10**8 + ids[:, 1] * 10**4 + ids[:, 2]
    assert int(nu) == len(np.unique(key))
    assert rv.sum() == int(nu)
    # multiplicities partition the valid points
    assert rm.sum() == 700
    # every valid point maps to a live slot; invalid points map to cap
    assert (pr[:700] < int(nu)).all()
    assert (pr[700:] == cap).all()
    # a point and its representative share a voxel
    rep_ids = np.floor(rx[pr[:700]] / 0.5).astype(np.int64)
    assert (rep_ids == ids).all()
    # multiplicity of each point's rep counts its voxel's points
    vox_count = {k: c for k, c in zip(*np.unique(key, return_counts=True))}
    got = rm[pr[:700]]
    want = np.array([vox_count[k] for k in key])
    assert (got == want).all()


def test_weighted_core_counts_points():
    """Weighted d_k on dedup representatives ~= raw-cloud d_k (within the
    voxel quantisation)."""
    from icpflow_tpu.ops.cluster import (exact_knn_mutual_reachability,
                                         voxel_dedup_compact)
    rng = np.random.default_rng(8)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 300, 0.08),      # dense: many co-voxel dups
        blob(rng, [8, 0, 0], 60, 0.7),        # sparse: mult ~ 1
    ])
    valid = np.ones(len(pts), bool)
    k = 10
    vox = 0.15
    rx, rv, rm, pr, nu = voxel_dedup_compact(
        jnp.asarray(pts), jnp.asarray(valid), voxel=vox, cap=2048)
    core_w, _, _ = exact_knn_mutual_reachability(rx, rv, rm, k=k)
    core_w = np.asarray(core_w)
    # raw-cloud d_k
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    kth = np.sort(d, axis=1)[:, k - 1]
    pr = np.asarray(pr)
    # compare each point's rep core against its true d_k: equal up to the
    # voxel diagonal (dedup quantises distances by at most one cell diag)
    err = np.abs(core_w[pr] - kth)
    assert np.quantile(err, 0.9) < vox * np.sqrt(3) + 1e-3, err.max()


def test_dedup_path_matches_full_graph_labels():
    """End contract: labels from the dedup path agree with the full exact
    graph (same partition up to label permutation) on a mixed-density
    scene."""
    rng = np.random.default_rng(9)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 400, 0.06),
        blob(rng, [3, 0, 0], 250, 0.06),
        blob(rng, [20, 20, 0], 150, 0.5),
        rng.uniform(-30, 40, size=(60, 3)).astype(np.float32),
    ])
    valid = np.ones(len(pts), bool)
    full = hdbscan(jnp.asarray(pts), jnp.asarray(valid),
                   CFG.replace(hdbscan_dedup_voxel=0.0))
    dedup = hdbscan(jnp.asarray(pts), jnp.asarray(valid),
                    CFG.replace(hdbscan_dedup_voxel=0.15, hdbscan_rep_cap=4096))
    # cluster cores must agree: for each of the three planted groups, the
    # dominant label covers the group in both runs and the partitions match
    for sl in (slice(0, 400), slice(400, 650), slice(650, 800)):
        f, g = full[sl], dedup[sl]
        assert (f >= 0).mean() > 0.9 and (g >= 0).mean() > 0.9
        fm = np.bincount(f[f >= 0]).argmax()
        gm = np.bincount(g[g >= 0]).argmax()
        both = (f == fm) & (g == gm)
        assert both.mean() > 0.85, (sl, both.mean())


def test_dedup_overflow_falls_back_to_full_graph():
    from icpflow_tpu.ops import hdbscan as hmod
    rng = np.random.default_rng(10)
    pts = rng.uniform(-50, 50, size=(600, 3)).astype(np.float32)
    dense = blob(rng, [0, 0, 0], 300, 0.1)
    pts = np.concatenate([pts, dense])
    valid = np.ones(len(pts), bool)
    before = hmod.DEDUP_OVERFLOWS
    # rep_cap 64 << unique voxels -> must fall back, counted, still labels
    lab = hdbscan(jnp.asarray(pts), jnp.asarray(valid),
                  CFG.replace(hdbscan_dedup_voxel=0.15, hdbscan_rep_cap=64))
    assert hmod.DEDUP_OVERFLOWS == before + 1
    core = lab[600:]
    assert (core >= 0).mean() > 0.85
