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
        cell_size=0.8)
    core = np.asarray(core)
    # brute-force k-th neighbor distance
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    kth = np.sort(d, axis=1)[:, 4]
    capped = np.minimum(kth, 1.2)
    np.testing.assert_allclose(core, capped, atol=1e-4)
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
