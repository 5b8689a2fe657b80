import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.cluster import dbscan


def reference_dbscan(xyz, eps, min_points):
    """O(N^2) numpy DBSCAN for small-N parity checks."""
    n = len(xyz)
    d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
    within = d <= eps
    core = within.sum(1) >= min_points
    labels = np.full(n, -1)
    cur = 0
    for i in range(n):
        if not core[i] or labels[i] >= 0:
            continue
        stack = [i]
        labels[i] = cur
        while stack:
            p = stack.pop()
            for q in np.flatnonzero(within[p]):
                if labels[q] < 0:
                    labels[q] = cur
                    if core[q]:
                        stack.append(q)
                elif core[q] and labels[q] != cur:
                    pass
        cur += 1
    return labels, core


def blob(rng, center, n, scale=0.08):
    return center + rng.normal(scale=scale, size=(n, 3))


def test_separated_blobs():
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 80),
        blob(rng, [5, 0, 0], 120),
        blob(rng, [0, 6, 0], 60),
        rng.uniform(-20, 20, size=(30, 3)),     # sparse noise
    ]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    lab = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(valid),
                            eps=0.4, min_points=10, num_clusters=10,
                            tile=128))
    # the three blobs must be three distinct clusters, size-ordered 0..2
    l0 = lab[:80]
    l1 = lab[80:200]
    l2 = lab[200:260]
    assert len(set(l0)) == 1 and l0[0] >= 0
    assert len(set(l1)) == 1 and l1[0] >= 0
    assert len(set(l2)) == 1 and l2[0] >= 0
    assert len({l0[0], l1[0], l2[0]}) == 3
    assert l1[0] == 0  # largest blob gets label 0 (size-ranked)


def test_matches_reference_partition():
    rng = np.random.default_rng(1)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 50, scale=0.15),
        blob(rng, [2.5, 1, 0], 70, scale=0.15),
        rng.uniform(-5, 5, size=(40, 3)),
    ]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    eps, mp = 0.5, 8
    ours = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(valid),
                             eps=eps, min_points=mp, num_clusters=50,
                             tile=64))
    ref, core = reference_dbscan(pts, eps, mp)
    # partitions over CORE points must agree exactly (border assignment is
    # implementation-defined in DBSCAN)
    for c in np.unique(ref[core]):
        members = ours[core][ref[core] == c]
        assert len(set(members)) == 1, c
        assert members[0] >= 0
    # noise must agree on non-border points: every ref-noise point that is
    # not within eps of a core point must be ours-noise too
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    near_core = (d[:, core] <= eps).any(1)
    pure_noise = (ref == -1) & ~near_core
    assert (ours[pure_noise] == -1).all()


def test_chain_connectivity():
    # a long chain of points spaced just under eps must form ONE cluster —
    # exercises the propagation distance / pointer jumping
    xs = np.arange(0, 30, 0.2)
    pts = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], 1)
    pts = np.repeat(pts, 4, axis=0)  # densify so points are core
    pts = pts + np.random.default_rng(2).normal(scale=0.02, size=pts.shape)
    pts = pts.astype(np.float32)
    valid = np.ones(len(pts), bool)
    lab = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(valid),
                            eps=0.25, min_points=4, num_clusters=10,
                            tile=128))
    assert (lab >= 0).all()
    assert len(np.unique(lab)) == 1


def test_invalid_points_and_top_k_filtering():
    rng = np.random.default_rng(3)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 100),
        blob(rng, [4, 0, 0], 50),
        blob(rng, [8, 0, 0], 30),
    ]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    valid[150:] = False   # third blob invalidated by padding
    lab = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(valid),
                            eps=0.4, min_points=10, num_clusters=1,
                            tile=64))
    assert (lab[~valid] == -1).all()
    # only the single largest cluster survives num_clusters=1
    assert set(lab[:100]) == {0}
    assert (lab[100:150] == -1).all()


def test_dedup_matches_full_path():
    """dbscan_dedup (weighted counts on voxel reps) reproduces the full-cloud
    clustering on well-separated structure, and its overflow fallback is
    bit-identical to the full path (ops/cluster.py dbscan_dedup)."""
    from icpflow_tpu.ops.cluster import dbscan_dedup

    rng = np.random.default_rng(3)
    pts = np.concatenate([
        blob(rng, [0, 0, 0], 200),
        blob(rng, [5, 0, 0], 300),
        blob(rng, [0, 6, 0], 150),
        rng.uniform(-20, 20, size=(50, 3)),
    ]).astype(np.float32)
    n = 1024
    pts_p = np.zeros((n, 3), np.float32)
    pts_p[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    kw = dict(eps=0.5, min_points=10, num_clusters=8)

    full = np.asarray(dbscan(jnp.asarray(pts_p), jnp.asarray(valid), **kw))
    dd = np.asarray(dbscan_dedup(jnp.asarray(pts_p), jnp.asarray(valid),
                                 dedup_voxel=0.2, rep_cap=512, **kw))
    # same partition on the real points (labels are size-ranked, so equal
    # partitions get equal ids here)
    m = valid
    assert (dd[m] == full[m]).mean() > 0.98, (dd[m] != full[m]).sum()

    # overflow fallback: rep_cap below the occupied-voxel count must take
    # the full-cloud branch bit-identically
    fb = np.asarray(dbscan_dedup(jnp.asarray(pts_p), jnp.asarray(valid),
                                 dedup_voxel=0.2, rep_cap=16, **kw))
    np.testing.assert_array_equal(fb, full)


def test_dedup_weighted_counts_keep_sparse_reps_noise():
    """A lone far point stays noise under dedup (its rep multiplicity 1
    cannot clear min_points), while a dense blob's reps stay core even
    though the rep COUNT within eps is below min_points (multiplicities
    carry the raw density)."""
    from icpflow_tpu.ops.cluster import dbscan_dedup

    rng = np.random.default_rng(4)
    # 400 points crammed into a couple of voxels: rep count ~8 << min_points
    dense = blob(rng, [0, 0, 0], 400, scale=0.05)
    lone = np.array([[15.0, 15.0, 1.0]])
    pts = np.concatenate([dense, lone]).astype(np.float32)
    n = 512
    pts_p = np.zeros((n, 3), np.float32)
    pts_p[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    lab = np.asarray(dbscan_dedup(jnp.asarray(pts_p), jnp.asarray(valid),
                                  dedup_voxel=0.2, rep_cap=256,
                                  eps=0.5, min_points=50, num_clusters=4))
    assert (lab[:400] == 0).all()          # dense blob is one cluster
    assert lab[400] == -1                  # lone point is noise
    assert (lab[len(pts):n] == -1).all()   # padding is noise


def test_dedup_rejects_too_coarse_voxel():
    from icpflow_tpu.ops.cluster import dbscan_dedup
    import pytest as _pytest
    pts = jnp.zeros((64, 3), jnp.float32)
    valid = jnp.ones((64,), bool)
    with _pytest.raises(ValueError, match="too coarse"):
        dbscan_dedup(pts, valid, dedup_voxel=0.2, rep_cap=32, eps=0.25)
