"""Multi-device tests on the virtual 8-device CPU mesh.

Validates (a) the dp scan-pair sharding produces identical results to the
single-device path, and (b) the cp cluster-pair sharding's pmin/all_gather
collectives preserve the matcher semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from icpflow_tpu import DEMO
from icpflow_tpu.parallel.mesh import make_mesh
from icpflow_tpu.parallel.shard import make_sharded_step, _frame_pair_step

CFG = DEMO.replace(
    max_points_scene=1024,
    max_points=128,
    num_clusters=8,
    max_pairs=8,
    min_cluster_size=5,
    nn_tile=128,
    hist_grid_xy=64,
    icp_max_iters=8,
    epsilon=0.4,
)


def make_batch(b, seed=0):
    rng = np.random.default_rng(seed)
    n = CFG.max_points_scene
    pts_s = np.zeros((b, n, 3), np.float32)
    pts_d = np.zeros((b, n, 3), np.float32)
    lab = np.full((b, n), -1, np.int32)
    valid = np.zeros((b, n), bool)
    gt = np.zeros((b, n, 3), np.float32)
    for i in range(b):
        # two clusters per frame pair, one moving
        c0 = rng.uniform(-3, 3, size=3).astype(np.float32)
        pts0 = c0 + rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        c1 = rng.uniform(-3, 3, size=3).astype(np.float32)
        pts1 = c1 + rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        shift = np.array([1.0 + 0.1 * i, -0.5, 0.0], np.float32)
        pts_s[i, :300] = pts0
        pts_s[i, 300:500] = pts1
        pts_d[i, :300] = pts0
        pts_d[i, 300:500] = pts1 + shift
        lab[i, :300] = 0
        lab[i, 300:500] = 1
        valid[i, :500] = True
        gt[i, 300:500] = shift
    return (jnp.asarray(pts_s), jnp.asarray(valid), jnp.asarray(lab),
            jnp.asarray(pts_d), jnp.asarray(valid), jnp.asarray(lab),
            jnp.asarray(gt))


# one mesh shape in the fast tier keeps sharded-vs-single parity covered on
# every inner-loop run; the other two shapes (same code path, different
# partitioning) each cost a full mesh-specific compile and run in the slow
# tier / CI sweep
@pytest.mark.parametrize(
    "n_dp,n_cp",
    [pytest.param(8, 1, marks=pytest.mark.slow),
     pytest.param(4, 2, marks=pytest.mark.slow),
     (2, 4)])
def test_sharded_step_matches_single_device(n_dp, n_cp):
    if len(jax.devices()) < n_dp * n_cp:
        pytest.skip("needs 8 virtual devices")
    batch = make_batch(n_dp, seed=42)
    mesh = make_mesh(n_dp, n_cp)
    step = make_sharded_step(mesh, CFG)
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_dp, 4, 4))
    tfs = jnp.full((n_dp,), 4.0, jnp.float32)
    flow, transforms, sums = step(*batch, poses, tfs)
    flow = np.asarray(flow)

    # single-device reference: run each frame pair alone
    for i in range(n_dp):
        one = [a[i] for a in batch]
        f1, t1, s1 = _frame_pair_step(*one, poses[i], jnp.float32(4.0),
                                      CFG, None, 1)
        np.testing.assert_allclose(flow[i], np.asarray(f1),
                                   rtol=1e-4, atol=1e-4)

    # metric sums: [num, epe, accs, accr, outlier, routlier]
    sums = np.asarray(sums)
    assert sums.shape == (6,)
    assert sums[0] == n_dp * 500
    assert np.isfinite(sums).all()


def test_sharded_step_recovers_motion():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = make_batch(4, seed=7)
    mesh = make_mesh(4, 2)
    step = make_sharded_step(mesh, CFG)
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (4, 4, 4))
    flow, transforms, sums = step(*batch, poses,
                                  jnp.full((4,), 4.0, jnp.float32))
    flow = np.asarray(flow)
    gt = np.asarray(batch[6])
    err = np.linalg.norm(flow - gt, axis=-1)
    valid = np.asarray(batch[1])
    assert err[valid].mean() < 0.1


@pytest.mark.slow
def test_sharded_step_realistic_buckets():
    """Sharded equality at realistic bucket geometry (8k-point scenes,
    1k-point segments, both pair buckets exercised) — the toy-scale tests
    above cannot catch bucket-boundary bugs in the cp sharding."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = DEMO.replace(
        max_points_scene=8192,
        max_points=1024,
        max_points_small=128,
        pairs_small=32,
        pairs_large=8,
        num_clusters=16,
        max_pairs=32,
        min_cluster_size=5,
        nn_tile=256,
        hist_grid_xy=64,
        icp_max_iters=8,
        epsilon=0.4,
    )
    rng = np.random.default_rng(3)
    b = 2
    n = cfg.max_points_scene
    pts_s = np.zeros((b, n, 3), np.float32)
    pts_d = np.zeros((b, n, 3), np.float32)
    lab = np.full((b, n), -1, np.int32)
    valid = np.zeros((b, n), bool)
    gt = np.zeros((b, n, 3), np.float32)
    for i in range(b):
        pos = 0
        for li, sz in enumerate((700, 400, 90, 60)):   # large + small buckets
            c = rng.uniform(-8, 8, size=3).astype(np.float32)
            cloud = c + rng.uniform(-1, 1, (sz, 3)).astype(np.float32)
            shift = (np.array([1.0 + 0.3 * li, -0.4, 0.0], np.float32)
                     if li % 2 else np.zeros(3, np.float32))
            pts_s[i, pos:pos + sz] = cloud
            pts_d[i, pos:pos + sz] = cloud + shift
            lab[i, pos:pos + sz] = li
            gt[i, pos:pos + sz] = shift
            pos += sz
        valid[i, :pos] = True
    batch = (jnp.asarray(pts_s), jnp.asarray(valid), jnp.asarray(lab),
             jnp.asarray(pts_d), jnp.asarray(valid), jnp.asarray(lab),
             jnp.asarray(gt))
    mesh = make_mesh(2, 2)
    step = make_sharded_step(mesh, cfg)
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    flow, transforms, sums = step(*batch, poses,
                                  jnp.full((b,), 6.0, jnp.float32))
    flow = np.asarray(flow)
    for i in range(b):
        one = [a[i] for a in batch]
        f1, _, _ = _frame_pair_step(*one, poses[i], jnp.float32(6.0),
                                    cfg, None, 1)
        np.testing.assert_allclose(flow[i], np.asarray(f1),
                                   rtol=1e-4, atol=1e-4)
    err = np.linalg.norm(flow - np.asarray(batch[6]), axis=-1)
    assert err[np.asarray(batch[1])].mean() < 0.1
