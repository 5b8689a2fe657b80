"""Pathological-input robustness: the framework must never NaN or crash."""

import numpy as np
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.pipeline import run_frame_pair
from icpflow_tpu.utils.viz import trackers_to_labels

# every fixture in this file is <= 400 points; the smallest buckets cut the
# per-run engine compile this fast-tier file pays (cache is off under pytest)
CFG = DEMO.replace(
    max_points_scene=2048, max_points=256, num_clusters=16, max_pairs=16,
    pairs_small=16, pairs_large=4, max_points_small=128,
    min_cluster_size=5, nn_tile=128, hist_grid_xy=32, icp_max_iters=10,
    epsilon=0.4, use_hdbscan=False,
)


def run(src, dst):
    eng = SceneFlowEngine(CFG)
    return run_frame_pair(eng, src.astype(np.float32),
                          dst.astype(np.float32), translation_frame=4.0)


def test_duplicate_points():
    pts = np.tile(np.array([[1.0, 2.0, 0.5]]), (300, 1))
    res = run(pts, pts)
    assert np.isfinite(res.flow).all()


def test_collinear_degenerate_cluster():
    # perfectly collinear points: rank-1 covariance in Kabsch
    t = np.linspace(0, 5, 200)[:, None]
    pts = t * np.array([[1.0, 0.3, 0.0]])
    res = run(pts, pts + [0.5, 0.15, 0.0])
    assert np.isfinite(res.flow).all()


def test_single_point_cloud():
    pts = np.array([[0.0, 0.0, 0.0]])
    res = run(pts, pts)
    assert res.flow.shape == (1, 3)
    assert np.isfinite(res.flow).all()


def test_extreme_coordinates():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (200, 3)) + [500.0, -800.0, 50.0]
    res = run(pts, pts)
    assert np.isfinite(res.flow).all()
    assert np.abs(res.flow).max() < 1.0     # static scene -> near-zero flow


def test_trackers_to_labels():
    ls = np.array([0, 0, 1, 2, -1, -100000000])
    ld = np.array([5, 5, 3, -1])
    pairs = np.array([[0, 5], [2, 3]])
    ts, td = trackers_to_labels(ls, ld, pairs)
    np.testing.assert_array_equal(ts, [0, 0, -1, 1, -1, -100000000])
    np.testing.assert_array_equal(td, [0, 0, 1, -1])


def test_bitwise_determinism():
    """Two identical runs produce bitwise-identical flow: no RNG, stable
    sorts, order-independent reductions (SURVEY §5 determinism goals)."""
    rng = np.random.default_rng(11)
    src = rng.uniform(-5, 5, (800, 3)).astype(np.float32)
    dst = (src + np.array([0.8, -0.2, 0.0], np.float32)
           + rng.normal(scale=0.01, size=src.shape).astype(np.float32))
    r1 = run(src, dst)
    r2 = run(src, dst)
    np.testing.assert_array_equal(r1.flow, r2.flow)
    np.testing.assert_array_equal(r1.labels_src, r2.labels_src)
