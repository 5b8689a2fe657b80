"""StreamingEngine: online per-frame flow over a synthetic scan stream."""

import numpy as np
import pytest

from icpflow_tpu import DEMO
from icpflow_tpu.models.streaming import StreamingEngine

CFG = DEMO.replace(
    max_points_scene=16384, max_points=1024, num_clusters=32, max_pairs=64,
    pairs_small=64, pairs_large=8, min_cluster_size=15, nn_tile=512,
    hist_grid_xy=128, icp_max_iters=15, epsilon=0.4, speed=2.0,
    range_z=-1.8, ground_slack=0.3, ego_map_capacity=32768,
)


def make_world(rng):
    def box(center, size, n):
        return center + rng.uniform(-0.5, 0.5, (n, 3)) * size
    ground_r = np.sqrt(rng.uniform(2.0 ** 2, 35.0 ** 2, 3000))
    th = rng.uniform(0, 2 * np.pi, 3000)
    ground = np.stack([ground_r * np.cos(th), ground_r * np.sin(th),
                       np.full(3000, -1.7) + rng.normal(scale=0.02, size=3000)], 1)
    wall = box([0, 12, 0.0], [30, 0.3, 2.5], 3000)
    car = box([-5, -4, -0.9], [4.2, 1.8, 1.5], 1200)
    return ground, wall, car


@pytest.mark.slow
def test_streaming_flow_and_ego():
    rng = np.random.default_rng(0)
    ground, wall, car = make_world(rng)
    car_v = np.array([1.2, 0.2, 0.0])
    ego_v = np.array([0.7, 0.0, 0.0])

    eng = StreamingEngine(CFG, estimate_ego=True)
    outs = []
    for k in range(3):
        world = np.concatenate([ground, wall, car + car_v * k])
        scan = (world - ego_v * k).astype(np.float32)   # sensor frame
        scan = scan + rng.normal(scale=0.01, size=scan.shape).astype(np.float32)
        outs.append(eng.process(scan))

    assert outs[0] is None
    for k in (1, 2):
        out = outs[k]
        assert out is not None
        # ego pose recovered
        np.testing.assert_allclose(out.pose[:3, 3], ego_v * k, atol=0.15)
        # car flow ~ -car_v (new frame vs PREVIOUS frame: prev = cur - v)
        car_sel = slice(len(ground) + len(wall), None)
        f = out.flow[car_sel]
        np.testing.assert_allclose(np.median(f, axis=0), -car_v, atol=0.15)
        # static wall flow ~ 0 in world coordinates
        wall_sel = slice(len(ground), len(ground) + len(wall))
        assert np.abs(np.median(out.flow[wall_sel], axis=0)).max() < 0.1
        assert len(out.pairs) >= 1


def test_streaming_reset():
    # reset semantics don't need realistic geometry — a minimal config keeps
    # this fast-tier test from paying the full streaming-program compile
    rng = np.random.default_rng(1)
    cfg = CFG.replace(max_points_scene=4096, max_points=512, num_clusters=16,
                      max_pairs=32, pairs_small=32, pairs_large=4,
                      nn_tile=256, hist_grid_xy=64, ego_map_capacity=8192)
    eng = StreamingEngine(cfg, estimate_ego=False)
    ground, wall, car = make_world(rng)
    scan = np.concatenate([ground[:1600], wall[:1200], car]).astype(np.float32)
    assert eng.process(scan) is None
    assert eng.process(scan) is not None
    eng.reset()
    assert eng.process(scan) is None


def test_viz3d_html_self_contained(tmp_path):
    """3D viewer parity (utils_visualization.py:95-145): per-label traces,
    hover annotations, ground/noise sentinels, no hard plotly dependency."""
    import numpy as np
    from icpflow_tpu.utils.viz3d import (visualize_pcd_3d,
                                         visualize_registration_3d)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    lab = rng.integers(-1, 4, 2000).astype(np.int64)
    lab[:50] = -10 ** 8
    flow = rng.normal(scale=0.1, size=(2000, 3)).astype(np.float32)
    p = visualize_pcd_3d(pts, lab, path=str(tmp_path / "v.html"), flow=flow)
    html = open(p).read()
    for needle in ("scatter3d", "hovertemplate", "ground", "noise",
                   "label 0", "|flow|"):
        assert needle in html, needle
    q = visualize_registration_3d(pts[:300], pts[300:600],
                                  np.eye(4, dtype=np.float32),
                                  path=str(tmp_path / "r.html"))
    assert "scatter3d" in open(q).read()
