import numpy as np
import jax.numpy as jnp
import pytest

from icpflow_tpu import DEMO
from icpflow_tpu.ops.ego import EgoOdometry, voxel_downsample_mask


def make_world(rng, n=6000):
    """A structured static world: ground plane + walls + poles."""
    g = np.stack([rng.uniform(-40, 40, n // 2),
                  rng.uniform(-40, 40, n // 2),
                  rng.normal(scale=0.05, size=n // 2) - 1.7], 1)
    w1 = np.stack([rng.uniform(-40, 40, n // 4),
                   np.full(n // 4, 12.0) + rng.normal(scale=0.05, size=n // 4),
                   rng.uniform(-1.5, 2, n // 4)], 1)
    poles = []
    for px, py in ((5, -5), (-12, 3), (20, 8), (-25, -15)):
        m = n // 16
        poles.append(np.stack([
            px + rng.normal(scale=0.05, size=m),
            py + rng.normal(scale=0.05, size=m),
            rng.uniform(-1.5, 2.5, m)], 1))
    return np.concatenate([g, w1] + poles).astype(np.float32)


def test_voxel_downsample_mask():
    pts = np.array([[0, 0, 0], [0.01, 0, 0], [1.0, 0, 0], [5, 5, 5]],
                   np.float32)
    valid = np.array([True, True, True, False])
    keep = np.asarray(voxel_downsample_mask(jnp.asarray(pts),
                                            jnp.asarray(valid), voxel=0.5))
    assert keep.sum() == 2          # the two close points dedup to one
    assert not keep[3]


def test_odometry_recovers_constant_motion():
    rng = np.random.default_rng(0)
    world = make_world(rng)
    cfg = DEMO.replace(max_points_scene=16384, ego_map_capacity=32768,
                       nn_tile=512)
    odo = EgoOdometry(cfg)
    true_poses = []
    step_t = np.array([1.2, 0.15, 0.0])
    for k in range(4):
        # sensor moves forward; the scan is the world in the sensor frame
        pose = np.eye(4)
        pose[:3, 3] = step_t * k
        scan = (world - pose[:3, 3]) @ np.eye(3)
        # re-sample the world a bit each frame like a real scanner
        noise = rng.normal(scale=0.01, size=scan.shape)
        odo.register_frame((scan + noise).astype(np.float32))
        true_poses.append(pose)
    for k in (1, 2, 3):
        est_t = odo.poses[k][:3, 3]
        err = np.linalg.norm(est_t - true_poses[k][:3, 3])
        assert err < 0.15, (k, est_t, true_poses[k][:3, 3])
