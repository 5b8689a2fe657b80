import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.ground import czm_ground_mask, segment_ground, NUM_PATCHES


def make_scene(rng, n_ground=4000, n_obj=600, sensor_height=1.723,
               slope=0.0):
    """Flat(ish) ground disc at z=-sensor_height plus boxes standing on it."""
    r = np.sqrt(rng.uniform(1.5 ** 2, 40.0 ** 2, n_ground))
    th = rng.uniform(0, 2 * np.pi, n_ground)
    gx, gy = r * np.cos(th), r * np.sin(th)
    gz = -sensor_height + slope * gx + rng.normal(scale=0.03, size=n_ground)
    ground = np.stack([gx, gy, gz], 1)

    objs = []
    for cx, cy in ((5, 2), (-8, -4), (15, 10)):
        base = -sensor_height + slope * cx
        o = np.stack([
            cx + rng.uniform(-1, 1, n_obj // 3),
            cy + rng.uniform(-1, 1, n_obj // 3),
            base + rng.uniform(0.2, 1.8, n_obj // 3),
        ], 1)
        objs.append(o)
    pts = np.concatenate([ground] + objs).astype(np.float32)
    is_ground = np.zeros(len(pts), bool)
    is_ground[:n_ground] = True
    return pts, is_ground


def test_flat_ground_and_objects():
    rng = np.random.default_rng(0)
    pts, is_ground = make_scene(rng)
    valid = np.ones(len(pts), bool)
    mask = np.asarray(czm_ground_mask(jnp.asarray(pts), jnp.asarray(valid)))
    recall = mask[is_ground].mean()
    false_pos = mask[~is_ground].mean()
    assert recall > 0.9, recall
    assert false_pos < 0.05, false_pos


def test_sloped_ground():
    rng = np.random.default_rng(1)
    pts, is_ground = make_scene(rng, slope=0.03)   # ~1.7 degree slope
    valid = np.ones(len(pts), bool)
    mask = np.asarray(czm_ground_mask(jnp.asarray(pts), jnp.asarray(valid)))
    assert mask[is_ground].mean() > 0.85


def test_segment_ground_combines_z_threshold():
    rng = np.random.default_rng(2)
    pts, is_ground = make_scene(rng)
    valid = np.ones(len(pts), bool)
    # reference AND-semantics: non-ground requires above z-threshold AND
    # not CZM-ground (utils_ground.py:16-23)
    ng = np.asarray(segment_ground(jnp.asarray(pts), jnp.asarray(valid),
                                   range_z=-1.723, ground_slack=0.3))
    assert ng[is_ground].mean() < 0.1       # ground mostly removed
    # objects kept except the band below the z-threshold (points within
    # 0.3 m of ground are cropped by design, utils_ground.py:26-32)
    above = pts[~is_ground][:, 2] > (-1.723 + 0.3)
    assert ng[~is_ground][above].mean() > 0.97
    # z-threshold alone path
    ng2 = np.asarray(segment_ground(jnp.asarray(pts), jnp.asarray(valid),
                                    range_z=-1.723, ground_slack=0.3,
                                    use_czm=False))
    assert ng2[~is_ground][above].mean() > 0.999


def test_invalid_points_never_ground():
    rng = np.random.default_rng(3)
    pts, _ = make_scene(rng, n_ground=500, n_obj=60)
    valid = np.zeros(len(pts), bool)
    valid[:100] = True
    mask = np.asarray(czm_ground_mask(jnp.asarray(pts), jnp.asarray(valid)))
    assert not mask[~valid].any()
