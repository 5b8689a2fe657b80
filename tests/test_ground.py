import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.ground import (czm_ground_mask, czm_ground_mask_stateful,
                                    initial_ground_state, segment_ground,
                                    segment_ground_stateful, NUM_PATCHES)


def make_scene(rng, n_ground=20000, n_obj=600, sensor_height=1.723,
               slope=0.0):
    """Flat(ish) ground disc at z=-sensor_height plus boxes standing on it.

    Density matters: patchwork++ skips patches below num_min_pts=10
    (`patchworkpp.h:84`), so the ground must be lidar-dense for near rings
    to be fit at all — exactly as in real scans.
    """
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
    assert recall > 0.95, recall
    assert false_pos < 0.05, false_pos


def test_sloped_ground():
    rng = np.random.default_rng(1)
    pts, is_ground = make_scene(rng, slope=0.03)   # ~1.7 degree slope
    valid = np.ones(len(pts), bool)
    mask = np.asarray(czm_ground_mask(jnp.asarray(pts), jnp.asarray(valid)))
    assert mask[is_ground].mean() > 0.95


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


def test_rvpf_wall_meets_ground():
    """R-VPF adversarial case (VERDICT r1): a vertical wall reaching down to
    the ground inside zone 0. Without R-VPF the lowest-point seeds sit on the
    wall base, the fit tilts, and either the wall base is labelled ground or
    the patch loses its true ground. Ref patchworkpp.cpp:460-491."""
    rng = np.random.default_rng(4)
    pts, is_ground = make_scene(rng, n_ground=30000)
    # dense wall through zone 0: x in [3,5.5], thin in y, from below ground
    # (buried footing) up 2 m
    nw = 4000
    wall = np.stack([
        rng.uniform(3.0, 5.5, nw),
        2.5 + rng.normal(scale=0.02, size=nw),
        rng.uniform(-2.0, 0.2, nw),
    ], 1).astype(np.float32)
    allp = np.concatenate([pts, wall])
    valid = np.ones(len(allp), bool)
    mask = np.asarray(czm_ground_mask(jnp.asarray(allp), jnp.asarray(valid)))
    wall_mask = mask[len(pts):]
    wall_above = wall[:, 2] > -1.723 + 0.15
    # the wall body must NOT be ground
    assert wall_mask[wall_above].mean() < 0.05, wall_mask[wall_above].mean()
    # and the true ground near the wall must still be found
    near_wall = is_ground & (np.abs(pts[:, 0] - 4.25) < 1.5) & (
        np.abs(pts[:, 1] - 2.5) < 1.5)
    assert mask[:len(pts)][near_wall].mean() > 0.85


def test_tgr_reverts_flat_elevated_terrace():
    """A raised flat terrace (elevated road section) that OCCLUDES the ground
    beneath it: the patch fit lands on the terrace, the elevation consensus
    rejects it, and TGR reverts it because its flatness matches the ring's
    ground-flatness distribution. A rough surface at the same elevation must
    stay rejected. Ref patchworkpp.cpp:385-447."""
    def scene_with_terrace(noise):
        rng = np.random.default_rng(5)
        pts, is_ground = make_scene(rng, n_ground=30000, n_obj=0)
        in_area = (pts[:, 0] > -21) & (pts[:, 0] < -13) & (
            np.abs(pts[:, 1]) < 4)
        pts = pts[~in_area]                    # terrace occludes the ground
        ns = 3000
        terrace = np.stack([
            rng.uniform(-20, -14, ns),         # sectors in rings 2/3
            rng.uniform(-3, 3, ns),
            -1.723 + 0.3 + rng.normal(scale=noise, size=ns),
        ], 1).astype(np.float32)
        return np.concatenate([pts, terrace]).astype(np.float32), ns

    allp, ns = scene_with_terrace(noise=0.03)  # as flat as the ground
    valid = np.ones(len(allp), bool)
    mask = np.asarray(czm_ground_mask(jnp.asarray(allp), jnp.asarray(valid)))
    assert mask[-ns:].mean() > 0.7, mask[-ns:].mean()

    allp, ns = scene_with_terrace(noise=0.2)   # rough: prob_flatness ~ 0
    valid = np.ones(len(allp), bool)
    mask = np.asarray(czm_ground_mask(jnp.asarray(allp), jnp.asarray(valid)))
    assert mask[-ns:].mean() < 0.3, mask[-ns:].mean()


def test_stateful_adaptation_tightens_thresholds():
    """A-GLE cross-frame state: after a frame of clean ground, the elevation
    threshold tightens toward mean+k*std of observed ground, so an elevated
    plane that frame 1 might accept is rejected in later frames even without
    the consensus pass. Ref patchworkpp.cpp:321-358."""
    rng = np.random.default_rng(6)
    state = initial_ground_state()
    pts, is_ground = make_scene(rng)
    valid = np.ones(len(pts), bool)
    m1, state = czm_ground_mask_stateful(
        jnp.asarray(pts), jnp.asarray(valid), state)
    thr = np.asarray(state.elev_thr)
    assert (thr < -1.0).all(), thr              # adapted near true ground
    assert np.asarray(m1)[is_ground].mean() > 0.95
    # second frame unchanged scene: still works with adapted thresholds
    pts2, is_ground2 = make_scene(np.random.default_rng(7))
    m2, state = czm_ground_mask_stateful(
        jnp.asarray(pts2), jnp.asarray(valid), state)
    assert np.asarray(m2)[is_ground2].mean() > 0.95
    assert np.asarray(m2)[~is_ground2].mean() < 0.05


def test_segment_ground_stateful_roundtrip():
    rng = np.random.default_rng(8)
    pts, is_ground = make_scene(rng)
    valid = np.ones(len(pts), bool)
    state = initial_ground_state()
    ng, state2 = segment_ground_stateful(
        jnp.asarray(pts), jnp.asarray(valid), state,
        range_z=-1.723, ground_slack=0.3)
    assert np.asarray(ng)[is_ground].mean() < 0.1
    assert np.asarray(state2.elev_stats)[:, 0].sum() > 0
