import numpy as np
import jax.numpy as jnp
import pytest

from icpflow_tpu import DEMO
from icpflow_tpu.match.matcher import match_frame_pair, hist_icp, match_eval
from icpflow_tpu.ops.segments import extract_segments

CFG = DEMO.replace(
    max_points_scene=4096, max_points=256, num_clusters=16, max_pairs=32,
    pairs_small=32, pairs_large=4, max_points_small=128,
    min_cluster_size=10, nn_tile=128, hist_grid_xy=64, icp_max_iters=15,
)


def build_scene(rng, clusters, n_cap=4096):
    """clusters: list of (center, n, shift) -> (src pts/labels, dst pts/labels)."""
    src, dst, ls, ld = [], [], [], []
    for lbl, (c, n, shift) in enumerate(clusters):
        pts = np.asarray(c) + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        src.append(pts)
        ls.append(np.full(n, lbl))
        moved = pts + np.asarray(shift, np.float32)
        dst.append(moved + rng.normal(scale=0.01, size=moved.shape))
    src = np.concatenate(src).astype(np.float32)
    dst = np.concatenate(dst).astype(np.float32)
    labels = np.concatenate(ls).astype(np.int32)

    def pad(p, l):
        pp = np.zeros((n_cap, 3), np.float32)
        pp[: len(p)] = p
        vv = np.zeros((n_cap,), bool)
        vv[: len(p)] = True
        ll = np.full((n_cap,), -1, np.int32)
        ll[: len(l)] = l
        return jnp.asarray(pp), jnp.asarray(vv), jnp.asarray(ll)

    return pad(src, labels), pad(dst, labels)


def segs(padded, cfg=CFG):
    p, v, l = padded
    return extract_segments(p, l, v, num_labels=cfg.num_clusters,
                            max_points=cfg.max_points)


def test_stage1_static_self_match():
    rng = np.random.default_rng(0)
    s, d = build_scene(rng, [([0, 0, 0], 100, [0, 0, 0]),
                             ([10, 0, 0], 80, [0.1, 0, 0])])
    res = match_frame_pair(segs(s), segs(d), jnp.float32(4.0), CFG)
    m = np.asarray(res.matched)
    assert m[0] and m[1]
    T = np.asarray(res.transforms)
    np.testing.assert_allclose(T[0, :3, 3], 0, atol=0.05)
    np.testing.assert_allclose(T[1, :3, 3], [0.1, 0, 0], atol=0.05)


def test_stage2_cross_label_match():
    rng = np.random.default_rng(1)
    # same object, but src/dst labelled differently (disjoint -> dynamic)
    pts = rng.uniform(-1, 1, (120, 3)).astype(np.float32)
    shift = np.array([3.0, 0.5, 0.0], np.float32)
    n_cap = 4096

    def pad(p, lbl):
        pp = np.zeros((n_cap, 3), np.float32)
        pp[: len(p)] = p
        vv = np.zeros((n_cap,), bool)
        vv[: len(p)] = True
        ll = np.full((n_cap,), -1, np.int32)
        ll[: len(p)] = lbl
        return jnp.asarray(pp), jnp.asarray(vv), jnp.asarray(ll)

    s = pad(pts, 2)
    d = pad(pts + shift, 5)
    res = match_frame_pair(segs(s), segs(d), jnp.float32(8.0), CFG)
    m = np.asarray(res.matched)
    assert m[2]
    assert int(np.asarray(res.dst_label)[2]) == 5
    np.testing.assert_allclose(np.asarray(res.transforms)[2, :3, 3],
                               shift, atol=0.05)


def test_size_mismatch_rejected_by_sanity():
    rng = np.random.default_rng(2)
    # tiny vs huge cluster with same label: bbox ratio gate must reject
    small = rng.uniform(-0.2, 0.2, (40, 3)).astype(np.float32)
    big = rng.uniform(-8, 8, (200, 3)).astype(np.float32)
    n_cap = 4096

    def pad(p, lbl):
        pp = np.zeros((n_cap, 3), np.float32)
        pp[: len(p)] = p
        vv = np.zeros((n_cap,), bool)
        vv[: len(p)] = True
        ll = np.full((n_cap,), -1, np.int32)
        ll[: len(p)] = lbl
        return jnp.asarray(pp), jnp.asarray(vv), jnp.asarray(ll)

    res = match_frame_pair(segs(pad(small, 0)), segs(pad(big, 0)),
                           jnp.float32(4.0), CFG)
    assert not bool(np.asarray(res.matched)[0])


def test_hist_icp_swap_invariance():
    rng = np.random.default_rng(3)
    # smaller-as-src swap (utils_match.py:138-157): result must map src->dst
    # regardless of which side is bigger
    a = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    shift = np.array([1.0, -0.4, 0.0], np.float32)

    def seg(p, cap=512):
        pp = np.zeros((1, cap, 3), np.float32)
        pp[0, : len(p)] = p
        mm = np.zeros((1, cap), bool)
        mm[0, : len(p)] = True
        return jnp.asarray(pp), jnp.asarray(mm)

    sx, sm = seg(np.concatenate([a, b]))          # src bigger
    dx, dm = seg(np.concatenate([a, b]) + shift)  # dst = src + shift
    T1 = np.asarray(hist_icp(sx, sm, dx, dm, jnp.float32(4.0), CFG))[0]
    np.testing.assert_allclose(T1[:3, 3], shift, atol=0.05)

    # reversed roles: transform should be the inverse shift
    T2 = np.asarray(hist_icp(dx, dm, sx, sm, jnp.float32(4.0), CFG))[0]
    np.testing.assert_allclose(T2[:3, 3], -shift, atol=0.05)


def test_pair_bucket_overflow_reported():
    rng = np.random.default_rng(4)
    cfg = CFG.replace(max_pairs=4, pairs_small=4, pairs_large=2,
                      min_cluster_size=5)
    # many mutually-plausible leftovers -> candidate count exceeds bucket
    clusters = [([3 * i, 0, 0], 30, [0, 0, 0]) for i in range(8)]
    s, d = build_scene(rng, clusters)
    # force stage-2 by giving dst different labels
    p, v, l = d
    d = (p, v, jnp.where(l >= 0, l + 8, l))
    res = match_frame_pair(segs(s, cfg), segs(d, cfg), jnp.float32(50.0), cfg)
    assert int(res.overflow) > 0


def test_long_gap_far_mover():
    # temporal-gap stress (README.md:16 claims usable 0.4 s gaps): a mover
    # 10 m away needs the centroid pre-shift because the residual histogram
    # window is far smaller than translation_frame
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1.5, 1.5, (150, 3)).astype(np.float32)
    shift = np.array([10.0, -7.0, 0.0], np.float32)
    n_cap = 4096

    def pad(p, lbl):
        pp = np.zeros((n_cap, 3), np.float32)
        pp[: len(p)] = p
        vv = np.zeros((n_cap,), bool)
        vv[: len(p)] = True
        ll = np.full((n_cap,), -1, np.int32)
        ll[: len(p)] = lbl
        return jnp.asarray(pp), jnp.asarray(vv), jnp.asarray(ll)

    res = match_frame_pair(segs(pad(pts, 0)), segs(pad(pts + shift, 1)),
                           jnp.float32(26.7), CFG)
    assert bool(np.asarray(res.matched)[0])
    np.testing.assert_allclose(np.asarray(res.transforms)[0, :3, 3],
                               shift, atol=0.05)


def _box_surface_sample(rng, n, center, ext=(4.0, 1.5, 1.5)):
    """Independent LiDAR-like resample of a box's visible surfaces (side +
    top + front), so the two frames share the object but not the points."""
    ex, ey, ez = ext
    areas = np.array([ex * ez, ex * ey, ey * ez])  # side(y=0), top(z=e), front(x=0)
    face = rng.choice(3, size=n, p=areas / areas.sum())
    u = rng.uniform(0, 1, n).astype(np.float32)
    v = rng.uniform(0, 1, n).astype(np.float32)
    pts = np.zeros((n, 3), np.float32)
    pts[face == 0] = np.stack([u[face == 0] * ex,
                               np.zeros((face == 0).sum(), np.float32),
                               v[face == 0] * ez], 1)
    pts[face == 1] = np.stack([u[face == 1] * ex, v[face == 1] * ey,
                               np.full((face == 1).sum(), ez, np.float32)], 1)
    pts[face == 2] = np.stack([np.zeros((face == 2).sum(), np.float32),
                               u[face == 2] * ey, v[face == 2] * ez], 1)
    return pts + np.asarray(center, np.float32)


def test_sparse_far_cluster_needs_adaptive_inlier_radius():
    """A correctly-posed sparse far cluster cannot clear the IoU gate at the
    fixed thres_dist radius (point spacing >> 0.1 m at long range); the
    range-adaptive statistics radius (inlier_scale_per_m) recovers it.
    Regression for the demo fixture's 102-point car at 34 m.

    The gate-physics arm evaluates the statistics AT THE GROUND-TRUTH pose
    (no ICP): on independently resampled sparse surfaces ICP overfits the
    realized samples (it can drive >half the points within 0.1 m of a wrong
    pose at 0.19 m mean spacing), so an end-to-end fixed-radius arm is a
    chaotic coin flip, not a regression signal."""
    rng = np.random.default_rng(7)
    center = [40.0, 0.0, 0.0]
    shift = np.array([1.0, 0.3, 0.0], np.float32)
    # ~110 points over ~14 m^2 of visible surface -> mean NN spacing ~0.18 m:
    # above the fixed 0.1 m radius, at the adaptive radius at 40 m (0.18 m).
    src_pts = _box_surface_sample(rng, 100, center)
    dst_pts = _box_surface_sample(rng, 110, center) + shift
    n_cap = 4096

    def pad(p, lbl):
        pp = np.zeros((n_cap, 3), np.float32)
        pp[: len(p)] = p
        vv = np.zeros((n_cap,), bool)
        vv[: len(p)] = True
        ll = np.full((n_cap,), -1, np.int32)
        ll[: len(p)] = lbl
        return jnp.asarray(pp), jnp.asarray(vv), jnp.asarray(ll)

    # gate physics at the GT pose (the DEMO preset bakes in the adaptive
    # radius; the reference-exact control must zero it explicitly)
    cfg_fixed = CFG.replace(inlier_scale_per_m=0.0)
    sx = jnp.asarray(src_pts)[None]
    dx = jnp.asarray(dst_pts)[None]
    sm = jnp.ones((1, len(src_pts)), bool)
    dm = jnp.ones((1, len(dst_pts)), bool)
    T_gt = jnp.eye(4)[None].at[0, :3, 3].set(jnp.asarray(shift))
    stats_fixed, _, _ = match_eval(sx, sm, dx, dm, T_gt, cfg_fixed)
    iou_fixed = float(np.asarray(stats_fixed)[0, 6:8].min())
    assert iou_fixed < cfg_fixed.thres_iou, iou_fixed

    cfg_ad = CFG.replace(inlier_scale_per_m=0.02)
    stats_ad, _, _ = match_eval(sx, sm, dx, dm, T_gt, cfg_ad)
    iou_ad = float(np.asarray(stats_ad)[0, 6:8].min())
    assert iou_ad >= cfg_ad.thres_iou, iou_ad

    # end-to-end: the adaptive preset matches the cluster and recovers the
    # xy motion; z is only weakly constrained by the sparse top face. A
    # slightly denser cloud keeps the ICP pose itself out of the sparse
    # overfit regime (at 100 pts the matched pose wanders ~0.5 m in y).
    src_e2e = _box_surface_sample(rng, 150, center)
    dst_e2e = _box_surface_sample(rng, 160, center) + shift
    s, d = pad(src_e2e, 0), pad(dst_e2e, 0)
    adapt = match_frame_pair(segs(s, cfg_ad), segs(d, cfg_ad),
                             jnp.float32(4.0), cfg_ad)
    assert bool(np.asarray(adapt.matched)[0])
    np.testing.assert_allclose(np.asarray(adapt.transforms)[0, :2, 3],
                               shift[:2], atol=0.25)
