import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.icp import apply_icp, icp_core
from icpflow_tpu.ops import geometry as geo


def rot_z(deg):
    t = np.radians(deg)
    return np.array([[np.cos(t), -np.sin(t), 0],
                     [np.sin(t), np.cos(t), 0],
                     [0, 0, 1]], np.float32)


def make_case(rng, n, R, t, p):
    src = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    dst = src @ R.T + t
    out_s = np.zeros((p, 3), np.float32)
    out_d = np.zeros((p, 3), np.float32)
    out_s[:n] = src
    out_d[:n] = dst
    m = np.zeros((p,), bool)
    m[:n] = True
    return out_s, out_d, m


def test_icp_core_recovers_small_transform():
    rng = np.random.default_rng(0)
    R = rot_z(4.0)
    t = np.array([0.05, -0.04, 0.01], np.float32)
    s, d, m = make_case(rng, 400, R, t, 512)
    T = icp_core(jnp.asarray(s)[None], jnp.asarray(m)[None],
                 jnp.asarray(d)[None], jnp.asarray(m)[None],
                 thres=0.3, tile=128)
    T = np.asarray(T)[0]
    np.testing.assert_allclose(T[:3, :3], R, atol=2e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=2e-2)


def test_apply_icp_with_init_handles_large_translation():
    rng = np.random.default_rng(1)
    R = rot_z(3.0)
    t = np.array([3.0, -2.0, 0.0], np.float32)
    s, d, m = make_case(rng, 400, R, t, 512)
    init = np.eye(4, dtype=np.float32)[None].copy()
    init[0, :3, 3] = [3.0, -2.0, 0.0]  # histogram-style translation init
    T = apply_icp(jnp.asarray(s)[None], jnp.asarray(m)[None],
                  jnp.asarray(d)[None], jnp.asarray(m)[None],
                  jnp.asarray(init), thres=0.3, tile=128)
    T = np.asarray(T)[0]
    moved = s[m] @ T[:3, :3].T + T[:3, 3]
    err = np.linalg.norm(moved - d[m], axis=1).mean()
    assert err < 0.02


def test_apply_icp_rollback_when_icp_cannot_improve():
    # src/dst have no overlap within threshold: ICP finds no inliers and must
    # return the init pose unchanged (utils_icp.py:26-35 rollback).
    rng = np.random.default_rng(2)
    s = rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32)
    d = s + 100.0
    m = jnp.ones((1, 64), bool)
    init = jnp.eye(4)[None]
    T = apply_icp(jnp.asarray(s), m, jnp.asarray(d), m, init,
                  thres=0.1, tile=64)
    np.testing.assert_allclose(np.asarray(T)[0], np.eye(4), atol=1e-5)


def test_batched_mixed_difficulty():
    rng = np.random.default_rng(3)
    cases = [
        (rot_z(2.0), np.array([0.1, 0.0, 0.0], np.float32)),
        (np.eye(3, dtype=np.float32), np.array([0.0, 0.2, 0.0], np.float32)),
    ]
    ss, ds, ms = [], [], []
    for R, t in cases:
        s, d, m = make_case(rng, 300, R, t, 384)
        ss.append(s); ds.append(d); ms.append(m)
    T = icp_core(jnp.asarray(np.stack(ss)), jnp.asarray(np.stack(ms)),
                 jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(ms)),
                 thres=0.5, tile=128)
    for k, (R, t) in enumerate(cases):
        Tk = np.asarray(T)[k]
        moved = ss[k][ms[k]] @ Tk[:3, :3].T + Tk[:3, 3]
        err = np.linalg.norm(moved - ds[k][ms[k]], axis=1).mean()
        assert err < 0.02, (k, err)


def test_icp_corr_cap_matches_full_resolution_pose():
    # Kabsch from strided correspondences recovers the same transform as
    # the full set to O(1/sqrt(k)) (ops/icp.py corr_cap)
    rng = np.random.default_rng(3)
    R = rot_z(3.0)
    t = np.array([0.06, -0.03, 0.02], np.float32)
    s, d, m = make_case(rng, 2000, R, t, 2048)
    kw = dict(thres=0.3, tile=256)
    T_full = np.asarray(icp_core(
        jnp.asarray(s)[None], jnp.asarray(m)[None],
        jnp.asarray(d)[None], jnp.asarray(m)[None], **kw))[0]
    T_cap = np.asarray(icp_core(
        jnp.asarray(s)[None], jnp.asarray(m)[None],
        jnp.asarray(d)[None], jnp.asarray(m)[None], corr_cap=256, **kw))[0]
    np.testing.assert_allclose(T_cap[:3, :3], T_full[:3, :3], atol=3e-3)
    np.testing.assert_allclose(T_cap[:3, 3], T_full[:3, 3], atol=2e-2)


def test_apply_icp_relative_margin_rolls_back_marginal_gains():
    # a pair where ICP cannot improve on a perfect init: with a relative
    # margin the init must win; without, either pose is acceptable but the
    # returned pose must still align src onto dst
    rng = np.random.default_rng(4)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, 0.0, 0.0], np.float32)
    s, d, m = make_case(rng, 400, R, t, 512)
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = t  # exact init
    T = np.asarray(apply_icp(
        jnp.asarray(s)[None], jnp.asarray(m)[None],
        jnp.asarray(d)[None], jnp.asarray(m)[None],
        jnp.asarray(init)[None], thres=0.3, tile=128,
        init_margin_rel=0.02))[0]
    np.testing.assert_allclose(T, init, atol=1e-5)


def test_icp_latch_early_exit_same_pose_as_full_run():
    # converged pairs exit the while_loop early via the per-pair latch and
    # must land on the same pose as an effectively-unbounded run
    rng = np.random.default_rng(5)
    R = rot_z(2.0)
    t = np.array([0.03, 0.02, -0.01], np.float32)
    s, d, m = make_case(rng, 300, R, t, 512)
    args = (jnp.asarray(s)[None], jnp.asarray(m)[None],
            jnp.asarray(d)[None], jnp.asarray(m)[None])
    T_latch = np.asarray(icp_core(*args, thres=0.3, tile=128, patience=5))[0]
    T_long = np.asarray(icp_core(*args, thres=0.3, tile=128,
                                 patience=10000))[0]
    np.testing.assert_allclose(T_latch, T_long, atol=1e-5)


def test_icp_shrink_tail_compaction_is_bit_identical():
    # tail compaction (icp_core shrink=...) is a scheduling change only:
    # every body kernel treats batch rows independently, so the compacted
    # loop must reproduce the uncompacted poses BIT-exactly — including
    # pairs of mixed difficulty that freeze at very different iterations
    rng = np.random.default_rng(6)
    B, N = 8, 256
    srcs, dsts, msks = [], [], []
    for i in range(B):
        R = rot_z(1.0 + 5.0 * (i % 3))
        t = np.array([0.05 * i, -0.02 * i, 0.01], np.float32)
        s, d, m = make_case(rng, 150 + 12 * i, R, t, N)
        srcs.append(s); dsts.append(d); msks.append(m)
    args = (jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(msks)),
            jnp.asarray(np.stack(dsts)), jnp.asarray(np.stack(msks)))
    kw = dict(thres=0.3, tile=128, patience=5)
    T_plain = np.asarray(icp_core(*args, shrink=0, **kw))
    T_shrunk = np.asarray(icp_core(*args, shrink=4, **kw))
    np.testing.assert_array_equal(T_plain, T_shrunk)


def test_icp_no_valid_dst_stays_identity():
    # all-dst-invalid pairs must not "match" the zero-filled nn partners
    # (their sweep distances are ~1e15, outside every inlier gate)
    rng = np.random.default_rng(6)
    s = rng.uniform(-0.05, 0.05, size=(1, 64, 3)).astype(np.float32)
    d = np.zeros((1, 64, 3), np.float32)
    ms = np.ones((1, 64), bool)
    md = np.zeros((1, 64), bool)
    T = np.asarray(icp_core(jnp.asarray(s), jnp.asarray(ms),
                            jnp.asarray(d), jnp.asarray(md),
                            thres=0.3, tile=64, max_iters=8))[0]
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_icp_coarse_off_is_bit_identical_to_disabled():
    # coarse_iters > 0 with coarse_on=False must follow the exact
    # single-radius trajectory of coarse_iters=0 (the traced gate is what
    # keeps small-gap accuracy pinning intact).
    rng = np.random.default_rng(7)
    R = rot_z(4.0)
    t = np.array([0.05, -0.04, 0.01], np.float32)
    s, d, m = make_case(rng, 400, R, t, 512)
    args = (jnp.asarray(s)[None], jnp.asarray(m)[None],
            jnp.asarray(d)[None], jnp.asarray(m)[None])
    T0 = np.asarray(icp_core(*args, thres=0.3, tile=128))
    T_off = np.asarray(icp_core(*args, jnp.bool_(False), thres=0.3, tile=128,
                                coarse_iters=6, coarse_scale=3.0))
    np.testing.assert_array_equal(T0, T_off)


def test_icp_coarse_recovers_offset_beyond_strict_gate():
    # init lands ~3x the inlier radius off: the strict gate sheds every true
    # correspondence and ICP stalls; the coarse phase must pull it in.
    rng = np.random.default_rng(8)
    src = rng.uniform(-2, 2, size=(600, 3)).astype(np.float32)
    t_true = np.array([0.26, -0.19, 0.0], np.float32)
    dst = src + t_true
    p = 1024
    s = np.zeros((p, 3), np.float32); s[:600] = src
    d = np.zeros((p, 3), np.float32); d[:600] = dst
    m = np.zeros((p,), bool); m[:600] = True
    args = (jnp.asarray(s)[None], jnp.asarray(m)[None],
            jnp.asarray(d)[None], jnp.asarray(m)[None])
    thres = 0.1
    T_plain = np.asarray(icp_core(*args, thres=thres, tile=256))[0]
    T_coarse = np.asarray(icp_core(
        *args, jnp.bool_(True), thres=thres, tile=256,
        coarse_iters=6, coarse_scale=3.0))[0]
    err_plain = np.linalg.norm(T_plain[:3, 3] - t_true)
    err_coarse = np.linalg.norm(T_coarse[:3, 3] - t_true)
    assert err_coarse < 0.02, err_coarse
    assert err_coarse < err_plain  # plain ICP cannot close a 0.3 m offset
