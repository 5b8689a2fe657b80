import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.hist import estimate_init_translation


def make_pair(rng, n, shift, noise=0.0, extra_src=0):
    """Shifted-cloud pair: dst = src + shift (the hist kernel smoke-test
    scenario from hist_cuda/test.py:19-63, promoted to an asserted test)."""
    src = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    src[:, 2] *= 0.1
    dst = src + np.asarray(shift, np.float32)
    if noise:
        dst = dst + rng.normal(scale=noise, size=dst.shape).astype(np.float32)
    if extra_src:
        extra = rng.uniform(-4, 4, size=(extra_src, 3)).astype(np.float32)
        src = np.concatenate([src, extra], 0)
    return src, dst


def pad(cloud, p):
    out = np.zeros((p, 3), np.float32)
    out[:len(cloud)] = cloud
    mask = np.zeros((p,), bool)
    mask[:len(cloud)] = True
    return out, mask


def test_recovers_known_translation():
    rng = np.random.default_rng(0)
    P = 512
    shifts = [(2.0, -1.5, 0.0), (0.0, 0.0, 0.0), (-3.0, 2.5, 0.05)]
    srcs, dsts, sm, dm = [], [], [], []
    for s in shifts:
        a, b = make_pair(rng, 400, s, noise=0.01)
        pa, ma = pad(a, P)
        pb, mb = pad(b, P)
        srcs.append(pa); dsts.append(pb); sm.append(ma); dm.append(mb)
    T = estimate_init_translation(
        jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(sm)),
        jnp.asarray(np.stack(dsts)), jnp.asarray(np.stack(dm)),
        jnp.float32(8.0), lxy=128, lz=8, eval_tile=128)
    t = np.asarray(T)[:, :3, 3]
    for k, s in enumerate(shifts):
        np.testing.assert_allclose(t[k], s, atol=0.15)


def test_large_offset_beyond_wrap_uses_centroid_preshift():
    # centroid pre-shift must handle shifts far larger than the wrap window
    rng = np.random.default_rng(1)
    a, b = make_pair(rng, 300, (25.0, -18.0, 0.0), noise=0.01)
    pa, ma = pad(a, 512)
    pb, mb = pad(b, 512)
    T = estimate_init_translation(
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.asarray(pb)[None], jnp.asarray(mb)[None],
        jnp.float32(40.0), lxy=128, lz=8, eval_tile=128)
    np.testing.assert_allclose(np.asarray(T)[0, :3, 3], (25.0, -18.0, 0.0),
                               atol=0.15)


def test_zero_candidate_wins_for_identical_clouds():
    rng = np.random.default_rng(2)
    a, _ = make_pair(rng, 300, (0, 0, 0))
    pa, ma = pad(a, 512)
    T = estimate_init_translation(
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.float32(4.0), lxy=128, lz=8, eval_tile=128)
    np.testing.assert_allclose(np.asarray(T)[0, :3, 3], 0.0, atol=0.05)


def test_empty_pair_is_finite():
    z = jnp.zeros((1, 64, 3))
    m = jnp.zeros((1, 64), bool)
    T = estimate_init_translation(z, m, z, m, jnp.float32(4.0),
                                  lxy=64, lz=8, eval_tile=64)
    assert np.isfinite(np.asarray(T)).all()


def test_wall_larger_than_wrap_period():
    """A structure larger than the wrap period (L*bin = 12.8 m at lxy=128):
    wrapped self-structure aliases into background noise but the true shift
    must still win (module docstring claim)."""
    rng = np.random.default_rng(3)
    n = 3000
    wall = np.stack([
        rng.uniform(-20, 20, n),            # 40 m long >> wrap period
        rng.normal(scale=0.05, size=n),
        rng.uniform(-1, 2, n)], 1).astype(np.float32)
    shift = (1.3, 0.4, 0.0)
    pa, ma = pad(wall, 4096)
    pb, mb = pad(wall + np.asarray(shift, np.float32), 4096)
    T = estimate_init_translation(
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.asarray(pb)[None], jnp.asarray(mb)[None],
        jnp.float32(4.0), lxy=128, lz=8, eval_tile=256)
    np.testing.assert_allclose(np.asarray(T)[0, :3, 3], shift, atol=0.15)


def test_vertical_shift_beyond_reference_band():
    """dz beyond the reference's fixed +-0.1 m z band: the all-axes centroid
    pre-shift must still recover it (long-gap fix)."""
    rng = np.random.default_rng(4)
    a, b = make_pair(rng, 400, (2.0, -1.0, 0.45), noise=0.01)
    pa, ma = pad(a, 512)
    pb, mb = pad(b, 512)
    T = estimate_init_translation(
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.asarray(pb)[None], jnp.asarray(mb)[None],
        jnp.float32(8.0), lxy=128, lz=8, eval_tile=128)
    np.testing.assert_allclose(np.asarray(T)[0, :3, 3], (2.0, -1.0, 0.45),
                               atol=0.15)


def _box(rng, n=600):
    """Car-like box surface: thin geometry where yaw matters."""
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    pts[:, 0] *= 2.2   # length
    pts[:, 1] = np.sign(pts[:, 1]) * 0.9 + 0.03 * pts[:, 1]  # two sides
    pts[:, 2] *= 0.7
    return pts


def test_yaw_sweep_recovers_rotating_mover():
    """Long-gap rotating mover: translation + 0.28 rad yaw. The yaw sweep
    must pick a nonzero hypothesis near the truth."""
    rng = np.random.default_rng(7)
    src = _box(rng)
    yaw = 0.28
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([6.0, -2.0, 0.0], np.float32)
    dst = src @ R.T + t + rng.normal(scale=0.01, size=src.shape
                                     ).astype(np.float32)
    pa, ma = pad(src, 1024)
    pb, mb = pad(dst, 1024)
    T = estimate_init_translation(
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.asarray(pb)[None], jnp.asarray(mb)[None],
        jnp.float32(16.0), lxy=128, lz=8, eval_tile=128,
        yaws=(0.0, -0.3, -0.15, 0.15, 0.3))
    got_R = np.asarray(T)[0, :3, :3]
    got_yaw = np.arctan2(got_R[1, 0], got_R[0, 0])
    assert abs(got_yaw - yaw) < 0.1, got_yaw
    # translated+rotated src must land near dst (centroid-level check)
    moved = src @ got_R.T + np.asarray(T)[0, :3, 3]
    assert np.linalg.norm(moved.mean(0) - dst.mean(0)) < 0.2


def test_yaw_sweep_keeps_identity_for_pure_translation():
    """The 5% margin: a purely translated cloud must not pick up yaw."""
    rng = np.random.default_rng(8)
    a, b = make_pair(rng, 400, (3.0, 1.0, 0.0), noise=0.01)
    pa, ma = pad(a, 512)
    pb, mb = pad(b, 512)
    T = estimate_init_translation(
        jnp.asarray(pa)[None], jnp.asarray(ma)[None],
        jnp.asarray(pb)[None], jnp.asarray(mb)[None],
        jnp.float32(8.0), lxy=128, lz=8, eval_tile=128,
        yaws=(0.0, -0.3, -0.15, 0.15, 0.3))
    got_R = np.asarray(T)[0, :3, :3]
    np.testing.assert_allclose(got_R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T)[0, :3, 3], (3.0, 1.0, 0.0),
                               atol=0.15)
