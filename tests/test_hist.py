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
