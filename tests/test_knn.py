import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.knn import masked_nn, masked_nn_error, masked_nn_points


def brute_force(src, dst, dst_mask):
    d = np.linalg.norm(src[:, None, :] - dst[None, :, :], axis=-1)
    d[:, ~dst_mask] = np.inf
    return d.argmin(1), d.min(1)


def test_masked_nn_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, N, M = 3, 100, 333
    src = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    dst = rng.normal(size=(B, M, 3)).astype(np.float32) * 10
    mask = rng.random((B, M)) > 0.3
    mask[:, 0] = True
    idx, dist = masked_nn(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(mask), tile=64)
    for b in range(B):
        ref_i, ref_d = brute_force(src[b], dst[b], mask[b])
        np.testing.assert_allclose(np.asarray(dist)[b], ref_d,
                                   rtol=1e-3, atol=1e-3)
        # indices may differ on exact ties; distances must agree
        picked = np.linalg.norm(src[b] - dst[b][np.asarray(idx)[b]], axis=-1)
        np.testing.assert_allclose(picked, ref_d, rtol=1e-3, atol=1e-3)


def test_masked_nn_all_dst_invalid_is_finite_path():
    src = jnp.zeros((1, 8, 3))
    dst = jnp.ones((1, 8, 3))
    mask = jnp.zeros((1, 8), bool)
    idx, dist = masked_nn(src, dst, mask)
    assert np.asarray(dist).min() > 1e10  # sentinel large
    assert np.asarray(idx).min() >= 0


def test_masked_nn_points_matches_index_form():
    rng = np.random.default_rng(2)
    B, N, M = 3, 100, 257
    src = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    dst = rng.normal(size=(B, M, 3)).astype(np.float32) * 10
    mask = rng.random((B, M)) > 0.3
    mask[:, 0] = True
    idx, dist = masked_nn(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(mask), tile=64)
    pts, dist2 = masked_nn_points(jnp.asarray(src), jnp.asarray(dst),
                                  jnp.asarray(mask), tile=64)
    np.testing.assert_allclose(np.asarray(dist2), np.asarray(dist),
                               rtol=1e-4, atol=1e-4)
    gathered = np.take_along_axis(dst, np.asarray(idx)[:, :, None], axis=1)
    # tie-breaking may differ; the picked point's distance must agree
    d_pts = np.linalg.norm(src - np.asarray(pts), axis=-1)
    d_gth = np.linalg.norm(src - gathered, axis=-1)
    np.testing.assert_allclose(d_pts, d_gth, rtol=1e-4, atol=1e-4)


def test_masked_nn_points_all_invalid_returns_zeros():
    src = jnp.ones((1, 8, 3))
    dst = jnp.ones((1, 8, 3)) * 5
    mask = jnp.zeros((1, 8), bool)
    pts, dist = masked_nn_points(src, dst, mask)
    assert np.asarray(dist).min() > 1e10
    np.testing.assert_allclose(np.asarray(pts), 0.0)


def test_masked_nn_error_means_only_valid_src():
    src = np.zeros((1, 4, 3), np.float32)
    src[0, :2] = [[0, 0, 0], [1, 0, 0]]
    src[0, 2:] = 50.0  # invalid rows, must not contribute
    dst = np.zeros((1, 4, 3), np.float32)
    dst[0, 0] = [0, 0, 0.5]
    src_mask = np.array([[True, True, False, False]])
    dst_mask = np.array([[True, False, False, False]])
    err = masked_nn_error(jnp.asarray(src), jnp.asarray(src_mask),
                          jnp.asarray(dst), jnp.asarray(dst_mask))
    expected = (0.5 + np.sqrt(1 + 0.25)) / 2
    np.testing.assert_allclose(np.asarray(err)[0], expected, rtol=1e-5)
