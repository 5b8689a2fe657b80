import numpy as np
import jax.numpy as jnp
import pytest

from icpflow_tpu.ops import geometry as geo


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def test_transform_roundtrip():
    rng = np.random.default_rng(0)
    R = random_rotation(rng)
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    pts = rng.normal(size=(100, 3))
    out = np.asarray(geo.transform_points(jnp.asarray(pts), jnp.asarray(T)))
    np.testing.assert_allclose(out, pts @ R.T + t, rtol=1e-5, atol=1e-5)

    Ti = np.asarray(geo.invert_rigid(jnp.asarray(T)[None]))[0]
    np.testing.assert_allclose(Ti @ T, np.eye(4), atol=1e-5)


def test_kabsch_recovers_known_transform():
    rng = np.random.default_rng(1)
    B, N = 4, 200
    src = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    Rs, ts = [], []
    dst = np.zeros_like(src)
    for b in range(B):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        dst[b] = src[b] @ R.T + t
        Rs.append(R)
        ts.append(t)
    w = np.ones((B, N), np.float32)
    # knock out some correspondences with garbage; weights must ignore them
    dst[:, :20] = 1e3
    w[:, :20] = 0.0
    R_est, t_est = geo.kabsch(jnp.asarray(src), jnp.asarray(dst),
                              jnp.asarray(w))
    for b in range(B):
        np.testing.assert_allclose(np.asarray(R_est)[b], Rs[b], atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_est)[b], ts[b], atol=1e-3)
        assert np.linalg.det(np.asarray(R_est)[b]) == pytest.approx(1.0, abs=1e-4)


def test_svd3x3_jacobi_reconstructs():
    rng = np.random.default_rng(3)
    H = rng.normal(size=(64, 3, 3)).astype(np.float32)
    # include near-degenerate members: rank-1, rank-2, scaled reflections
    H[0] = np.outer([1, 2, 3], [0.5, -1, 2])
    H[1] = np.diag([1.0, 1e-7, 0.0])
    H[2] = -np.eye(3)  # pure reflection
    U, S, V = (np.asarray(x) for x in geo._svd3x3_jacobi(jnp.asarray(H)))
    # singular values match LAPACK, sorted descending
    S_ref = np.linalg.svd(H, compute_uv=False)
    np.testing.assert_allclose(S, S_ref, rtol=1e-4, atol=1e-5)
    assert (np.diff(S, axis=1) <= 1e-5).all()
    # reconstruction H = U diag(S) V^T
    rec = np.einsum("bij,bj,bkj->bik", U, S, V)
    np.testing.assert_allclose(rec, H, rtol=1e-4, atol=1e-4)
    # V orthogonal everywhere; U columns orthonormal where S is nonzero
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", V, V), np.broadcast_to(np.eye(3), V.shape),
        atol=1e-4)


def test_kabsch_rank_deficient_correspondences():
    """Planar and collinear correspondence sets must still yield a proper
    rotation mapping src onto dst (the reflection-fix cases SVD handles via
    diag(1,1,det); the Jacobi path must match)."""
    rng = np.random.default_rng(4)
    N = 64
    R_true = random_rotation(rng)
    t_true = rng.normal(size=3)
    # planar cloud (z=0) and collinear cloud (x axis)
    planar = rng.normal(size=(N, 3)).astype(np.float32)
    planar[:, 2] = 0.0
    collinear = np.zeros((N, 3), np.float32)
    collinear[:, 0] = rng.normal(size=N)
    src = np.stack([planar, collinear])
    dst = np.einsum("ij,bnj->bni", R_true, src) + t_true
    w = np.ones((2, N), np.float32)
    R, t = (np.asarray(x) for x in
            geo.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    for b in range(2):
        assert np.linalg.det(R[b]) == pytest.approx(1.0, abs=1e-4)
        moved = src[b] @ R[b].T + t[b]
        # the pose itself is ambiguous for rank-deficient sets; the mapped
        # points must still land on dst
        np.testing.assert_allclose(moved, np.asarray(dst)[b],
                                   rtol=1e-3, atol=1e-3)


def test_kabsch_degenerate_inputs_are_finite():
    B, N = 2, 16
    src = jnp.zeros((B, N, 3))
    dst = jnp.zeros((B, N, 3))
    w = jnp.zeros((B, N))
    R, t = geo.kabsch(src, dst, w)
    assert np.isfinite(np.asarray(R)).all()
    assert np.isfinite(np.asarray(t)).all()
    np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)


def test_euler_zyx_matches_scipy_convention():
    rng = np.random.default_rng(2)
    # R = Rz(a) Ry(b) Rx(c)
    a, b, c = 0.4, -0.2, 0.7

    def rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0],
                         [np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def ry(t):
        return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                         [-np.sin(t), 0, np.cos(t)]])

    def rx(t):
        return np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)],
                         [0, np.sin(t), np.cos(t)]])

    R = rz(a) @ ry(b) @ rx(c)
    ang = np.asarray(geo.euler_zyx_deg(jnp.asarray(R)[None]))[0]
    np.testing.assert_allclose(
        ang, np.degrees([a, b, c]), atol=1e-4)


def test_bbox_extent_sorted_masked():
    pts = jnp.asarray(np.array([[[0, 0, 0], [2, 1, 0.5], [100, 100, 100]]],
                               np.float32))
    mask = jnp.asarray(np.array([[True, True, False]]))
    ext = np.asarray(geo.bbox_extent_sorted(pts, mask))[0]
    np.testing.assert_allclose(ext, [0.5, 1.0, 2.0], atol=1e-6)
