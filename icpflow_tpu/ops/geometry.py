"""Core masked-batch geometry: rigid transforms, weighted Kabsch/Umeyama, stats.

Semantics mirror the reference's tensor utilities (`utils_helper.py:76-106`,
`utils_icp_pytorch3d.py:233-396`) but are written as pure jnp functions over
masked fixed-shape batches — the static-shape discipline XLA wants.

Conventions
-----------
* Transforms are column-convention homogeneous 4x4: ``x' = T[:3,:3] @ x + T[:3,3]``
  (matches `utils_helper.py:89-93` / `utils_loading.py:21-31`).
* Point batches are ``(B, N, 3)`` with boolean/float validity masks ``(B, N)``.
* Every reduction is mask-weighted with epsilon-guarded denominators so empty
  segments produce finite garbage (masked out downstream) instead of NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def eye4(batch: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), (batch, 4, 4))


def transform_points(xyz: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply one 4x4 to (N,3) points. Ref: utils_helper.py:89-93.

    HIGHEST precision: on TPU a default-precision matmul truncates the
    metre-scale operands to bf16 (~0.4% relative) — the round-5 static-flow
    bug (docs/ROUND5_NOTES.md item 6) was exactly this on the pose path.
    """
    return jnp.matmul(xyz, T[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + T[:3, 3]


def transform_points_batch(xyz: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply (B,4,4) to (B,N,3). Ref: utils_helper.py:76-87. (HIGHEST: see
    transform_points.)"""
    return jnp.einsum("bij,bnj->bni", T[:, :3, :3], xyz,
                      precision=jax.lax.Precision.HIGHEST) \
        + T[:, None, :3, 3]


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack (B,3,3) rotation + (B,3) translation into (B,4,4)."""
    b = R.shape[0]
    top = jnp.concatenate([R, t[:, :, None]], axis=2)
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (b, 1, 4))
    return jnp.concatenate([top, bot], axis=1)


def translation_mat(t: jnp.ndarray) -> jnp.ndarray:
    """(B,3) translations -> (B,4,4) pure-translation transforms."""
    b = t.shape[0]
    T = eye4(b, t.dtype)
    return T.at[:, :3, 3].set(t)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Mask-weighted mean along ``axis``; zero where mask is empty."""
    w = mask.astype(x.dtype)
    num = jnp.sum(x * jnp.expand_dims(w, -1), axis=axis)
    den = jnp.sum(w, axis=axis, keepdims=False)[..., None]
    return num / jnp.maximum(den, _EPS)


def _svd3x3_jacobi(H: jnp.ndarray, sweeps: int = 6):
    """Batched one-sided (Hestenes) Jacobi SVD of (B, 3, 3) matrices.

    ``jnp.linalg.svd`` lowers to a general-purpose factorization whose device
    cost dwarfs the 3x3 problem (measured 1.2 ms for 256 matrices on a v5e —
    more than the ICP NN sweep it feeds). One-sided Jacobi is a handful of
    fully batched vector ops: right-rotate column pairs until all columns are
    mutually orthogonal (W = H V), then the column norms are the singular
    values and the normalized columns are U. Unlike the eigh-of-H^T H route
    it never squares the condition number. 6 unrolled cyclic sweeps drive the
    off-diagonal mass below f32 noise for any 3x3 (quadratic convergence).

    Returns (U, S, V) with H = U diag(S) V^T, S sorted descending.
    U's columns are L2-normalized where S > 0; zero where S == 0.
    """
    W = H
    V = jnp.broadcast_to(jnp.eye(3, dtype=H.dtype), H.shape)

    def rotate(W, V, p, q):
        wp = W[:, :, p]
        wq = W[:, :, q]
        a = jnp.sum(wp * wp, axis=1)
        b = jnp.sum(wq * wq, axis=1)
        c = jnp.sum(wp * wq, axis=1)
        # Jacobi angle: tan(2th) = 2c / (a - b); stable via tau cotangent
        small = jnp.abs(c) <= _EPS * jnp.sqrt(a * b + _EPS)
        tau = (b - a) / (2.0 * jnp.where(small, 1.0, c))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        cs = 1.0 / jnp.sqrt(1.0 + t * t)
        sn = cs * t
        csn = cs[:, None]
        snn = sn[:, None]
        W = W.at[:, :, p].set(csn * wp - snn * wq)
        W = W.at[:, :, q].set(snn * wp + csn * wq)
        vp = V[:, :, p]
        vq = V[:, :, q]
        V = V.at[:, :, p].set(csn * vp - snn * vq)
        V = V.at[:, :, q].set(snn * vp + csn * vq)
        return W, V

    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            W, V = rotate(W, V, p, q)

    S = jnp.sqrt(jnp.sum(W * W, axis=1))                        # (B,3)

    def order(W, V, S, p, q):                                   # S[p] >= S[q]
        swap = S[:, q] > S[:, p]
        sw = swap[:, None]

        def sw2(M):
            mp, mq = M[:, :, p], M[:, :, q]
            return (M.at[:, :, p].set(jnp.where(sw, mq, mp))
                     .at[:, :, q].set(jnp.where(sw, mp, mq)))

        S = (S.at[:, p].set(jnp.where(swap, S[:, q], S[:, p]))
              .at[:, q].set(jnp.where(swap, S[:, p], S[:, q])))
        return sw2(W), sw2(V), S

    for p, q in ((0, 1), (1, 2), (0, 1)):                       # sort network
        W, V, S = order(W, V, S, p, q)
    U = W / jnp.maximum(S, _EPS)[:, None, :]
    return U, S, V


def kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted least-squares rigid alignment ``R @ src + t ~= dst``.

    Batched Umeyama solve with reflection fix, the masked equivalent of
    `utils_icp_pytorch3d.py:233-382` (weighted covariance -> SVD -> det fix)
    expressed in column convention, with the SVD done by the batched 3x3
    Jacobi kernel above. The reflection fix is folded into the factor
    construction: the two leading left columns are re-orthonormalized from
    H V, the third columns of BOTH factors are completed by cross products
    (making each factor a proper rotation), and then R = V U^T equals
    V diag(1, 1, det(V U^T)) U^T of the SVD formulation for every sign case.
    Degenerate inputs (all-zero weights, coincident or collinear points)
    fall back to identity rotation with a centroid-difference translation.

    Args:
      src: (B, N, 3) source points.
      dst: (B, N, 3) corresponding target points.
      weights: (B, N) non-negative weights (typically 0/1 inlier masks).
    Returns:
      R: (B, 3, 3), t: (B, 3).
    """
    w = weights.astype(src.dtype)
    total = jnp.sum(w, axis=1)                                # (B,)
    denom = jnp.maximum(total, _EPS)[:, None]
    mu_s = jnp.sum(src * w[:, :, None], axis=1) / denom        # (B,3)
    mu_d = jnp.sum(dst * w[:, :, None], axis=1) / denom
    cs = (src - mu_s[:, None, :]) * w[:, :, None]
    cd = dst - mu_d[:, None, :]
    # covariance H = sum_i w_i (src_i - mu_s)(dst_i - mu_d)^T, contracted on MXU
    H = jnp.einsum("bni,bnj->bij", cs, cd,
                   precision=jax.lax.Precision.HIGHEST)
    H = H / jnp.maximum(total, _EPS)[:, None, None]

    U, S, V = _svd3x3_jacobi(H)
    # proper-rotation factors: u3 = u1 x u2 and v3 = v1 x v2 flip exactly
    # the reflected third columns, so R = V U^T carries the det fix.
    # Collinear correspondences (S2 ~ 0) leave u2 noise-driven: rebuild it
    # orthonormal to u1, falling back to an arbitrary perpendicular.
    u1 = U[:, :, 0]
    n1 = jnp.linalg.norm(u1, axis=1, keepdims=True)
    u1 = u1 / jnp.maximum(n1, _EPS)
    u2 = U[:, :, 1]
    u2 = u2 - jnp.sum(u2 * u1, axis=1, keepdims=True) * u1
    n2 = jnp.linalg.norm(u2, axis=1, keepdims=True)
    alt = jnp.cross(u1, jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], src.dtype), u1.shape))
    alt2 = jnp.cross(u1, jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], src.dtype), u1.shape))
    alt = jnp.where(
        (jnp.linalg.norm(alt, axis=1) >= jnp.linalg.norm(alt2, axis=1)
         )[:, None], alt, alt2)
    u2 = jnp.where(n2 > 1e-6, u2 / jnp.maximum(n2, _EPS),
                   alt / jnp.maximum(jnp.linalg.norm(alt, axis=1,
                                                     keepdims=True), _EPS))
    u3 = jnp.cross(u1, u2)
    Up = jnp.stack([u1, u2, u3], axis=2)
    v3 = jnp.cross(V[:, :, 0], V[:, :, 1])
    Vp = jnp.concatenate([V[:, :, :2], v3[:, :, None]], axis=2)
    R = jnp.einsum("bij,bkj->bik", Vp, Up,                     # V @ U^T
                   precision=jax.lax.Precision.HIGHEST)

    degenerate = ((total < 1.0) | ~jnp.isfinite(S).all(axis=1)
                  | (S[:, 0] <= 1e-12) | (n1[:, 0] <= 1e-6))
    R = jnp.where(degenerate[:, None, None], jnp.eye(3, dtype=src.dtype), R)
    t = mu_d - jnp.einsum("bij,bj->bi", R, mu_s,
                          precision=jax.lax.Precision.HIGHEST)
    t = jnp.where(jnp.isfinite(t), t, 0.0)
    return R, t


def euler_zyx_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (B,3,3) -> intrinsic ZYX Euler angles in degrees.

    Matches pytorch3d's ``matrix_to_euler_angles(..., 'ZYX')`` used by the
    reference's match gate (`utils_match.py:184`): returns (yaw_z, pitch_y,
    roll_x); indices 1:2 are the roll/pitch checked in `utils_check.py:63`.
    """
    # R = Rz(a) @ Ry(b) @ Rx(c)
    sy = -R[:, 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    b = jnp.arcsin(sy)
    a = jnp.arctan2(R[:, 1, 0], R[:, 0, 0])
    c = jnp.arctan2(R[:, 2, 1], R[:, 2, 2])
    return jnp.stack([a, b, c], axis=1) * (180.0 / jnp.pi)


def bbox_extent_sorted(xyz: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sorted axis-aligned bbox side lengths per segment.

    Ref: `utils_helper.py:166-170` (get_bbox_tensor returns sorted [x,y,z]).
    Args: xyz (B,N,3), mask (B,N). Returns (B,3) ascending extents.
    """
    big = jnp.asarray(1e9, xyz.dtype)
    m = mask[:, :, None]
    hi = jnp.max(jnp.where(m, xyz, -big), axis=1)
    lo = jnp.min(jnp.where(m, xyz, big), axis=1)
    ext = jnp.maximum(hi - lo, 0.0)
    return jnp.sort(ext, axis=1)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B,4,4) @ (B,4,4): apply ``b`` first, then ``a``."""
    return jnp.einsum("bij,bjk->bik", a, b,
                      precision=jax.lax.Precision.HIGHEST)


def invert_rigid(T: jnp.ndarray) -> jnp.ndarray:
    """Invert (B,4,4) rigid transforms without a linear solve."""
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    Rt = jnp.swapaxes(R, 1, 2)
    ti = -jnp.einsum("bij,bj->bi", Rt, t,
                     precision=jax.lax.Precision.HIGHEST)
    return rt_to_mat(Rt, ti)
