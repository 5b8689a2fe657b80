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
    """Apply one 4x4 to (N,3) points. Ref: utils_helper.py:89-93."""
    return xyz @ T[:3, :3].T + T[:3, 3]


def transform_points_batch(xyz: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply (B,4,4) to (B,N,3). Ref: utils_helper.py:76-87."""
    return jnp.einsum("bij,bnj->bni", T[:, :3, :3], xyz) + T[:, None, :3, 3]


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


def kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted least-squares rigid alignment ``R @ src + t ~= dst``.

    Batched Umeyama solve with reflection fix, the masked equivalent of
    `utils_icp_pytorch3d.py:233-382` (weighted covariance -> SVD -> det fix)
    expressed in column convention. Degenerate inputs (all-zero weights or
    rank-deficient covariance) fall back to identity rotation with a pure
    centroid-difference translation.

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

    U, S, Vt = jnp.linalg.svd(H)
    # reflection fix: R = V diag(1,1,det(V U^T)) U^T  (column convention)
    det = jnp.linalg.det(jnp.einsum("bji,bkj->bik", Vt, U))     # det(V @ U^T)
    D = jnp.zeros_like(H).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    D = D.at[:, 2, 2].set(det)
    R = jnp.einsum("bji,bjk,blk->bil", Vt, D, U)               # V @ D @ U^T

    degenerate = (total < 1.0) | ~jnp.isfinite(S).all(axis=1)
    R = jnp.where(degenerate[:, None, None], jnp.eye(3, dtype=src.dtype), R)
    t = mu_d - jnp.einsum("bij,bj->bi", R, mu_s)
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
    return jnp.einsum("bij,bjk->bik", a, b)


def invert_rigid(T: jnp.ndarray) -> jnp.ndarray:
    """Invert (B,4,4) rigid transforms without a linear solve."""
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    Rt = jnp.swapaxes(R, 1, 2)
    ti = -jnp.einsum("bij,bj->bi", Rt, t)
    return rt_to_mat(Rt, ti)
