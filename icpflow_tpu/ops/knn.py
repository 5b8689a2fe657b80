"""Masked batched nearest-neighbor search.

Replaces pytorch3d ``knn_points`` (used at `utils_helper.py:20-30` and inside
the reference ICP loop `utils_icp_pytorch3d.py:153-156`) with an MXU-friendly
formulation: squared distances expand to ``|x|^2 - 2<x,y> + |y|^2`` where the
cross term is a large batched matmul. The dst axis is tiled with ``lax.scan``
so the full (B, N, M) distance matrix is never materialised — peak memory is
(B, N, tile).

Precision note: coordinates are metre-scale (|x| up to ~100 m) and the ICP
inlier gate is 0.1 m, so the cross term runs at HIGHEST matmul precision
(3-pass bf16 == ~fp32 on the MXU). Callers should pre-center clouds when
possible to keep the dynamic range small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30  # plain float: a jnp constant here would init the backend at import


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def masked_nn(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: jnp.ndarray,
    tile: int = 2048,
    exact: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point, index and euclidean distance of nearest valid dst.

    ``exact`` forces the scan-tiled path with ELEMENTWISE squared distances
    (no matmul-form cancellation; see _masked_nn_xla) — used by the ego
    odometry, whose registration accuracy sits at the cancellation noise
    floor. Default keeps the MXU/Pallas forms the matcher guardrails are
    pinned on.

    Dispatches to the fused Pallas kernel on TPU backends (VMEM-resident
    distance blocks, see `ops/pallas/nn_kernel.py`); the scan-tiled XLA path
    is the portable fallback used on CPU (tests, virtual meshes).

    Args:
      src: (B, N, 3) query points (invalid rows allowed; mask downstream).
      dst: (B, M, 3) reference points.
      dst_mask: (B, M) validity of reference points.
      tile: dst tile size for the scan fallback.
    Returns:
      idx: (B, N) int32 argmin over valid dst (0 if none valid).
      dist: (B, N) euclidean distance (sqrt of min squared distance).
    """
    m = dst.shape[1]
    n = src.shape[1]
    if exact:
        return _masked_nn_xla(src, dst, dst_mask, tile=tile, exact=True)
    # VMEM guard: the kernel keeps the whole dst row resident per batch;
    # very large dst (e.g. the ego odometry map buffer) stays on the XLA path.
    if jax.default_backend() == "tpu" and 128 <= m <= 8192:
        import os
        from .pallas.nn_kernel import masked_nn_pallas
        rup = lambda v: -(-v // 128) * 128
        return masked_nn_pallas(
            src, dst, dst_mask,
            tn=min(1024, rup(n)), tm=min(1024, rup(m)),
            variant=_pick_variant(m))
    return _masked_nn_xla(src, dst, dst_mask, tile=tile)


def _pick_variant(m: int) -> str:
    """Kernel-variant policy (override: ICPFLOW_NN_VARIANT=mxu|vpu|vpu2).

    "auto" (default) picks by dst size from the round-5 on-chip shootout
    (scripts/profile_nn.py, 3-repeat medians): the elementwise "vpu" kernel
    wins ~2x at large dst (2.37 vs 4.56 ms at 32x4096x4096; 0.60 vs 1.18 at
    32x1024x4096) because the "mxu" form pads its K=3 contraction to 128
    (42x redundant MXU work), while at small buckets (<=1024 dst) one dst
    tile per grid cell leaves the VPU variants paying per-cell setup that
    the otherwise-idle MXU absorbs (mxu 1.00 vs vpu 1.25 ms at 256x512x512).

    Numerics note: "vpu" computes exact elementwise differences (tighter
    than the |x|^2-2xy+|y|^2 form at metre scale). Round 3 saw one
    knife-edge mover flip under all-vpu (+0.03 dyn EPE); re-validated in
    round 5 on the current pipeline the full demo guardrail set is
    IDENTICAL under all-vpu (EPE 0.00401/dyn 0.03834/ACC3DS 0.99169,
    matched 39) and gap-4x improves 0.0254 -> 0.0228, so the large-bucket
    switch is safe. The small-bucket side keeps mxu — both for speed and to
    leave the pinned small-pair basins untouched.
    """
    import os
    v = os.environ.get("ICPFLOW_NN_VARIANT", "auto")
    if v != "auto":
        return v
    return "vpu" if m >= 2048 else "mxu"


def masked_nn_points(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: jnp.ndarray,
    tile: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point: coordinates and distance of nearest valid dst.

    The ICP loop form of ``masked_nn``: returns the matched POINTS instead
    of indices, so no per-point gather follows the sweep (on TPU the
    selection happens in-register inside the Pallas kernel; the XLA
    fallback gathers).

    Returns:
      pts: (B, N, 3) nearest valid dst coordinates (zeros if none valid).
      dist: (B, N) euclidean distance (~1e15 where no dst is valid).
    """
    m = dst.shape[1]
    n = src.shape[1]
    if jax.default_backend() == "tpu" and 128 <= m <= 8192:
        from .pallas.nn_kernel import masked_nn_points_pallas
        rup = lambda v: -(-v // 128) * 128
        return masked_nn_points_pallas(
            src, dst, dst_mask,
            tn=min(1024, rup(n)), tm=min(1024, rup(m)),
            variant=_pick_variant(m))
    idx, dist = _masked_nn_xla(src, dst, dst_mask, tile=tile)
    pts = jnp.take_along_axis(dst, idx[:, :, None], axis=1)
    no_valid = ~jnp.any(dst_mask, axis=1)
    pts = jnp.where(no_valid[:, None, None], 0.0, pts)
    return pts, dist


@functools.partial(jax.jit, static_argnames=("tile", "exact"))
def _masked_nn_xla(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: jnp.ndarray,
    tile: int = 2048,
    exact: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, n, _ = src.shape
    m = dst.shape[1]
    dst_p = _pad_to_multiple(dst, tile, 1, 0.0)
    mask_p = _pad_to_multiple(dst_mask.astype(bool), tile, 1, False)
    mp = dst_p.shape[1]
    n_tiles = mp // tile

    dst_t = dst_p.reshape(b, n_tiles, tile, 3).transpose(1, 0, 2, 3)
    mask_t = mask_p.reshape(b, n_tiles, tile).transpose(1, 0, 2)

    src_sq = jnp.sum(src * src, axis=-1)                       # (B, N)

    def step(carry, inp):
        best_d, best_i, t0 = carry
        d_tile, m_tile = inp                                   # (B,tile,3),(B,tile)
        if exact:
            # elementwise squared distances: the matmul form below loses
            # ~1e-3 absolute in d^2 to cancellation at +-60 m coordinates
            # (||a||^2 and ||b||^2 are ~4e3 while d^2 is ~1e-2), which is
            # comparable to candidate separations on dense surfaces — the
            # resulting NN flips land robust-IRLS registration in different
            # (backend-dependent) basins. 3x the FLOPs, no MXU, exact to
            # f32 rounding of the difference — required by the odometry
            # path (ops/ego.py), whose mm-level pose accuracy sits exactly
            # at that noise floor.
            diff = src[:, :, None, :] - d_tile[:, None, :, :]
            d_sq = jnp.sum(diff * diff, axis=-1)
        else:
            cross = jnp.einsum("bnd,bmd->bnm", src, d_tile,
                               precision=jax.lax.Precision.HIGHEST)
            d_sq = (src_sq[:, :, None]
                    - 2.0 * cross
                    + jnp.sum(d_tile * d_tile, axis=-1)[:, None, :])
        d_sq = jnp.where(m_tile[:, None, :], d_sq, _BIG)
        tile_min = jnp.min(d_sq, axis=2)
        tile_arg = jnp.argmin(d_sq, axis=2).astype(jnp.int32) + t0
        take = tile_min < best_d
        best_d = jnp.where(take, tile_min, best_d)
        best_i = jnp.where(take, tile_arg, best_i)
        return (best_d, best_i, t0 + tile), None

    init = (jnp.full((b, n), _BIG, src.dtype),
            jnp.zeros((b, n), jnp.int32),
            jnp.int32(0))
    (best_d, best_i, _), _ = jax.lax.scan(step, init, (dst_t, mask_t))
    best_i = jnp.minimum(best_i, m - 1)
    return best_i, jnp.sqrt(jnp.maximum(best_d, 0.0))


def masked_nn_error(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: jnp.ndarray,
    tile: int = 2048,
) -> jnp.ndarray:
    """Mean NN distance of valid src points into valid dst. Returns (B,)."""
    _, d = masked_nn(src, dst, dst_mask, tile=tile)
    w = src_mask.astype(d.dtype)
    return jnp.sum(d * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-9)
