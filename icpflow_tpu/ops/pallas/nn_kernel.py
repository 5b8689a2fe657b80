"""Pallas TPU kernel: fused masked nearest-neighbor search.

The XLA path (`ops/knn.py`) computes distance tiles with MXU matmuls but
round-trips each (B, N, tile) distance block through HBM before the running
min — at reference scale that is tens of GB of traffic per ICP iteration and
the pipeline becomes bandwidth-bound. This kernel keeps each distance block
in VMEM and folds the min/argmin immediately: per (batch, src-tile) grid cell
it streams dst tiles, forms the (TM, TN) squared-distance block, and reduces
over the dst (sublane) axis, writing only the final (dist, idx) lane vectors.

Layout notes:
 * coordinates are carried as (B, 3, N) so the *point* axis is the lane
   dimension — a trailing xyz axis of size 3 would waste 125/128 lanes;
 * the distance block is (TM, TN) so the reduction runs over sublanes and
   the carries stay (1, TN) 2D lane vectors;
 * the cross term runs at HIGHEST MXU precision (3-pass bf16 ~= fp32) —
   metre-scale coordinates with a 0.1 m inlier gate do not survive one-pass
   bf16.

HBM traffic drops from O(N*M) to O(N + M) per batch row, which moves the op
off the bandwidth wall; the remaining bound is VPU ISSUE RATE (~13 vector
ops per distance candidate — bench.py derives the roofline and reports
measured utilization against it). Measured band (round-5 variance study,
scripts/profile_nn.py, 3 repeats at the bench shape B=32 N=M=4096): "vpu"
2.32-2.41 ms = 0.75-0.78 of bound, "mxu" 4.56-4.60 ms = 0.39 (its K=3->128
padded contraction does 42x redundant MXU work; it stays the default only
because the accuracy guardrails are pinned on its numerics). BENCH_r04's
one-off vpu reading of 6.7 ms (util 0.40) was transient tunnel load, not a
kernel regression — bench.py now takes a median of 3. At small bucket
shapes (256x512x512) "mxu" wins outright (1.0 vs 1.25 ms): with one dst
tile per grid cell the VPU variants pay per-cell setup, while the otherwise
idle MXU absorbs 8 of the 13 passes. A K=3 contraction can never be
MXU-efficient (3 of 128 systolic rows used), so matmul-peak "MFU" is not a
meaningful metric for this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
# "vpu2" folds the dst mask into the coordinates: invalid dst points are
# moved to this sentinel before the kernel, so their distance (>= ~1e12) can
# never beat a real candidate (coords are metre-scale, real d^2 <= ~1e6) and
# the per-candidate mask select disappears from the inner loop. Src rows with
# NO valid dst report dist ~1.7e6 (vs the masked kernels' 1e15) — both are
# "huge" to every downstream gate.
_SENTINEL = 1e6


def _nn_kernel(src_ref, dst_ref, mask_ref, dist_ref, idx_ref, *, tm: int):
    x = src_ref[0]                                     # (3, TN)
    tn = x.shape[1]
    m = dst_ref.shape[2]
    n_tiles = m // tm
    xsq = jnp.sum(x * x, axis=0, keepdims=True)        # (1, TN)

    def body(t, carry):
        best_d, best_i = carry                         # (1, TN) each
        j0 = t * tm
        y = dst_ref[0, :, pl.ds(j0, tm)]               # (3, TM)
        msk = mask_ref[0, pl.ds(j0, tm), :]            # (TM, 1)
        cross = jax.lax.dot_general(
            y, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (TM, TN)
        ysq = jnp.sum(y * y, axis=0)                   # (TM,)
        d2 = xsq - 2.0 * cross + ysq[:, None]          # (TM, TN)
        d2 = jnp.where(msk, d2, _BIG)
        tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, TN)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + j0
        tile_arg = jnp.min(
            jnp.where(d2 <= tile_min, j_iota, m), axis=0, keepdims=True)
        take = tile_min < best_d
        return (jnp.where(take, tile_min, best_d),
                jnp.where(take, tile_arg, best_i))

    init = (jnp.full((1, tn), _BIG, jnp.float32),
            jnp.zeros((1, tn), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[0] = best_d
    idx_ref[0] = jnp.minimum(best_i, m - 1)


def _nn_kernel_vpu(src_ref, dst_ref, mask_ref, dist_ref, idx_ref, *, tm: int):
    """Elementwise-distance variant: the MXU formulation contracts over a
    K=3 axis padded to 128 (42/43 of the systolic array wasted), so forming
    (y_d - x_d)^2 per coordinate on the VPU does strictly less work AND is
    numerically tighter (no |x|^2 - 2<x,y> cancellation at metre scale)."""
    x = src_ref[0]                                     # (3, TN)
    tn = x.shape[1]
    m = dst_ref.shape[2]
    n_tiles = m // tm

    def body(t, carry):
        best_d, best_i = carry                         # (1, TN) each
        j0 = t * tm
        y = dst_ref[0, :, pl.ds(j0, tm)]               # (3, TM)
        msk = mask_ref[0, pl.ds(j0, tm), :]            # (TM, 1)
        d0 = y[0][:, None] - x[0][None, :]             # (TM, TN)
        d1 = y[1][:, None] - x[1][None, :]
        d2c = y[2][:, None] - x[2][None, :]
        d2 = d0 * d0 + d1 * d1 + d2c * d2c
        d2 = jnp.where(msk, d2, _BIG)
        tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, TN)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + j0
        tile_arg = jnp.min(
            jnp.where(d2 <= tile_min, j_iota, m), axis=0, keepdims=True)
        take = tile_min < best_d
        return (jnp.where(take, tile_min, best_d),
                jnp.where(take, tile_arg, best_i))

    init = (jnp.full((1, tn), _BIG, jnp.float32),
            jnp.zeros((1, tn), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[0] = best_d
    idx_ref[0] = jnp.minimum(best_i, m - 1)


def _nn_kernel_vpu2(src_ref, dsty_ref, dist_ref, idx_ref, *, tc: int):
    """Chunked running-min NN sweep (the roofline-chasing variant).

    The "vpu"/"mxu" kernels pay for three structural costs the VPU issue-rate
    bound does not include: (a) per-iteration lane->sublane TRANSPOSES of the
    dst coordinates (dst arrives as (3, M) lane vectors but the distance
    block needs them sublane-oriented), (b) a materialised (TM, TN) distance
    block that is re-read by ~4 extra argmin passes, and (c) a mask select
    per candidate. This variant removes all three:

      * dst arrives SUBLANE-oriented as (M, 3) — the HBM->VMEM DMA performs
        the relayout for free;
      * the sweep runs over tc-row chunks carrying a (tc, TN) running
        (best_d, best_i) pair in registers — no (TM, TN) block ever exists,
        argmin is a compare+select fused into the single pass;
      * invalid dst points sit at ``_SENTINEL`` so masking is free.

    Per-candidate vector ops: 3 sub + 3 mul/fma + 1 cmp + 2 select = 9
    (vs ~13 for "vpu" plus its transposes). Numerics are identical to the
    "vpu" variant: exact elementwise differences, no |x|^2-2xy cancellation.
    """
    x = src_ref[0]                                     # (3, TN)
    tn = x.shape[1]
    x0, x1, x2 = x[0:1, :], x[1:2, :], x[2:3, :]       # (1, TN) each
    m = dsty_ref.shape[1]
    n_chunks = m // tc
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)

    def body(t, carry):
        best_d, best_i = carry                         # (tc, TN) each
        j0 = t * tc
        y = dsty_ref[0, pl.ds(j0, tc), :]              # (tc, 3)
        d0 = y[:, 0:1] - x0                            # (tc, TN)
        d1 = y[:, 1:2] - x1
        d2c = y[:, 2:3] - x2
        d2 = d0 * d0 + d1 * d1 + d2c * d2c
        take = d2 < best_d
        return (jnp.where(take, d2, best_d),
                jnp.where(take, row_iota + j0, best_i))

    init = (jnp.full((tc, tn), _BIG, jnp.float32),
            jnp.zeros((tc, tn), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    minv = jnp.min(best_d, axis=0, keepdims=True)      # (1, TN)
    winner = jnp.min(jnp.where(best_d <= minv, best_i, m),
                     axis=0, keepdims=True)
    dist_ref[0] = minv
    idx_ref[0] = jnp.minimum(winner, m - 1)


def _nn_kernel_pts_vpu2(src_ref, dsty_ref, dist_ref, pts_ref, *, tc: int):
    """Chunked running-min NN returning the winning COORDINATES.

    Same structure as ``_nn_kernel_vpu2`` but the carry holds the winner's
    (y0, y1, y2) instead of its index (4 selects per candidate instead of
    2); the within-carry row winner is resolved once after the loop with a
    one-hot reduction.
    """
    x = src_ref[0]                                     # (3, TN)
    tn = x.shape[1]
    x0, x1, x2 = x[0:1, :], x[1:2, :], x[2:3, :]
    m = dsty_ref.shape[1]
    n_chunks = m // tc

    def body(t, carry):
        best_d, by0, by1, by2 = carry                  # (tc, TN) each
        j0 = t * tc
        y = dsty_ref[0, pl.ds(j0, tc), :]              # (tc, 3)
        y0, y1, y2 = y[:, 0:1], y[:, 1:2], y[:, 2:3]   # (tc, 1)
        d0 = y0 - x0                                   # (tc, TN)
        d1 = y1 - x1
        d2c = y2 - x2
        d2 = d0 * d0 + d1 * d1 + d2c * d2c
        take = d2 < best_d
        return (jnp.where(take, d2, best_d),
                jnp.where(take, y0, by0),
                jnp.where(take, y1, by1),
                jnp.where(take, y2, by2))

    zeros = jnp.zeros((tc, tn), jnp.float32)
    init = (jnp.full((tc, tn), _BIG, jnp.float32), zeros, zeros, zeros)
    best_d, by0, by1, by2 = jax.lax.fori_loop(0, n_chunks, body, init)
    minv = jnp.min(best_d, axis=0, keepdims=True)      # (1, TN)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, tn), 0)
    rowwin = jnp.min(jnp.where(best_d <= minv, row_iota, tc),
                     axis=0, keepdims=True)            # (1, TN)
    onehot = row_iota == rowwin                        # (tc, TN)
    sel = lambda by: jnp.sum(jnp.where(onehot, by, 0.0), axis=0)
    dist_ref[0] = minv
    pts_ref[0] = jnp.stack([sel(by0), sel(by1), sel(by2)])


def _nn_kernel_pts(src_ref, dst_ref, mask_ref, dist_ref, pts_ref, *,
                   tm: int, variant: str):
    """NN search that also returns the nearest point's COORDINATES.

    The ICP inner loop needs the matched dst points, not their indices: an
    XLA ``take_along_axis`` after the kernel moves one row per src point
    through the gather unit (~7 ns/row — 0.9 ms at the small matcher bucket,
    more than the NN sweep itself). Here the winning candidate's coordinates
    are selected in-register per dst tile with a one-hot masked reduction,
    so the gather never materializes.
    """
    x = src_ref[0]                                     # (3, TN)
    tn = x.shape[1]
    m = dst_ref.shape[2]
    n_tiles = m // tm
    if variant == "mxu":
        xsq = jnp.sum(x * x, axis=0, keepdims=True)    # (1, TN)

    def body(t, carry):
        best_d, best_y = carry                         # (1,TN), (3,TN)
        j0 = t * tm
        y = dst_ref[0, :, pl.ds(j0, tm)]               # (3, TM)
        msk = mask_ref[0, pl.ds(j0, tm), :]            # (TM, 1)
        if variant == "mxu":
            cross = jax.lax.dot_general(
                y, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (TM, TN)
            ysq = jnp.sum(y * y, axis=0)
            d2 = xsq - 2.0 * cross + ysq[:, None]
        else:
            d0 = y[0][:, None] - x[0][None, :]
            d1 = y[1][:, None] - x[1][None, :]
            d2c = y[2][:, None] - x[2][None, :]
            d2 = d0 * d0 + d1 * d1 + d2c * d2c
        d2 = jnp.where(msk, d2, _BIG)
        tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, TN)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        tile_arg = jnp.min(
            jnp.where(d2 <= tile_min, j_iota, m), axis=0, keepdims=True)
        onehot = j_iota == tile_arg                    # (TM, TN) exactly one
        ysel = jnp.stack([
            jnp.sum(jnp.where(onehot, y[d][:, None], 0.0), axis=0)
            for d in range(3)])                        # (3, TN)
        take = tile_min < best_d
        return (jnp.where(take, tile_min, best_d),
                jnp.where(take, ysel, best_y))

    init = (jnp.full((1, tn), _BIG, jnp.float32),
            jnp.zeros((3, tn), jnp.float32))
    best_d, best_y = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[0] = best_d
    pts_ref[0] = best_y


@functools.partial(jax.jit,
                   static_argnames=("tn", "tm", "interpret", "variant", "tc"))
def masked_nn_points_pallas(src, dst, dst_mask, *, tn: int = 1024,
                            tm: int = 1024, interpret: bool = False,
                            variant: str = "mxu", tc: int = 8):
    """Like ``masked_nn_pallas`` but returns (nn_points, dist).

    ``nn_points`` is (B, N, 3): the coordinates of each src point's nearest
    valid dst point (zeros — or the far sentinel under "vpu2" — where no dst
    is valid; the huge dist masks those downstream either way).
    """
    b, n, _ = src.shape
    m = dst.shape[1]
    src_t = _pad_axis(jnp.swapaxes(src.astype(jnp.float32), 1, 2), tn, 2, 0.0)
    np_ = src_t.shape[2]
    grid = (b, np_ // tn)

    if variant == "vpu2":
        dst_s = jnp.where(dst_mask[:, :, None], dst.astype(jnp.float32),
                          _SENTINEL)
        dst_sub = _pad_axis(dst_s, max(tc, 8), 1, _SENTINEL)  # (B, Mp, 3)
        mp = dst_sub.shape[1]
        dist, pts = pl.pallas_call(
            functools.partial(_nn_kernel_pts_vpu2, tc=tc),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3, tn), lambda bb, ii: (bb, 0, ii),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, 3), lambda bb, ii: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, tn), lambda bb, ii: (bb, 0, ii),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, tn), lambda bb, ii: (bb, 0, ii),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((b, 3, np_), jnp.float32),
            ],
            interpret=interpret,
        )(src_t, dst_sub)
        return (jnp.swapaxes(pts[:, :, :n], 1, 2),
                jnp.sqrt(jnp.maximum(dist[:, 0, :n], 0.0)))

    dst_t = _pad_axis(jnp.swapaxes(dst.astype(jnp.float32), 1, 2), tm, 2, 0.0)
    mask_p = _pad_axis(dst_mask.astype(bool), tm, 1, False)[:, :, None]
    mp = dst_t.shape[2]
    dist, pts = pl.pallas_call(
        functools.partial(_nn_kernel_pts, tm=tm, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tn), lambda bb, ii: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mp), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, 1), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn), lambda bb, ii: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tn), lambda bb, ii: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, np_), jnp.float32),
        ],
        interpret=interpret,
    )(src_t, dst_t, mask_p)
    return (jnp.swapaxes(pts[:, :, :n], 1, 2),
            jnp.sqrt(jnp.maximum(dist[:, 0, :n], 0.0)))


def _pad_axis(x, multiple, axis, value):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit,
                   static_argnames=("tn", "tm", "interpret", "variant", "tc"))
def masked_nn_pallas(src, dst, dst_mask, *, tn: int = 1024, tm: int = 1024,
                     interpret: bool = False, variant: str = "mxu",
                     tc: int = 8):
    """Drop-in for `knn.masked_nn` on TPU. Returns (idx, euclidean dist).

    ``variant``: "mxu" (default; dot_general distances — what the accuracy
    guardrails are pinned on), "vpu" (elementwise distances: avoids the
    K=3->128 contraction padding and is numerically tighter, but the sub-mm
    distance deltas shift batched-ICP convergence basins on knife-edge
    cluster pairs — see `knn.masked_nn` for the tradeoff), or "vpu2"
    (chunked running-min elementwise sweep — same numerics as "vpu", fastest;
    see `_nn_kernel_vpu2`).
    """
    b, n, _ = src.shape
    m = dst.shape[1]
    src_t = _pad_axis(jnp.swapaxes(src.astype(jnp.float32), 1, 2), tn, 2, 0.0)
    np_ = src_t.shape[2]
    grid = (b, np_ // tn)

    if variant == "vpu2":
        dst_s = jnp.where(dst_mask[:, :, None], dst.astype(jnp.float32),
                          _SENTINEL)
        dst_sub = _pad_axis(dst_s, max(tc, 8), 1, _SENTINEL)  # (B, Mp, 3)
        mp = dst_sub.shape[1]
        dist, idx = pl.pallas_call(
            functools.partial(_nn_kernel_vpu2, tc=tc),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3, tn), lambda bb, ii: (bb, 0, ii),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, 3), lambda bb, ii: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, tn), lambda bb, ii: (bb, 0, ii),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tn), lambda bb, ii: (bb, 0, ii),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
            ],
            interpret=interpret,
        )(src_t, dst_sub)
        idx = jnp.minimum(idx[:, 0, :n], m - 1)
        return idx, jnp.sqrt(jnp.maximum(dist[:, 0, :n], 0.0))

    dst_t = _pad_axis(jnp.swapaxes(dst.astype(jnp.float32), 1, 2), tm, 2, 0.0)
    mask_p = _pad_axis(dst_mask.astype(bool), tm, 1, False)[:, :, None]
    mp = dst_t.shape[2]

    kern = _nn_kernel_vpu if variant == "vpu" else _nn_kernel
    dist, idx = pl.pallas_call(
        functools.partial(kern, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tn), lambda bb, ii: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mp), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, 1), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn), lambda bb, ii: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda bb, ii: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
        ],
        interpret=interpret,
    )(src_t, dst_t, mask_p)
    idx = jnp.minimum(idx[:, 0, :n], m - 1)
    return idx, jnp.sqrt(jnp.maximum(dist[:, 0, :n], 0.0))
