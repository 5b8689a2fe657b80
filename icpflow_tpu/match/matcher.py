"""Two-stage cluster matcher — the heart of the method, fully jitted.

Re-designs `utils_match.py:24-157` for XLA: instead of Python loops building
per-pair lists, both stages run as masked fixed-shape pair buckets inside one
compiled program per frame pair:

  stage 1 ("static", `utils_match.py:30-41`): joint clustering gives matching
    static objects the same label, so the candidates are the L self-pairs.
  stage 2 ("dynamic", `utils_match.py:43-60`): the cartesian product of labels
    left unmatched by stage 1, gated by the sanity matrix and compacted into a
    static bucket of ``max_pairs`` (valid candidates sorted to the front; any
    overflow beyond the bucket is counted and reported).

Each stage: histogram translation init (`ops/hist.py`) -> batched masked ICP
with rollback (`ops/icp.py`) -> match statistics (`utils_match.py:159-213`)
-> transform acceptance gate (`utils_check.py:51-66`) -> per-source-label
argmin assignment with error threshold (`utils_match.py:110-121`,
`utils_helper.py:108-115`) implemented as two scatter-mins.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops import geometry as geo
from ..ops import hist as _hist
from ..ops import icp as _icp
from ..ops import knn as _knn
from ..ops.segments import SegmentBatch
from . import gates

_INF = 1e8   # reference's "no match" fill (utils_match.py:72); plain float so import stays backend-free


class MatchResult(NamedTuple):
    """Per-source-label match table (static shape (L, ...)).

    ``transforms`` holds the accepted cluster transform or identity — exactly
    what flow assembly consumes (`utils_flow.py:36-48`). ``stats`` packs the
    reference's pairs[:, 2:10] columns: error x2, inlier x2, ratio x2, iou x2
    (`utils_match.py:123-128`).
    """
    matched: jnp.ndarray      # (L,) bool
    dst_label: jnp.ndarray    # (L,) int32 (valid where matched)
    transforms: jnp.ndarray   # (L,4,4)
    stats: jnp.ndarray        # (L,8)
    overflow: jnp.ndarray     # () int32: stage-2 candidates beyond the bucket
    identity_pt: jnp.ndarray  # (L,P) bool: per-point ego-only override
                              # (static stowaways in moving clusters)


def hist_icp(src_xyz, src_mask, dst_xyz, dst_mask, translation_frame,
             cfg: PipelineConfig, lxy: int = 0):
    """Init + ICP with the smaller cloud as source. Ref utils_match.py:138-157.

    ``lxy``: optional histogram-grid override (the small pair bucket passes
    ``hist_grid_xy_small`` — see the config comment).
    """
    n_src = jnp.sum(src_mask, axis=1)
    n_dst = jnp.sum(dst_mask, axis=1)
    swap = (n_src > n_dst)[:, None, None]
    a_xyz = jnp.where(swap, dst_xyz, src_xyz)
    b_xyz = jnp.where(swap, src_xyz, dst_xyz)
    sw = swap[:, :, 0]
    a_mask = jnp.where(sw, dst_mask, src_mask)
    b_mask = jnp.where(sw, src_mask, dst_mask)

    init = _hist.estimate_init_translation(
        a_xyz, a_mask, b_xyz, b_mask, translation_frame,
        bin_w=cfg.hist_bin, lxy=lxy or cfg.hist_grid_xy, lz=cfg.hist_grid_z,
        topk=cfg.hist_topk, nms_kernel=cfg.hist_nms_kernel,
        eval_tile=cfg.nn_tile, yaws=cfg.hist_yaws,
        coarse_cap=cfg.hist_coarse_cap, refine=cfg.hist_refine,
        yaw_per_m=cfg.hist_yaw_per_m, yaw_scale_cap=cfg.hist_yaw_scale_cap)
    # coarse phase only when the search window (== init uncertainty) is
    # large: small-gap pairs keep the exact single-radius trajectory
    coarse_on = jnp.asarray(translation_frame, jnp.float32) \
        >= cfg.icp_coarse_min_tf
    T = _icp.apply_icp(
        a_xyz, a_mask, b_xyz, b_mask, init, coarse_on,
        thres=cfg.thres_dist, max_iters=cfg.icp_max_iters,
        tile=cfg.nn_tile,
        patience=cfg.icp_patience, stall_rel=cfg.icp_stall_rel,
        corr_cap=cfg.icp_corr_cap, shrink=cfg.icp_shrink,
        coarse_iters=cfg.icp_coarse_iters,
        coarse_scale=cfg.icp_coarse_scale,
        init_margin=cfg.icp_init_margin,
        init_margin_rel=cfg.icp_init_margin_rel)
    return jnp.where(swap, geo.invert_rigid(T), T)


def match_eval(src_xyz, src_mask, dst_xyz, dst_mask, T, cfg: PipelineConfig,
               moved=None, dist_f=None, dist_b=None):
    """Symmetric NN statistics of a transformed pair. Ref utils_match.py:159-213.

    ``moved``/``dist_f``/``dist_b`` may be passed in when the caller already
    ran the NN sweeps for this exact pose (``_solve_bucket``'s identity
    evaluation does) — the sweeps are the expensive part of the stage.

    Deliberate deviation (off by default): with ``cfg.inlier_scale_per_m``
    > 0 the inlier radius behind the inl/ratio/iou columns grows with the
    cluster's sensor range (see the config comment) so sparse far clusters
    are gated on a radius commensurate with their point spacing. The err
    columns are means and stay radius-free.
    """
    if moved is None:
        moved = geo.transform_points_batch(src_xyz, T)
    if dist_f is None:
        _, dist_f = _knn.masked_nn(moved, dst_xyz, dst_mask, tile=cfg.nn_tile)
    if dist_b is None:
        _, dist_b = _knn.masked_nn(dst_xyz, moved, src_mask, tile=cfg.nn_tile)
    wf = src_mask.astype(dist_f.dtype)
    wb = dst_mask.astype(dist_b.dtype)
    n_src = jnp.maximum(jnp.sum(wf, 1), 1e-9)
    n_dst = jnp.maximum(jnp.sum(wb, 1), 1e-9)

    radius = cfg.thres_dist
    if cfg.inlier_scale_per_m > 0:
        rng = jnp.linalg.norm(geo.masked_mean(src_xyz, src_mask), axis=-1)
        radius = jnp.minimum(
            cfg.thres_dist * (1.0 + cfg.inlier_scale_per_m * rng),
            cfg.inlier_radius_max)[:, None]
    inl_f = jnp.sum(((dist_f < radius) & src_mask).astype(wf.dtype), 1)
    inl_b = jnp.sum(((dist_b < radius) & dst_mask).astype(wb.dtype), 1)
    ratio_f = inl_f / n_src
    ratio_b = inl_b / n_dst
    iou_f = inl_f / jnp.maximum(n_src + n_dst - inl_b, 1e-9)
    iou_b = inl_b / jnp.maximum(n_src + n_dst - inl_f, 1e-9)
    err_f = jnp.sum(dist_f * wf, 1) / n_src
    err_b = jnp.sum(dist_b * wb, 1) / n_dst

    mu_moved = geo.masked_mean(moved, src_mask)
    mu_src = geo.masked_mean(src_xyz, src_mask)
    translation = mu_moved - mu_src
    rotation = geo.euler_zyx_deg(T[:, :3, :3])
    stats = jnp.stack(
        [err_f, err_b, inl_f, inl_b, ratio_f, ratio_b, iou_f, iou_b], axis=1)
    return stats, translation, rotation


def _solve_bucket(seg_src: SegmentBatch, seg_dst: SegmentBatch,
                  pair_src, pair_dst, pair_valid,
                  translation_frame, cfg: PipelineConfig, n_points: int):
    """hist_icp + eval + gate for one compact pair bucket at ``n_points``.

    Ref utils_match.py:69-136. ``n_points`` slices the segment point axis:
    pairs routed here are guaranteed to fit (their clusters have at most
    ``n_points`` valid points, which all sit at the front of the segment).
    """
    s_xyz = jnp.take(seg_src.xyz, pair_src, axis=0)[:, :n_points]
    s_mask = (jnp.take(seg_src.mask, pair_src, axis=0)[:, :n_points]
              & pair_valid[:, None])
    d_xyz = jnp.take(seg_dst.xyz, pair_dst, axis=0)[:, :n_points]
    d_mask = (jnp.take(seg_dst.mask, pair_dst, axis=0)[:, :n_points]
              & pair_valid[:, None])

    small_lxy = (cfg.hist_grid_xy_small
                 if n_points <= cfg.max_points_small else 0)
    T = hist_icp(s_xyz, s_mask, d_xyz, d_mask, translation_frame, cfg,
                 lxy=small_lxy)
    id_pt = jnp.zeros_like(s_mask)
    moved = dist_f = dist_b = None
    if cfg.identity_margin > 0 or cfg.per_point_identity:
        # per-point NN distances under identity and under T (reused for the
        # identity-preference rule, the per-point refinement, AND the
        # match_eval statistics below — these four sweeps are the whole NN
        # cost of the post-ICP stage, so nothing is computed twice)
        _, d_id = _knn.masked_nn(s_xyz, d_xyz, d_mask, tile=cfg.nn_tile)
        _, d_id_b = _knn.masked_nn(d_xyz, s_xyz, s_mask, tile=cfg.nn_tile)
        wf = s_mask.astype(d_id.dtype)
        wb = d_mask.astype(d_id.dtype)
        n_s = jnp.maximum(jnp.sum(wf, 1), 1e-9)
        n_d = jnp.maximum(jnp.sum(wb, 1), 1e-9)
        err_f_id = jnp.sum(d_id * wf, 1) / n_s
        err_b_id = jnp.sum(d_id_b * wb, 1) / n_d
        err_id = jnp.minimum(err_f_id, err_b_id)
        moved_T = geo.transform_points_batch(s_xyz, T)
        _, d_T = _knn.masked_nn(moved_T, d_xyz, d_mask, tile=cfg.nn_tile)
        _, d_T_b = _knn.masked_nn(d_xyz, moved_T, s_mask, tile=cfg.nn_tile)
        err_f_T = jnp.sum(d_T * wf, 1) / n_s
        err_b_T = jnp.sum(d_T_b * wb, 1) / n_d
        err_T = jnp.minimum(err_f_T, err_b_T)
        if cfg.identity_margin > 0:
            # identity preference: self-similar geometry lets ICP slide to a
            # marginally better NN error while the true motion is zero; when
            # identity fits within the margin, it wins (config.identity_margin)
            prefer_id = err_id <= err_T + cfg.identity_margin
            eye = jnp.broadcast_to(jnp.eye(4, dtype=T.dtype), T.shape)
            T = jnp.where(prefer_id[:, None, None], eye, T)
        else:
            prefer_id = jnp.zeros(T.shape[:1], bool)
        # hand the pose-consistent vectors to match_eval (identity wins ->
        # the identity sweeps ARE that pair's statistics)
        pid = prefer_id[:, None]
        moved = jnp.where(prefer_id[:, None, None], s_xyz, moved_T)
        dist_f = jnp.where(pid, d_id, d_T)
        dist_b = jnp.where(pid, d_id_b, d_T_b)
        if cfg.per_point_identity:
            # static stowaways inside an under-segmented moving cluster: the
            # point's unmoved twin is an identity-NN inlier while its
            # transformed position lands nowhere (config.per_point_identity)
            is_mover = (jnp.linalg.norm(T[:, :3, 3], axis=1)
                        > 2.0 * cfg.thres_dist) & ~prefer_id
            id_pt = (s_mask & is_mover[:, None]
                     & (d_id < cfg.thres_dist)
                     & (d_T > 2.0 * cfg.thres_dist))
    stats, translation, rotation = match_eval(
        s_xyz, s_mask, d_xyz, d_mask, T, cfg,
        moved=moved, dist_f=dist_f, dist_b=dist_b)
    accept = gates.check_transformation(
        translation, rotation, jnp.minimum(stats[:, 6], stats[:, 7]),
        translation_frame=translation_frame,
        thres_iou=cfg.thres_iou, thres_rot=cfg.thres_rot,
        thres_z=cfg.thres_z)
    return T, stats, accept & pair_valid, id_pt


def _solve_bucket_laddered(seg_src: SegmentBatch, seg_dst: SegmentBatch,
                           pair_src, pair_dst, pair_valid,
                           translation_frame, cfg: PipelineConfig,
                           n_points: int):
    """``_solve_bucket`` in the smallest ladder bucket that holds the valid
    pairs (runtime ``lax.switch`` over compile-time sizes).

    The (K,) bucket is padded worst-case; at demo scale it runs <15%
    occupied and a whole stage-2 bucket is often EMPTY, yet every kernel's
    cost is shape-driven. Valid pairs sit compacted at the FRONT of the
    bucket (the caller's argsort), so solving the first ``s >= n_valid``
    rows is exhaustive, and because every solve kernel (hist grids, Pallas
    NN, Jacobi Kabsch, per-pair ICP latch) treats batch rows independently,
    the result is bit-identical to solving the full bucket — the switch is
    pure scheduling. XLA executes only the taken conditional branch on TPU,
    so cost follows the ACTUAL pair count in factor-of-``cfg.pair_ladder``
    steps, and an empty bucket costs nothing.
    """
    K = pair_src.shape[0]
    sizes = sorted({max(1, K // d) for d in cfg.pair_ladder} | {K})
    f32 = seg_src.xyz.dtype
    # _solve_bucket slices seg.xyz[:, :n_points]; a request beyond the
    # segment width yields the width, so the pad shapes must match that
    n_points = min(n_points, seg_src.xyz.shape[1])
    eyeT = jnp.broadcast_to(jnp.eye(4, dtype=f32), (K, 4, 4))

    def empty_fn(_):
        return (eyeT, jnp.zeros((K, 8), f32), jnp.zeros((K,), bool),
                jnp.zeros((K, n_points), bool))

    def solve_at(s):
        def f(_):
            T, st, acc, idp = _solve_bucket(
                seg_src, seg_dst, pair_src[:s], pair_dst[:s], pair_valid[:s],
                translation_frame, cfg, n_points)
            if s == K:
                return T, st, acc, idp
            return (jnp.concatenate([T, eyeT[s:]], 0),
                    jnp.concatenate([st, jnp.zeros((K - s, 8), f32)], 0),
                    jnp.concatenate([acc, jnp.zeros((K - s,), bool)], 0),
                    jnp.concatenate(
                        [idp, jnp.zeros((K - s, n_points), bool)], 0))
        return f

    if sizes == [K]:   # ladder (1,): disabled, no conditional
        return _solve_bucket(seg_src, seg_dst, pair_src, pair_dst, pair_valid,
                             translation_frame, cfg, n_points)
    nv = jnp.sum(pair_valid.astype(jnp.int32))
    # branch 0: empty; branch i: sizes[i-1] (smallest size >= nv)
    idx = jnp.where(
        nv == 0, 0,
        1 + jnp.searchsorted(jnp.asarray(sizes, jnp.int32), nv, side="left"))
    return jax.lax.switch(idx, [empty_fn] + [solve_at(s) for s in sizes],
                          operand=None)


def _run_stage(seg_src: SegmentBatch, seg_dst: SegmentBatch,
               pair_src, pair_dst, pair_valid,
               translation_frame, cfg: PipelineConfig):
    """Size-classed stage solve over a (K,) pair frame.

    Valid pairs are compacted into two static buckets: a wide "small" bucket
    at ``max_points_small`` points (subsampled clusters never exceed their
    real size, so a pair whose clusters are both small carries all of its
    points in the front slice) and a narrow "large" bucket at full
    ``max_points``. Removes the padding FLOPs the reference pays by running
    every pair at max_points (`utils_match.py:81-91`). Each bucket then
    solves at the smallest ladder size that holds its valid pairs
    (``_solve_bucket_laddered``). Results are scattered back to the (K,)
    frame; pairs beyond the buckets are dropped and counted.
    """
    K = pair_src.shape[0]
    ps = cfg.max_points_small
    cnt_s = jnp.take(seg_src.count, pair_src)
    cnt_d = jnp.take(seg_dst.count, pair_dst)
    small = pair_valid & (cnt_s <= ps) & (cnt_d <= ps)
    large = pair_valid & ~small

    def compact(mask, bucket):
        order = jnp.argsort(~mask, stable=True)[:bucket].astype(jnp.int32)
        return order, mask[order]

    os_, vs_ = compact(small, cfg.pairs_small)
    ol_, vl_ = compact(large, cfg.pairs_large)
    dropped = (jnp.sum(pair_valid.astype(jnp.int32))
               - jnp.sum(vs_.astype(jnp.int32))
               - jnp.sum(vl_.astype(jnp.int32)))

    Ts, stats_s, acc_s, idp_s = _solve_bucket_laddered(
        seg_src, seg_dst, pair_src[os_], pair_dst[os_], vs_,
        translation_frame, cfg, ps)
    Tl, stats_l, acc_l, idp_l = _solve_bucket_laddered(
        seg_src, seg_dst, pair_src[ol_], pair_dst[ol_], vl_,
        translation_frame, cfg, cfg.max_points)

    eye = jnp.broadcast_to(jnp.eye(4, dtype=Ts.dtype), (K, 4, 4))
    T = eye.at[os_].set(jnp.where(vs_[:, None, None], Ts, eye[:cfg.pairs_small]))
    T = T.at[ol_].set(jnp.where(vl_[:, None, None], Tl, T[ol_]))
    stats = jnp.zeros((K, 8), Ts.dtype)
    stats = stats.at[os_].set(jnp.where(vs_[:, None], stats_s, 0.0))
    stats = stats.at[ol_].set(jnp.where(vl_[:, None], stats_l, stats[ol_]))
    accept = jnp.zeros((K,), bool)
    accept = accept.at[os_].set(acc_s & vs_)
    accept = accept.at[ol_].max(acc_l & vl_)
    # per-point identity flags back to the (K, P) frame (small bucket covers
    # only the first max_points_small slots; the rest stay False)
    P = cfg.max_points
    id_pt = jnp.zeros((K, P), bool)
    idp_s_full = jnp.zeros((idp_s.shape[0], P), bool
                           ).at[:, :ps].set(idp_s & vs_[:, None])
    id_pt = id_pt.at[os_].set(idp_s_full)
    id_pt = id_pt.at[ol_].max(idp_l & vl_[:, None])
    return T, stats, accept & pair_valid, dropped, id_pt


def _assign(pair_src, pair_dst, err, accept, L, thres_error,
            cp_axis=None, idx_offset=0, total_pairs=None):
    """Per-src-label argmin assignment with error gate.

    Ref `utils_match.py:110-121`: each source label takes its lowest-error
    accepted pair if that error beats ``thres_error``. Two scatter-mins: one
    for the best score per label, one to break ties by pair index. When the
    pair bucket is sharded over ``cp_axis``, both tables are pmin-reduced
    across the axis (the ICI collective of the cluster-pair sharding);
    ``idx_offset`` globalises the local pair indices.
    """
    K_total = total_pairs if total_pairs is not None else pair_src.shape[0]
    K = pair_src.shape[0]
    score = jnp.where(accept, err, _INF)
    src_safe = jnp.where(accept, pair_src, L)
    best = jnp.full((L + 1,), _INF).at[src_safe].min(score)
    if cp_axis is not None:
        best = jax.lax.pmin(best, cp_axis)
    is_best = accept & (score <= best[src_safe]) & (score < thres_error)
    gidx = jnp.arange(K, dtype=jnp.int32) + idx_offset
    cand = jnp.where(is_best, gidx, K_total)
    chosen = jnp.full((L + 1,), K_total, jnp.int32).at[src_safe].min(cand)
    if cp_axis is not None:
        chosen = jax.lax.pmin(chosen, cp_axis)
    chosen = chosen[:L]
    matched = chosen < K_total
    chosen_c = jnp.minimum(chosen, K_total - 1)
    return matched, chosen_c


@functools.partial(jax.jit, static_argnames=("cfg", "cp_axis", "cp_size"))
def match_frame_pair(
    seg_src: SegmentBatch,
    seg_dst: SegmentBatch,
    translation_frame,
    cfg: PipelineConfig,
    cp_axis: str | None = None,
    cp_size: int = 1,
) -> MatchResult:
    """Full two-stage matching of one frame pair. Ref utils_match.py:24-66.

    With ``cp_axis`` set (inside a shard_map over a mesh axis of size
    ``cp_size``), the pair buckets of both stages are sharded across the axis:
    each device solves hist+ICP for its slice of cluster pairs, and only the
    tiny assignment tables (pmin) and per-pair transforms (all_gather) cross
    the interconnect.
    """
    L = seg_src.xyz.shape[0]
    sanity = gates.sanity_matrix(
        seg_src.count, seg_src.mean, seg_src.extent,
        seg_dst.count, seg_dst.mean, seg_dst.extent,
        min_cluster_size=cfg.min_cluster_size,
        thres_box=cfg.thres_box,
        translation_frame=translation_frame)

    def shard_slice(arrs, total):
        if cp_axis is None:
            return arrs, 0
        per = total // cp_size
        assert per * cp_size == total, (total, cp_size)
        off = jax.lax.axis_index(cp_axis) * per
        return [jax.lax.dynamic_slice_in_dim(a, off, per, 0) for a in arrs], off

    def gather(x):
        if cp_axis is None:
            return x
        return jax.lax.all_gather(x, cp_axis, tiled=True)

    # ---- stage 1: static self-pairs -------------------------------------
    iota = jnp.arange(L, dtype=jnp.int32)
    valid1 = jnp.diagonal(sanity)
    (p1s, v1s), off1 = shard_slice([iota, valid1], L)
    T1l, stats1l, accept1l, dropped1, idp1l = _run_stage(
        seg_src, seg_dst, p1s, p1s, v1s, translation_frame, cfg)
    err1l = jnp.minimum(stats1l[:, 0], stats1l[:, 1])
    matched1, _ = _assign(p1s, p1s, err1l, accept1l, L, cfg.thres_error,
                          cp_axis=cp_axis, idx_offset=off1, total_pairs=L)
    T1 = gather(T1l)
    stats1 = gather(stats1l)
    idp1 = gather(idp1l)

    # ---- stage 2: dynamic cartesian leftovers ---------------------------
    left_src = (seg_src.count > 0) & ~matched1
    left_dst = (seg_dst.count > 0) & ~matched1   # stage-1 pairs are (l, l)
    cand = sanity & left_src[:, None] & left_dst[None, :]
    flat = cand.reshape(-1)
    K2 = cfg.max_pairs
    order = jnp.argsort(~flat, stable=True)[:K2].astype(jnp.int32)
    valid2 = flat[order]
    pair_src2 = order // L
    pair_dst2 = order % L
    overflow = jnp.sum(flat.astype(jnp.int32)) - jnp.sum(
        valid2.astype(jnp.int32))

    (p2s, d2s, v2s), off2 = shard_slice([pair_src2, pair_dst2, valid2], K2)
    T2l, stats2l, accept2l, dropped2, idp2l = _run_stage(
        seg_src, seg_dst, p2s, d2s, v2s, translation_frame, cfg)
    err2l = jnp.minimum(stats2l[:, 0], stats2l[:, 1])
    matched2, chosen2 = _assign(
        p2s, d2s, err2l, accept2l, L, cfg.thres_error,
        cp_axis=cp_axis, idx_offset=off2, total_pairs=K2)
    T2 = gather(T2l)
    stats2 = gather(stats2l)
    idp2 = gather(idp2l)

    # ---- combine: stage-1 winners keep their match ----------------------
    eye = jnp.broadcast_to(jnp.eye(4, dtype=T1.dtype), (L, 4, 4))
    t2_per_label = jnp.take(T2, chosen2, axis=0)
    s2_per_label = jnp.take(stats2, chosen2, axis=0)
    d2_per_label = jnp.take(pair_dst2, chosen2, axis=0)
    i2_per_label = jnp.take(idp2, chosen2, axis=0)

    matched = matched1 | matched2
    transforms = jnp.where(
        matched1[:, None, None], T1,
        jnp.where(matched2[:, None, None], t2_per_label, eye))
    stats = jnp.where(matched1[:, None], stats1,
                      jnp.where(matched2[:, None], s2_per_label, 0.0))
    dst_label = jnp.where(matched1, iota,
                          jnp.where(matched2, d2_per_label, -1))
    identity_pt = jnp.where(matched1[:, None], idp1,
                            jnp.where(matched2[:, None], i2_per_label,
                                      False))
    dropped = dropped1 + dropped2
    if cp_axis is not None:
        dropped = jax.lax.psum(dropped, cp_axis)
    return MatchResult(matched=matched, dst_label=dst_label,
                       transforms=transforms, stats=stats,
                       overflow=overflow + dropped,
                       identity_pt=identity_pt)
