"""Diagnostic: how many iterations does the batched ICP while_loop actually
run on the real demo buckets, and what do per-pair convergence curves look
like? Informs the per-pair freeze/latch optimization (round 2).

Run on TPU from repo root: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/icp_iters.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops import geometry as geo, hist as _hist, knn as _knn
from icpflow_tpu.ops.segments import extract_segments
from icpflow_tpu.match import gates
from icpflow_tpu.match.matcher import _run_stage


def icp_iters(src, src_mask, dst, dst_mask, thres, max_iters, rel_rmse, tile):
    """icp_core with per-pair iteration-of-convergence reporting."""
    b = src.shape[0]
    f32 = jnp.float32
    src = src.astype(f32)
    dst = dst.astype(f32)

    def body(carry):
        R, t, rmse, it, done, conv_at = carry
        moved = jnp.einsum("bij,bnj->bni", R, src) + t[:, None, :]
        idx, dist = _knn.masked_nn(moved, dst, dst_mask, tile=tile)
        nn_pts = jnp.take_along_axis(dst, idx[:, :, None], axis=1)
        inlier = (dist <= thres) & src_mask
        R2, t2 = geo.kabsch(src, nn_pts, inlier)
        moved2 = jnp.einsum("bij,bnj->bni", R2, src) + t2[:, None, :]
        sq = jnp.sum((moved2 - nn_pts) ** 2, axis=-1)
        w = inlier.astype(f32)
        r2 = jnp.sqrt(jnp.sum(sq * w, 1) / jnp.maximum(jnp.sum(w, 1), 1e-9))
        rel = (rmse - r2) / jnp.maximum(rmse, 1e-20)
        first = it == 0
        pair_conv = jnp.where(first, False, rel <= rel_rmse)
        conv_at = jnp.where((conv_at < 0) & pair_conv, it, conv_at)
        conv_at = jnp.where(~pair_conv, -1, conv_at)  # un-latch: simultaneity
        done = jnp.where(first, False, jnp.all(rel <= rel_rmse))
        return R2, t2, r2, it + 1, done, conv_at

    init = (jnp.broadcast_to(jnp.eye(3, dtype=f32), (b, 3, 3)),
            jnp.zeros((b, 3), f32), jnp.full((b,), jnp.inf, f32),
            jnp.int32(0), jnp.bool_(False),
            jnp.full((b,), -1, jnp.int32))
    out = jax.lax.while_loop(lambda c: (~c[4]) & (c[3] < max_iters),
                             body, init)
    return out[3], out[5]


def main():
    cfg = DEMO.replace(
        max_points_scene=131072, max_points=4096, num_clusters=200,
        min_cluster_size=20, nn_tile=256, hist_grid_xy=256, icp_max_iters=100,
        epsilon=0.6, eps_scale_per_m=0.012, eps_max=0.8)
    data = load_demo_npz("/root/reference/demo.npz")
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
    jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)
    lab_dst, lab_src = engine.cluster_joint(jpd, jvd, jps, jvs)

    seg_src = extract_segments(jps, lab_src, jvs,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    seg_dst = extract_segments(jpd, lab_dst, jvd,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    L = cfg.num_clusters
    tf = jnp.float32(2.0)
    sanity = gates.sanity_matrix(
        seg_src.count, seg_src.mean, seg_src.extent,
        seg_dst.count, seg_dst.mean, seg_dst.extent,
        min_cluster_size=cfg.min_cluster_size, thres_box=cfg.thres_box,
        translation_frame=tf)
    iota = jnp.arange(L, dtype=jnp.int32)
    valid1 = jnp.diagonal(sanity)

    # replicate _run_stage's bucket compaction for stage 1
    ps = cfg.max_points_small
    cnt = jnp.take(seg_src.count, iota)
    cntd = jnp.take(seg_dst.count, iota)
    small = valid1 & (cnt <= ps) & (cntd <= ps)
    large = valid1 & ~small
    for name, mask, bucket, npts in (
            ("small", small, cfg.pairs_small, ps),
            ("large", large, cfg.pairs_large, cfg.max_points)):
        order = jnp.argsort(~mask, stable=True)[:bucket].astype(jnp.int32)
        pv = mask[order]
        s_xyz = jnp.take(seg_src.xyz, order, axis=0)[:, :npts]
        s_m = jnp.take(seg_src.mask, order, axis=0)[:, :npts] & pv[:, None]
        d_xyz = jnp.take(seg_dst.xyz, order, axis=0)[:, :npts]
        d_m = jnp.take(seg_dst.mask, order, axis=0)[:, :npts] & pv[:, None]
        init = _hist.estimate_init_translation(
            s_xyz, s_m, d_xyz, d_m, tf, bin_w=cfg.hist_bin,
            lxy=cfg.hist_grid_xy, lz=cfg.hist_grid_z, topk=cfg.hist_topk,
            nms_kernel=cfg.hist_nms_kernel, eval_tile=cfg.nn_tile,
            yaws=cfg.hist_yaws)
        s_init = geo.transform_points_batch(s_xyz, init)
        t0 = time.time()
        it, conv = jax.jit(icp_iters, static_argnames=(
            "thres", "max_iters", "rel_rmse", "tile"))(
            s_init, s_m, d_xyz, d_m, thres=cfg.thres_dist,
            max_iters=cfg.icp_max_iters, rel_rmse=1e-6,
            tile=cfg.nn_tile)
        it = int(it)
        conv = np.asarray(conv)
        npv = int(np.asarray(pv).sum())
        print(f"stage1/{name}: {npv} valid pairs, while_loop ran {it} iters "
              f"(wall {time.time()-t0:.1f}s incl compile)")
        c = conv[np.asarray(pv)]
        print(f"  per-pair converged-at (at exit): "
              f"min {c.min() if len(c) else -1} "
              f"median {np.median(c) if len(c) else -1} "
              f"max {c.max() if len(c) else -1} "
              f"not-conv {(c < 0).sum()}")


if __name__ == "__main__":
    main()
