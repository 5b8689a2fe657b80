"""Match-stage decomposition on the REAL demo buckets (chained timing).

Times, per (stage-1 bucket) at the bench config:
  * hist total / hist grid+FFT+NMS only / hypothesis-scoring sweeps only
  * icp_core (real init poses, real masks) and the 2 rollback sweeps
  * the post-ICP eval sweeps of _solve_bucket (identity + T, fwd + bwd)
  * match_frame_pair total (both stages)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_match.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.match import gates
from icpflow_tpu.match.matcher import match_frame_pair
from icpflow_tpu.ops import geometry as geo
from icpflow_tpu.ops import hist as _hist
from icpflow_tpu.ops import icp as _icp
from icpflow_tpu.ops import knn as _knn
from icpflow_tpu.ops.segments import extract_segments
from bench import make_cfg, DEMO_PATH, fetch_barrier_cost, chain_time

cfg = make_cfg()
data = load_demo_npz(DEMO_PATH)
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)
lab_dst, lab_src = engine.cluster_joint(jpd, jvd, jps, jvs)

seg_src = extract_segments(jps, lab_src, jvs, num_labels=cfg.num_clusters,
                           max_points=cfg.max_points)
seg_dst = extract_segments(jpd, lab_dst, jvd, num_labels=cfg.num_clusters,
                           max_points=cfg.max_points)
L = cfg.num_clusters
tf = jnp.float32(2.0)
bar = fetch_barrier_cost()
print(f"barrier={bar*1e3:.0f}ms", flush=True)

sanity = gates.sanity_matrix(
    seg_src.count, seg_src.mean, seg_src.extent,
    seg_dst.count, seg_dst.mean, seg_dst.extent,
    min_cluster_size=cfg.min_cluster_size, thres_box=cfg.thres_box,
    translation_frame=tf)
iota = jnp.arange(L, dtype=jnp.int32)
valid1 = jnp.diagonal(sanity)
ps = cfg.max_points_small
cnt = jnp.take(seg_src.count, iota)
cntd = jnp.take(seg_dst.count, iota)
small = valid1 & (cnt <= ps) & (cntd <= ps)
large = valid1 & ~small

HIST_KW = dict(bin_w=cfg.hist_bin, lxy=cfg.hist_grid_xy, lz=cfg.hist_grid_z,
               topk=cfg.hist_topk, nms_kernel=cfg.hist_nms_kernel,
               eval_tile=cfg.nn_tile, yaws=cfg.hist_yaws,
               coarse_cap=cfg.hist_coarse_cap, refine=cfg.hist_refine)
ICP_KW = dict(thres=cfg.thres_dist, max_iters=cfg.icp_max_iters,
              tile=cfg.nn_tile, patience=cfg.icp_patience,
              stall_rel=cfg.icp_stall_rel, corr_cap=cfg.icp_corr_cap,
              shrink=cfg.icp_shrink)


def hist_grid_only(src, src_mask, dst, dst_mask, translation_frame):
    """Copy of estimate_init_translation up to (but excluding) the scoring
    sweeps: scatter grids + FFT correlation + NMS + top-k candidates."""
    b, n, _ = src.shape
    f32 = jnp.float32
    bin_w, lxy, lz = cfg.hist_bin, cfg.hist_grid_xy, cfg.hist_grid_z
    wsrc = src_mask.astype(f32)
    wdst = dst_mask.astype(f32)
    c_src = jnp.sum(src * wsrc[:, :, None], 1) / jnp.maximum(
        jnp.sum(wsrc, 1), 1e-9)[:, None]
    c_dst = jnp.sum(dst * wdst[:, :, None], 1) / jnp.maximum(
        jnp.sum(wdst, 1), 1e-9)[:, None]
    dc = c_dst - c_src
    dc_shift = jnp.round(dc / bin_w) * bin_w
    src_shifted = src + dc_shift[:, None, :]
    origin = c_dst
    grid_src = _hist._wrap_counts(src_shifted, wsrc, origin, bin_w, lxy, lxy, lz)
    grid_dst = _hist._wrap_counts(dst, wdst, origin, bin_w, lxy, lxy, lz)
    fa = jnp.fft.rfftn(grid_dst, axes=(1, 2, 3))
    fb = jnp.fft.rfftn(grid_src, axes=(1, 2, 3))
    corr = jnp.fft.irfftn(fa * jnp.conj(fb), s=(lz, lxy, lxy), axes=(1, 2, 3))
    corr = jnp.roll(corr, (lz // 2, lxy // 2, lxy // 2), axis=(1, 2, 3))
    sx = _hist._signed_shifts(lxy) * bin_w
    sz = _hist._signed_shifts(lz) * bin_w
    total_x = dc_shift[:, 0][:, None] + sx[None, :]
    total_y = dc_shift[:, 1][:, None] + sx[None, :]
    tfv = jnp.asarray(translation_frame, f32)
    window = ((jnp.abs(sz) <= bin_w + 1e-6)[None, :, None, None]
              & (jnp.abs(total_x) <= tfv)[:, None, :, None]
              & (jnp.abs(total_y) <= tfv)[:, None, None, :])
    kz = min(cfg.hist_nms_kernel, lz)
    pooled = corr
    for axis, k in ((1, kz), (2, cfg.hist_nms_kernel), (3, cfg.hist_nms_kernel)):
        dims = [1, 1, 1, 1]
        dims[axis] = k
        pooled = jax.lax.reduce_window(
            pooled, -jnp.inf, jax.lax.max, window_dimensions=tuple(dims),
            window_strides=(1, 1, 1, 1), padding="SAME")
    votes = jnp.where((corr >= pooled) & window & (corr > 0), corr, -1.0)
    _, flat_idx = jax.lax.top_k(votes.reshape(b, -1), cfg.hist_topk)
    return flat_idx


def bucket_data(mask, bucket, npts):
    order = jnp.argsort(~mask, stable=True)[:bucket].astype(jnp.int32)
    pv = mask[order]
    s_xyz = jnp.take(seg_src.xyz, order, axis=0)[:, :npts]
    s_m = jnp.take(seg_src.mask, order, axis=0)[:, :npts] & pv[:, None]
    d_xyz = jnp.take(seg_dst.xyz, order, axis=0)[:, :npts]
    d_m = jnp.take(seg_dst.mask, order, axis=0)[:, :npts] & pv[:, None]
    return s_xyz, s_m, d_xyz, d_m, pv


def t_stat(name, step, state0, probe, iters=8):
    dt = chain_time(jax.jit(step), state0, probe, iters, bar)
    print(f"{name:38s} {dt*1e3:8.2f} ms", flush=True)
    return dt


for name, mask, bucket, npts in (
        ("small", small, cfg.pairs_small, ps),
        ("large", large, cfg.pairs_large, cfg.max_points)):
    s_xyz, s_m, d_xyz, d_m, pv = bucket_data(mask, bucket, npts)
    nv = int(np.asarray(pv).sum())
    print(f"== stage1/{name}: B={bucket} N={npts} valid={nv}", flush=True)

    def hist_step(x):
        T = _hist.estimate_init_translation(x, s_m, d_xyz, d_m, tf, **HIST_KW)
        return x + 1e-30 * T[:, :3, 3][:, None, :], T
    t_stat("hist total", hist_step, s_xyz, lambda o: jnp.sum(o))

    def grid_step(x):
        fi = hist_grid_only(x, s_m, d_xyz, d_m, tf)
        return x + 1e-30 * jnp.sum(fi).astype(x.dtype), fi
    t_stat("hist grid+fft+nms+topk", grid_step, s_xyz, lambda o: jnp.sum(o))

    # scoring sweeps alone: K=7 translation hypotheses + 8 yaw hypotheses
    k1, k2 = cfg.hist_topk + 2, 2 * sum(1 for y in cfg.hist_yaws if y != 0.0)
    def score_step(x, k1=k1, k2=k2):
        mk1 = jnp.broadcast_to(x[None], (k1,) + x.shape) + 0.01
        e1 = _hist._score_hypotheses(mk1, s_m, d_xyz, d_m, cfg.nn_tile)
        mk2 = jnp.broadcast_to(x[None], (k2,) + x.shape) + 0.02
        e2 = _hist._score_hypotheses(mk2, s_m, d_xyz, d_m, cfg.nn_tile)
        e = jnp.concatenate([e1, e2], 0)
        return x + 1e-30 * jnp.sum(e).astype(x.dtype), e
    t_stat(f"hist scoring ({k1}+{k2} hyps)", score_step, s_xyz,
           lambda o: jnp.sum(o))

    init = jax.jit(lambda x: _hist.estimate_init_translation(
        x, s_m, d_xyz, d_m, tf, **HIST_KW))(s_xyz)

    def icp_step(x):
        T = _icp.apply_icp(x, s_m, d_xyz, d_m, init,
                           init_margin_rel=cfg.icp_init_margin_rel, **ICP_KW)
        return x + 1e-30 * T[:, :3, 3][:, None, :], T
    t_stat("apply_icp (core + 2 sweeps)", icp_step, s_xyz,
           lambda o: jnp.sum(o), iters=4)

    def core_step(x):
        T = _icp.icp_core(x, s_m, d_xyz, d_m, **ICP_KW)
        return x + 1e-30 * T[:, :3, 3][:, None, :], T
    t_stat("icp_core only", core_step, s_xyz, lambda o: jnp.sum(o), iters=4)

    def sweep2_step(x):
        e1 = _knn.masked_nn_error(x, s_m, d_xyz, d_m, tile=cfg.nn_tile)
        e2 = _knn.masked_nn_error(x + 0.01, s_m, d_xyz, d_m, tile=cfg.nn_tile)
        return x + 1e-30 * (e1 + e2)[:, None, None], e1
    t_stat("2 full fwd sweeps (rollback)", sweep2_step, s_xyz,
           lambda o: jnp.sum(o))

    def eval4_step(x):
        _, d_id = _knn.masked_nn(x, d_xyz, d_m, tile=cfg.nn_tile)
        _, d_id_b = _knn.masked_nn(d_xyz, x, s_m, tile=cfg.nn_tile)
        _, d_T = _knn.masked_nn(x + 0.01, d_xyz, d_m, tile=cfg.nn_tile)
        _, d_T_b = _knn.masked_nn(d_xyz, x + 0.01, s_m, tile=cfg.nn_tile)
        s = jnp.sum(d_id) + jnp.sum(d_id_b) + jnp.sum(d_T) + jnp.sum(d_T_b)
        return x + 1e-30 * s.astype(x.dtype), s
    t_stat("4 eval sweeps (_solve_bucket)", eval4_step, s_xyz,
           lambda o: jnp.sum(o))


def match_step(x):
    seg2 = seg_src._replace(xyz=x)
    r = match_frame_pair(seg2, seg_dst, tf, cfg)
    return x + 1e-30 * jnp.sum(r.transforms).astype(x.dtype), r

print("== full matcher", flush=True)
t_stat("match_frame_pair (both stages)", match_step, seg_src.xyz,
       lambda o: jnp.sum(o.transforms), iters=4)
