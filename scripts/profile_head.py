"""Current-HEAD hot-path decomposition (chained + value-fetch timing).

Times, on the real demo fixture at the bench config:
  * dbscan full vs candidate-pass-only (debug_edges) -> propagation cost
  * icp_core iteration counts per bucket (how many sweeps the latch burns)
  * per-iteration ICP sweep cost at both bucket shapes

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_head.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops import cluster as _cluster
from bench import make_cfg, DEMO_PATH, fetch_barrier_cost, chain_time

cfg = make_cfg()
data = load_demo_npz(DEMO_PATH)
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
bar = fetch_barrier_cost()
print(f"barrier={bar*1e3:.0f}ms n={xyz.shape[0]}", flush=True)

kw = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
          num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
          max_iters=cfg.cluster_max_iters,
          eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)


@jax.jit
def full_step(x):
    lab = _cluster.dbscan(x, valid, **kw)
    return x + 1e-30 * jnp.sum(lab).astype(x.dtype), lab


@jax.jit
def cand_step(x):
    edges, core, order = _cluster.dbscan(x, valid, debug_edges=True, **kw)
    return x + 1e-30 * jnp.sum(edges).astype(x.dtype), (edges, core)


t_full = chain_time(full_step, xyz, lambda o: jnp.sum(o), 4, bar)
t_cand = chain_time(cand_step, xyz, lambda o: jnp.sum(o[0]), 4, bar)
print(f"dbscan full   {t_full*1e3:8.1f} ms", flush=True)
print(f"  candidates  {t_cand*1e3:8.1f} ms", flush=True)
print(f"  propagation {(t_full-t_cand)*1e3:8.1f} ms (diff)", flush=True)

edges, core = cand_step(xyz)[1]
n = xyz.shape[0]
flat = np.asarray(edges).reshape(-1)
real = flat < n
print(f"edges real={real.sum()} ({real.sum()/n:.2f}/pt) cap={4*n}",
      flush=True)
core_np = np.asarray(core)
print(f"core={core_np.sum()} valid={int(np.asarray(valid).sum())}",
      flush=True)

# unique undirected edges after dedup (host-side estimate)
u = np.repeat(np.arange(n), edges.shape[1])[real]
v = flat[real]
cc = core_np[u] & core_np[v]
a = np.minimum(u[cc], v[cc]).astype(np.int64)
b = np.maximum(u[cc], v[cc]).astype(np.int64)
key = a * n + b
nun = len(np.unique(key))
print(f"core-core directed={cc.sum()} unique-undirected={nun} "
      f"({nun/n:.2f}/pt)", flush=True)

# ---- ICP iteration counts on the real demo buckets ----------------------
from icpflow_tpu.ops.segments import extract_segments
from icpflow_tpu.match import matcher as _m
from icpflow_tpu.ops import icp as _icp, knn as _knn, geometry as geo
from icpflow_tpu.match import gates

lab = full_step(xyz)[1]
n0 = jnp.asarray(p_dst).shape[0]
lab_dst, lab_src = lab[:n0], lab[n0:]
seg_src = extract_segments(jnp.asarray(p_src), lab_src, jnp.asarray(v_src),
                           num_labels=cfg.num_clusters,
                           max_points=cfg.max_points)
seg_dst = extract_segments(jnp.asarray(p_dst), lab_dst, jnp.asarray(v_dst),
                           num_labels=cfg.num_clusters,
                           max_points=cfg.max_points)
L = cfg.num_clusters
tf_dev = jnp.float32(2.0)

sanity = gates.sanity_matrix(
    seg_src.count, seg_src.mean, seg_src.extent,
    seg_dst.count, seg_dst.mean, seg_dst.extent,
    min_cluster_size=cfg.min_cluster_size, thres_box=cfg.thres_box,
    translation_frame=tf_dev)
valid1 = jnp.diagonal(sanity)
iota = jnp.arange(L, dtype=jnp.int32)

# replicate _run_stage bucket compaction for stage 1
ps = cfg.max_points_small
cnt = jnp.take(seg_src.count, iota)
small = valid1 & (cnt <= ps) & (jnp.take(seg_dst.count, iota) <= ps)
large = valid1 & ~small
print(f"stage1 small={int(jnp.sum(small))} large={int(jnp.sum(large))}",
      flush=True)

import functools


def icp_iters(seg_s, seg_d, pair_s, pair_d, pv, *, npts):
    s_xyz = jnp.take(seg_s.xyz, pair_s, axis=0)[:, :npts]
    s_mask = (jnp.take(seg_s.mask, pair_s, axis=0)[:, :npts] & pv[:, None])
    d_xyz = jnp.take(seg_d.xyz, pair_d, axis=0)[:, :npts]
    d_mask = (jnp.take(seg_d.mask, pair_d, axis=0)[:, :npts] & pv[:, None])
    # smaller-as-src swap as in hist_icp
    n_s = jnp.sum(s_mask, axis=1)
    n_d = jnp.sum(d_mask, axis=1)
    swap = (n_s > n_d)[:, None, None]
    a_xyz = jnp.where(swap, d_xyz, s_xyz)
    b_xyz = jnp.where(swap, s_xyz, d_xyz)
    sw = swap[:, :, 0]
    a_mask = jnp.where(sw, d_mask, s_mask)
    b_mask = jnp.where(sw, s_mask, d_mask)
    from icpflow_tpu.ops import hist as _hist
    init = _hist.estimate_init_translation(
        a_xyz, a_mask, b_xyz, b_mask, tf_dev,
        bin_w=cfg.hist_bin, lxy=cfg.hist_grid_xy, lz=cfg.hist_grid_z,
        topk=cfg.hist_topk, nms_kernel=cfg.hist_nms_kernel,
        eval_tile=cfg.nn_tile, yaws=cfg.hist_yaws)
    src = geo.transform_points_batch(a_xyz, init)
    src_mask, dst, dst_mask = a_mask, b_xyz, b_mask
    if cfg.icp_corr_cap and src.shape[1] > cfg.icp_corr_cap:
        stride = -(-src.shape[1] // cfg.icp_corr_cap)
        src = src[:, ::stride]
        src_mask = src_mask[:, ::stride]
    f32 = jnp.float32
    b = src.shape[0]

    def body(s):
        moved = jnp.einsum("bij,bnj->bni", s[0], src) + s[1][:, None, :]
        idx, dist = _knn.masked_nn(moved, dst, dst_mask, tile=cfg.nn_tile)
        nn_pts = jnp.take_along_axis(dst, idx[:, :, None], axis=1)
        inlier = (dist <= cfg.thres_dist) & src_mask
        R, t = geo.kabsch(src, nn_pts, inlier)
        moved2 = jnp.einsum("bij,bnj->bni", R, src) + t[:, None, :]
        sq = jnp.sum((moved2 - nn_pts) ** 2, axis=-1)
        w = inlier.astype(f32)
        rmse = jnp.sqrt(jnp.sum(sq * w, 1)
                        / jnp.maximum(jnp.sum(w, 1), 1e-9))
        first = s[7] == 0
        take = (first | (rmse < s[4])) & ~s[6]
        meaningful = first | ((s[4] - rmse)
                              > cfg.icp_stall_rel * jnp.maximum(s[4], 1e-20))
        stale = jnp.where(s[6] | meaningful, 0, s[5] + 1)
        frozen = s[6] | (stale >= cfg.icp_patience)
        upd = ~s[6]
        froze_at = jnp.where(frozen & ~s[6], s[7] + 1, s[8])
        return (jnp.where(upd[:, None, None], R, s[0]),
                jnp.where(upd[:, None], t, s[1]),
                jnp.where(take[:, None, None], R, s[2]),
                jnp.where(take[:, None], t, s[3]),
                jnp.where(take, rmse, s[4]),
                stale, frozen, s[7] + 1, froze_at)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=f32), (b, 3, 3))
    st = (eye, jnp.zeros((b, 3), f32), eye, jnp.zeros((b, 3), f32),
          jnp.full((b,), jnp.inf, f32), jnp.zeros((b,), jnp.int32),
          jnp.zeros((b,), bool), jnp.int32(0),
          jnp.full((b,), -1, jnp.int32))
    st = jax.lax.while_loop(
        lambda s: (~jnp.all(s[6])) & (s[7] < cfg.icp_max_iters), body, st)
    return st[7], st[8], pv


def compact(mask, bucket):
    order = jnp.argsort(~mask, stable=True)[:bucket].astype(jnp.int32)
    return order, mask[order]


for name, (msk, bucket, npts) in {
        "s1_small": (small, cfg.pairs_small, cfg.max_points_small),
        "s1_large": (large, cfg.pairs_large, cfg.max_points)}.items():
    o, v = compact(msk, bucket)
    f = jax.jit(functools.partial(icp_iters, seg_src, seg_dst),
                static_argnames=("npts",))
    total_it, froze_at, pv = f(o, o, v, npts=npts)
    fa = np.asarray(froze_at)
    pvn = np.asarray(pv)
    print(f"{name}: loop_iters={int(total_it)} "
          f"froze_at(valid)={sorted(fa[pvn].tolist())}", flush=True)
