"""Cluster-stage decomposition for the dedup-DBSCAN path (chained timing).

Times at the bench config (131072 scene bucket, 0.15 m dedup, 32768 reps):
  * voxel_dedup_compact alone (sort + segment scan at 131k)
  * weighted dbscan on the rep bucket
  * full dbscan_dedup (incl. label broadcast + lax.cond)
  * control: raw-cloud dbscan at 131k

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_cluster_dedup.py
"""
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
print(f"n={xyz.shape[0]} valid={int(valid.sum())} barrier={bar*1e3:.0f}ms",
      flush=True)

KW = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
          num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
          max_iters=cfg.cluster_max_iters,
          eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)

rep_xyz, rep_valid, rep_mult, point_rep, n_unique = \
    _cluster.voxel_dedup_compact(xyz, valid, voxel=cfg.cluster_dedup_voxel,
                                 cap=cfg.cluster_rep_cap)
print(f"reps={int(n_unique)} cap={cfg.cluster_rep_cap}", flush=True)


def t(name, step, s0, probe, iters=6):
    dt = chain_time(jax.jit(step), s0, probe, iters, bar)
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def dedup_step(x):
    rx, rv, rm, pr, nu = _cluster.voxel_dedup_compact(
        x, valid, voxel=cfg.cluster_dedup_voxel, cap=cfg.cluster_rep_cap)
    return x + 1e-30 * rx[0, 0], (rx, nu)
t("voxel_dedup_compact @131k", dedup_step, xyz, lambda o: jnp.sum(o[0]))


def rep_dbscan_step(x):
    lab = _cluster.dbscan(x, rep_valid, rep_mult, **KW)
    return x + 1e-30 * lab[0].astype(x.dtype), lab
t("weighted dbscan @32k reps", rep_dbscan_step, rep_xyz,
  lambda o: jnp.sum(o), iters=4)


def full_step(x):
    lab = _cluster.dbscan_dedup(x, valid, dedup_voxel=cfg.cluster_dedup_voxel,
                                rep_cap=cfg.cluster_rep_cap, **KW)
    return x + 1e-30 * lab[0].astype(x.dtype), lab
t("dbscan_dedup full @131k", full_step, xyz, lambda o: jnp.sum(o), iters=4)
