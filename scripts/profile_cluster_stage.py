#!/usr/bin/env python
"""Decompose the current (round-5) cluster stage: dedup-DBSCAN at demo scale.

stage_cluster was 76.3 ms in the round-5 bench — the largest stage after
the NN-policy win moved match to 68 ms. Splits: voxel dedup, weighted
DBSCAN on the 32768-rep bucket, label broadcast, vs the fused
dbscan_dedup and the full-cloud dbscan.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_cluster_stage.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icpflow_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_cfg, chain_time, _chain_fold
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops import cluster as _cluster
from icpflow_tpu import SceneFlowEngine


def main():
    cfg = make_cfg()
    data = load_demo_npz("/root/reference/demo.npz")
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
    valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
    kw = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
              num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
              max_iters=cfg.cluster_max_iters,
              eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)

    def t(name, step, probe=lambda o: jnp.sum(o), iters=8):
        ms = chain_time(step, xyz, probe, iters) * 1e3
        print(f"  {name:32s} {ms:8.2f} ms", flush=True)
        return ms

    print(f"joint cloud {int(valid.sum())}/{len(valid)}; "
          f"dedup {cfg.cluster_dedup_voxel} cap {cfg.cluster_rep_cap}")

    def full_step(x):
        lab = _cluster.dbscan_dedup(
            x, valid, dedup_voxel=cfg.cluster_dedup_voxel,
            rep_cap=cfg.cluster_rep_cap, **kw)
        return _chain_fold(x, jnp.sum(lab).astype(x.dtype)), lab
    t("dbscan_dedup (stage total)", full_step)

    def dedup_step(x):
        rep_xyz, rep_valid, rep_mult, point_rep, nu = (
            _cluster.voxel_dedup_compact(
                x, valid, voxel=cfg.cluster_dedup_voxel,
                cap=cfg.cluster_rep_cap))
        return _chain_fold(x, jnp.sum(rep_xyz).astype(x.dtype)), rep_xyz
    t("voxel_dedup_compact", dedup_step)

    rep_xyz, rep_valid, rep_mult, point_rep, nu = (
        _cluster.voxel_dedup_compact(
            xyz, valid, voxel=cfg.cluster_dedup_voxel,
            cap=cfg.cluster_rep_cap))
    print(f"  (n_unique={int(nu)})")

    def reps_step(x):
        lab = _cluster.dbscan(rep_xyz + 1e-30 * jnp.sum(x), rep_valid,
                              rep_mult, **kw)
        return _chain_fold(x, jnp.sum(lab).astype(x.dtype)), lab
    t("dbscan on reps", reps_step)

    lab_r = _cluster.dbscan(rep_xyz, rep_valid, rep_mult, **kw)

    def bc_step(x):
        lab_pad = jnp.concatenate(
            [lab_r + jnp.sum(x).astype(jnp.int32) * 0,
             jnp.full((1,), -1, jnp.int32)])
        out = lab_pad[jnp.minimum(point_rep, cfg.cluster_rep_cap)]
        return _chain_fold(x, jnp.sum(out).astype(x.dtype)), out
    t("label broadcast", bc_step)

    def raw_step(x):
        lab = _cluster.dbscan(x, valid, **kw)
        return _chain_fold(x, jnp.sum(lab).astype(x.dtype)), lab
    t("full-cloud dbscan (control)", raw_step, iters=4)


if __name__ == "__main__":
    main()
