#!/usr/bin/env python
"""Where does the hdbscan-primary path's 1.5 s/pair go? (VERDICT r4 item 5)

Splits the dedup-exact-graph hdbscan call on the demo joint cloud into:
  dedup (device) / graph (device, chained timing) / edge fetch (tunnel!) /
  native condensed tree / finish+broadcast (host numpy).

Run from repo root on the TPU: python scripts/profile_hdbscan.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icpflow_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_cfg, chain_time, _chain_fold
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops import cluster as _cluster
from icpflow_tpu.ops import hdbscan as _h
from icpflow_tpu import SceneFlowEngine


def main():
    cfg = make_cfg().replace(hdbscan_exact=True)
    data = load_demo_npz("/root/reference/demo.npz")
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
    valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
    k_core = min(cfg.min_cluster_size, 30)
    print(f"joint cloud: {int(valid.sum())} valid of {len(valid)}")

    t0 = time.time()
    rep_xyz, rep_valid, rep_mult, point_rep, n_unique = (
        _cluster.voxel_dedup_compact(
            xyz, valid, voxel=cfg.hdbscan_dedup_voxel,
            cap=cfg.hdbscan_rep_cap))
    nu = int(n_unique)
    print(f"dedup: {time.time()-t0:.3f}s wall (n_unique={nu}, "
          f"bucket={rep_xyz.shape[0]})")

    # graph compute, honest chained timing
    def step(x):
        core, ed, ew = _cluster.exact_knn_mutual_reachability(
            x, rep_valid, rep_mult, k=k_core)
        return _chain_fold(x, jnp.sum(ew, dtype=jnp.float32)), (core, ed, ew)
    t = chain_time(step, rep_xyz, lambda o: jnp.sum(o[2]), 4)
    print(f"graph (chained device): {t*1e3:.1f} ms")
    core, edge_dst, edge_w = _cluster.exact_knn_mutual_reachability(
        rep_xyz, rep_valid, rep_mult, k=k_core)
    jax.block_until_ready(edge_w)

    t0 = time.time()
    ed = np.asarray(edge_dst)
    ew = np.asarray(edge_w)
    mult_h = np.asarray(rep_mult)
    print(f"edge fetch -> host: {time.time()-t0:.3f}s "
          f"({(ed.nbytes + ew.nbytes + mult_h.nbytes)/1e6:.1f} MB)")

    t0 = time.time()
    rep_labels = _h._native_labels(ed, ew, cfg.min_cluster_size,
                                   node_w=mult_h)
    print(f"native condensed tree: {time.time()-t0:.3f}s")

    t0 = time.time()
    rep_labels = _h._finish_labels(rep_labels, np.asarray(rep_valid), ed, ew,
                                   cfg, sizes_w=mult_h.astype(np.int64))
    lab_pad = np.concatenate([rep_labels, np.full((1,), -1, np.int32)])
    out = lab_pad[np.minimum(np.asarray(point_rep), cfg.hdbscan_rep_cap)]
    print(f"finish+broadcast: {time.time()-t0:.3f}s")

    # full-call wall for reference (what the bench's e2e section sees)
    for rep in range(3):
        t0 = time.time()
        _ = _h.hdbscan(xyz, valid, cfg)
        print(f"hdbscan() full call wall: {time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
