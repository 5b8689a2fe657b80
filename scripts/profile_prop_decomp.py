"""Decompose DBSCAN's post-candidate cost on the real chip.

Replicates step-4 machinery (compaction, fine-cell contraction, sort-dedup)
piecewise from the debug_edges output, timing each stage chained.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_prop_decomp.py
"""
import math
import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops import cluster as _cluster
from bench import make_cfg, DEMO_PATH, chain_time

cfg = make_cfg()
data = load_demo_npz(DEMO_PATH)
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])

kw = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
          num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
          max_iters=cfg.cluster_max_iters,
          eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)

edges, core, order = _cluster.dbscan(xyz, valid, debug_edges=True, **kw)
edges = jax.device_put(np.asarray(edges))
core = jax.device_put(np.asarray(core))
xyz_s = jnp.asarray(np.asarray(xyz)[np.asarray(order)])
valid_s = jnp.asarray(np.asarray(valid)[np.asarray(order)])
n = int(xyz.shape[0])
eps = cfg.epsilon
idx = jnp.arange(n, dtype=jnp.int32)


@jax.jit
def compact_stage(e):
    flat_v = e.reshape(-1)
    ecap = min(4 * n, flat_v.shape[0])
    (sel,) = jnp.nonzero(flat_v < n, size=ecap, fill_value=flat_v.shape[0])
    sel_c = jnp.minimum(sel, flat_v.shape[0] - 1)
    e_u = (sel_c // e.shape[1]).astype(jnp.int32)
    e_v = flat_v[sel_c]
    e_real = sel < flat_v.shape[0]
    e_u = jnp.where(e_real, e_u, n)
    e_v = jnp.where(e_real, e_v, n)
    return e + jnp.int32(0) * (e_u[0] + e_v[0]), (e_u, e_v)


flat_v = edges.reshape(-1)
ecap = min(4 * n, flat_v.shape[0])
(sel,) = jnp.nonzero(flat_v < n, size=ecap, fill_value=flat_v.shape[0])
sel_c = jnp.minimum(sel, flat_v.shape[0] - 1)
e_u_all = jnp.where(sel < flat_v.shape[0],
                    (sel_c // edges.shape[1]).astype(jnp.int32), n)
e_v_all = jnp.where(sel < flat_v.shape[0], flat_v[sel_c], n)
e_u_all, e_v_all = jax.device_put(np.asarray(e_u_all)), jax.device_put(
    np.asarray(e_v_all))

# fine-cell rep
fside = eps / math.sqrt(3.0)
fcell = jnp.floor(xyz_s / fside).astype(jnp.int32)
fmin = jnp.min(jnp.where(valid_s[:, None], fcell, 2 ** 20), axis=0)
fspan = jnp.maximum(
    jnp.max(jnp.where(valid_s[:, None], fcell, -(2 ** 20)), axis=0)
    - fmin + 1, 1)
fcc = fcell - fmin
fid = (fcc[..., 0] * fspan[1] + fcc[..., 1]) * fspan[2] + fcc[..., 2]
ftable_cap = 1 << 22
fid_c = jnp.clip(fid, 0, ftable_cap - 1)


@jax.jit
def rep_stage(eu):
    rep_table = jnp.full((ftable_cap + 1,), n, jnp.int32).at[
        jnp.where(core, fid_c, ftable_cap)].min(idx, mode="drop")
    rep = jnp.where(core, rep_table[fid_c], n)
    return eu + jnp.int32(0) * rep[0], rep


rep = rep_stage(e_u_all)[1]
rep = jax.device_put(np.asarray(rep))
core_pad = jnp.concatenate([core, jnp.zeros((1,), bool)])
rep_of = jnp.concatenate([rep, jnp.full((1,), n, jnp.int32)])


@jax.jit
def sort_stage(eu):
    cc_all = core_pad[eu] & core_pad[e_v_all]
    ru = jnp.where(cc_all, rep_of[eu], n)
    rv = jnp.where(cc_all, rep_of[e_v_all], n)
    ca = jnp.minimum(ru, rv)
    cb = jnp.maximum(ru, rv)
    dead = ca == cb
    ca = jnp.where(dead, n, ca)
    cb = jnp.where(dead, n, cb)
    ca_s, cb_s = jax.lax.sort((ca, cb), num_keys=2)
    return eu + jnp.int32(0) * ca_s[0], (ca_s, cb_s)


ca_s, cb_s = sort_stage(e_u_all)[1]
ca_s = jax.device_put(np.asarray(ca_s))
cb_s = jax.device_put(np.asarray(cb_s))


@jax.jit
def dedup_stage(ca):
    first = (ca < n) & ((jnp.arange(ecap) == 0)
                        | (ca != jnp.roll(ca, 1))
                        | (cb_s != jnp.roll(cb_s, 1)))
    ccap = min(max(n // 2, 16384), ecap)
    (csel,) = jnp.nonzero(first, size=ccap, fill_value=ecap)
    csel_c = jnp.minimum(csel, ecap - 1)
    c_real = csel < ecap
    cu = jnp.where(c_real, ca[csel_c], n)
    cv = jnp.where(c_real, cb_s[csel_c], n)
    return ca + jnp.int32(0) * cu[0], (cu, cv)


t_comp = chain_time(compact_stage, edges, lambda o: jnp.sum(o[0]), 4)
print(f"edge compaction (nonzero 2.36M->1M) {t_comp*1e3:7.1f} ms", flush=True)
t_rep = chain_time(rep_stage, e_u_all, lambda o: jnp.sum(o), 4)
print(f"rep scatter-min (4M table)          {t_rep*1e3:7.1f} ms", flush=True)
t_sort = chain_time(sort_stage, e_u_all, lambda o: jnp.sum(o[0]), 4)
print(f"cell-pair map + 2-key sort (1M)     {t_sort*1e3:7.1f} ms", flush=True)
t_dedup = chain_time(dedup_stage, ca_s, lambda o: jnp.sum(o[0]), 4)
print(f"mark-first + nonzero dedup (1M)     {t_dedup*1e3:7.1f} ms", flush=True)
