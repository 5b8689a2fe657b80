"""Decompose the weighted rep-scale DBSCAN (the 70 ms of the cluster stage).

Times at the bench config's rep bucket (27.8k reps in a 32768 bucket):
  * candidates only (debug_edges=True)
  * relax loop / border adopt / relabel (replicated stages on real edges)
The gap between (full - candidates - loop - border - relabel) is the edge
compaction + 2-key sort + dedup machinery.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_rep_dbscan.py
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
xyz_full = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
valid_full = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])

rep_xyz, rep_valid, rep_mult, point_rep, n_unique = \
    _cluster.voxel_dedup_compact(xyz_full, valid_full,
                                 voxel=cfg.cluster_dedup_voxel,
                                 cap=cfg.cluster_rep_cap)
xyz, valid, mult = rep_xyz, rep_valid, rep_mult
n = int(xyz.shape[0])
print(f"reps={int(n_unique)} bucket={n}", flush=True)

KW = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
          num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
          max_iters=cfg.cluster_max_iters,
          eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)


def t(name, step, s0, probe, iters=6):
    dt = chain_time(jax.jit(step), s0, probe, iters)
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def full_step(x):
    lab = _cluster.dbscan(x, valid, mult, **KW)
    return x + 1e-30 * lab[0].astype(x.dtype), lab
t("full weighted dbscan", full_step, xyz, lambda o: jnp.sum(o), iters=4)


def cand_step(x):
    e, c, o = _cluster.dbscan(x, valid, mult, debug_edges=True, **KW)
    return x + 1e-30 * c[0].astype(x.dtype), (e, c)
t("candidates only (debug_edges)", cand_step, xyz,
  lambda o: jnp.sum(o[0]), iters=6)

# ---- replicate the propagation stages on the REAL edge data -------------
edges, core, order = _cluster.dbscan(xyz, valid, mult, debug_edges=True, **KW)
edges_np = np.asarray(edges)
core_np = np.asarray(core)
order_np = np.asarray(order)
xyz_s = np.asarray(xyz)[order_np]
valid_s = np.asarray(valid)[order_np]
eps = cfg.epsilon
max_iters = cfg.cluster_max_iters

flat_v = edges_np.reshape(-1)
real = flat_v < n
e_u_all = np.where(real, np.arange(flat_v.size) // edges_np.shape[1],
                   n).astype(np.int32)
e_v_all = np.where(real, flat_v, n).astype(np.int32)
ecap = min(4 * n, flat_v.size)
sel = np.argsort(~real, kind="stable")[:ecap]
e_u_all = e_u_all[sel]
e_v_all = e_v_all[sel]

fside = eps / math.sqrt(3.0)
fcell = np.floor(xyz_s / fside).astype(np.int64)
fmin = fcell[valid_s].min(axis=0)
fspan = fcell[valid_s].max(axis=0) - fmin + 1
fid = ((fcell - fmin)[:, 0] * fspan[1] + (fcell - fmin)[:, 1]) * fspan[2] \
    + (fcell - fmin)[:, 2]
rep = np.full(n, n, np.int64)
idx_np = np.arange(n)
tbl = {}
for i in idx_np[core_np]:
    f = fid[i]
    if f not in tbl:
        tbl[f] = i
rep[core_np] = [tbl[f] for f in fid[core_np]]
rep = rep.astype(np.int32)

core_pad_np = np.concatenate([core_np, [False]])
rep_of = np.concatenate([rep, [n]]).astype(np.int32)
cc = core_pad_np[np.minimum(e_u_all, n)] & core_pad_np[np.minimum(e_v_all, n)]
ru = np.where(cc, rep_of[np.minimum(e_u_all, n)], n)
rv = np.where(cc, rep_of[np.minimum(e_v_all, n)], n)
ca, cb = np.minimum(ru, rv), np.maximum(ru, rv)
dead = ca == cb
ca[dead] = n
cb[dead] = n
uniq = np.unique(np.stack([ca, cb], 1)[ca < n], axis=0)
# same expression as ops/cluster.py (the n_uni<=ccap cond there falls back
# to the compacted path on overflow); keep the two in sync — ADVICE r4.
# Round 5 landed the scene-scale floor in cluster.py proper.
ccap = min(max(n // 2, 49152), ecap)
cu = np.full(ccap, n, np.int32)
cv = np.full(ccap, n, np.int32)
cu[:len(uniq)] = uniq[:, 0]
cv[:len(uniq)] = uniq[:, 1]
print(f"unique cell edges {len(uniq)} (ccap {ccap})", flush=True)

rl_cap = max(1024, n // 4)
is_rep = core_np & (rep == idx_np)
rl = np.flatnonzero(is_rep)
rlist = np.full(rl_cap, n, np.int32)
rlist[:len(rl)] = rl[:rl_cap]
print(f"reps(contracted)={is_rep.sum()} (cap {rl_cap})", flush=True)

core_d = jax.device_put(core_np)
rep_d = jax.device_put(rep)
cu_d, cv_d = jax.device_put(cu), jax.device_put(cv)
rlist_d = jax.device_put(rlist)
eu_d, ev_d = jax.device_put(e_u_all), jax.device_put(e_v_all)
core_pad = jnp.concatenate([core_d, jnp.zeros((1,), bool)])


@jax.jit
def loop_stage(seed):
    init = jnp.where(core_d, jnp.minimum(rep_d, rep_d + seed), n)

    def prop_body(state):
        lab, _, it = state
        lab_pad = jnp.concatenate([lab, jnp.full((1,), n, jnp.int32)])
        m = jnp.minimum(lab_pad[cu_d], lab_pad[cv_d])
        new = lab_pad.at[cu_d].min(m).at[cv_d].min(m)
        lr = new[rlist_d]
        jumped = jnp.minimum(lr, new[new[lr]])
        new = new.at[rlist_d].min(jumped)[:n]
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    label, _, iters = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), prop_body,
        (init, jnp.bool_(True), jnp.int32(0)))
    return seed + jnp.int32(0) * label[0], (label, iters)


@jax.jit
def border_stage(label):
    lab_pad = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
    from_u = jnp.where(core_pad[eu_d], lab_pad[eu_d], n)
    from_v = jnp.where(core_pad[ev_d], lab_pad[ev_d], n)
    border_lab = (jnp.full((n + 1,), n, jnp.int32)
                  .at[eu_d].min(from_v).at[ev_d].min(from_u))[:n]
    return label + jnp.int32(0) * border_lab[0], border_lab


@jax.jit
def relabel_stage(label):
    sizes = jnp.bincount(jnp.minimum(label, n), length=n + 1)[:n]
    c = min(cfg.num_clusters, n)
    _, top_roots = jax.lax.top_k(sizes, c)
    keep = sizes[top_roots] > 0
    table = jnp.full((n + 1,), -1, jnp.int32).at[top_roots].set(
        jnp.where(keep, jnp.arange(c, dtype=jnp.int32), -1))
    out = table[jnp.minimum(label, n)]
    return label + jnp.int32(0) * out[0], out


lab0, iters = loop_stage(jnp.int32(0))[1]
print(f"loop iters to converge: {int(iters)}", flush=True)
t("relax while_loop", lambda s: loop_stage(s), jnp.int32(0),
  lambda o: jnp.sum(o[0]), iters=4)
t("border adopt", lambda s: border_stage(s), lab0, lambda o: jnp.sum(o),
  iters=6)
t("relabel (bincount+topk)", lambda s: relabel_stage(s), lab0,
  lambda o: jnp.sum(o), iters=6)

# the 2-key sort of the ecap edge buffer (the compaction machinery's core)
ca_d = jax.device_put(ca.astype(np.int32))
cb_d = jax.device_put(cb.astype(np.int32))


@jax.jit
def sort_stage(x):
    a, b = jax.lax.sort((ca_d + x, cb_d), num_keys=2)
    return x + jnp.int32(0) * a[0], a
t(f"2-key sort @ecap={ecap}", sort_stage, jnp.int32(0),
  lambda o: jnp.sum(o), iters=6)


@jax.jit
def compact_stage(x):
    fv = jax.device_put(flat_v.astype(np.int32)) + x * 0
    (s,) = jnp.nonzero(fv < n, size=ecap, fill_value=fv.shape[0])
    return x + jnp.int32(0) * s[0], s
t(f"edge nonzero-compact @{flat_v.size}", compact_stage, jnp.int32(0),
  lambda o: jnp.sum(o), iters=6)
