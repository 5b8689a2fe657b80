"""Decompose the SHIPPED dbscan's post-tile machinery (chained timing).

profile_dbscan2 covers prep/bounds/tile variants; this script times the
pieces between the (N,18) edge slab and the propagation fixpoint:
  * point-edge compaction (nonzero over the 18N slab)
  * fine-cell rep table build
  * cell-edge map + two-key sort + dedup-compact
  * rep list build
  * one relax round / full propagation
  * border adopt + final top-K relabel

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dbscan3.py
"""
import math
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops.cluster import dbscan


def barrier_cost():
    x = jnp.zeros((8,), jnp.float32)
    _ = float(jnp.sum(x))
    ts = []
    for _ in range(5):
        t0 = time.time()
        _ = float(jnp.sum(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def chain_time(step, state0, probe, iters, bar):
    st, out = step(state0)
    _ = float(probe(out))
    st = state0
    t0 = time.time()
    for _ in range(iters):
        st, out = step(st)
    _ = float(probe(out))
    return max((time.time() - t0 - bar) / iters, 1e-9)


cfg = DEMO.replace(
    max_points_scene=131072, max_points=4096, num_clusters=200,
    min_cluster_size=20, nn_tile=256, epsilon=0.6, eps_scale_per_m=0.012,
    eps_max=0.8)
data = load_demo_npz("/root/reference/demo.npz")
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
bar = barrier_cost()
n = xyz.shape[0]
eps = cfg.eps_max
print(f"barrier={bar*1e3:.0f}ms n={n}", flush=True)

# real slab via the debug hook
edges, core, order = dbscan(
    xyz, valid, eps=cfg.epsilon, min_points=cfg.min_cluster_size,
    num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
    max_iters=cfg.cluster_max_iters, eps_scale_per_m=cfg.eps_scale_per_m,
    eps_max=cfg.eps_max, debug_edges=True)
edges = jnp.asarray(edges)
core = jnp.asarray(core)
xyz_s = xyz[order]
valid_s = valid[order]
idx = jnp.arange(n, dtype=jnp.int32)
core_pad = jnp.concatenate([core, jnp.zeros((1,), bool)])
n_real = int(jnp.sum((edges.reshape(-1) < n).astype(jnp.int32)))
print(f"n_core={int(core.sum())} edge_occupancy={n_real/n:.2f}/pt", flush=True)


def timed(name, fn, x0, probe, iters=8):
    t = chain_time(jax.jit(fn), x0, probe, iters, bar)
    print(f"{name:34s} {t*1e3:8.1f} ms", flush=True)
    return t


ecap = min(8 * n, edges.reshape(-1).shape[0])

# 1. point-edge compaction
def compact(e):
    flat_v = e.reshape(-1)
    (sel,) = jnp.nonzero(flat_v < n, size=ecap, fill_value=flat_v.shape[0])
    sel_c = jnp.minimum(sel, flat_v.shape[0] - 1)
    e_u = (sel_c // e.shape[1]).astype(jnp.int32)
    e_v = flat_v[sel_c]
    real = sel < flat_v.shape[0]
    e_u = jnp.where(real, e_u, n)
    e_v = jnp.where(real, e_v, n)
    return e + 0, (e_u, e_v)

timed("point-edge nonzero compaction", compact, edges,
      lambda o: jnp.sum(o[0]))
_, (e_u_all, e_v_all) = jax.jit(compact)(edges)

# 2. rep table build
fside = eps / math.sqrt(3.0)
def rep_build(x):
    fcell = jnp.floor(x / fside).astype(jnp.int32)
    fmin = jnp.min(jnp.where(valid_s[:, None], fcell, 2 ** 20), axis=0)
    fmax = jnp.max(jnp.where(valid_s[:, None], fcell, -(2 ** 20)), axis=0)
    fspan = jnp.maximum(fmax - fmin + 1, 1)
    fcc = fcell - fmin
    fid = (fcc[..., 0] * fspan[1] + fcc[..., 1]) * fspan[2] + fcc[..., 2]
    cap = 1 << 22
    fid_c = jnp.clip(fid, 0, cap - 1)
    rep_table = jnp.full((cap + 1,), n, jnp.int32).at[
        jnp.where(core, fid_c, cap)].min(idx, mode="drop")
    rep = jnp.where(core, rep_table[fid_c], n)
    return x + 0.0, rep

timed("fine-cell rep table", rep_build, xyz_s, lambda o: jnp.sum(o))
_, rep = jax.jit(rep_build)(xyz_s)

# 3. cell-edge map + sort + dedup
def cell_edges(eu):
    rep_of = jnp.concatenate([rep, jnp.full((1,), n, jnp.int32)])
    cc_all = core_pad[eu] & core_pad[e_v_all]
    ru = jnp.where(cc_all, rep_of[eu], n)
    rv = jnp.where(cc_all, rep_of[e_v_all], n)
    ca = jnp.minimum(ru, rv)
    cb = jnp.maximum(ru, rv)
    dead = ca == cb
    ca = jnp.where(dead, n, ca)
    cb = jnp.where(dead, n, cb)
    ca_s, cb_s = jax.lax.sort((ca, cb), num_keys=2)
    first = (ca_s < n) & ((jnp.arange(ecap) == 0)
                          | (ca_s != jnp.roll(ca_s, 1))
                          | (cb_s != jnp.roll(cb_s, 1)))
    ccap = min(n, ecap)
    (csel,) = jnp.nonzero(first, size=ccap, fill_value=ecap)
    csel_c = jnp.minimum(csel, ecap - 1)
    c_real = csel < ecap
    cu = jnp.where(c_real, ca_s[csel_c], n)
    cv = jnp.where(c_real, cb_s[csel_c], n)
    return eu + 0, (cu, cv)

timed("cell-edge map+sort+dedup", cell_edges, e_u_all,
      lambda o: jnp.sum(o[0]))

# 3b. the same without the sort (hash-table dedup)
def cell_edges_hash(eu):
    rep_of = jnp.concatenate([rep, jnp.full((1,), n, jnp.int32)])
    cc_all = core_pad[eu] & core_pad[e_v_all]
    ru = jnp.where(cc_all, rep_of[eu], n)
    rv = jnp.where(cc_all, rep_of[e_v_all], n)
    ca = jnp.minimum(ru, rv)
    cb = jnp.maximum(ru, rv)
    dead = (ca == cb) | (ca >= n)
    cap = 1 << 21
    # multiplicative hash of the pair; collisions only leave duplicates
    h = ((ca * jnp.int32(-1640531535) + cb * jnp.int32(40503))
         & jnp.int32(2 ** 31 - 1)) % cap
    h = jnp.where(dead, cap, h)
    eidx = jnp.arange(ecap, dtype=jnp.int32)
    table = jnp.full((cap + 1,), ecap, jnp.int32).at[h].min(eidx, mode="drop")
    keep = table[h] == eidx                      # first edge with this hash
    ccap = min(n, ecap)
    (csel,) = jnp.nonzero(keep & ~dead, size=ccap, fill_value=ecap)
    csel_c = jnp.minimum(csel, ecap - 1)
    c_real = csel < ecap
    cu = jnp.where(c_real, ca[csel_c], n)
    cv = jnp.where(c_real, cb[csel_c], n)
    return eu + 0, (cu, cv)

timed("cell-edge hash dedup (alt)", cell_edges_hash, e_u_all,
      lambda o: jnp.sum(o[0]))

_, (cu, cv) = jax.jit(cell_edges)(e_u_all)
n_cell_edges = int(jnp.sum((cu < n).astype(jnp.int32)))
_, (cuh, cvh) = jax.jit(cell_edges_hash)(e_u_all)
n_hash_edges = int(jnp.sum((cuh < n).astype(jnp.int32)))
print(f"cell_edges={n_cell_edges} hash_edges={n_hash_edges}", flush=True)

# 4. rep list
rl_cap = max(1024, n // 4)
def rep_list(r):
    is_rep = core & (r == idx)
    (rlist,) = jnp.nonzero(is_rep, size=rl_cap, fill_value=n)
    return r + 0, rlist

timed("rep-list nonzero", rep_list, rep, lambda o: jnp.sum(o))
_, rlist = jax.jit(rep_list)(rep)

# 5. one relax round at the contracted level
def relax_round(lab):
    lab_pad = jnp.concatenate([lab, jnp.full((1,), n, jnp.int32)])
    m = jnp.minimum(lab_pad[cu], lab_pad[cv])
    new = lab_pad.at[cu].min(m).at[cv].min(m)
    lr = new[rlist]
    jumped = jnp.minimum(lr, new[new[lr]])
    new = new.at[rlist].min(jumped)[:n]
    return new, new

lab0 = jnp.where(core, rep, n)
timed("one contracted relax round", relax_round, lab0, lambda o: jnp.sum(o))

# 6. whole dbscan for reference
def whole(p):
    lab = dbscan(p, valid, eps=cfg.epsilon, min_points=cfg.min_cluster_size,
                 num_clusters=cfg.num_clusters, cell_cap=cfg.cluster_cell_cap,
                 max_iters=cfg.cluster_max_iters,
                 eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)
    return p + 1e-30 * jnp.sum(lab).astype(p.dtype), lab

timed("whole dbscan", whole, xyz, lambda o: jnp.sum(o), iters=4)
