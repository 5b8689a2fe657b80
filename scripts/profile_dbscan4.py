"""Candidate-pass edge-selection variants (the 184 ms mystery).

profile_dbscan2 measured: tiles counts-only 21 ms, tiles counts+edges
205 ms — the two extra (T,9,W) min/max reductions cost ~9x the whole
distance pass. This script times alternatives at demo scale and checks how
many edge slots each yields (connectivity budget for the propagation).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dbscan4.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops.cluster import _NBR9

cfg = DEMO.replace(max_points_scene=131072, max_points=4096, num_clusters=200,
                   min_cluster_size=20, nn_tile=256, epsilon=0.6,
                   eps_scale_per_m=0.012, eps_max=0.8)
data = load_demo_npz("/root/reference/demo.npz")
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
n = xyz.shape[0]
eps, eps_scale, eps_max = cfg.epsilon, cfg.eps_scale_per_m, cfg.eps_max
cell_cap = cfg.cluster_cell_cap
rcap = 2 * cell_cap
tile = 2048
f32 = jnp.float32


def chain2(step, s0, probe, k=4):
    st, out = step(s0)
    _ = float(probe(out))
    def run(m):
        st = s0
        t0 = time.time()
        for _ in range(m):
            st, out = step(st)
        _ = float(probe(out))
        return time.time() - t0
    t1 = run(k)
    t2 = run(2 * k)
    return (t2 - t1) / k


# ---- shared prep (copied from ops/cluster.py dbscan steps 1-3a) ----------
cell_size = eps_max
cell = jnp.floor(xyz / cell_size).astype(jnp.int32)
cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
span = jnp.maximum(cmax - cmin + 3, 1)
cc = cell - cmin + 1
ids = jnp.where(valid, (cc[..., 0] * span[1] + cc[..., 1]) * span[2]
                + cc[..., 2], jnp.int32(2 ** 30))
order = jnp.argsort(ids)
ids_s = ids[order]
xyz_s = xyz[order]
rng_xy = jnp.linalg.norm(xyz_s[:, :2], axis=1)
eps_s = jnp.clip(eps + eps_scale * rng_xy, eps, eps_max)
n_valid = int(jnp.sum(valid.astype(jnp.int32)))
deltas = jnp.stack([(jnp.int32(dx) * span[1] + jnp.int32(dy)) * span[2] - 1
                    for dx, dy in _NBR9])
lo = ids_s[:, None] + deltas[None, :]
queries = jnp.concatenate([lo, lo + 3], axis=1)
bounds = jnp.searchsorted(ids_s, queries.reshape(-1),
                          method="sort").reshape(n, 18).astype(jnp.int32)
starts_all = jnp.asarray(bounds[:, :9])
tots_all = jnp.asarray(bounds[:, 9:] - bounds[:, :9])

blk = 64
width = ((blk + rcap + blk - 1) // blk) * blk
nb = -(-n // blk)
xyz_sp = jnp.pad(xyz_s, ((0, nb * blk + width - n), (0, 0)))
blocks = jnp.concatenate(
    [xyz_sp[o:o + nb * blk].reshape(nb, blk, 3)
     for o in range(0, width, blk)], axis=1)

pad_tile = (-n) % tile
nt = (n + pad_tile) // tile
xyz_pad = jnp.pad(xyz_s, ((0, pad_tile), (0, 0)))
eps_pad = jnp.pad(eps_s, (0, pad_tile))
starts_pad = jnp.pad(starts_all, ((0, pad_tile), (0, 0)), constant_values=n)
tots_pad = jnp.pad(tots_all, ((0, pad_tile), (0, 0)))
nv = jnp.int32(n_valid)


def tile_core(t):
    base = t * tile
    rows = base + jnp.arange(tile)
    p = jax.lax.dynamic_slice_in_dim(xyz_pad, base, tile)
    p_eps = jax.lax.dynamic_slice_in_dim(eps_pad, base, tile)
    st = jax.lax.dynamic_slice_in_dim(starts_pad, base, tile)
    tt = jax.lax.dynamic_slice_in_dim(tots_pad, base, tile)
    row_ok = rows < nv
    st_c = jnp.clip(st, 0, jnp.int32(n))
    bi = jnp.minimum(st_c // blk, nb - 1)
    g = blocks[bi]
    k = jnp.arange(width, dtype=jnp.int32)
    pos = bi[:, :, None] * blk + k[None, None, :]
    ok = ((pos >= st[:, :, None]) & (pos < st[:, :, None] + tt[:, :, None])
          & (pos < jnp.minimum(st[:, :, None] + rcap, nv)))
    d_sq = jnp.sum((g - p[:, None, None, :]) ** 2, axis=-1)
    e_cand = jnp.clip(eps + eps_scale * jnp.linalg.norm(g[..., :2], axis=-1),
                      eps, eps_max)
    r_edge = jnp.minimum(p_eps[:, None, None], e_cand)
    within = ok & (d_sq <= r_edge * r_edge) & row_ok[:, None, None]
    totf = tt.astype(f32)
    scale = totf / jnp.maximum(jnp.minimum(totf, rcap), 1.0)
    count = jnp.round(jnp.sum(
        jnp.sum(within, axis=2).astype(f32) * scale, axis=1)).astype(jnp.int32)
    return count, within, pos, d_sq


def run_variant(name, tile_fn, out_width):
    def step(p):
        res = jax.lax.map(tile_fn, jnp.arange(nt))
        return p + 1e-30 * res[1].astype(f32).sum(), res

    t = chain2(jax.jit(step), xyz_pad, lambda o: jnp.sum(o[0]))
    res = jax.jit(step)(xyz_pad)[1]
    edges = np.asarray(res[1]).reshape(-1, out_width)[:n]
    occ = float((edges < n).mean() * out_width)
    print(f"{name:38s} {t*1e3:8.1f} ms  occupancy {occ:.2f}/pt", flush=True)


# (a) current: first+last within-eps per run (18 slots)
def tile_first_last(t):
    count, within, pos, _ = tile_core(t)
    pos_hit_min = jnp.min(jnp.where(within, pos, jnp.int32(2 ** 30)), axis=2)
    pos_hit_max = jnp.max(jnp.where(within, pos, -1), axis=2)
    e_first = jnp.where(pos_hit_min < 2 ** 30, pos_hit_min, n)
    e_last = jnp.where(pos_hit_max >= 0, pos_hit_max, n)
    return count, jnp.concatenate([e_first, e_last], axis=1)


# (b) argmin-distance per run (9 slots)
def tile_argmin(t):
    count, within, pos, d_sq = tile_core(t)
    dm = jnp.where(within, d_sq, jnp.float32(1e30))
    amin = jnp.argmin(dm, axis=2)
    hit = jnp.take_along_axis(within, amin[:, :, None], axis=2)[:, :, 0]
    e = jnp.where(hit, jnp.take_along_axis(pos, amin[:, :, None],
                                           axis=2)[:, :, 0], n)
    return count, e


# (c) packed single min-reduction: min over (k<<1|0) and ((W-1-k)<<1|1)
#     stacked channel axis -> one reduce for first AND last
def tile_packed(t):
    count, within, pos, _ = tile_core(t)
    k = jnp.arange(width, dtype=jnp.int32)
    fwd = jnp.where(within, k[None, None, :], jnp.int32(2 ** 20))
    bwd = jnp.where(within, width - 1 - k[None, None, :], jnp.int32(2 ** 20))
    both = jnp.stack([fwd, bwd], axis=2)                  # (T,9,2,W)
    m = jnp.min(both, axis=3)                             # (T,9,2)
    base = pos[:, :, 0]                                   # window start
    e_first = jnp.where(m[:, :, 0] < 2 ** 20, base + m[:, :, 0], n)
    e_last = jnp.where(m[:, :, 1] < 2 ** 20,
                       base + (width - 1 - m[:, :, 1]), n)
    return count, jnp.concatenate([e_first, e_last], axis=1)


run_variant("first+last (current, 18 slots)", tile_first_last, 18)
run_variant("argmin-distance (9 slots)", tile_argmin, 9)
run_variant("packed fwd/bwd min (18 slots)", tile_packed, 18)
