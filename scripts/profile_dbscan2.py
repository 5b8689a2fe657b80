"""Finer decomposition of the DBSCAN candidate pass (copies of cluster.py
sub-steps timed independently; chained + value-fetch methodology).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dbscan2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops.cluster import _NBR9


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
    min_cluster_size=20, nn_tile=256, hist_grid_xy=256,
    epsilon=0.6, eps_scale_per_m=0.012, eps_max=0.8)
data = load_demo_npz("/root/reference/demo.npz")
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
xyz = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
valid = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
bar = barrier_cost()
n = xyz.shape[0]
eps, eps_scale, eps_max = cfg.epsilon, cfg.eps_scale_per_m, cfg.eps_max
cell_size = eps_max
tile = 2048
rcap = 128
blk = 64

print(f"barrier={bar*1e3:.0f}ms n={n}", flush=True)


@jax.jit
def prep(xyz):
    f32 = jnp.float32
    cell = jnp.floor(xyz / cell_size).astype(jnp.int32)
    cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
    span = jnp.maximum(cmax - cmin + 3, 1)
    cc = cell - cmin + 1
    ids = jnp.where(valid, (cc[..., 0] * span[1] + cc[..., 1]) * span[2]
                    + cc[..., 2], jnp.int32(2 ** 30))
    order = jnp.argsort(ids)
    return ids[order], xyz[order], span


ids_s, xyz_s, span = prep(xyz)


def t_prep():
    @jax.jit
    def step(x):
        i, xs, sp = prep(x)
        return x + 1e-30 * xs, (i, xs, sp)
    return chain_time(step, xyz, lambda o: jnp.sum(o[1]), 8, bar)


def t_bounds():
    deltas = jnp.stack(
        [(jnp.int32(dx) * span[1] + jnp.int32(dy)) * span[2] - 1
         for dx, dy in _NBR9])

    @jax.jit
    def step(i):
        lo = i[:, None] + deltas[None, :]
        bounds = jnp.searchsorted(
            i, jnp.concatenate([lo, lo + 3], axis=1).reshape(-1),
            method="sort").reshape(n, 18).astype(jnp.int32)
        return i + 0 * bounds[:, 0], bounds
    return chain_time(step, ids_s, lambda o: jnp.sum(o), 4, bar)


def t_bounds_table():
    """Dense cell-start table instead of sort-merge searchsorted."""
    deltas = jnp.stack(
        [(jnp.int32(dx) * span[1] + jnp.int32(dy)) * span[2] - 1
         for dx, dy in _NBR9])
    cap = 1 << 22

    @jax.jit
    def step(i):
        ncell = span[0] * span[1] * span[2]
        iv = jnp.minimum(i, ncell)  # invalid ids (2^30) -> ncell bucket
        cnt = jnp.zeros((cap + 2,), jnp.int32).at[
            jnp.minimum(iv, cap + 1)].add(1, mode="drop")
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1]])
        lo = i[:, None] + deltas[None, :]
        q = jnp.concatenate([lo, lo + 3], axis=1)
        q = jnp.clip(q, 0, jnp.minimum(ncell, cap + 1))
        bounds = starts[q].astype(jnp.int32)
        return i + 0 * bounds[0, 0], bounds
    return chain_time(step, ids_s, lambda o: jnp.sum(o), 4, bar)


deltas = jnp.stack(
    [(jnp.int32(dx) * span[1] + jnp.int32(dy)) * span[2] - 1
     for dx, dy in _NBR9])
lo = ids_s[:, None] + deltas[None, :]
bounds = jnp.searchsorted(
    ids_s, jnp.concatenate([lo, lo + 3], axis=1).reshape(-1),
    method="sort").reshape(n, 18).astype(jnp.int32)
starts_all = bounds[:, :9]
tots_all = bounds[:, 9:] - starts_all
n_valid = jnp.sum(valid.astype(jnp.int32))


def make_tile_fn(with_edges: bool, e_per: int = 2):
    f32 = jnp.float32
    width = ((blk + rcap + blk - 1) // blk) * blk
    nb = -(-n // blk)

    @jax.jit
    def run(xyz_s):
        rng_xy = jnp.linalg.norm(xyz_s[:, :2], axis=1)
        eps_s = jnp.clip(eps + eps_scale * rng_xy, eps, eps_max)
        xyz_sp = jnp.pad(xyz_s, ((0, nb * blk + width - n), (0, 0)))
        blocks = jnp.concatenate(
            [xyz_sp[o:o + nb * blk].reshape(nb, blk, 3)
             for o in range(0, width, blk)], axis=1)
        pad_tile = (-n) % tile
        nt = (n + pad_tile) // tile
        xyz_pad = jnp.pad(xyz_s, ((0, pad_tile), (0, 0)))
        eps_pad = jnp.pad(eps_s, (0, pad_tile))
        starts_pad = jnp.pad(starts_all, ((0, pad_tile), (0, 0)),
                             constant_values=n)
        tots_pad = jnp.pad(tots_all, ((0, pad_tile), (0, 0)))

        def tile_pass(t):
            base = t * tile
            rows = base + jnp.arange(tile)
            p = jax.lax.dynamic_slice_in_dim(xyz_pad, base, tile)
            p_eps = jax.lax.dynamic_slice_in_dim(eps_pad, base, tile)
            st = jax.lax.dynamic_slice_in_dim(starts_pad, base, tile)
            tt = jax.lax.dynamic_slice_in_dim(tots_pad, base, tile)
            row_ok = rows < n_valid
            st_c = jnp.clip(st, 0, jnp.int32(n))
            bi = jnp.minimum(st_c // blk, nb - 1)
            g = blocks[bi]
            k = jnp.arange(width, dtype=jnp.int32)
            pos = bi[:, :, None] * blk + k[None, None, :]
            ok = ((pos >= st[:, :, None])
                  & (pos < st[:, :, None] + tt[:, :, None])
                  & (pos < jnp.minimum(st[:, :, None] + rcap, n_valid)))
            d_sq = jnp.sum((g - p[:, None, None, :]) ** 2, axis=-1)
            e_cand = jnp.clip(
                eps + eps_scale * jnp.linalg.norm(g[..., :2], axis=-1),
                eps, eps_max)
            r_edge = jnp.minimum(p_eps[:, None, None], e_cand)
            within = ok & (d_sq <= r_edge * r_edge) & row_ok[:, None, None]
            totf = tt.astype(f32)
            scale = totf / jnp.maximum(jnp.minimum(totf, rcap), 1.0)
            count = jnp.round(jnp.sum(
                jnp.sum(within, axis=2).astype(f32) * scale, axis=1)
            ).astype(jnp.int32)
            if not with_edges:
                return count, count
            czq = jnp.floor(p[:, 2] / cell_size).astype(jnp.int32)
            czc = jnp.floor(g[..., 2] / cell_size).astype(jnp.int32)
            zi = jnp.clip(czc - czq[:, None, None] + 1, 0, 2)
            e_list = []
            for z in range(3):
                wz = within & (zi == z)
                rank = jnp.cumsum(wz.astype(jnp.int32), axis=2)
                for e in range(e_per):
                    hit = wz & (rank == e + 1)
                    has = jnp.any(hit, axis=2)
                    idx_e = jnp.argmax(hit, axis=2)
                    e_pos = jnp.take_along_axis(
                        pos, jnp.minimum(idx_e[:, :, None], width - 1),
                        axis=2)[..., 0]
                    e_list.append(jnp.where(has, e_pos, n))
            return count, jnp.stack(e_list, axis=2).reshape(tile, 27 * e_per)

        counts, edges = jax.lax.map(tile_pass, jnp.arange(nt))
        return counts.reshape(-1)[:n], edges

    return run


for name, fn in (
        ("prep (cells+argsort)", None),
        ("bounds searchsorted-sort", None),
        ("bounds dense-table", None),
        ("tiles counts-only", make_tile_fn(False)),
        ("tiles counts+edges", make_tile_fn(True))):
    if name.startswith("prep"):
        t = t_prep()
    elif name == "bounds searchsorted-sort":
        t = t_bounds()
    elif name == "bounds dense-table":
        t = t_bounds_table()
    else:
        @jax.jit
        def step(x, fn=fn):
            c, e = fn(x)
            return x + 1e-30 * jnp.sum(c).astype(x.dtype), (c, e)
        t = chain_time(step, xyz_s, lambda o: jnp.sum(o[0]), 4, bar)
    print(f"{name:28s} {t*1e3:8.1f} ms", flush=True)
