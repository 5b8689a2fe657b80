"""Decompose DBSCAN device time on the demo joint cloud.

Times the full dbscan at several label-propagation caps (the while_loop
runs min(actual_rounds, max_iters), so the time-vs-cap curve reveals both
the per-round cost and the actual round count), plus a candidates-only
probe (min_points=10^9 makes every point noise, so propagation exits
after one round). Chained + value-fetch timing (see bench.py docstring).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dbscan.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.ops import cluster as _cluster


def fetch_barrier_cost():
    x = jnp.zeros((8,), jnp.float32)
    _ = float(jnp.sum(x))
    ts = []
    for _ in range(5):
        t0 = time.time()
        _ = float(jnp.sum(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def chain_time(step, state0, probe, iters, barrier):
    st, out = step(state0)
    _ = float(probe(out))
    st = state0
    t0 = time.time()
    for _ in range(iters):
        st, out = step(st)
    _ = float(probe(out))
    return max((time.time() - t0 - barrier) / iters, 1e-9)


def main():
    cfg = DEMO.replace(
        max_points_scene=131072, max_points=4096, num_clusters=200,
        min_cluster_size=20, nn_tile=256, hist_grid_xy=256,
        epsilon=0.6, eps_scale_per_m=0.012, eps_max=0.8)
    data = load_demo_npz("/root/reference/demo.npz")
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    cat_p = jnp.concatenate([jnp.asarray(p_dst), jnp.asarray(p_src)])
    cat_v = jnp.concatenate([jnp.asarray(v_dst), jnp.asarray(v_src)])
    barrier = fetch_barrier_cost()
    print(f"barrier={barrier*1e3:.0f}ms  n={cat_p.shape[0]}")

    def run(tag, **over):
        kw = dict(eps=cfg.epsilon, min_points=cfg.min_cluster_size,
                  num_clusters=cfg.num_clusters,
                  cell_cap=cfg.cluster_cell_cap,
                  max_iters=cfg.cluster_max_iters,
                  eps_scale_per_m=cfg.eps_scale_per_m, eps_max=cfg.eps_max)
        kw.update(over)

        @jax.jit
        def step(p):
            lab = _cluster.dbscan(p, cat_v, **kw)
            return p + 1e-30 * jnp.sum(lab).astype(p.dtype), lab
        t = chain_time(step, cat_p, lambda o: jnp.sum(o), 4, barrier)
        lab = step(cat_p)[1]
        ncl = int(jnp.max(lab)) + 1
        print(f"{tag:28s} {t*1e3:8.1f} ms   clusters={ncl}", flush=True)
        return t

    run("candidates-only (allnoise)", min_points=10 ** 9, max_iters=2)
    for mi in (2, 4, 8, 12, 16, 24, 32, 100):
        run(f"max_iters={mi}", max_iters=mi)


if __name__ == "__main__":
    main()
