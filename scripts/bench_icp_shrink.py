"""Micro-bench: ICP tail compaction (icp_core shrink) at the matcher buckets.

Chained + value-fetch timing (see bench.py docstring). Compares shrink=0
vs the configured shrink on realistic mixed-difficulty inputs: most pairs
converge quickly, a few oscillate — the regime the compaction targets.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/icpflow_jax_cache")

from icpflow_tpu import DEMO
from icpflow_tpu.ops import icp as _icp

cfg = DEMO


def chain_time(step, state0, probe, iters, barrier):
    st, out = step(state0)
    _ = float(probe(out))
    st = state0
    t0 = time.time()
    for _ in range(iters):
        st, out = step(st)
    _ = float(probe(out))
    return max((time.time() - t0 - barrier) / iters, 1e-9)


def barrier_cost():
    x = jnp.zeros((8,), jnp.float32)
    _ = float(jnp.sum(x))
    ts = []
    for _ in range(5):
        t0 = time.time()
        _ = float(jnp.sum(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def make_bucket(rng, b, n):
    """Mixed difficulty: clean offsets for most pairs, self-similar noise
    blobs (ICP oscillators) for ~1/8."""
    src = rng.normal(size=(b, n, 3)).astype(np.float32) * 2.0
    dst = src + np.array([0.3, -0.2, 0.05], np.float32)
    hard = rng.random(b) < 0.125
    reroll = rng.normal(size=(b, n, 3)).astype(np.float32) * 2.0
    dst = np.where(hard[:, None, None], reroll, dst)
    msk = rng.random((b, n)) > 0.2
    return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(msk)


def main():
    rng = np.random.default_rng(0)
    bar = barrier_cost()
    print(f"barrier {bar*1e3:.1f} ms")
    for name, (b, n) in {"small": (cfg.pairs_small, cfg.max_points_small),
                         "large": (cfg.pairs_large, cfg.max_points)}.items():
        src, dst, msk = make_bucket(rng, b, n)
        for shrink in (0, 4, 8, 16):
            @jax.jit
            def step(x, shrink=shrink):
                T = _icp.icp_core(
                    x, msk, dst, msk, thres=cfg.thres_dist,
                    max_iters=cfg.icp_max_iters, tile=cfg.nn_tile,
                    patience=cfg.icp_patience, stall_rel=cfg.icp_stall_rel,
                    corr_cap=cfg.icp_corr_cap, shrink=shrink)
                return x + 1e-30 * T[:, :3, 3][:, None, :], T

            dt = chain_time(step, src, lambda o: jnp.sum(o), 4, bar)
            T = np.asarray(step(src)[1])
            print(f"icp_{name} shrink={shrink}: {dt*1e3:8.2f} ms  "
                  f"tsum={np.abs(T[:, :3, 3]).sum():.4f}")


if __name__ == "__main__":
    main()
