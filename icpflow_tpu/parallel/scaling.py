"""Scaling-efficiency measurement for the sharded step.

Measures scan-pairs/sec of `make_sharded_step` at increasing dp widths on
whatever device pool is available (real chips, or the virtual CPU mesh for
plumbing validation) and reports efficiency relative to linear scaling.

    python -m icpflow_tpu.parallel.scaling            # real devices
    python -m icpflow_tpu.parallel.scaling --virtual 8

On the single-chip harness this primarily validates that collective overhead
(cp pmin/all_gather, dp psum) stays negligible; true multi-host numbers
require a pod slice (mesh axes are already laid out for it: dp across
hosts/DCN, cp across chips/ICI).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_scaling(widths, cfg=None, batch_per_device: int = 1,
                iters: int = 5):
    import jax
    import jax.numpy as jnp
    from ..config import DEMO
    from .mesh import make_mesh
    from .shard import make_sharded_step

    if cfg is None:
        cfg = DEMO.replace(
            max_points_scene=8192, max_points=512, num_clusters=32,
            max_pairs=32, pairs_small=32, pairs_large=4,
            min_cluster_size=10, nn_tile=256, hist_grid_xy=64,
            icp_max_iters=10)

    rng = np.random.default_rng(0)
    n = cfg.max_points_scene
    results = []
    for w in widths:
        if w > len(jax.devices()):
            continue
        mesh = make_mesh(w, 1)
        step = make_sharded_step(mesh, cfg)
        B = w * batch_per_device

        def mk(seed):
            r = np.random.default_rng(seed)
            return (jnp.asarray(r.uniform(-10, 10, (B, n, 3)).astype(
                        np.float32)),
                    jnp.asarray(np.ones((B, n), bool)),
                    jnp.asarray(r.integers(-1, cfg.num_clusters,
                                           (B, n)).astype(np.int32)))
        src = mk(0)
        dst = mk(1)
        gt = jnp.zeros((B, n, 3), jnp.float32)
        poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
        tfs = jnp.full((B,), 4.0, jnp.float32)
        # chained + value-fetch timing (see bench.py TIMING METHODOLOGY):
        # the runtime defers queued executions, so each iteration folds the
        # previous output into its input and the loop closes with a fetch
        out = step(*src, *dst, gt, poses, tfs)
        _ = float(jnp.sum(out[2]))
        pts = src[0]
        t0 = time.time()
        for _ in range(iters):
            out = step(pts, *src[1:], *dst, gt, poses, tfs)
            pts = pts + 1e-30 * out[0]
        _ = float(jnp.sum(out[2]))
        dt = (time.time() - t0) / iters
        pps = B / dt
        results.append({"dp": w, "pairs_per_sec": pps})
    base = results[0]["pairs_per_sec"] / results[0]["dp"]
    backend = jax.default_backend()
    for r in results:
        r["efficiency"] = r["pairs_per_sec"] / (base * r["dp"])
        r["backend"] = backend
        if backend == "cpu":
            # virtual devices share physical cores: throughput cannot scale,
            # so "efficiency" here only validates collective plumbing
            r["note"] = "virtual-cpu: shared cores, efficiency not meaningful"
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force a virtual CPU platform with N devices")
    ap.add_argument("--widths", type=int, nargs="+", default=None)
    args = ap.parse_args()
    if args.virtual:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.virtual}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    n_dev = len(jax.devices())
    widths = args.widths or [w for w in (1, 2, 4, 8, 16, 32) if w <= n_dev]
    results = run_scaling(widths)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
