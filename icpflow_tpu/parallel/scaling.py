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
import os
import time

import numpy as np


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
_HLO_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
              "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def collective_stats(compiled_text: str):
    """Count collective instructions and sum their OUTPUT bytes per step
    from compiled HLO text (static per program — the ICI traffic a step
    pays, up to in-place reuse)."""
    import re
    counts = {}
    total_bytes = 0
    # e.g. "  %ar = f32[6]{0} all-reduce(...)" or tuple-shaped outputs
    pat = re.compile(
        r"=\s*((?:\([^)]*\)|[a-z0-9]+\[[^\]]*\])[^ ]*)\s+(" +
        "|".join(_COLLECTIVES) + r")\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in pat.finditer(compiled_text):
        shape_txt, op = m.group(1), m.group(2)
        counts[op] = counts.get(op, 0) + 1
        for dt, dims in shape_pat.findall(shape_txt):
            if dt not in _HLO_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total_bytes += n * _HLO_BYTES[dt]
    return counts, total_bytes


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
        compiled = step.lower(*src, *dst, gt, poses, tfs).compile()
        coll_counts, coll_bytes = collective_stats(compiled.as_text())
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
        results.append({"dp": w, "pairs_per_sec": pps,
                        "collectives_per_step": coll_counts,
                        "collective_bytes_per_step": coll_bytes})
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
    ap.add_argument("--json", type=str, default=None,
                    help="also append results (one object) to this file")
    args = ap.parse_args()
    if args.virtual:
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
    if args.json:
        blob = {"results": results}
        if os.path.exists(args.json):
            with open(args.json) as f:
                try:
                    prev = json.load(f)
                except Exception:
                    prev = {}
            prev.setdefault("runs", []).append(blob)
            out = prev
        else:
            out = {"runs": [blob]}
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
