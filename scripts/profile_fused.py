"""Profile the fused per-pair program on the real chip; print top device ops.

Usage: python scripts/profile_fused.py [iters]

Captures a jax.profiler trace of the steady-state fused pipeline
(`SceneFlowEngine.run_pair` on the full-res demo fixture) and prints the
device-time breakdown by XLA op category — the ground truth for where the
per-pair budget goes (docs claims must trace back to this, not to staged
micro-benches, which measure each stage at full dispatch isolation).
"""

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.demo import load_demo_npz
from bench import make_cfg, DEMO_PATH


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    data = load_demo_npz(DEMO_PATH)
    cfg = make_cfg()
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
    jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)

    out = engine.run_pair(jps, jvs, jpd, jvd, 2.0)
    jax.block_until_ready(out.flow)

    logdir = "/tmp/icpflow_prof"
    with jax.profiler.trace(logdir):
        t0 = time.time()
        for _ in range(iters):
            out = engine.run_pair(jps, jvs, jpd, jvd, 2.0)
        jax.block_until_ready(out.flow)
        wall = time.time() - t0
    print(f"wall: {wall*1e3/iters:.3f} ms/pair over {iters} iters")

    traces = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace captured")
        return
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device track pids: names containing "TPU" and not "Host"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm:
                dev_pids.add(e["pid"])
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            agg[name] += e["dur"]
            total += e["dur"]
    print(f"total device-op time: {total/1e3/iters:.3f} ms/pair")
    for name, dur in agg.most_common(40):
        print(f"{dur/1e3/iters:9.4f} ms  {100*dur/max(total,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
