"""Benchmark: full-resolution demo.npz scene-flow on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload: the reference's end-to-end demo path (`demo.py:198-259`) at full
resolution (63k valid points/frame, AV2). The reference requires a CUDA GPU
for this (`README.md:56`); its shipped prediction for this exact sample
(`demo.npz: est_flow`) scores EPE3D 0.0114, which is the accuracy bar.

Throughput metric: scan_pairs_per_sec (frame pairs fully processed per
second, including clustering + matching + flow, excluding host npz load).
vs_baseline is measured against BASELINE_PAIRS_PER_SEC = 1.0, a generous
estimate of the reference pipeline's single-GPU rate on this sample (its
hist+ICP alone runs hundreds of ms per cluster-pair chunk; the repo reports
runtime only as total wall-hours per dataset run, `main.py:313-314`).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.metrics import compute_epe
from icpflow_tpu.pipeline import run_frame_pair

BASELINE_PAIRS_PER_SEC = 1.0
DEMO_PATH = "/root/reference/demo.npz"


def main():
    data = load_demo_npz(DEMO_PATH)
    cfg = DEMO.replace(
        max_points_scene=131072,
        max_points=4096,
        num_clusters=200,
        max_pairs=256,
        min_cluster_size=20,
        nn_tile=256,
        hist_grid_xy=256,
        icp_max_iters=100,
    )
    engine = SceneFlowEngine(cfg)

    t0 = time.time()
    res = run_frame_pair(engine, data["point_src"], data["point_dst"],
                         translation_frame=2.0)
    compile_and_first = time.time() - t0

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        res = run_frame_pair(engine, data["point_src"], data["point_dst"],
                             translation_frame=2.0)
    dt = (time.time() - t0) / iters
    pairs_per_sec = 1.0 / dt

    gt = data["scene_flow"]
    epe, accs, accr, outlier, routlier = compute_epe(res.flow, gt)
    dyn = np.linalg.norm(gt, axis=1) > 0.05
    epe_dyn = float(np.linalg.norm((res.flow - gt)[dyn], axis=1).mean())

    print(json.dumps({
        "metric": "scan_pairs_per_sec",
        "value": round(pairs_per_sec, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 4),
        "epe3d": round(epe, 5),
        "epe3d_dynamic": round(epe_dyn, 5),
        "acc3ds": round(accs, 5),
        "ref_epe3d": 0.01145,
        "ref_epe3d_dynamic": 0.12479,
        "sec_per_pair": round(dt, 4),
        "compile_s": round(compile_and_first, 1),
        "n_pairs_matched": int(len(res.pairs)),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
