"""Per-cluster win/loss table: our flow vs the reference's shipped est_flow.

`demo.npz` ships the reference pipeline's own prediction for this exact
frame pair (`est_flow`, produced by `/root/reference/demo.py:37-71`'s
pipeline). The bench quotes only aggregate EPE; this script turns the
fixture into a per-segment diagnostic: for every cluster of OUR joint
clustering (plus the GT-dynamic points as their own rows), it reports our
EPE, the reference's EPE, the winner, and the segment's motion magnitude —
the targeting artifact for the remaining dynamic-EPE gap.

Writes EST_FLOW_COMPARE.json at the repo root and prints the table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compare_est_flow.py
"""
import json

import numpy as np
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.demo import load_demo_npz
from bench import make_cfg, DEMO_PATH


def main():
    raw = np.load(DEMO_PATH)
    # est_flow is stored already restricted to pc1_flows_valid_idx rows
    # (same row space as load_demo_npz's point_src / scene_flow)
    est_flow = np.asarray(raw["est_flow"], np.float32)

    data = load_demo_npz(DEMO_PATH)
    cfg = make_cfg()
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
    jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)
    out = engine.run_pair(jps, jvs, jpd, jvd, 2.0)
    n = len(data["point_src"])
    ours = np.asarray(out.flow)[:n]
    lab = np.asarray(out.lab_src)[:n]
    matched = np.asarray(out.track.result.matched)

    gt = data["scene_flow"]
    err_ours = np.linalg.norm(ours - gt, axis=1)
    err_ref = np.linalg.norm(est_flow - gt, axis=1)
    motion = np.linalg.norm(gt, axis=1)

    rows = []
    for li in sorted(set(lab.tolist())):
        sel = lab == li
        m = float(motion[sel].mean())
        rows.append({
            "label": int(li),
            "n": int(sel.sum()),
            "motion_m": round(m, 3),
            "dynamic": bool(m > 0.05),
            "matched": bool(matched[li]) if li >= 0 else None,
            "epe_ours": round(float(err_ours[sel].mean()), 4),
            "epe_ref": round(float(err_ref[sel].mean()), 4),
        })
    for r in rows:
        r["winner"] = ("ours" if r["epe_ours"] < r["epe_ref"] - 1e-4 else
                       "ref" if r["epe_ref"] < r["epe_ours"] - 1e-4 else "tie")

    dyn = [r for r in rows if r["dynamic"]]
    summary = {
        "overall_epe_ours": round(float(err_ours.mean()), 5),
        "overall_epe_ref": round(float(err_ref.mean()), 5),
        "dynamic_epe_ours": round(float(err_ours[motion > 0.05].mean()), 5),
        "dynamic_epe_ref": round(float(err_ref[motion > 0.05].mean()), 5),
        "clusters": len(rows),
        "dynamic_clusters": len(dyn),
        "dyn_wins_ours": sum(r["winner"] == "ours" for r in dyn),
        "dyn_wins_ref": sum(r["winner"] == "ref" for r in dyn),
    }
    with open("EST_FLOW_COMPARE.json", "w") as f:
        json.dump({"summary": summary, "per_cluster": rows}, f, indent=1)

    print(json.dumps(summary))
    print(f"{'lab':>5} {'n':>6} {'motion':>7} {'ours':>8} {'ref':>8} winner")
    for r in sorted(rows, key=lambda r: -r["motion_m"]):
        if r["dynamic"] or r["winner"] == "ref":
            print(f"{r['label']:>5} {r['n']:>6} {r['motion_m']:>7.3f} "
                  f"{r['epe_ours']:>8.4f} {r['epe_ref']:>8.4f} {r['winner']}"
                  + ("" if r["matched"] in (True, None) else "  UNMATCHED"))


if __name__ == "__main__":
    main()
