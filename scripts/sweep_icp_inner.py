"""Sweep icp_inner (fixed-correspondence solves per NN sweep) on the chip.

For each inner value: demo-fixture accuracy (gap 1 + gap 4x) and the chained
match-stage / icp-kernel device time. Decides the config default — the sweep
halves the ICP sweep budget only if the latch actually freezes pairs in
proportionally fewer sweeps without moving the accuracy guardrails.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_icp_inner.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.models.icp_flow import _track_pair_impl
from icpflow_tpu.ops import icp as _icp
from bench import make_cfg, fetch_barrier_cost, chain_time, device_metrics

INNERS = (1, 2, 3)


def main():
    base = make_cfg()
    data = load_demo_npz("/root/reference/demo.npz")
    engine0 = SceneFlowEngine(base)
    p_src, v_src = engine0.pad_cloud(data["point_src"])
    p_dst, v_dst = engine0.pad_cloud(data["point_dst"])
    gt_pad = np.zeros((len(p_src), 3), np.float32)
    gt_pad[: len(data["scene_flow"])] = data["scene_flow"]
    jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
    jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)
    jgt = jnp.asarray(gt_pad)
    bar = fetch_barrier_cost()

    # labels once (clustering is inner-invariant)
    lab_dst, lab_src = engine0.cluster_joint(jpd, jvd, jps, jvs)
    jgt4 = 4.0 * jgt
    jp4 = jps + jgt4
    lab_d4, lab_s4 = engine0.cluster_joint(jp4, jvs, jps, jvs)

    rng = np.random.default_rng(0)
    bL, nL = base.pairs_large, base.max_points
    aL = jnp.asarray(rng.normal(size=(bL, nL, 3)).astype(np.float32))
    bbL = aL + 0.3
    mskL = jnp.ones((bL, nL), bool)
    initL = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (bL, 4, 4))

    for inner in INNERS:
        cfg = base.replace(icp_inner=inner)
        engine = SceneFlowEngine(cfg)
        t0 = time.time()
        out = engine.track_pair(jps, jvs, lab_src, jpd, jvd, lab_dst, 2.0)
        flow = engine.flow(jps, lab_src, out.result.transforms,
                           np.eye(4, dtype=np.float32))
        m = np.asarray(device_metrics(flow, jgt, jvs))
        out4 = engine.track_pair(jps, jvs, lab_s4, jp4, jvs, lab_d4, 8.0)
        flow4 = engine.flow(jps, lab_s4, out4.result.transforms,
                            np.eye(4, dtype=np.float32))
        m4 = np.asarray(device_metrics(flow4, jgt4, jvs))
        compile_s = time.time() - t0

        @jax.jit
        def track_step(ps, cfg=cfg):
            o = _track_pair_impl(ps, jvs, lab_src, jpd, jvd, lab_dst,
                                 jnp.float32(2.0), cfg)
            return ps + 1e-30 * jnp.sum(o.result.transforms).astype(ps.dtype), o

        t_match = chain_time(track_step, jps,
                             lambda o: jnp.sum(o.result.transforms), 4, bar)

        @jax.jit
        def icp_step(x, cfg=cfg):
            T = _icp.apply_icp(x, mskL, bbL, mskL, initL,
                               thres=cfg.thres_dist,
                               max_iters=cfg.icp_max_iters, tile=cfg.nn_tile,
                               patience=cfg.icp_patience,
                               stall_rel=cfg.icp_stall_rel,
                               corr_cap=cfg.icp_corr_cap,
                               shrink=cfg.icp_shrink, inner=cfg.icp_inner,
                               init_margin_rel=cfg.icp_init_margin_rel)
            return x + 1e-30 * T[:, :3, 3][:, None, :], T

        t_icp = chain_time(icp_step, aL, lambda o: jnp.sum(o), 4, bar)

        print(json.dumps({
            "inner": inner,
            "epe3d": round(float(m[0]), 5),
            "epe3d_dynamic": round(float(m[1]), 5),
            "acc3ds": round(float(m[2]), 5),
            "epe3d_static": round(float(m[3]), 5),
            "matched": int(np.asarray(out.result.matched).sum()),
            "epe3d_dynamic_gap4x": round(float(m4[1]), 5),
            "stage_match_ms": round(t_match * 1e3, 2),
            "kern_icp_large_ms": round(t_icp * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
