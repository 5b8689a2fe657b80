"""Quick demo-fixture accuracy check on the current backend (TPU by default).

Prints one JSON line with EPE stats + matched-pair count for the gap-1 demo
pair and the 4x long-gap stress variant. Much faster than the full bench —
use while iterating on accuracy-relevant code.

Env: ICPFLOW_NN_VARIANT=vpu|mxu selects the Pallas NN kernel variant.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO
from icpflow_tpu.data.demo import load_demo_npz


def device_metrics(flow_dev, gt_dev, valid):
    err = jnp.linalg.norm(flow_dev - gt_dev, axis=-1)
    w = valid.astype(err.dtype)
    sf = jnp.linalg.norm(gt_dev, axis=-1)
    rel = err / (sf + 1e-20)
    dyn_w = w * (sf > 0.05)
    stat_w = w * (sf <= 0.05)
    accs_pt = ((err < 0.05) | (rel < 0.05)).astype(err.dtype)
    return jnp.stack([
        jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1),
        jnp.sum(err * dyn_w) / jnp.maximum(jnp.sum(dyn_w), 1),
        jnp.sum(accs_pt * w) / jnp.maximum(jnp.sum(w), 1),
        jnp.sum(err * stat_w) / jnp.maximum(jnp.sum(stat_w), 1)])


def main():
    from bench import make_cfg
    cfg = make_cfg()
    data = load_demo_npz("/root/reference/demo.npz")
    engine = SceneFlowEngine(cfg)
    p_src, v_src = engine.pad_cloud(data["point_src"])
    p_dst, v_dst = engine.pad_cloud(data["point_dst"])
    gt_pad = np.zeros((len(p_src), 3), np.float32)
    gt_pad[: len(data["scene_flow"])] = data["scene_flow"]
    jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
    jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)
    jgt = jnp.asarray(gt_pad)

    t0 = time.time()
    lab_dst, lab_src = engine.cluster_joint(jpd, jvd, jps, jvs)
    out = engine.track_pair(jps, jvs, lab_src, jpd, jvd, lab_dst, 2.0)
    flow = engine.flow(jps, lab_src, out.result.transforms,
                       np.eye(4, dtype=np.float32))
    m = np.asarray(device_metrics(flow, jgt, jvs))

    jgt4 = 4.0 * jgt
    jp4 = jps + jgt4
    lab_d4, lab_s4 = engine.cluster_joint(jp4, jvs, jps, jvs)
    out4 = engine.track_pair(jps, jvs, lab_s4, jp4, jvs, lab_d4, 8.0)
    flow4 = engine.flow(jps, lab_s4, out4.result.transforms,
                        np.eye(4, dtype=np.float32))
    m4 = np.asarray(device_metrics(flow4, jgt4, jvs))

    print(json.dumps({
        "epe3d": round(float(m[0]), 5),
        "epe3d_dynamic": round(float(m[1]), 5),
        "acc3ds": round(float(m[2]), 5),
        "epe3d_static": round(float(m[3]), 5),
        "matched": int(np.asarray(out.result.matched).sum()),
        "epe3d_dynamic_gap4x": round(float(m4[1]), 5),
        "matched_gap4x": int(np.asarray(out4.result.matched).sum()),
        "wall_s": round(time.time() - t0, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
