"""Count stage-2 candidate occupancy + ICP iteration counts on the demo.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stage2.py
"""
import numpy as np
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.demo import load_demo_npz
from icpflow_tpu.match import gates
from icpflow_tpu.match.matcher import match_frame_pair, _run_stage
from icpflow_tpu.ops.segments import extract_segments
from bench import make_cfg, DEMO_PATH

cfg = make_cfg()
data = load_demo_npz(DEMO_PATH)
engine = SceneFlowEngine(cfg)
p_src, v_src = engine.pad_cloud(data["point_src"])
p_dst, v_dst = engine.pad_cloud(data["point_dst"])
jps, jvs = jnp.asarray(p_src), jnp.asarray(v_src)
jpd, jvd = jnp.asarray(p_dst), jnp.asarray(v_dst)
lab_dst, lab_src = engine.cluster_joint(jpd, jvd, jps, jvs)
seg_src = extract_segments(jps, lab_src, jvs, num_labels=cfg.num_clusters,
                           max_points=cfg.max_points)
seg_dst = extract_segments(jpd, lab_dst, jvd, num_labels=cfg.num_clusters,
                           max_points=cfg.max_points)
L = cfg.num_clusters
tf = jnp.float32(2.0)

sanity = gates.sanity_matrix(
    seg_src.count, seg_src.mean, seg_src.extent,
    seg_dst.count, seg_dst.mean, seg_dst.extent,
    min_cluster_size=cfg.min_cluster_size, thres_box=cfg.thres_box,
    translation_frame=tf)
iota = jnp.arange(L, dtype=jnp.int32)
valid1 = jnp.diagonal(sanity)
ps = cfg.max_points_small
cnt = jnp.take(seg_src.count, iota)
cntd = jnp.take(seg_dst.count, iota)
small1 = valid1 & (cnt <= ps) & (cntd <= ps)
large1 = valid1 & ~small1
print(f"stage1: small={int(np.asarray(small1).sum())} "
      f"large={int(np.asarray(large1).sum())}")

# run stage 1 to get matched1, then stage-2 candidates
T1, stats1, accept1, dropped1, idp1 = _run_stage(
    seg_src, seg_dst, iota, iota, valid1, tf, cfg)
from icpflow_tpu.match.matcher import _assign
err1 = jnp.minimum(stats1[:, 0], stats1[:, 1])
matched1, _ = _assign(iota, iota, err1, accept1, L, cfg.thres_error)
left_src = (seg_src.count > 0) & ~matched1
left_dst = (seg_dst.count > 0) & ~matched1
cand = sanity & left_src[:, None] & left_dst[None, :]
flat = np.asarray(cand.reshape(-1))
n2 = int(flat.sum())
p2s = np.flatnonzero(flat) // L
p2d = np.flatnonzero(flat) % L
cnts = np.asarray(seg_src.count)
cntd_ = np.asarray(seg_dst.count)
small2 = (cnts[p2s] <= ps) & (cntd_[p2d] <= ps)
print(f"stage2: candidates={n2} small={int(small2.sum())} "
      f"large={int((~small2).sum())}")
print(f"stage1 matched: {int(np.asarray(matched1).sum())}")

# per-pair point counts for context
c1 = np.asarray(cnt)[np.asarray(valid1)]
print(f"stage1 cluster sizes: min={c1.min() if len(c1) else 0} "
      f"med={int(np.median(c1)) if len(c1) else 0} max={c1.max() if len(c1) else 0}")
