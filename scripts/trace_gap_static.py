#!/usr/bin/env python
"""Trace the long-gap static EPE creep (VERDICT r4 item 6).

nuscene-like seed 9, gaps 6-9: heldout static EPE steps 0.0064 -> 0.0125 ->
0.0125 -> 0.025 (ACCURACY.json r4) under GT ego, where the correct outcome
for statics is the exact ego-only identity flow (utils_flow.py:44-45).
For every gap this script lists, per SRC cluster with static points: its
matched flag, winning dst label, transform distance from identity
(translation metres / rotation degrees), per-cluster static EPE, and the
match stats columns — pinpointing which statics beat identity with a
drifted transform and which gate admitted them.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_gap_static.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icpflow_jax_cache")

import numpy as np
import jax

if os.environ.get("TRACE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")   # before any backend use

import jax.numpy as jnp

from bench import make_cfg
from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.synthetic import make_sample
from icpflow_tpu.data.pca import DatasetPCA
from icpflow_tpu.metrics import crop_for_eval
from icpflow_tpu.ops import geometry as geo

GAPS = [int(g) for g in os.environ.get("GAPS", "6,7,8,9").split(",")]


def main():
    cfg = make_cfg().replace(dataset="waymo", range_x=32.0, range_y=32.0,
                             range_z=-1.6, ground_slack=0.3,
                             num_frames=11, speed=0.833333)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene9.npz")
        make_sample(path, num_frames=11, seed=9)
        ds = DatasetPCA(cfg, td, "test")
        ds.seq_paths = [path]
        data, pairs = ds[0]
    engine = SceneFlowEngine(cfg)
    ti = data["time_indice"]

    for gap in GAPS:
        pair = pairs[gap - 1]
        gt = data["scene_flow"][ti == gap]
        sd = data["sd_labels"][ti == gap]
        p_src, v_src, l_src = engine.pad_cloud(
            pair["point_src"], pair["label_src"])
        p_dst, v_dst, l_dst = engine.pad_cloud(
            pair["point_dst"], pair["label_dst"])
        npad = len(p_src)
        tf = cfg.translation_frame(gap)
        out = engine.track_pair(
            jnp.asarray(p_src), jnp.asarray(v_src), jnp.asarray(l_src),
            jnp.asarray(p_dst), jnp.asarray(v_dst), jnp.asarray(l_dst), tf)
        res = out.result
        pose = np.asarray(data["ego_poses"][gap], np.float32)
        raw_j = data["raw_points"][ti == gap, :3]
        raw_pad = np.zeros((npad, 3), np.float32)
        raw_pad[: len(raw_j)] = raw_j
        flow = np.asarray(engine.flow(
            jnp.asarray(raw_pad), jnp.asarray(l_src), res.transforms, pose))

        gt_pad = np.zeros((npad, 3), np.float32)
        gt_pad[: len(gt)] = gt
        stat_pad = np.zeros((npad,), bool)
        stat_pad[: len(sd)] = sd == 0
        eval_w = np.array(v_src)
        eval_w[: len(raw_j)] &= crop_for_eval(
            raw_j, range_x=cfg.range_x, range_y=cfg.range_y,
            range_z=cfg.range_z, ground_slack=cfg.ground_slack,
            eval_ground=False)
        eval_w[len(raw_j):] = False
        err = np.linalg.norm(flow - gt_pad, axis=-1)
        sw = stat_pad & eval_w
        print(f"\n=== gap {gap}: static EPE "
              f"{err[sw].mean() if sw.any() else 0.0:.5f} "
              f"({int(sw.sum())} static pts)")

        lab = np.asarray(l_src)
        matched = np.asarray(res.matched)
        dstl = np.asarray(res.dst_label)
        T = np.asarray(res.transforms)
        stats = np.asarray(res.stats)
        idp = np.asarray(res.identity_pt)
        for L in np.unique(lab[lab >= 0]):
            m = (lab == L) & sw
            if not m.any():
                continue
            epe = err[m].mean()
            tnorm = float(np.linalg.norm(T[L, :3, 3]))
            rdeg = float(np.degrees(np.arccos(
                np.clip((np.trace(T[L, :3, :3]) - 1) / 2, -1, 1))))
            nid = int(idp[L][: m.sum()].sum()) if idp.ndim == 2 else -1
            flag = " <-- DRIFTED" if epe > 0.005 and matched[L] else ""
            print(f"  lab {L:3d} n_stat={int(m.sum()):5d} epe={epe:.5f} "
                  f"matched={bool(matched[L])} dst={int(dstl[L]):3d} "
                  f"|t|={tnorm:.4f} rot={rdeg:.3f}deg "
                  f"err_f={stats[L, 0]:.4f} iou_f={stats[L, 6]:.3f} "
                  f"ident_pts={nid}{flag}")


if __name__ == "__main__":
    main()
