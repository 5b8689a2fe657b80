"""Trace the nuscene-like gap-9/10 dynamic-EPE cliff (VERDICT r2 item 3).

For the held-out seed-9 scene at gaps 7-10: per GT mover, where does the
pipeline lose it — joint clustering (fragmented/merged labels), the sanity
gate, the histogram init, ICP, or the transform gate? Also lists static
clusters with large flow error (the static EPE jumps at those gaps too).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_gap_cliff.py
"""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.synthetic import make_sample
from icpflow_tpu.data.pca import DatasetPCA
from icpflow_tpu.match import gates
from bench import make_cfg


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
    # reload instance labels from the raw fixture (DatasetPCA drops them)
    with tempfile.TemporaryDirectory() as td2:
        p2 = os.path.join(td2, "scene9.npz")
        make_sample(p2, num_frames=11, seed=9)
        rawnpz = np.load(p2)
        inst_all = rawnpz["inst_labels"]
        keep = np.logical_and(
            np.abs(rawnpz["raw_points"][:, 0]) < cfg.range_x,
            np.abs(rawnpz["raw_points"][:, 1]) < cfg.range_y)
        inst_all = inst_all[keep]

    for gap in (7, 8, 9, 10):
        pair = pairs[gap - 1]
        tf = cfg.translation_frame(
            gap, float(np.linalg.norm(data["ego_poses"][gap][:3, 3])))
        p_src, v_src, l_src = engine.pad_cloud(
            pair["point_src"], pair["label_src"])
        p_dst, v_dst, l_dst = engine.pad_cloud(
            pair["point_dst"], pair["label_dst"])
        out = engine.track_pair(
            jnp.asarray(p_src), jnp.asarray(v_src), jnp.asarray(l_src),
            jnp.asarray(p_dst), jnp.asarray(v_dst), jnp.asarray(l_dst), tf)
        res = out.result
        matched = np.asarray(res.matched)
        dstlab = np.asarray(res.dst_label)
        T = np.asarray(res.transforms)
        stats = np.asarray(res.stats)

        gt = data["scene_flow"][ti == gap]
        sd = data["sd_labels"][ti == gap]
        inst_j = inst_all[ti == gap]
        raw_j = data["raw_points"][ti == gap, :3]
        pose = np.asarray(data["ego_poses"][gap], np.float32)
        npad = len(p_src)
        raw_pad = np.zeros((npad, 3), np.float32)
        raw_pad[: len(raw_j)] = raw_j
        flow = np.asarray(engine.flow(
            jnp.asarray(raw_pad), jnp.asarray(l_src), res.transforms,
            pose))[: len(raw_j)]
        err = np.linalg.norm(flow - gt, axis=1)
        print(f"\n=== gap {gap}: tf={tf:.1f}  dyn_epe="
              f"{err[sd > 0].mean():.4f}  static_epe={err[sd == 0].mean():.4f}")

        ls = pair["label_src"]
        ld_arr = pair["label_dst"]
        for mi in sorted(set(inst_j[inst_j > 0].tolist())):
            sel = inst_j == mi
            labs, cnts = np.unique(ls[sel], return_counts=True)
            main_lab = int(labs[np.argmax(cnts)])
            frag = {int(a): int(b) for a, b in zip(labs, cnts)}
            line = (f" mover {int(mi)}: n={sel.sum()} src_labels={frag} "
                    f"epe={err[sel].mean():.3f}")
            if main_lab < 0:
                print(line + "  -> NOISE/GROUND in clustering")
                continue
            m = bool(matched[main_lab])
            if not m:
                line += "  -> UNMATCHED"
            else:
                t_est = T[main_lab][:3, 3]
                line += (f" matched->dst {int(dstlab[main_lab])} "
                         f"|t_est-?|: t={np.round(t_est, 2)}")
            line += (f" iou={min(stats[main_lab, 6], stats[main_lab, 7]):.2f}"
                     f" err={min(stats[main_lab, 0], stats[main_lab, 1]):.3f}")
            print(line)
        # static clusters with large error
        bad = {}
        for li in set(ls[(ls >= 0)].tolist()):
            s = (ls == li) & (sd == 0)
            if s.sum() > 20 and err[s].mean() > 0.1:
                bad[int(li)] = (int(s.sum()), round(float(err[s].mean()), 3),
                                bool(matched[li]), int(dstlab[li]))
        if bad:
            print(f" static clusters with epe>0.1: {bad}")


if __name__ == "__main__":
    main()
