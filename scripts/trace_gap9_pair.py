"""Deep-dive one mover pair at gap 9 of the held-out nuscene-like scene.

For each mover: score the GT pose, every init hypothesis (translation +
yaw x {t_vote, dc}), the chosen init, the ICP result, and the rollback
decision — pinpoints whether the long-gap degradation is hypothesis range,
hypothesis SELECTION (coarse-phase subsample noise), ICP drift, or rollback.

Run (CPU): PYTHONPATH=/root/repo:/root/.axon_site python -c \
  "import jax; jax.config.update('jax_platforms','cpu'); \
   exec(open('scripts/trace_gap9_pair.py').read())"
"""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine
from icpflow_tpu.data.synthetic import make_sample, _rot_z
from icpflow_tpu.data.pca import DatasetPCA
from icpflow_tpu.ops import hist as _hist
from icpflow_tpu.ops import icp as _icp
from icpflow_tpu.ops import knn as _knn
from icpflow_tpu.ops import geometry as geo
from bench import make_cfg

GAP = int(os.environ.get("GAP", "9"))
COARSE = int(os.environ.get("COARSE", "6"))


def nn_err(a, am, b, bm):
    e_f = _knn.masked_nn_error(a, am, b, bm, tile=512)
    e_b = _knn.masked_nn_error(b, bm, a, am, tile=512)
    return float(jnp.minimum(e_f, e_b)[0])


def main():
    cfg = make_cfg().replace(dataset="waymo", range_x=32.0, range_y=32.0,
                             range_z=-1.6, ground_slack=0.3,
                             num_frames=11, speed=0.833333,
                             icp_coarse_iters=COARSE)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene9.npz")
        make_sample(path, num_frames=11, seed=9)
        ds = DatasetPCA(cfg, td, "test")
        ds.seq_paths = [path]
        data, pairs = ds[0]
    pair = pairs[GAP - 1]
    engine = SceneFlowEngine(cfg)

    # mover GT (data/synthetic.py): src = frame GAP ego-aligned; the cluster
    # transform should map it onto the frame-0 instance state
    movers = {
        1: (np.array([-6.0, -12.0, -1.1]), np.array([1.4, 0.25, 0.0]), 0.03),
        2: (np.array([12.0, 4.0, -1.0]), np.array([-0.9, 0.55, 0.0]), -0.05),
    }

    ls, ld = pair["label_src"], pair["label_dst"]
    ps_, pd_ = pair["point_src"], pair["point_dst"]
    tf = cfg.translation_frame(GAP)

    for mi, (start, vel, yaw_rate) in movers.items():
        # cluster label = dominant src label of this mover's points: use GT
        # geometry to find it (points near the mover's frame-GAP center)
        center = start + vel * GAP
        d = np.linalg.norm(ps_[:, :2] - center[None, :2], axis=1)
        labs, cnts = np.unique(ls[(d < 3.0) & (ls >= 0)], return_counts=True)
        if not len(labs):
            print(f"mover {mi}: no cluster"); continue
        lab = int(labs[np.argmax(cnts)])
        sel_s = ls == lab
        # GT transform frame-GAP-aligned -> frame-0 state
        yaw = yaw_rate * GAP
        R = _rot_z(-yaw)
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = R
        T_gt[:3, 3] = start - R @ center

        # dst cluster: transform src by GT, find dominant dst label there
        s_pts = ps_[sel_s].astype(np.float32)
        moved_gt = s_pts @ T_gt[:3, :3].T + T_gt[:3, 3]
        from scipy.spatial import cKDTree
        tree = cKDTree(pd_[:, :2])
        _, nn = tree.query(moved_gt[:, :2])
        dl, dc_ = np.unique(ld[nn][ld[nn] >= 0], return_counts=True)
        labd = int(dl[np.argmax(dc_)])
        d_pts = pd_[ld == labd].astype(np.float32)
        print(f"\nmover {mi}: src_lab={lab} n={len(s_pts)} dst_lab={labd} "
              f"n={len(d_pts)} yaw_gt={yaw:+.2f}")

        # pad to a common bucket
        n = max(len(s_pts), len(d_pts))
        cap = 1 << (n - 1).bit_length()
        def pad(p):
            out = np.zeros((1, cap, 3), np.float32); out[0, :len(p)] = p
            m = np.zeros((1, cap), bool); m[0, :len(p)] = True
            return jnp.asarray(out), jnp.asarray(m)
        sj, sm = pad(s_pts)
        dj, dm = pad(d_pts)

        err_gt = nn_err(geo.transform_points_batch(sj, jnp.asarray(T_gt[None])),
                        sm, dj, dm)
        err_id = nn_err(sj, sm, dj, dm)
        print(f"  err(GT pose)={err_gt:.4f}  err(identity)={err_id:.4f}")

        # the matcher swaps so smaller is src
        swap = len(s_pts) > len(d_pts)
        a, amk, b, bmk = (dj, dm, sj, sm) if swap else (sj, sm, dj, dm)
        init = _hist.estimate_init_translation(
            a, amk, b, bmk, jnp.float32(tf), bin_w=cfg.hist_bin,
            lxy=cfg.hist_grid_xy, lz=cfg.hist_grid_z, topk=cfg.hist_topk,
            nms_kernel=cfg.hist_nms_kernel, eval_tile=cfg.nn_tile,
            yaws=cfg.hist_yaws, coarse_cap=cfg.hist_coarse_cap,
            refine=cfg.hist_refine, yaw_per_m=cfg.hist_yaw_per_m,
            yaw_scale_cap=cfg.hist_yaw_scale_cap)
        initT = np.asarray(init)[0]
        moved_i = geo.transform_points_batch(a, init)
        err_init = nn_err(moved_i, amk, b, bmk)
        from icpflow_tpu.ops.geometry import euler_zyx_deg
        yaw_init = float(np.asarray(euler_zyx_deg(init[:, :3, :3]))[0, 0])
        print(f"  init: t={np.round(initT[:3,3],2)} yaw={yaw_init:+.1f}deg "
              f"err={err_init:.4f} (swap={swap})")

        coarse_on = jnp.float32(tf) >= cfg.icp_coarse_min_tf
        T = _icp.apply_icp(a, amk, b, bmk, init, coarse_on,
                           thres=cfg.thres_dist,
                           max_iters=cfg.icp_max_iters, tile=cfg.nn_tile,
                           patience=cfg.icp_patience,
                           stall_rel=cfg.icp_stall_rel,
                           corr_cap=cfg.icp_corr_cap, shrink=0,
                           inner=cfg.icp_inner,
                           coarse_iters=cfg.icp_coarse_iters,
                           coarse_scale=cfg.icp_coarse_scale,
                           init_margin_rel=cfg.icp_init_margin_rel)
        moved_f = geo.transform_points_batch(a, T)
        err_icp = nn_err(moved_f, amk, b, bmk)
        Tn = np.asarray(T)[0]
        if swap:
            Tn = np.asarray(geo.invert_rigid(T))[0]
        yaw_icp = float(np.asarray(euler_zyx_deg(
            jnp.asarray(Tn[None, :3, :3])))[0, 0])
        # final pose error vs GT on the src cluster
        moved_est = s_pts @ Tn[:3, :3].T + Tn[:3, 3]
        pose_err = float(np.linalg.norm(moved_est - moved_gt, axis=1).mean())
        print(f"  final: t={np.round(Tn[:3,3],2)} yaw={yaw_icp:+.1f}deg "
              f"err={err_icp:.4f} |pose err vs GT|={pose_err:.3f} m")


main()
