"""Trace estimated-ego pose error per frame on the held-out synthetic scene.

VERDICT r3 weak item 2: heldout_ego_estimated static EPE up to 0.112 while
the reference's kiss-icp core is cm-level. This script isolates the odometry
from the matcher: for each frame j, compare EgoOdometry's pose against the
GT ego pose — translation error, yaw error, and the displacement that error
causes at 32 m range (what static EPE sees).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_ego.py
"""
import os
import tempfile
import time

import numpy as np
import jax.numpy as jnp

from icpflow_tpu import DEMO
from icpflow_tpu.data.synthetic import make_sample
from icpflow_tpu.ops.ego import EgoOdometry


def pose_err(T_est, T_gt):
    D = np.linalg.inv(T_gt) @ T_est
    t = np.linalg.norm(D[:3, 3])
    ang = np.arccos(np.clip((np.trace(D[:3, :3]) - 1) / 2, -1, 1))
    return t, ang


def main():
    cfg = DEMO.replace(dataset="waymo", range_x=32.0, range_y=32.0,
                       range_z=-1.6, ground_slack=0.3, num_frames=5,
                       use_kiss_icp=True, max_points_scene=131072)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.npz")
        make_sample(path, num_frames=cfg.num_frames, seed=7)
        d = np.load(path)
        ti = d["time_indice"]
        gt = d["ego_motion_gt"]
        odo = EgoOdometry(cfg)
        for j in range(cfg.num_frames):
            frame = d["raw_points"][ti == j, :3]
            t0 = time.time()
            odo.register_frame(frame)
            est = odo.poses[-1]
            te, ae = pose_err(est, gt[j])
            print(f"frame {j}: |t_err|={te*100:6.2f} cm  yaw_err="
                  f"{np.degrees(ae):6.3f} deg  err@32m="
                  f"{(te + 2*32*np.sin(ae/2))*100:6.2f} cm   "
                  f"sigma={odo._sigma():.3f}  ({time.time()-t0:.1f}s)",
                  flush=True)
        # relative per-step error (what the pair alignment actually uses):
        # pose_j composes frame j onto frame 0
        print("\nrelative step errors (gap-1):")
        for j in range(1, cfg.num_frames):
            D_est = np.linalg.inv(odo.poses[j - 1]) @ odo.poses[j]
            D_gt = np.linalg.inv(gt[j - 1]) @ gt[j]
            te, ae = pose_err(D_est, D_gt)
            print(f"  {j-1}->{j}: |t_err|={te*100:6.2f} cm  yaw_err="
                  f"{np.degrees(ae):6.3f} deg")


if __name__ == "__main__":
    main()
