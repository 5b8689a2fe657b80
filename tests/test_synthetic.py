"""Synthetic lidar generator: schema + GT-consistency checks."""

import os

import numpy as np

from icpflow_tpu.data.synthetic import make_sample
from icpflow_tpu.data.loading import (ego_motion_compensation,
                                      reconstruct_sequence)


def test_sample_schema_and_gt_consistency(tmp_path):
    path = make_sample(os.path.join(tmp_path, "s.npz"), num_frames=3, seed=1)
    z = np.load(path)
    for k in ("raw_points", "time_indice", "sd_labels", "fb_labels",
              "inst_labels", "sem_labels", "ego_motion_gt", "bbox_tsfm"):
        assert k in z.files, k
    raw, ti = z["raw_points"], z["time_indice"]
    assert z["ego_motion_gt"].shape == (3, 4, 4)
    assert z["bbox_tsfm"].shape[1] == 3

    # GT reconstruction must map every frame onto the frame-0 world state:
    # static points land exactly on their frame-0 twins; movers land on the
    # frame-0 instance pose (dataset_pca.py:66-69 semantics)
    pts_ego = ego_motion_compensation(raw, ti, z["ego_motion_gt"])
    pts_full = reconstruct_sequence(pts_ego, ti, z["inst_labels"],
                                    z["bbox_tsfm"], 3)
    flow = pts_full - raw[:, :3]
    # frame 0 flow is ~0 (identity transforms)
    np.testing.assert_allclose(flow[ti == 0], 0, atol=1e-5)
    # static points at frame 2: flow == ego compensation displacement only
    stat2 = (ti == 2) & (z["inst_labels"] == 0)
    np.testing.assert_allclose(
        pts_full[stat2], pts_ego[stat2], atol=1e-5)
    # movers at frame 2 reconstruct near the frame-0 mover centroid
    for mi in (1, 2, 3):
        sel0 = (ti == 0) & (z["inst_labels"] == mi)
        sel2 = (ti == 2) & (z["inst_labels"] == mi)
        c0 = raw[sel0, :3].mean(0)
        c2 = pts_full[sel2].mean(0)
        assert np.linalg.norm(c2 - c0) < 0.3, (mi, c0, c2)
    # dynamic labels mark exactly the movers
    assert (z["sd_labels"][z["inst_labels"] > 0] == 1).all()
    assert (z["sd_labels"][z["inst_labels"] == 0] == 0).all()
