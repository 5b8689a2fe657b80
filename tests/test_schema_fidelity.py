"""Differential schema-fidelity tests for the real-dataset loaders.

Real Waymo/nuScenes PCA trees and AV2 ZeroFlow dumps are not on this rig,
so these tests pin the LOADER CONTRACT instead: one crafted fixture per
format exercising every schema field the reference consumes, with the
expected outputs computed by an independent per-point scalar re-derivation
(not by calling the loader's own vectorised helpers).

Fields covered (reference consumption sites):
  PCA  — raw_points/time_indice/sd/fb/inst labels (`dataset_pca.py:41-56`),
         the x-y crop (`dataset_pca.py:62-66`), ego compensation
         (`utils_loading.py:21-31`), per-instance GT reconstruction via the
         flat (inst * n_frames + t) gather (`utils_loading.py:33-48`,
         `dataset_pca.py:66-69`).
  AV2  — pc1/pc2 + *_flows_valid_idx filtering, gt_flow_0_1, the 10 Hz
         dynamic threshold ||flow|| > 0.5*0.1 (`dataset_argo.py:67`), the
         taxonomy-derived background fb labels INCLUDING the reference's
         enumerate-over-sorted-ids index mapping (BOLLARD -> 5, not its raw
         id 4 — `dataset_argo.py:211-215`; parity is bug-compatible by
         design), frame packing [pc2, pc1] with identity ego
         (`dataset_argo.py:84-90`).
"""

import numpy as np
import pytest

from icpflow_tpu.config import DEMO
from icpflow_tpu.data.pca import DatasetPCA
from icpflow_tpu.data.argo import DatasetArgo


def _rigid(yaw_deg, t):
    c, s = np.cos(np.radians(yaw_deg)), np.sin(np.radians(yaw_deg))
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = t
    return T


def _apply(T, p):
    return T[:3, :3] @ p + T[:3, 3]


def make_pca_fixture():
    """3 frames, 2 instances (0 static via identity, 1 a rigid mover),
    nontrivial ego rotation+translation, two points placed outside the
    crop window."""
    n_frames = 3
    ego = np.stack([_rigid(0, [0, 0, 0]),
                    _rigid(5, [1.0, 0.2, 0.0]),
                    _rigid(10, [2.0, 0.4, 0.0])])
    inst = np.stack([
        np.stack([np.eye(4)] * n_frames),            # instance 0: static
        np.stack([_rigid(0, [0, 0, 0]),              # instance 1: mover
                  _rigid(-3, [0.8, -0.1, 0.05]),
                  _rigid(-6, [1.6, -0.2, 0.10])]),
    ])
    pts, ti, sd, fb, il = [], [], [], [], []
    rng = np.random.default_rng(3)
    for j in range(n_frames):
        static = rng.uniform(-10, 10, (5, 3))
        mover = rng.uniform(-2, 2, (4, 3)) + [5.0, 3.0, 0.5]
        outx = np.array([[1e3, 0.0, 0.0]])          # cropped: |x| >= range_x
        outy = np.array([[0.0, -1e3, 0.0]])         # cropped: |y| >= range_y
        pts += [static, mover, outx, outy]
        ti += [np.full(5, j), np.full(4, j), np.full(1, j), np.full(1, j)]
        il += [np.zeros(5), np.ones(4), np.zeros(1), np.zeros(1)]
        sd += [np.zeros(5), np.ones(4), np.zeros(1), np.zeros(1)]
        fb += [np.zeros(5), np.ones(4), np.zeros(1), np.zeros(1)]
    d = {
        "raw_points": np.concatenate(pts).astype(np.float64),
        "time_indice": np.concatenate(ti).astype(np.int64),
        "sd_labels": np.concatenate(sd).astype(np.int64),
        "fb_labels": np.concatenate(fb).astype(np.int64),
        "inst_labels": np.concatenate(il).astype(np.int64),
        "sem_labels": np.zeros(n_frames * 11, np.int64),
        "ego_motion_gt": ego,
        "bbox_tsfm": inst,
    }
    return d, n_frames


def test_pca_loader_schema_differential(tmp_path):
    d, n_frames = make_pca_fixture()
    cfg = DEMO.replace(num_frames=n_frames, range_x=32.0, range_y=32.0)
    ds = object.__new__(DatasetPCA)
    ds.cfg = cfg

    path = tmp_path / "sample.npz"
    np.savez_compressed(path, **d)
    out = ds.load_raw(str(path))     # exercises the native npz reader too

    # crop: exactly the |x| < range_x and |y| < range_y points survive
    keep = (np.abs(d["raw_points"][:, 0]) < 32.0) \
        & (np.abs(d["raw_points"][:, 1]) < 32.0)
    assert out["raw_points"].shape == (keep.sum(), 3)
    np.testing.assert_allclose(out["raw_points"],
                               d["raw_points"][keep], rtol=1e-6)
    for key in ("time_indice", "sd_labels", "fb_labels"):
        np.testing.assert_array_equal(out[key], d[key][keep])
    np.testing.assert_allclose(out["ego_motion_gt"],
                               d["ego_motion_gt"], atol=1e-6)
    assert out["raw_points"].dtype == np.float32
    assert out["scene_flow"].dtype == np.float32

    # scene flow: independent per-point scalar re-derivation of
    # utils_loading.py:21-48 + dataset_pca.py:66-69
    raw = d["raw_points"][keep]
    tidx = d["time_indice"][keep]
    inst = d["inst_labels"][keep]
    for i in range(len(raw)):
        p_ego = _apply(d["ego_motion_gt"][tidx[i]], raw[i])
        p_full = _apply(d["bbox_tsfm"][inst[i], tidx[i]], p_ego)
        np.testing.assert_allclose(out["scene_flow"][i], p_full - raw[i],
                                   atol=1e-4)

    # static points under identity instance motion: flow == ego motion only
    stat = inst == 0
    ego_only = np.stack([
        _apply(d["ego_motion_gt"][tidx[i]], raw[i]) - raw[i]
        for i in range(len(raw))])
    np.testing.assert_allclose(out["scene_flow"][stat], ego_only[stat],
                               atol=1e-4)
    # frame-0 points never move (ego[0] == I, mover[0] == I)
    np.testing.assert_allclose(out["scene_flow"][tidx == 0], 0.0, atol=1e-6)


def test_pca_flat_gather_semantics():
    """The (inst * n_frames + t) flat gather of utils_loading.py:44-46 —
    pin it with asymmetric transforms so any index swap changes the answer."""
    d, n_frames = make_pca_fixture()
    cfg = DEMO.replace(num_frames=n_frames, range_x=32.0, range_y=32.0)
    ds = object.__new__(DatasetPCA)
    ds.cfg = cfg
    out = ds._raw_from_dict(dict(d), "inline")
    keep = (np.abs(d["raw_points"][:, 0]) < 32.0) \
        & (np.abs(d["raw_points"][:, 1]) < 32.0)
    raw = d["raw_points"][keep]
    tidx = d["time_indice"][keep]
    inst = d["inst_labels"][keep]
    # a mover point at frame 2 must use bbox_tsfm[1, 2] — flat index 5 —
    # not [2, 1] (index swap) nor [1, 1] (off-by-one)
    sel = np.flatnonzero((inst == 1) & (tidx == 2))
    assert sel.size
    i = sel[0]
    p_ego = _apply(d["ego_motion_gt"][2], raw[i])
    good = _apply(d["bbox_tsfm"][1, 2], p_ego) - raw[i]
    bad = _apply(d["bbox_tsfm"][1, 1], p_ego) - raw[i]
    np.testing.assert_allclose(out["scene_flow"][i], good, atol=1e-4)
    assert np.linalg.norm(good - bad) > 0.1   # the probe can discriminate


def make_argo_fixture():
    rng = np.random.default_rng(4)
    pc1 = rng.uniform(-20, 20, (6, 3))
    pc2 = rng.uniform(-20, 20, (5, 3))
    v1 = np.array([True, True, False, True, True, True])
    v2 = np.array([True, False, True, True, True])
    flow = np.zeros((6, 3))
    flow[0] = [0.049, 0, 0]       # static: just under the 0.05 threshold
    flow[1] = [0.051, 0, 0]       # dynamic: just over
    flow[3] = [0, 0.2, 0]         # dynamic
    flow[4] = [0.03, 0.03, 0.03]  # norm 0.0520 -> dynamic
    flow[5] = [0.028, 0.028, 0.028]  # norm 0.0485 -> static
    cls1 = np.array([18, 5, 0, -1, 4, 21])
    # mapped background idxes are {5, 8, 9, 13, 21, 22} (enumerate over
    # sorted ids: BOLLARD->5, ..., SIGN->21, STOP_SIGN->22) — so class 5
    # and 21 are background, class 4 is NOT, -1 always is
    return {
        "pc1": pc1, "pc2": pc2,
        "pc1_flows_valid_idx": v1, "pc2_flows_valid_idx": v2,
        "gt_flow_0_1": flow,
        "pc1_classes": cls1, "pc2_classes": np.zeros(5, np.int64),
        "ground1": np.zeros(6, bool), "ground2": np.zeros(5, bool),
    }


def test_argo_loader_schema_differential(tmp_path):
    d = make_argo_fixture()
    cfg = DEMO.replace(num_frames=2)
    ds = object.__new__(DatasetArgo)
    ds.cfg = cfg
    from icpflow_tpu.data.argo import (CATEGORY_NAME_TO_IDX,
                                       BACKGROUND_CATEGORIES)
    ds.background_idxes = [CATEGORY_NAME_TO_IDX[c]
                           for c in BACKGROUND_CATEGORIES]
    assert ds.background_idxes == [5, 8, 9, 13, 21, 22]

    path = tmp_path / "argo.npz"
    np.savez_compressed(path, **d)
    out = ds.load_raw(str(path))

    n1 = int(d["pc1_flows_valid_idx"].sum())   # 5 valid pc1 rows
    n2 = int(d["pc2_flows_valid_idx"].sum())   # 4 valid pc2 rows
    assert out["raw_points"].shape == (n1 + n2, 3)
    # packing: [pc2 valid rows, pc1 valid rows], time 0 then 1
    np.testing.assert_allclose(
        out["raw_points"][:n2], d["pc2"][d["pc2_flows_valid_idx"]],
        rtol=1e-6)
    np.testing.assert_allclose(
        out["raw_points"][n2:], d["pc1"][d["pc1_flows_valid_idx"]],
        rtol=1e-6)
    np.testing.assert_array_equal(out["time_indice"],
                                  [0] * n2 + [1] * n1)
    # flow: zeros for frame 0, the filtered gt flow for frame 1
    np.testing.assert_allclose(out["scene_flow"][:n2], 0.0)
    np.testing.assert_allclose(
        out["scene_flow"][n2:], d["gt_flow_0_1"][d["pc1_flows_valid_idx"]],
        atol=1e-7)
    # dynamic threshold at 10 Hz: valid rows 0,1,3,4,5 keep flows with
    # norms .049/.051/.2/.052/.0485 -> sd = F,T,T,T,F
    np.testing.assert_array_equal(out["sd_labels"][n2:].astype(bool),
                                  [False, True, True, True, False])
    # fb: classes [18, 5, -1, 4, 21] after filtering -> bg iff in mapped
    # idx set or -1: [True, False, False, True, False]
    np.testing.assert_array_equal(out["fb_labels"][n2:].astype(bool),
                                  [True, False, False, True, False])
    # frame 0 rows carry zero sd/fb (evaluation is on frame 1 only,
    # dataset_argo.py:88-89)
    np.testing.assert_array_equal(out["sd_labels"][:n2], 0)
    np.testing.assert_array_equal(out["fb_labels"][:n2], 0)
    # identity ego poses
    np.testing.assert_allclose(
        out["ego_motion_gt"],
        np.stack([np.eye(4), np.eye(4)]).astype(np.float32))
