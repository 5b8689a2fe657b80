import numpy as np
import jax.numpy as jnp

from icpflow_tpu.flow import flow_from_transforms
from icpflow_tpu import metrics as M
from icpflow_tpu.ops.segments import extract_segments, GROUND_LABEL


def test_flow_assembly_semantics():
    # per-point transform = T_cluster o pose; unmatched/ground -> pose only
    # (utils_flow.py:57-69)
    pts = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [2, 2, 2]], np.float32)
    labels = np.array([0, 1, -1, GROUND_LABEL], np.int32)
    T = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    T[0, :3, 3] = [1, 0, 0]       # cluster 0 moves +x
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 0.5]     # ego lifts everything +z
    flow = np.asarray(flow_from_transforms(
        jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(T),
        jnp.asarray(pose)))
    np.testing.assert_allclose(flow[0], [1, 0, 0.5], atol=1e-6)
    np.testing.assert_allclose(flow[1], [0, 0, 0.5], atol=1e-6)
    np.testing.assert_allclose(flow[2], [0, 0, 0.5], atol=1e-6)
    np.testing.assert_allclose(flow[3], [0, 0, 0.5], atol=1e-6)


def test_flow_assembly_precision_metre_scale():
    """Flow assembly must be float64-exact to ~f32 rounding at metre-scale
    poses: the round-5 TPU regression (docs/ROUND5_NOTES.md item 6) was a
    default-precision `T_cluster @ pose` einsum truncating metre-scale
    translations to bf16 — every identity-matched static point carried a
    per-gap-constant flow error up to 2.5 cm. The einsums are pinned at
    HIGHEST precision; this test pins the contract on every backend (on
    CPU it guards against the precision kwarg being dropped; the bench
    guardrails catch the TPU-only regression end-to-end)."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (512, 3)).astype(np.float32)
    labels = np.zeros(512, np.int32)
    yaw = 0.3
    c, s = np.cos(yaw), np.sin(yaw)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    pose[:3, 3] = [7.5, -3.25, 0.125]       # metre-scale ego translation
    T = np.eye(4, dtype=np.float32)[None]   # identity match: flow == ego
    flow = np.asarray(flow_from_transforms(
        jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(T),
        jnp.asarray(pose)))
    exact = (pts.astype(np.float64) @ pose[:3, :3].astype(np.float64).T
             + pose[:3, 3].astype(np.float64)) - pts
    err = np.linalg.norm(flow - exact, axis=1)
    # f32 rounding at |x|~60 m is ~4e-6; one-pass bf16 would be ~0.2 (5 cm
    # on the translation alone) — orders of magnitude apart
    assert err.max() < 1e-4, err.max()


def test_compute_epe_definitions():
    gt = np.array([[1, 0, 0], [0, 0.0, 0], [0, 2, 0]], np.float32)
    pred = np.array([[1, 0, 0], [0.2, 0, 0], [0, 1, 0]], np.float32)
    epe, accs, accr, outlier, routlier = M.compute_epe(pred, gt)
    per = np.array([0.0, 0.2, 1.0])
    assert np.isclose(epe, per.mean())
    # point0 exact (acc), point1 abs err .2 & rel huge, point2 rel 0.5
    assert np.isclose(accs, 1 / 3)
    assert np.isclose(accr, 1 / 3)
    # outlier: >0.3 abs or >0.1 rel -> points 1 (rel) and 2
    assert np.isclose(outlier, 2 / 3)
    # routlier: >0.3 abs and >0.3 rel -> point 2 only
    assert np.isclose(routlier, 1 / 3)


def test_meter_weighted_average():
    m = M.AverageMeter()
    m.update(1.0, 0, 0, 0, 0, num=10)
    m.update(2.0, 0, 0, 0, 0, num=30)
    assert np.isclose(m.epe_avg, 1.75)
    m2 = M.AverageMeter()
    m2.merge_sums(np.array([40, 70.0, 0, 0, 0, 0]))
    assert np.isclose(m2.epe_avg, 1.75)


def test_update_metrics_category_masks():
    n = 100
    ti = np.concatenate([np.zeros(50), np.ones(50)])
    gt = np.zeros((n, 3), np.float32)
    gt[60:80] = [1, 0, 0]                      # dynamic points
    pred = gt.copy()
    pred[60:70] = 0                            # miss 10 dynamic points
    sd = np.zeros(n)
    sd[60:80] = 1
    fb = np.zeros(n)
    fb[60:80] = 1
    meters = M.make_meters(2)
    M.update_metrics(meters, flow_pred=pred, flow_gt=gt, sd_labels=sd,
                     fb_labels=fb, time_indice=ti, num_frames=2)
    assert np.isclose(meters["dynamic_1"].epe_avg, 0.5)   # 10 of 20 at 1.0
    assert np.isclose(meters["static_1"].epe_avg, 0.0)
    assert meters["overall_1"].num == 50


def test_eval_crop():
    pts = np.array([[0, 0, 1], [40, 0, 1], [0, 0, 0.1]], np.float32)
    keep = M.crop_for_eval(pts, range_x=32, range_y=32, range_z=0.0,
                           ground_slack=0.3, eval_ground=False)
    np.testing.assert_array_equal(keep, [True, False, False])


def test_segment_extraction_subsample_and_stats():
    n = 1000
    pts = np.zeros((n, 3), np.float32)
    pts[:600, 0] = np.linspace(0, 5, 600)      # label 0: long thin segment
    pts[600:650] = [[8, 8, 8]] * 50            # label 1: point blob
    labels = np.full(n, -1, np.int32)
    labels[:600] = 0
    labels[600:650] = 1
    valid = np.ones(n, bool)
    seg = extract_segments(jnp.asarray(pts), jnp.asarray(labels),
                           jnp.asarray(valid), num_labels=4, max_points=128)
    cnt = np.asarray(seg.count)
    assert cnt[0] == 600 and cnt[1] == 50 and cnt[2] == 0
    msk = np.asarray(seg.mask)
    assert msk[0].sum() == 128                 # subsampled to cap
    assert msk[1].sum() == 50
    ext = np.asarray(seg.extent)
    assert ext[0, 2] > 4.5                     # longest side ~5
    np.testing.assert_allclose(np.asarray(seg.mean)[1], [8, 8, 8], atol=1e-5)
