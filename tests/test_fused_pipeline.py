"""The fused single-program pipeline must equal the staged dispatches.

`SceneFlowEngine.run_pair` fuses joint DBSCAN + matcher + flow assembly
into one XLA program (launch-overhead amortisation); it must be bitwise
identical to the three-dispatch path on the same inputs (same ops, same
order — only the program boundary moves).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from icpflow_tpu import SceneFlowEngine, DEMO


def _toy_pair(seed=0, n=1500):
    rng = np.random.default_rng(seed)
    # a few blobs + noise, second frame shifted
    blobs = [rng.normal(loc=c, scale=0.2, size=(n // 4, 3))
             for c in ([0, 0, 0], [4, 1, 0], [-3, 2, 0.5])]
    noise = rng.uniform(-8, 8, size=(n - 3 * (n // 4), 3))
    src = np.concatenate(blobs + [noise]).astype(np.float32)
    shift = np.array([0.6, -0.3, 0.0], np.float32)
    dst = (src + shift + rng.normal(scale=0.01, size=src.shape)
           ).astype(np.float32)
    return src, dst


@pytest.mark.slow
def test_fused_equals_staged():
    cfg = DEMO.replace(max_points_scene=2048, max_points=512,
                       num_clusters=32, max_pairs=64, min_cluster_size=8,
                       nn_tile=256, hist_grid_xy=64, icp_max_iters=20)
    engine = SceneFlowEngine(cfg)
    src, dst = _toy_pair()
    ps, vs = engine.pad_cloud(src)
    pd, vd = engine.pad_cloud(dst)
    jps, jvs = jnp.asarray(ps), jnp.asarray(vs)
    jpd, jvd = jnp.asarray(pd), jnp.asarray(vd)

    fused = engine.run_pair(jps, jvs, jpd, jvd, 2.0)
    flow_f, out_f = fused.flow, fused.track

    lab_dst, lab_src = engine.cluster_joint(jpd, jvd, jps, jvs)
    out_s = engine.track_pair(jps, jvs, lab_src, jpd, jvd, lab_dst, 2.0)
    flow_s = engine.flow(jps, lab_src, out_s.result.transforms,
                         np.eye(4, dtype=np.float32))

    np.testing.assert_array_equal(np.asarray(fused.lab_src),
                                  np.asarray(lab_src))
    np.testing.assert_array_equal(np.asarray(fused.lab_dst),
                                  np.asarray(lab_dst))
    np.testing.assert_array_equal(np.asarray(out_f.result.matched),
                                  np.asarray(out_s.result.matched))
    np.testing.assert_array_equal(np.asarray(out_f.result.dst_label),
                                  np.asarray(out_s.result.dst_label))
    np.testing.assert_allclose(np.asarray(flow_f), np.asarray(flow_s),
                               atol=1e-6)
    # the fused program did real work
    assert int(np.asarray(out_f.result.matched).sum()) >= 3
    assert float(np.abs(np.asarray(flow_f)).max()) > 0.1
