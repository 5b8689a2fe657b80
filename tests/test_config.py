"""Config canonicalisation guards.

``PipelineConfig.device_canonical`` pins host-only fields so engines that
differ only in host-side orchestration share jitted device programs. These
tests enforce (a) the invariant the canonical set relies on — none of those
fields is read inside device code — and (b) that configs differing only in
host fields collapse to the same canonical config (and therefore the same
jit static-argument cache key).
"""

import os
import re

import jax.numpy as jnp
import numpy as np

from icpflow_tpu.config import (_HOST_ONLY_CANONICAL, DEMO, NUSCENES, WAYMO,
                                PipelineConfig)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Files that make up the jitted device path of the engine. Host-side
# orchestration (data/, cli, metrics, demo driver, ego host class, streaming
# host loop) may read the canonicalised fields freely.
DEVICE_FILES = [
    "icpflow_tpu/flow.py",
    "icpflow_tpu/match/matcher.py",
    "icpflow_tpu/match/gates.py",
    "icpflow_tpu/ops/hist.py",
    "icpflow_tpu/ops/icp.py",
    "icpflow_tpu/ops/segments.py",
    "icpflow_tpu/ops/knn.py",
    "icpflow_tpu/ops/geometry.py",
]


def test_host_only_fields_unused_in_device_code():
    pat = re.compile(
        r"cfg\.(" + "|".join(re.escape(k) for k in _HOST_ONLY_CANONICAL)
        + r")\b")
    hits = []
    for rel in DEVICE_FILES:
        with open(os.path.join(REPO, rel)) as f:
            for i, line in enumerate(f, 1):
                if pat.search(line):
                    hits.append(f"{rel}:{i}: {line.strip()}")
    assert not hits, (
        "host-only canonicalised config fields referenced in device code — "
        "remove the field from _HOST_ONLY_CANONICAL or the usage:\n"
        + "\n".join(hits))


def test_models_dir_reads_host_fields_only_outside_jit():
    # models/icp_flow.py may read host fields via self.cfg, but the jitted
    # impls receive the canonical config — spot-check the call sites.
    path = os.path.join(REPO, "icpflow_tpu/models/icp_flow.py")
    src = open(path).read()
    assert "self._dev_cfg)" in src
    assert "translation_frame, self.cfg)" not in src


def test_host_variants_share_canonical_config():
    base = DEMO.replace(max_points_scene=4096)
    variants = [
        base.replace(dataset="waymo", num_frames=5, speed=1.67),
        base.replace(range_x=32.0, range_y=32.0, range_z=-1.6,
                     ground_slack=0.3),
        base.replace(use_kiss_icp=True, ego_map_capacity=1024),
        base.replace(use_hdbscan=True, hdbscan_exact=False),
    ]
    canon = base.device_canonical()
    for v in variants:
        assert v.device_canonical() == canon
        assert hash(v.device_canonical()) == hash(canon)
    # device-shape knobs must NOT canonicalise away
    assert base.replace(max_points=2048).device_canonical() != canon
    assert base.replace(epsilon=0.5).device_canonical() != canon


def test_canonical_config_runs_pipeline():
    """The canonicalised config must drive the real engine unchanged."""
    from icpflow_tpu import SceneFlowEngine

    # minimal buckets: this test only proves the canonicalised configs drive
    # ONE shared compiled program, so compile cost is the whole budget
    cfg = PipelineConfig(
        max_points_scene=1024, max_points=128, num_clusters=8,
        pairs_small=8, pairs_large=2, max_points_small=32,
        epsilon=0.6, min_cluster_size=10, nn_tile=64, hist_grid_xy=32,
        icp_max_iters=4)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 2.0
    eng_a = SceneFlowEngine(cfg.replace(dataset="waymo", num_frames=7))
    eng_b = SceneFlowEngine(cfg.replace(dataset="nuscene", range_x=9.0))
    pa, va = eng_a.pad_cloud(pts)
    out_a = eng_a.run_pair(jnp.asarray(pa), jnp.asarray(va),
                           jnp.asarray(pa), jnp.asarray(va), 2.0)
    out_b = eng_b.run_pair(jnp.asarray(pa), jnp.asarray(va),
                           jnp.asarray(pa), jnp.asarray(va), 2.0)
    np.testing.assert_array_equal(np.asarray(out_a.flow),
                                  np.asarray(out_b.flow))
