"""CLI + PCA dataset end-to-end on a synthetic fixture.

Builds a tiny PCAccumulation-format npz (the `dataset_pca.py:30-113` schema:
raw_points / time_indice / sd / fb / inst / sem labels, GT ego and
per-instance motion), runs the full CLI path, and checks the reported EPE.
"""

import os

import numpy as np
import pytest

from icpflow_tpu import cli


def make_pca_npz(path, num_frames=2, seed=0):
    rng = np.random.default_rng(seed)

    def box(center, size, n):
        return center + rng.uniform(-0.5, 0.5, (n, 3)) * size

    # static world + one mover, in "world" coordinates at frame 0.
    # Sized to fit a 4096-point frame bucket: the fast tier pays the full
    # engine compile for this config, and compile cost tracks bucket size.
    ground = box([0, 0, -0.1], [50, 50, 0.1], 1600)
    wall = box([0, 12, 1.2], [40, 0.3, 2.0], 1400)
    car = box([-5, -4, 0.8], [4.2, 1.8, 1.5], 800)
    car_v = np.array([1.5, 0.2, 0.0])          # per-frame motion
    ego_v = np.array([0.8, 0.0, 0.0])          # ego motion per frame

    pts, ti, sd, fb, inst = [], [], [], [], []
    ego_T, inst_T = [], []
    n_inst = 2                                  # 0: static world, 1: car
    inst_motion = np.zeros((n_inst, num_frames, 4, 4), np.float32)
    for j in range(num_frames):
        # world state at frame j
        car_j = car + car_v * j
        world_j = np.concatenate([ground, wall, car_j])
        # sensor pose: ego has moved ego_v*j; points recorded in sensor frame
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = ego_v * j
        sensor_pts = (world_j - T[:3, 3]).astype(np.float32)
        pts.append(sensor_pts)
        ti.append(np.full(len(sensor_pts), j))
        is_car = np.zeros(len(sensor_pts), bool)
        is_car[len(ground) + len(wall):] = True
        sd.append(is_car.astype(np.int64))
        fb.append(is_car.astype(np.int64))
        inst.append(is_car.astype(np.int64))
        ego_T.append(T)
        # inst_motion maps frame-j ego-compensated points -> frame 0 state
        M = np.eye(4, dtype=np.float32)
        M[:3, 3] = -car_v * j
        inst_motion[1, j] = M
        inst_motion[0, j] = np.eye(4)

    np.savez_compressed(
        path,
        raw_points=np.concatenate(pts).astype(np.float32),
        time_indice=np.concatenate(ti).astype(np.int64),
        sd_labels=np.concatenate(sd),
        fb_labels=np.concatenate(fb),
        inst_labels=np.concatenate(inst),
        sem_labels=np.concatenate(inst),
        ego_motion_gt=np.stack(ego_T),
        bbox_tsfm=inst_motion,
    )


@pytest.fixture(scope="module")
def pca_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pca")
    make_pca_npz(os.path.join(root, "seq_000.npz"))
    return str(root)


def test_cli_pca_end_to_end(pca_root, capsys):
    parser = cli.build_parser()
    args = parser.parse_args([
        "--dataset", "waymo", "--split", "test", "--root", pca_root,
        "--num_frames", "2", "--range_x", "32", "--range_y", "32",
        "--range_z", "0.0", "--ground_slack", "0.3",
        "--num_clusters", "32", "--min_cluster_size", "20",
        "--epsilon", "0.4", "--speed", "1.67", "--max_points", "1024",
    ])
    cfg = cli.config_from_args(args)
    cfg = cfg.replace(max_points_scene=4096, max_points=512, max_pairs=32,
                      pairs_small=32, pairs_large=4, nn_tile=256,
                      hist_grid_xy=64)
    # monkey-light: run with the reduced bucket config
    orig = cli.config_from_args
    cli.config_from_args = lambda a: cfg
    try:
        epes = cli.run(args)
    finally:
        cli.config_from_args = orig
    # flow for the moving car must be recovered: overall EPE small
    assert epes["overall_0"] < 0.1, epes["overall_0"]
    assert epes["dynamic_0"] < 0.3, epes["dynamic_0"]


def test_cli_pca_multiframe(tmp_path):
    """num_frames=3: exercises the per-gap translation_frame loop and the
    (j, 0) pairing of the reference protocol (main.py:184-234)."""
    root = str(tmp_path)
    make_pca_npz(os.path.join(root, "seq_000.npz"), num_frames=3)
    parser = cli.build_parser()
    args = parser.parse_args([
        "--dataset", "waymo", "--split", "test", "--root", root,
        "--num_frames", "3", "--range_x", "32", "--range_y", "32",
        "--range_z", "0.0", "--ground_slack", "0.3",
        "--num_clusters", "32", "--min_cluster_size", "20",
        "--epsilon", "0.4", "--speed", "1.67", "--max_points", "1024",
    ])
    cfg = cli.config_from_args(args).replace(
        max_points_scene=4096, max_points=512, max_pairs=32,
        pairs_small=32, pairs_large=4, nn_tile=256, hist_grid_xy=64)
    orig = cli.config_from_args
    cli.config_from_args = lambda a: cfg
    try:
        epes = cli.run(args)
    finally:
        cli.config_from_args = orig
    assert epes["overall_0"] < 0.1
    assert epes["overall_2"] < 0.15      # per-frame gap-2 metric exists


@pytest.mark.slow
def test_cli_sharded_matches_single_device(tmp_path):
    """`--dp/--cp` route the sample's frame pairs through the (dp, cp)
    sharded step (parallel/shard.py); the reported meters must match the
    single-device run on the same fixture (VERDICT r2 item 2: distribution
    as product code, not just a library). Slow tier: two full CLI runs at
    16k buckets; library-level sharded parity stays in the fast tier
    (tests/test_sharding.py)."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    root = str(tmp_path)
    make_pca_npz(os.path.join(root, "seq_000.npz"), num_frames=3)
    base = [
        "--dataset", "waymo", "--split", "test", "--root", root,
        "--num_frames", "3", "--range_x", "32", "--range_y", "32",
        "--range_z", "0.0", "--ground_slack", "0.3",
        "--num_clusters", "32", "--min_cluster_size", "20",
        "--epsilon", "0.4", "--speed", "1.67", "--max_points", "1024",
    ]
    parser = cli.build_parser()
    cfg = cli.config_from_args(parser.parse_args(base)).replace(
        max_points_scene=16384, max_pairs=64, pairs_small=64,
        pairs_large=8, nn_tile=512, hist_grid_xy=128)
    orig = cli.config_from_args
    cli.config_from_args = lambda a: cfg
    try:
        epes_single = cli.run(parser.parse_args(base))
        epes_sharded = cli.run(parser.parse_args(
            base + ["--dp", "2", "--cp", "2"]))
    finally:
        cli.config_from_args = orig
    for name, v in epes_single.items():
        assert abs(epes_sharded[name] - v) < 1e-4, (name, v,
                                                    epes_sharded[name])


def test_cli_multihost_flag_initialises_distributed(pca_root, monkeypatch):
    """`--multihost` must call jax.distributed.initialize() before building
    the mesh and then run normally (cli.py:172-177). A real multi-host run
    needs a pod slice (one process per host with coordinator env vars) —
    unavailable on this rig — so initialize is mocked and the rest of the
    pipeline runs single-process. Reuses the module fixture + config of
    test_cli_pca_end_to_end so the jitted programs are shared."""
    import jax

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    parser = cli.build_parser()
    args = parser.parse_args([
        "--dataset", "waymo", "--split", "test", "--root", pca_root,
        "--num_frames", "2", "--range_x", "32", "--range_y", "32",
        "--range_z", "0.0", "--ground_slack", "0.3",
        "--num_clusters", "32", "--min_cluster_size", "20",
        "--epsilon", "0.4", "--speed", "1.67", "--max_points", "1024",
        "--multihost",
    ])
    cfg = cli.config_from_args(args).replace(
        max_points_scene=4096, max_points=512, max_pairs=32,
        pairs_small=32, pairs_large=4, nn_tile=256, hist_grid_xy=64)
    orig = cli.config_from_args
    cli.config_from_args = lambda a: cfg
    try:
        epes = cli.run(args)
    finally:
        cli.config_from_args = orig
    assert len(calls) == 1          # initialize() exactly once, before run
    assert epes["overall_0"] < 0.1


def test_shipped_split_manifests():
    """The reference's exact waymo/nuscene splits ship with the repo
    (assets/configs/datasets, 4031/2974 test seqs) and resolve from any cwd;
    a root that doesn't contain the manifest files falls back to globbing."""
    import numpy as np
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, n in (("waymo", 4031), ("nuscene", 2974)):
        path = os.path.join(repo, "assets/configs/datasets", name,
                            "test_info.txt")
        names = np.loadtxt(path, dtype=str)
        assert len(names) == n
        assert names[0].startswith(f"/{name}")
