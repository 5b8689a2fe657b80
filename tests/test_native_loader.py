"""Native data plane: C++ npz reader / prefetch pool / crop_pad vs numpy."""

import os

import numpy as np
import pytest

from icpflow_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def lib():
    lib = nl.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


@pytest.fixture()
def sample_npz(tmp_path):
    rng = np.random.default_rng(0)
    data = {
        "points": rng.normal(size=(5000, 3)).astype(np.float32),
        "labels": rng.integers(0, 100, size=(5000,)).astype(np.int64),
        "mask": (rng.random(5000) > 0.5),
        "pose": np.eye(4),
        "count": np.array([5000], np.int32),
    }
    path = os.path.join(tmp_path, "sample.npz")
    np.savez_compressed(path, **data)
    return path, data


def test_native_npz_matches_numpy(lib, sample_npz):
    path, data = sample_npz
    out = nl.load_npz(path)
    assert set(out) == set(data)
    for k in data:
        ref = np.asarray(data[k])
        got = out[k]
        assert got.shape == ref.shape, k
        np.testing.assert_array_equal(got.astype(ref.dtype), ref)


def test_native_npz_uncompressed(lib, tmp_path):
    path = os.path.join(tmp_path, "plain.npz")
    a = np.arange(101, dtype=np.float32).reshape(101, 1)
    np.savez(path, a=a)    # stored, not deflated
    out = nl.load_npz(path)
    np.testing.assert_array_equal(out["a"], a)


def test_prefetch_pool_in_order(lib, tmp_path):
    paths = []
    for i in range(7):
        p = os.path.join(tmp_path, f"s{i}.npz")
        np.savez_compressed(p, idx=np.array([i]))
        paths.append(p)
    pool = nl.PrefetchPool(paths, workers=3, depth=2)
    seen = [int(d["idx"][0]) for d in pool]
    pool.close()
    assert seen == list(range(7))


def test_crop_pad_matches_numpy(lib):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-50, 50, size=(20000, 3)).astype(np.float32)
    out, valid, k = nl.crop_pad(pts, 32.0, 32.0, 16384)
    keep = np.logical_and(np.abs(pts[:, 0]) < 32.0, np.abs(pts[:, 1]) < 32.0)
    # native uses <= bounds-exclusion equivalence; count must match closely
    assert abs(int(keep.sum()) - k) <= 2
    assert valid.sum() == min(k, 16384)
    assert np.isfinite(out).all()
    assert (out[~valid] == 0).all()


def test_iter_samples_prefetched_matches_getitem(tmp_path):
    """The CLI's prefetched iteration must yield exactly what indexed access
    yields (same decode + preprocessing), in order, honoring the index list."""
    from test_cli_pca import make_pca_npz
    from icpflow_tpu.config import PRESETS
    from icpflow_tpu.data.pca import DatasetPCA

    for i in range(3):
        make_pca_npz(str(tmp_path / f"s{i}.npz"), num_frames=2, seed=i)
    cfg = PRESETS["waymo"].replace(
        num_frames=2, max_points_scene=16384, max_points=1024,
        num_clusters=64, min_cluster_size=8, range_z=-0.35)
    ds = DatasetPCA(cfg, str(tmp_path), "test")
    assert len(ds) == 3

    got = list(ds.iter_samples([2, 0]))
    assert [g[0] for g in got] == [2, 0]
    for k, data, pairs in got:
        data_ref, pairs_ref = ds[k]
        np.testing.assert_array_equal(data["raw_points"],
                                      data_ref["raw_points"])
        np.testing.assert_array_equal(data["scene_flow"],
                                      data_ref["scene_flow"])
        assert len(pairs) == len(pairs_ref)
        for p, pr in zip(pairs, pairs_ref):
            np.testing.assert_array_equal(p["label_src"], pr["label_src"])
            np.testing.assert_array_equal(p["point_src"], pr["point_src"])
