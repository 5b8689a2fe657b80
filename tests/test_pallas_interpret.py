"""Pallas NN kernel correctness in interpreter mode (runs on CPU)."""

import numpy as np
import jax.numpy as jnp

from icpflow_tpu.ops.knn import _masked_nn_xla
from icpflow_tpu.ops.pallas.nn_kernel import masked_nn_pallas


def test_pallas_nn_matches_xla_interpreted():
    rng = np.random.default_rng(0)
    B, N, M = 2, 256, 384
    src = jnp.asarray(rng.uniform(-20, 20, (B, N, 3)).astype(np.float32))
    dst = jnp.asarray(rng.uniform(-20, 20, (B, M, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, M)) > 0.3)
    i1, d1 = _masked_nn_xla(src, dst, mask, tile=128)
    i2, d2 = masked_nn_pallas(src, dst, mask, tn=128, tm=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-4)
    # tie-breaking may differ; distances of picked neighbors must agree
    picked = np.linalg.norm(
        np.asarray(src)[:, :, None, :].squeeze(2)
        - np.take_along_axis(np.asarray(dst), np.asarray(i2)[:, :, None], 1),
        axis=-1)
    np.testing.assert_allclose(picked, np.asarray(d1), rtol=1e-3, atol=1e-3)


def test_pallas_nn_vpu_variant_matches_xla_interpreted():
    """Both kernel variants (mxu default, vpu alternative) against the XLA path."""
    rng = np.random.default_rng(1)
    B, N, M = 2, 256, 384
    src = jnp.asarray(rng.uniform(-20, 20, (B, N, 3)).astype(np.float32))
    dst = jnp.asarray(rng.uniform(-20, 20, (B, M, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, M)) > 0.3)
    i1, d1 = _masked_nn_xla(src, dst, mask, tile=128)
    for variant in ("vpu", "mxu", "vpu2"):
        i2, d2 = masked_nn_pallas(src, dst, mask, tn=128, tm=128,
                                  interpret=True, variant=variant)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_nn_points_vpu2_matches_gather_interpreted():
    """The chunked running-min points kernel: winner coords == gather of the
    winner index, and distances match the XLA reference."""
    from icpflow_tpu.ops.pallas.nn_kernel import masked_nn_points_pallas
    rng = np.random.default_rng(2)
    B, N, M = 2, 256, 384
    src = jnp.asarray(rng.uniform(-20, 20, (B, N, 3)).astype(np.float32))
    dst = jnp.asarray(rng.uniform(-20, 20, (B, M, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, M)) > 0.3)
    i1, d1 = _masked_nn_xla(src, dst, mask, tile=128)
    for variant in ("mxu", "vpu2"):
        pts, d2 = masked_nn_points_pallas(src, dst, mask, tn=128, tm=128,
                                          interpret=True, variant=variant)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-4, atol=1e-4)
        # the returned coordinates must be AT the reported distance
        got = np.linalg.norm(np.asarray(src) - np.asarray(pts), axis=-1)
        np.testing.assert_allclose(got, np.asarray(d2), rtol=1e-4, atol=1e-4)
