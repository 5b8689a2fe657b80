"""Vectorised pair gating.

Replaces the per-pair Python loops of `utils_check.py:21-66` with masked
batched predicates over the whole candidate matrix / pair bucket.
"""

from __future__ import annotations

import jax.numpy as jnp


def sanity_matrix(
    src_count, src_mean, src_extent,
    dst_count, dst_mean, dst_extent,
    *,
    min_cluster_size: int,
    thres_box: float,
    translation_frame,
) -> jnp.ndarray:
    """(L_src, L_dst) matchability of every label pair.

    Ref `utils_check.py:21-49`: both clusters at least ``min_cluster_size``
    points, xy centroid shift within ``translation_frame``, and each sorted
    bbox side within a ``thres_box`` ratio of its counterpart.
    """
    ok_size = (jnp.minimum(src_count[:, None], dst_count[None, :])
               >= min_cluster_size)
    d_xy = jnp.linalg.norm(
        dst_mean[None, :, :2] - src_mean[:, None, :2], axis=-1)
    ok_shift = d_xy <= translation_frame
    lo = jnp.minimum(src_extent[:, None, :], dst_extent[None, :, :])
    hi = jnp.maximum(src_extent[:, None, :], dst_extent[None, :, :])
    ok_box = jnp.all(lo >= thres_box * hi, axis=-1)
    return ok_size & ok_shift & ok_box


def check_transformation(
    translation: jnp.ndarray,
    rotation_deg: jnp.ndarray,
    iou_min: jnp.ndarray,
    *,
    translation_frame,
    thres_iou: float,
    thres_rot: float,
    thres_z: float = 0.0,
) -> jnp.ndarray:
    """Post-ICP acceptance per pair, (K,) bool.

    Ref `utils_check.py:51-66`: reject if the centroid translation exceeds
    ``translation_frame``, min IoU is below ``thres_iou``, or |roll/pitch|
    exceeds ``thres_rot * 90`` degrees. ``thres_z > 0`` adds a vertical
    centroid-shift gate (framework extension; see config.thres_z).
    """
    ok_t = jnp.linalg.norm(translation, axis=-1) <= translation_frame
    ok_iou = iou_min >= thres_iou
    max_rot = thres_rot * 90.0
    ok_rot = jnp.max(jnp.abs(rotation_deg[:, 1:3]), axis=-1) <= max_rot
    ok = ok_t & ok_iou & ok_rot
    if thres_z > 0:
        ok = ok & (jnp.abs(translation[:, 2]) <= thres_z)
    return ok
