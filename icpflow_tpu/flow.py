"""Flow assembly: per-point rigid flow from per-cluster transforms.

Ref `utils_flow.py:23-69`: each source point takes its cluster's accepted
transform (identity when unmatched/unclustered/ground), composed with the ego
pose; flow = (T_cluster o pose) x - x. Vectorised as a single (L+1)-table
gather — no per-cluster Python loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def flow_from_transforms(
    points: jnp.ndarray,
    labels: jnp.ndarray,
    transforms: jnp.ndarray,
    pose: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point flow. Ref utils_flow.py:57-69 (flow_estimation_torch).

    Args:
      points: (N, 3) source points (raw frame, pre ego-compensation).
      labels: (N,) int32; >=0 cluster id, negative -> identity transform.
      transforms: (L, 4, 4) per-cluster transforms (identity where unmatched).
      pose: (4, 4) ego pose of the source frame.
    Returns: (N, 3) flow vectors.
    """
    L = transforms.shape[0]
    eye = jnp.eye(4, dtype=transforms.dtype)[None]
    table = jnp.concatenate([transforms, eye], axis=0)        # (L+1,4,4)
    idx = jnp.where((labels >= 0) & (labels < L), labels, L)
    T_pt = table[idx]                                          # (N,4,4)
    # HIGHEST precision is load-bearing: at default precision the TPU MXU
    # truncates the metre-scale pose/point operands to bf16, and every
    # identity-matched static point inherited a per-gap-constant flow error
    # (~0.2% of the ego translation; heldout static EPE 0.0064-0.025 at
    # gaps 6-9, zero on CPU — round-5 item 6 trace, scripts/trace_gap_static)
    T_full = jnp.einsum("nij,jk->nik", T_pt, pose,
                        precision=jax.lax.Precision.HIGHEST)
    moved = jnp.einsum("nij,nj->ni", T_full[:, :3, :3], points,
                       precision=jax.lax.Precision.HIGHEST) \
        + T_full[:, :3, 3]
    return moved - points


@functools.partial(jax.jit, static_argnames=())
def flow_with_identity_override(
    points: jnp.ndarray,
    labels: jnp.ndarray,
    transforms: jnp.ndarray,
    pose: jnp.ndarray,
    seg_pidx: jnp.ndarray,
    identity_pt: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point flow with the matcher's ego-only overrides applied.

    ``identity_pt`` (L, P) flags static stowaways inside accepted moving
    clusters (see config.per_point_identity); their flow reverts to the
    ego-pose-only component. ``seg_pidx`` maps segment slots back to raw
    point indices.
    """
    flow = flow_from_transforms(points, labels, transforms, pose)
    ego_moved = jnp.einsum("ij,nj->ni", pose[:3, :3], points,
                           precision=jax.lax.Precision.HIGHEST) + pose[:3, 3]
    ego_flow = ego_moved - points
    n = points.shape[0]
    flat_idx = seg_pidx.reshape(-1)
    flat_flag = identity_pt.reshape(-1)
    tgt = jnp.where(flat_flag, flat_idx, n)              # OOB -> dropped
    return flow.at[tgt].set(ego_flow[jnp.minimum(flat_idx, n - 1)],
                            mode="drop")
