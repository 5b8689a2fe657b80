"""shard_map-based distributed step: dp over scan pairs, cp over cluster pairs.

The multi-device "training-step equivalent" of the framework: a batch of
frame pairs is sharded over the ``dp`` mesh axis; inside each frame pair the
cluster-pair buckets of the matcher are sharded over ``cp`` (see
`match/matcher.py`); per-point flow EPE sums are psum-reduced into the global
metric vector — the distributed form of the reference's AverageMeter
(`utils_eval.py:82-135`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PipelineConfig
from ..flow import flow_with_identity_override
from ..match.matcher import match_frame_pair
from ..ops.segments import extract_segments


def _frame_pair_step(pts_src, valid_src, labels_src,
                     pts_dst, valid_dst, labels_dst,
                     gt_flow, translation_frame, cfg: PipelineConfig,
                     cp_axis, cp_size):
    seg_src = extract_segments(pts_src, labels_src, valid_src,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    seg_dst = extract_segments(pts_dst, labels_dst, valid_dst,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    result = match_frame_pair(seg_src, seg_dst, translation_frame, cfg,
                              cp_axis=cp_axis, cp_size=cp_size)
    flow = flow_with_identity_override(
        pts_src, labels_src, result.transforms,
        jnp.eye(4, dtype=pts_src.dtype), seg_src.pidx, result.identity_pt)
    from ..metrics import compute_epe_sums_jnp
    sums = compute_epe_sums_jnp(flow, gt_flow, valid_src)
    return flow, result.transforms, sums


def make_sharded_step(mesh: Mesh, cfg: PipelineConfig):
    """Build the jitted multi-device step over a (dp, cp) mesh.

    Input batch axis B must be divisible by the dp axis size; cluster-pair
    buckets must be divisible by the cp axis size. Returns
    ``step(pts_src, valid_src, labels_src, pts_dst, valid_dst, labels_dst,
    gt_flow, translation_frame) -> (flow (B,N,3), transforms (B,L,4,4),
    metric_sums (2,))`` where metric_sums = [num_points, epe_sum] reduced
    over the whole mesh.
    """
    cp_size = mesh.shape["cp"]
    cp_axis = "cp" if cp_size > 1 else None

    def local_step(pts_src, valid_src, labels_src,
                   pts_dst, valid_dst, labels_dst,
                   gt_flow, translation_frame):
        def one(args):
            return _frame_pair_step(*args, translation_frame, cfg,
                                    cp_axis, cp_size)
        flow, transforms, sums = jax.lax.map(
            one, (pts_src, valid_src, labels_src,
                  pts_dst, valid_dst, labels_dst, gt_flow))
        sums = jnp.sum(sums, axis=0)
        sums = jax.lax.psum(sums, "dp")
        if cp_size > 1:
            # flow/transforms are replicated over cp after the matcher's
            # all_gather; metric sums are dp-reduced only.
            pass
        return flow, transforms, sums

    batch_spec = P("dp")
    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(batch_spec,) * 7 + (P(),),
        out_specs=(batch_spec, batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(step)
