"""shard_map-based distributed step: dp over scan pairs, cp over cluster pairs.

The multi-device "training-step equivalent" of the framework: a batch of
frame pairs is sharded over the ``dp`` mesh axis; inside each frame pair the
cluster-pair buckets of the matcher are sharded over ``cp`` (see
`match/matcher.py`); per-point flow EPE sums are psum-reduced into the global
metric vector — the distributed form of the reference's AverageMeter
(`utils_eval.py:82-135`). The reference itself is explicitly single-device
(`main.py:141-142`); this module is the SURVEY §2 "TPU-native equivalent".

Each batch element carries its own ego ``pose`` and ``translation_frame``
(the reference mutates a global ``args.translation_frame`` per frame gap,
`main.py:200`; here it is an explicit per-pair traced value), so one batch
can mix frame gaps — the CLI shards a sample's (num_frames-1) pairs straight
onto the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PipelineConfig
from ..flow import flow_with_identity_override
from ..match.matcher import match_frame_pair
from ..ops import geometry as geo
from ..ops.segments import extract_segments


def _frame_pair_step(pts_src, valid_src, labels_src,
                     pts_dst, valid_dst, labels_dst,
                     gt_flow, pose, translation_frame, cfg: PipelineConfig,
                     cp_axis, cp_size):
    seg_src = extract_segments(pts_src, labels_src, valid_src,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    seg_dst = extract_segments(pts_dst, labels_dst, valid_dst,
                               num_labels=cfg.num_clusters,
                               max_points=cfg.max_points)
    result = match_frame_pair(seg_src, seg_dst, translation_frame, cfg,
                              cp_axis=cp_axis, cp_size=cp_size)
    # flow is defined on the RAW source points: flow = (T_cluster o pose) x - x
    # (`utils_flow.py:36-48`). The step receives the ego-aligned cloud
    # (pts_src = pose . raw), so raw is recovered on device instead of
    # shipping a second copy of every cloud through host->device transfer.
    raw_src = geo.transform_points_batch(
        pts_src[None], geo.invert_rigid(pose[None]))[0]
    flow = flow_with_identity_override(
        raw_src, labels_src, result.transforms,
        pose, seg_src.pidx, result.identity_pt)
    from ..metrics import compute_epe_sums_jnp
    sums = compute_epe_sums_jnp(flow, gt_flow, valid_src)
    return flow, result.transforms, sums


def make_sharded_step(mesh: Mesh, cfg: PipelineConfig):
    """Build the jitted multi-device step over a (dp, cp) mesh.

    Input batch axis B must be divisible by the dp axis size; cluster-pair
    buckets must be divisible by the cp axis size. Returns
    ``step(pts_src, valid_src, labels_src, pts_dst, valid_dst, labels_dst,
    gt_flow, poses, translation_frames) -> (flow (B,N,3),
    transforms (B,L,4,4), metric_sums (6,))`` where ``poses`` is (B,4,4) ego
    poses, ``translation_frames`` is (B,) per-pair search radii, and
    metric_sums = [num, epe, accs, accr, outlier, routlier] sums reduced over
    the whole mesh (merge with ``AverageMeter.merge_sums``).
    """
    cp_size = mesh.shape["cp"]
    cp_axis = "cp" if cp_size > 1 else None

    def local_step(pts_src, valid_src, labels_src,
                   pts_dst, valid_dst, labels_dst,
                   gt_flow, poses, translation_frames):
        def one(args):
            *arrs, pose, tf = args
            return _frame_pair_step(*arrs, pose, tf, cfg, cp_axis, cp_size)
        flow, transforms, sums = jax.lax.map(
            one, (pts_src, valid_src, labels_src,
                  pts_dst, valid_dst, labels_dst, gt_flow,
                  poses, translation_frames))
        sums = jnp.sum(sums, axis=0)
        # flow/transforms are already replicated over cp by the matcher's
        # all_gather, so the metric reduction crosses dp only.
        sums = jax.lax.psum(sums, "dp")
        return flow, transforms, sums

    batch_spec = P("dp")
    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(batch_spec,) * 9,
        out_specs=(batch_spec, batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(step)
