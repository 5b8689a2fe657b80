"""StreamingEngine: online per-frame scene flow for serving.

The reference is an offline benchmark loop over pre-packaged multi-frame
samples (`main.py:184-285`). Production serving consumes a live scan stream;
this engine processes frames incrementally:

  new scan -> (optional) ego odometry against the running map ->
  ground removal -> joint clustering with the previous kept frame ->
  two-stage matching -> per-point flow of the new frame.

Device state (previous frame buffers) stays resident on-chip between frames,
so per-frame cost is the device pipeline (the fused pair program — see the
latest BENCH_r{N}.json `sec_per_pair` for the current honest number) plus
one host transfer of the new scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops.ego import EgoOdometry
from ..ops.ground import segment_ground
from .icp_flow import SceneFlowEngine


class StreamOutput(NamedTuple):
    flow: np.ndarray          # (n, 3) flow of the new frame vs previous
    pose: np.ndarray          # (4, 4) ego pose of the new frame (world)
    pairs: np.ndarray         # (K, 10) matched pairs table
    labels: np.ndarray        # (n,) cluster labels of the new frame


class StreamingEngine:
    """Online scene flow over a scan stream."""

    def __init__(self, cfg: PipelineConfig, estimate_ego: bool = True):
        self.cfg = cfg
        self.engine = SceneFlowEngine(cfg)
        self.odo: Optional[EgoOdometry] = (
            EgoOdometry(cfg) if estimate_ego else None)
        self._prev = None          # (jnp pts, valid, labels-at-prev, n)
        self._frame_idx = 0

    def reset(self):
        self._prev = None
        self._frame_idx = 0
        if self.odo is not None:
            self.odo = EgoOdometry(self.cfg)

    def process(self, scan: np.ndarray,
                pose: Optional[np.ndarray] = None) -> Optional[StreamOutput]:
        """Feed one (n, 3) scan in sensor coordinates.

        ``pose`` overrides ego estimation (world <- sensor). Returns None for
        the very first frame (no pair yet).
        """
        cfg = self.cfg
        eng = self.engine
        scan = np.asarray(scan, np.float32)[:, :3]

        if pose is None and self.odo is not None:
            pose = self.odo.register_frame(scan)
        if pose is None:
            pose = np.eye(4, dtype=np.float32)
        pose = np.asarray(pose, np.float32)

        world = scan @ pose[:3, :3].T + pose[:3, 3]
        p, v = eng.pad_cloud(world)
        jp, jv = jnp.asarray(p), jnp.asarray(v)
        ng = segment_ground(jp, jv, range_z=cfg.range_z,
                            ground_slack=cfg.ground_slack)

        prev = self._prev
        self._frame_idx += 1
        if prev is None:
            self._prev = (jp, jv, ng, len(scan))
            return None

        jp_prev, jv_prev, ng_prev, n_prev = prev
        # joint clustering: previous frame is "dst", new frame is "src"
        lab_dst, lab_src = eng.cluster_joint(
            jp_prev, jv_prev & ng_prev, jp, jv & ng)
        tf = cfg.translation_frame(1)
        out = eng.track_pair(jp, jv, lab_src, jp_prev, jv_prev, lab_dst, tf)
        # flow in world coordinates of the new frame vs the previous one
        flow = np.asarray(eng.flow(
            jp, lab_src, out.result.transforms, np.eye(4, dtype=np.float32),
            seg_pidx=out.seg_src.pidx,
            identity_pt=out.result.identity_pt))[: len(scan)]
        labels = np.asarray(lab_src)[: len(scan)]
        self._prev = (jp, jv, ng, len(scan))
        return StreamOutput(flow=flow, pose=pose,
                            pairs=self.engine.pairs_array(out.result),
                            labels=labels)
