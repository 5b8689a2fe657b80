"""Ego-motion estimation: KISS-ICP-style odometry, TPU-native.

Replaces the reference's dependency on the `kiss_icp` package
(`utils_ego_motion.py:21-111`) with a functional JAX pipeline of the same
shape: range preproceessing -> double voxel downsample (0.5x map voxel for
the local map insert, 1.5x for the registration source,
`utils_ego_motion.py:89-92`) -> constant-velocity initial guess
(`utils_ego_motion.py:101-104`) -> robust point-to-map ICP against a
fixed-capacity voxel-deduplicated map buffer -> adaptive threshold update
(`utils_ego_motion.py:66,84`).

Static shapes throughout: the local map is a fixed-capacity masked point
buffer; voxel dedup is a sort + first-in-voxel mask; the registration solve
is a Geman-McClure-weighted Kabsch iteration under ``lax.fori_loop``.

Deskewing note (`utils_ego_motion.py:54`): the reference calls
``compensator.deskew_scan(frame, poses, zeros(len(frame)) + t)`` with ``t``
the *frame index* — a constant per-point timestamp. KISS-ICP's deskew
interpolates by relative within-scan timestamps, so a constant vector makes
it a rigid no-op absorbed by the ICP initial guess; the PCA npz schema
carries no per-point timestamps for a real deskew to use. Omitting the stage
is therefore behaviourally faithful (docs/ARCHITECTURE.md).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from . import geometry as geo
from . import knn as _knn


@functools.partial(jax.jit, static_argnames=("voxel",))
def voxel_downsample_mask(xyz, valid, *, voxel: float):
    """Mark the first point of each occupied voxel (static-shape dedup)."""
    n = xyz.shape[0]
    cell = jnp.floor(xyz / voxel).astype(jnp.int32)
    cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
    span = jnp.maximum(cmax - cmin + 1, 1)
    cc = cell - cmin
    ids = (cc[:, 0] * span[1] + cc[:, 1]) * span[2] + cc[:, 2]
    ids = jnp.where(valid, ids, jnp.int32(2 ** 30))
    order = jnp.argsort(ids)
    ids_s = ids[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    keep_sorted = first & (ids_s < 2 ** 30)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep & valid


@functools.partial(jax.jit, static_argnames=("iters", "tile"))
def register_frame_icp(source, source_valid, map_pts, map_valid,
                       initial_guess, max_dist, kernel,
                       *, iters: int = 500, tile: int = 2048):
    """Robust point-to-map ICP. Returns the refined (4,4) pose.

    Geman-McClure weights w = (k^2 / (k^2 + d^2))^2 with correspondences
    gated at ``max_dist``, iterated until the pose update falls below the
    estimation threshold (cap ``iters``) — the registration model and
    termination rule of KISS-ICP's C++ core invoked at
    `utils_ego_motion.py:76-82` (kiss-icp Registration.cpp:
    ESTIMATION_THRESHOLD_ 1e-4, MAX_NUM_ITERATIONS_ 500). A fixed low cap
    stalls on turning motion: self-similar ground/wall correspondences make
    per-iteration progress small, so convergence — not a round number —
    must terminate the loop.
    """
    def body(state):
        pose, _, it = state
        moved = geo.transform_points_batch(source[None], pose[None])[0]
        idx, dist = _knn.masked_nn(moved[None], map_pts[None],
                                   map_valid[None], tile=tile)
        idx, dist = idx[0], dist[0]
        nn = map_pts[idx]
        w_gm = (kernel ** 2 / (kernel ** 2 + dist ** 2)) ** 2
        w = jnp.where((dist <= max_dist) & source_valid, w_gm, 0.0)
        R, t = geo.kabsch(source[None], nn[None], w[None])
        new_pose = geo.rt_to_mat(R, t)[0]
        delta = (jnp.linalg.norm(new_pose[:3, 3] - pose[:3, 3])
                 + jnp.linalg.norm(new_pose[:3, :3] - pose[:3, :3]))
        return new_pose, delta, it + 1

    def cond(state):
        _, delta, it = state
        return (delta > 1e-4) & (it < iters)

    pose, _, _ = jax.lax.while_loop(
        cond, body, (initial_guess, jnp.float32(1e9), jnp.int32(0)))
    return pose


class EgoOdometry:
    """Sequential odometry over frames (host loop, device compute).

    Mirrors the `egomotion` class surface (`utils_ego_motion.py:21-111`):
    ``register_frame(frame) -> pose`` appends to ``poses``.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.poses: List[np.ndarray] = []
        cap = cfg.ego_map_capacity
        self._map = np.zeros((cap, 3), np.float32)
        self._map_valid = np.zeros((cap,), bool)
        self._deviations: List[float] = []

    # -- adaptive threshold (kiss-icp threshold.py semantics) --------------
    def _sigma(self) -> float:
        cfg = self.cfg
        if not self._has_moved() or not self._deviations:
            return cfg.ego_initial_threshold
        dev = np.asarray(self._deviations)
        dev = dev[dev > cfg.ego_min_motion_th]
        if len(dev) == 0:
            return cfg.ego_initial_threshold
        return float(np.sqrt(np.mean(dev ** 2)))

    def _has_moved(self) -> bool:
        if len(self.poses) < 1:
            return False
        motion = np.linalg.norm(
            (np.linalg.inv(self.poses[0]) @ self.poses[-1])[:3, 3])
        return motion > 5 * self.cfg.ego_min_motion_th

    def _prediction(self) -> np.ndarray:
        if len(self.poses) < 2:
            return np.eye(4, dtype=np.float32)
        return np.linalg.inv(self.poses[-2]) @ self.poses[-1]

    def register_frame(self, frame: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        r = np.linalg.norm(frame[:, :3], axis=1)
        frame = frame[(r > cfg.ego_min_range) & (r < cfg.ego_max_range), :3]
        frame = frame.astype(np.float32)

        cap = cfg.max_points_scene
        buf = np.zeros((cap, 3), np.float32)
        n = min(len(frame), cap)
        buf[:n] = frame[:n]
        valid = np.zeros((cap,), bool)
        valid[:n] = True
        jbuf, jvalid = jnp.asarray(buf), jnp.asarray(valid)

        keep_map = np.asarray(voxel_downsample_mask(
            jbuf, jvalid, voxel=cfg.ego_voxel_size * 0.5))
        keep_src = np.asarray(voxel_downsample_mask(
            jbuf, jnp.asarray(keep_map), voxel=cfg.ego_voxel_size * 1.5))

        # registration source: the 1.5x-voxel downsample COMPACTED into its
        # own small bucket. Registering through the full frame bucket with a
        # keep mask pays the N x M NN sweep at the padded frame size
        # (131k x 262k x iters in one XLA execution — long enough that the
        # tunnel runtime's watchdog kills the worker); the downsampled cloud
        # is a few thousand points (kiss-icp registers exactly this cloud,
        # utils_ego_motion.py:62,76-82).
        src_pts = buf[keep_src]
        scap = int(cfg.ego_src_capacity)
        sbuf = np.zeros((scap, 3), np.float32)
        ns = min(len(src_pts), scap)
        sbuf[:ns] = src_pts[:ns]
        svalid = np.zeros((scap,), bool)
        svalid[:ns] = True

        if not self.poses:
            pose = np.eye(4, dtype=np.float32)
        else:
            sigma = self._sigma()
            initial = (self.poses[-1] @ self._prediction()).astype(np.float32)
            jsb, jsv = jnp.asarray(sbuf), jnp.asarray(svalid)
            jmap, jmv = jnp.asarray(self._map), jnp.asarray(self._map_valid)
            pose = np.asarray(register_frame_icp(
                jsb, jsv, jmap, jmv,
                jnp.asarray(initial), jnp.float32(3.0 * sigma),
                jnp.float32(sigma / 3.0), iters=cfg.ego_max_iters))
            if cfg.ego_refine_sigma > 0:
                # tight-radius refinement (framework extension beyond
                # kiss-icp, docs/ARCHITECTURE.md): the adaptive threshold
                # cannot fall below the LAST prediction deviation that
                # cleared min_motion_th, so on well-predicted sequences the
                # gate stays metres wide and far self-similar structure
                # keeps ~cm of bias in the solve. One more registration at a
                # fixed tight radius (same robust kernel shape) polishes the
                # pose using only near-surface correspondences; with the
                # wide-gate pose as its init it cannot diverge (same
                # convergence-terminated loop).
                s2 = cfg.ego_refine_sigma
                pose = np.asarray(register_frame_icp(
                    jsb, jsv, jmap, jmv,
                    jnp.asarray(pose), jnp.float32(3.0 * s2),
                    jnp.float32(s2 / 3.0), iters=cfg.ego_max_iters))
            # model deviation for the adaptive threshold: translation PLUS
            # the rotation-induced displacement at max range — kiss-icp's
            # ComputeModelError (adaptive_threshold.cpp), not just |t|
            dev = np.linalg.inv(self.poses[-1] @ self._prediction()) @ pose
            theta = np.arccos(np.clip((np.trace(dev[:3, :3]) - 1) / 2,
                                      -1.0, 1.0))
            model_err = (2.0 * cfg.ego_max_range * np.sin(theta / 2.0)
                         + np.linalg.norm(dev[:3, 3]))
            self._deviations.append(float(model_err))

        # map update: insert downsampled frame in world coords, voxel-dedup
        # with EXISTING map points winning occupied voxels (kiss-icp
        # VoxelHashMap::AddPoints inserts only into non-full voxels — the
        # map is stable, new scans fill gaps), then truncate to capacity;
        # prune map points beyond max_range of the current pose (kiss-icp
        # VoxelHashMap::Update's RemovePointsFarFromLocation, invoked via
        # `utils_ego_motion.py:85`). Order matters: the round-3 code
        # truncated [new; old] BEFORE dedup, so a large new scan could evict
        # the entire far map every frame.
        world = buf[keep_map] @ pose[:3, :3].T + pose[:3, 3]
        old = self._map[self._map_valid]
        if len(old):
            old = old[np.linalg.norm(old - pose[:3, 3], axis=1)
                      <= cfg.ego_max_range]
        capn = cfg.ego_map_capacity
        allpts = np.concatenate([old, world])      # old FIRST: wins dedup
        dbuf = np.zeros((2 * capn, 3), np.float32)
        nd = min(len(allpts), 2 * capn)
        dbuf[:nd] = allpts[:nd]
        dvalid = np.zeros((2 * capn,), bool)
        dvalid[:nd] = True
        keep = np.asarray(voxel_downsample_mask(
            jnp.asarray(dbuf), jnp.asarray(dvalid),
            voxel=cfg.ego_voxel_size))
        kept = dbuf[keep][:capn]                   # dedup THEN truncate
        mbuf = np.zeros((capn, 3), np.float32)
        mbuf[: len(kept)] = kept
        self._map = mbuf
        self._map_valid = np.arange(capn) < len(kept)
        self.poses.append(pose.astype(np.float32))
        return pose
