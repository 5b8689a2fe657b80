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


@functools.partial(jax.jit, static_argnames=("voxel", "per_voxel"))
def voxel_downsample_mask(xyz, valid, *, voxel: float, per_voxel: int = 1):
    """Mark the first ``per_voxel`` points of each occupied voxel.

    ``per_voxel=1`` is a plain dedup (registration-source downsample);
    the local map uses kiss-icp's max_points_per_voxel=20 semantics — a
    1-point-per-voxel map has a half-voxel NN residual floor (measured
    p50 = 0.31 m at voxel 0.64) that drowns the rotation signal sensor
    noise would otherwise carry (VoxelHashMap keeps up to 20 points per
    voxel so correspondences bottom out at noise level).
    The sort is stable, so earlier buffer positions win the per-voxel
    slots (map update relies on this: old map points precede the new scan).
    """
    n = xyz.shape[0]
    cell = jnp.floor(xyz / voxel).astype(jnp.int32)
    cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
    span = jnp.maximum(cmax - cmin + 1, 1)
    cc = cell - cmin
    ids = (cc[:, 0] * span[1] + cc[:, 1]) * span[2] + cc[:, 2]
    ids = jnp.where(valid, ids, jnp.int32(2 ** 30))
    order = jnp.argsort(ids, stable=True)
    ids_s = ids[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    if per_voxel == 1:
        keep_sorted = first & (ids_s < 2 ** 30)
    else:
        idxs = jnp.arange(n, dtype=jnp.int32)
        run_start = jax.lax.cummax(jnp.where(first, idxs, 0))
        rank = idxs - run_start
        keep_sorted = (rank < per_voxel) & (ids_s < 2 ** 30)
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

    DOF schedule + residual-quantile selection (framework extension beyond
    kiss-icp): a translation-only phase (rotation frozen at the initial
    guess) runs to its own fixpoint, the full-DOF loop continues from
    there, and the returned pose is whichever of the two scores the lower
    75th-percentile source residual. Rationale, traced on the heldout
    scene: under a wide adaptive kernel, a mover tracking near ego velocity
    carries high GM weight on a long lever arm and torques the full solve
    into a rotation-aliased local minimum of self-similar structure
    (1.5-5 deg spurious yaw on a translation-only GT, basin chosen by
    backend rounding). The aliased pose re-registers surface interiors at
    a ~half-sample-spacing residual floor, while the true pose reaches the
    noise floor — a robust residual quantile separates them. For genuinely
    rotating motion the full-DOF pose wins the comparison (the frozen
    rotation leaves structure at range off by the unmodelled yaw), so the
    selection only rejects rotations the data does not support.
    """
    def make_body(full_dof):
        def body(state):
            pose, _, it = state
            moved = geo.transform_points_batch(source[None], pose[None])[0]
            idx, dist = _knn.masked_nn(moved[None], map_pts[None],
                                       map_valid[None], tile=tile,
                                       exact=True)
            idx, dist = idx[0], dist[0]
            nn = map_pts[idx]
            w_gm = (kernel ** 2 / (kernel ** 2 + dist ** 2)) ** 2
            w = jnp.where((dist <= max_dist) & source_valid, w_gm, 0.0)
            if full_dof:
                R, t = geo.kabsch(source[None], nn[None], w[None])
                new_pose = geo.rt_to_mat(R, t)[0]
            else:
                # rotation frozen: weighted-centroid translation update of
                # R0 @ src + t ~= nn  =>  t = mean_w(nn - R0 @ src)
                R0 = initial_guess[:3, :3]
                rs = source @ R0.T
                denom = jnp.maximum(jnp.sum(w), 1e-9)
                t = jnp.sum((nn - rs) * w[:, None], axis=0) / denom
                new_pose = pose.at[:3, :3].set(R0).at[:3, 3].set(t)
            delta = (jnp.linalg.norm(new_pose[:3, 3] - pose[:3, 3])
                     + jnp.linalg.norm(new_pose[:3, :3] - pose[:3, :3]))
            return new_pose, delta, it + 1
        return body

    def cond(state):
        _, delta, it = state
        return (delta > 1e-4) & (it < iters)

    def score(pose):
        # saturated robust cost, fixed 0.1 m kernel: movers (residuals
        # >> 0.1 under BOTH candidates) saturate to ~1 and cancel out of
        # the comparison, while static structure — at the sensor-noise
        # floor under the true pose vs the ~half-sample-spacing aliasing
        # floor under a spurious rotation — dominates the difference. (A
        # p75 residual quantile failed here: the rotation-symmetric ground
        # majority pushes every quantile below the structure that witnesses
        # yaw.)
        moved = geo.transform_points_batch(source[None], pose[None])[0]
        _, dist = _knn.masked_nn(moved[None], map_pts[None],
                                 map_valid[None], tile=tile, exact=True)
        d2 = jnp.square(dist[0])
        rho = d2 / (0.01 + d2)
        return jnp.sum(jnp.where(source_valid, rho, 0.0))

    pose_t, _, _ = jax.lax.while_loop(
        cond, make_body(False), (initial_guess, jnp.float32(1e9),
                                 jnp.int32(0)))
    pose_f, _, _ = jax.lax.while_loop(
        cond, make_body(True), (pose_t, jnp.float32(1e9), jnp.int32(0)))
    return jnp.where(score(pose_f) <= score(pose_t), pose_f, pose_t)


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
            for s2 in cfg.ego_refine_sigmas:
                # graduated refinement (framework extension beyond kiss-icp,
                # docs/ARCHITECTURE.md): the adaptive threshold cannot fall
                # below the LAST prediction deviation that cleared
                # min_motion_th, so the gate stays metres wide — movers
                # inside it drag the solve into spurious yaw (traced: up to
                # 3.8 deg on a translation-only GT), and far self-similar
                # structure keeps ~cm of translation bias. Re-registering at
                # a DECREASING sigma schedule first crushes mover weights
                # (GM kernel) while far static points — the only witnesses
                # of yaw — stay in gate, then polishes translation on near
                # surfaces. Each pass starts from the previous pose, same
                # convergence-terminated loop, so it cannot diverge.
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
            voxel=cfg.ego_voxel_size, per_voxel=cfg.ego_map_per_voxel))
        kept = dbuf[keep][:capn]                   # dedup THEN truncate
        mbuf = np.zeros((capn, 3), np.float32)
        mbuf[: len(kept)] = kept
        self._map = mbuf
        self._map_valid = np.arange(capn) < len(kept)
        self.poses.append(pose.astype(np.float32))
        return pose
