"""Ground segmentation: concentric-zone-model plane fitting, TPU-native.

Replaces the reference's Patchwork++ C++ dependency (`patchwork-plusplus/`,
wrapped at `utils_ground.py:43-66`) with a static-shape JAX implementation of
the same pipeline shape: Concentric Zone Model binning (4 zones with
{2,4,4,4} rings x {16,32,54,32} sectors, `patchworkpp.h:100-101`) ->
per-patch seed selection from lowest points -> iterative PCA plane fit
(R-GPF, `patchworkpp.cpp:493-526`, 3 iterations) -> A-GLE-style acceptance on
uprightness / elevation / flatness (`patchworkpp.cpp:205-265`).

TPU shape discipline: one global sort by (patch, z) replaces the per-patch
z-sorts; plane fits run as a single batched masked PCA over all patches
(3x3 eigh); every point is then classified against its patch's plane, so the
per-patch point cap only limits the *fit*, never the labelling.

The public wrapper reproduces `utils_ground.py:16-23`: a point is non-ground
iff it is above the z-threshold AND the CZM model calls it non-ground.
Reflected-noise removal (RNR) is omitted — the reference disables it
(`utils_ground.py:54`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# CZM layout (patchworkpp.h:100-101): rings per zone x sectors per zone
ZONE_RINGS = (2, 4, 4, 4)
ZONE_SECTORS = (16, 32, 54, 32)
# radial zone boundaries in metres for min_range=1, max_range=64
# (patchwork++ derivation: sqrt-spaced intermediate boundaries)
ZONE_BOUNDS = (1.0, 12.3625, 22.025, 41.35, 64.0)

NUM_PATCHES = sum(r * s for r, s in zip(ZONE_RINGS, ZONE_SECTORS))

# A-GLE defaults (patchworkpp.h:38-108): uprightness cos(~45deg), per-zone
# elevation slack and flatness (surface variance) thresholds
UPRIGHTNESS_THR = 0.707
ELEVATION_THR = (0.523, 0.746, 0.879, 1.678)
FLATNESS_THR = (0.0005, 0.000725, 0.001, 0.001)
NUM_LPR = 20          # lowest-point representatives for seeding
TH_SEEDS = 0.125      # seed band above the lowest-point mean
TH_DIST = 0.125       # plane inlier distance
NUM_ITER = 3          # R-GPF iterations


def _patch_index(xyz: jnp.ndarray):
    """Flat CZM patch id per point; -1 outside [min_range, max_range)."""
    r = jnp.linalg.norm(xyz[:, :2], axis=1)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0]) + jnp.pi      # [0, 2pi)
    pid = jnp.full(r.shape, -1, jnp.int32)
    zone_elev = jnp.zeros(r.shape, jnp.int32)
    base = 0
    for z, (nr, ns) in enumerate(zip(ZONE_RINGS, ZONE_SECTORS)):
        lo, hi = ZONE_BOUNDS[z], ZONE_BOUNDS[z + 1]
        in_zone = (r >= lo) & (r < hi)
        ring = jnp.clip(((r - lo) / (hi - lo) * nr).astype(jnp.int32),
                        0, nr - 1)
        sector = jnp.clip((theta / (2 * jnp.pi) * ns).astype(jnp.int32),
                          0, ns - 1)
        pid = jnp.where(in_zone, base + ring * ns + sector, pid)
        zone_elev = jnp.where(in_zone, z, zone_elev)
        base += nr * ns
    return pid, zone_elev


def _zone_of_patch() -> jnp.ndarray:
    """(NUM_PATCHES,) zone index of each flat patch id."""
    out = []
    for z, (nr, ns) in enumerate(zip(ZONE_RINGS, ZONE_SECTORS)):
        out += [z] * (nr * ns)
    return jnp.asarray(out, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("patch_cap", "sensor_height"))
def czm_ground_mask(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    patch_cap: int = 256,
    sensor_height: float = 1.723,
) -> jnp.ndarray:
    """(N,) bool: True where the CZM model labels the point ground.

    Points outside the radial range are labelled non-ground (as in
    patchwork++, which simply does not bin them).
    """
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)
    pid, _ = _patch_index(xyz)
    pid = jnp.where(valid, pid, -1)
    key = jnp.where(pid >= 0, pid, NUM_PATCHES)

    # one global (patch, z) sort: pre-sort by z, stable-sort by patch key
    z_order = jnp.argsort(xyz[:, 2])
    key_z = key[z_order]
    order = z_order[jnp.argsort(key_z, stable=True)]       # patch asc, z asc
    key_s = key[order]

    counts = jnp.bincount(key, length=NUM_PATCHES + 1)[:NUM_PATCHES]
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])

    P, K = NUM_PATCHES, patch_cap
    k_iota = jnp.arange(K)
    gidx = jnp.clip(starts[:, None] + k_iota[None, :], 0, n - 1)
    pmask = k_iota[None, :] < jnp.minimum(counts, K)[:, None]
    pts = xyz[order[gidx]]                                  # (P,K,3) z-asc
    pts = pts * pmask[:, :, None]

    # --- seeds: lowest-point representatives (patchworkpp.cpp:528-559) ----
    lpr_mask = pmask & (k_iota[None, :] < NUM_LPR)
    lpr_w = lpr_mask.astype(f32)
    lpr_mean_z = (jnp.sum(pts[:, :, 2] * lpr_w, 1)
                  / jnp.maximum(jnp.sum(lpr_w, 1), 1e-9))
    seed = pmask & (pts[:, :, 2] < (lpr_mean_z[:, None] + TH_SEEDS))

    # --- R-GPF: iterative masked PCA plane fit ---------------------------
    def fit(w):
        wf = w.astype(f32)
        tot = jnp.maximum(jnp.sum(wf, 1), 1e-9)
        mean = jnp.sum(pts * wf[:, :, None], 1) / tot[:, None]
        c = (pts - mean[:, None, :]) * wf[:, :, None]
        cov = jnp.einsum("pki,pkj->pij", c, c) / tot[:, None, None]
        evals, evecs = jnp.linalg.eigh(cov)                 # ascending
        normal = evecs[:, :, 0]
        normal = normal * jnp.sign(normal[:, 2:3] + 1e-12)  # point up
        d = -jnp.sum(normal * mean, axis=1)
        return normal, d, evals, mean

    inlier = seed
    for _ in range(NUM_ITER):
        normal, d, evals, mean = fit(inlier)
        dist = jnp.abs(jnp.einsum("pki,pi->pk", pts, normal) + d[:, None])
        inlier = pmask & (dist < TH_DIST)

    # --- A-GLE acceptance -------------------------------------------------
    zone = _zone_of_patch()
    e_thr = jnp.asarray(ELEVATION_THR, f32)[zone]
    f_thr = jnp.asarray(FLATNESS_THR, f32)[zone]
    upright = jnp.abs(normal[:, 2]) > UPRIGHTNESS_THR
    elevation = mean[:, 2] + sensor_height                  # vs sensor ground
    flatness = evals[:, 0] / jnp.maximum(jnp.sum(evals, 1), 1e-12)
    ok_elev = elevation < e_thr
    ok_flat = flatness < f_thr
    has_fit = jnp.sum(inlier.astype(jnp.int32), 1) >= 3
    ground_patch = has_fit & upright & (ok_elev | ok_flat)

    # A-GLE consensus pass: patchwork++ adapts the elevation gate to
    # mean+3*std of accepted ground patches (`patchworkpp.cpp:321-358`,
    # across frames). Functional within-frame version: re-gate against the
    # per-zone consensus so locally-plausible planes fitted through object
    # undersides (elevated w.r.t. their zone's true ground) are rejected.
    acc = (ground_patch & ok_flat).astype(f32)
    zone_oh = (zone[:, None] == jnp.arange(len(ZONE_RINGS))[None, :])
    zw = zone_oh.astype(f32) * acc[:, None]                  # (P, zones)
    z_cnt = jnp.sum(zw, 0)
    z_mean = jnp.sum(zw * elevation[:, None], 0) / jnp.maximum(z_cnt, 1e-9)
    z_var = (jnp.sum(zw * (elevation[:, None] - z_mean[None, :]) ** 2, 0)
             / jnp.maximum(z_cnt, 1e-9))
    z_std = jnp.sqrt(z_var)
    consensus = jnp.where(z_cnt >= 4,
                          z_mean + 3.0 * z_std + 0.05,
                          jnp.asarray(ELEVATION_THR, f32))
    e_thr2 = jnp.minimum(e_thr, consensus[zone])
    ground_patch = has_fit & upright & (
        (elevation < e_thr2) | (ok_flat & ok_elev))

    # --- classify every point against its patch plane --------------------
    n_pad = jnp.concatenate([normal, jnp.zeros((1, 3), f32)])
    d_pad = jnp.concatenate([d, jnp.zeros((1,), f32)])
    gp_pad = jnp.concatenate([ground_patch, jnp.zeros((1,), bool)])
    pk = jnp.minimum(key, NUM_PATCHES)
    dist_all = jnp.abs(jnp.sum(xyz * n_pad[pk], axis=1) + d_pad[pk])
    return valid & gp_pad[pk] & (dist_all < TH_DIST)


def segment_ground(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    range_z: float,
    ground_slack: float,
    sensor_height: float = 1.723,
    patch_cap: int = 256,
    use_czm: bool = True,
) -> jnp.ndarray:
    """Non-ground mask, reference semantics (`utils_ground.py:16-32`).

    non-ground iff  z > range_z + ground_slack  AND  not CZM-ground.
    """
    above = xyz[:, 2] > (range_z + ground_slack)
    if not use_czm:
        return valid & above
    czm = czm_ground_mask(xyz, valid, patch_cap=patch_cap,
                          sensor_height=sensor_height)
    return valid & above & ~czm
