"""Pipeline configuration.

The reference (ICP-Flow) drives everything through ~30 argparse flags duplicated
across `main.py:45-132` and `demo.py:84-172`, with per-dataset presets living in
shell scripts (`main.sh:3-43`, `demo.sh:3-15`) and one flag mutated at runtime
(`args.translation_frame`, `main.py:200`).

Here the configuration is a frozen, hashable dataclass so it can be passed as a
static argument to ``jax.jit``: every field that changes program *shape*
(bucket sizes, grid sizes, iteration caps) lives here, while per-frame dynamic
values (``translation_frame``) are traced scalars threaded explicitly through
the call — never mutable global state.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration of the scene-flow engine.

    Mirrors the semantics of the reference flag set (`main.py:45-132`) but
    reorganised: shape-affecting knobs are explicit buckets, and the histogram
    search is parameterised by a *static* residual window (see `ops/hist.py`)
    rather than the gap-scaled dynamic bin count of `utils_hist.py:63-65`.
    """

    # --- dataset / scene crop (main.py:67-75) ---
    dataset: str = "argo"
    num_frames: int = 2
    range_x: float = 32.0
    range_y: float = 32.0
    range_z: float = 0.0
    ground_slack: float = 0.3
    eval_ground: bool = False

    # --- clustering (main.py:77-84) ---
    num_clusters: int = 200
    min_cluster_size: int = 30
    epsilon: float = 0.25
    use_hdbscan: bool = False
    # adaptive clustering: eps grows with sensor range to track lidar
    # density falloff (see ops/cluster.py); opt-in via eps_scale_per_m > 0.
    eps_scale_per_m: float = 0.0
    eps_max: float = 0.8
    # hdbscan (use_hdbscan=True -> ops/hdbscan.py hybrid device/native):
    hdbscan_edges: int = 8        # mutual-reach kNN edges per point PER LEVEL
    # multi-scale candidate voxel sizes (ops/cluster.py
    # mutual_reachability_edges): fine for dense near-range cells, coarse to
    # reach the k-th neighbor of sparse far-range points
    hdbscan_cells: tuple = (0.35, 1.0, 3.0)
    # per-cell candidate cap for the mutual-reachability kernel. Higher than
    # the DBSCAN cap: sampling a dense cell inflates kNN edge weights
    # non-uniformly, and the condensed tree reads such noise as cluster
    # splits (fragmented movers -> failed matches)
    hdbscan_cell_cap: int = 192
    # exact (brute-force MXU) kNN graph instead of the voxel-hash candidate
    # graph. The voxel graph is translation-variant: the two ego-aligned
    # copies of a mover straddle different cell boundaries and fragment
    # inconsistently, which the matcher's shape gates then reject. Exact kNN
    # is the upstream-faithful structure; O(N^2) matmul FLOPs (~1 s/frame
    # pair on one v5e chip for the hdbscan path only).
    hdbscan_exact: bool = True
    # voxel dedup ahead of the exact kNN graph (ops/cluster.py
    # voxel_dedup_compact): points sharing a fine voxel collapse to one
    # representative carrying an integer multiplicity, which the weighted
    # core distance and the weighted native condensed tree count as the
    # original points. ~4.6x fewer graph nodes on the demo joint cloud ->
    # ~16x less O(N^2) kNN work at measured-equal end-to-end accuracy.
    # 0 disables (round-3 behavior: exact graph over every point). The
    # dedup grid is origin-fixed, so the translation-variance pathology of
    # the voxel CANDIDATE graph does not apply (translation of the whole
    # joint cloud shifts which points represent a voxel but not the
    # density structure the condensed tree sees).
    hdbscan_dedup_voxel: float = 0.15
    # representative bucket (static shape). If a scene occupies more voxels,
    # hdbscan falls back to the full exact graph — counted, never truncated.
    hdbscan_rep_cap: int = 32768
    # border reclaim: unlabelled points within this mutual-reachability
    # distance of a labelled neighbor adopt its cluster (the analogue of
    # upstream hdbscan's cluster_selection_epsilon; excess-of-mass selection
    # otherwise sheds low-density cluster fringes). <=0 disables.
    hdbscan_reclaim: float = 0.5
    hdbscan_knn_recall: float = 0.0  # >0: per-dst-tile approx_min_k with
                                     # this recall target inside the exact
                                     # kNN graph (candidate recall only;
                                     # surviving edges keep exact
                                     # distances). 0 = fully exact merge.
    hdbscan_fetch_f16: bool = False  # compress the dedup-path edge fetch
                                     # through the tunnel: u16 indices +
                                     # f16 weights (~2.6 vs 5.4 MB; weight
                                     # quantisation ~5e-4 relative only
                                     # reorders MST near-ties). Requires
                                     # hdbscan_rep_cap <= 65534.

    # --- histogram translation init (main.py:87-92, utils_hist.py) ---
    speed: float = 1.67
    translation_max: float = 12.8  # static cap on the residual xy search (m)
    hist_grid_xy: int = 128       # wrapped grid cells per xy axis (12.8 m
                                  # wrap at 0.1 m bins; residuals are
                                  # centroid-pre-shifted so the window
                                  # suffices — measured identical accuracy
                                  # to 256 at 2x less FFT time)
    hist_grid_z: int = 8          # wrapped grid cells along z
    hist_grid_xy_small: int = 0   # grid override for the SMALL pair bucket
                                  # (0 = use hist_grid_xy). Small clusters
                                  # (<= max_points_small pts) have small
                                  # extent, and the centroid pre-shift
                                  # bounds their residual by object
                                  # geometry — a 64-cell (6.4 m) wrap
                                  # suffices and the FFT is the small
                                  # bucket's dominant hist cost (round-5
                                  # decomposition: 14.7 of 42.6 ms)
    hist_topk: int = 5            # NMS peaks kept (utils_hist.py:21 topk_nms k)
    hist_nms_kernel: int = 11     # NMS max-pool kernel (utils_hist.py:24)
    # yaw hypotheses scored at the winning translation (framework extension;
    # the reference init is translation-only, utils_hist.py:121-124, and
    # point-to-point ICP cannot close >~0.1 rad on thin vehicle geometry, so
    # long-gap rotating movers need the init to carry coarse yaw). (0.0,)
    # disables the sweep.
    hist_yaws: tuple = (0.0, -0.3, -0.15, 0.15, 0.3)
    # two-phase hypothesis scoring (ops/hist.py _select_hypothesis): all
    # hypotheses coarse-ranked on a hist_coarse_cap-query subset, top
    # hist_refine re-scored at the full 1024-query budget. The scoring
    # sweeps are the init's dominant device cost (36 of 40 ms at the large
    # demo bucket); ranking candidates >= one bin apart survives the
    # coarser mean, and near-ties are re-decided at full budget. 0 = single
    # full-budget phase (the pre-round-3 behavior).
    hist_coarse_cap: int = 256
    hist_refine: int = 2
    # gap-scaled yaw window (ops/hist.py): a turning vehicle's accumulated
    # yaw grows with distance travelled, so the fixed hist_yaws run out of
    # range at long gaps (held-out trace: a 0.05 rad/frame mover exceeds the
    # 0.3 rad sweep at gap >= 9 and latches a body-slid pose). The yaw
    # values stretch by clip(hist_yaw_per_m * translation_frame / max_yaw,
    # 1, hist_yaw_scale_cap) — hypothesis count (and cost) unchanged, only
    # spacing coarsens; at small gaps the factor clips to 1 (legacy values).
    # The constant is curvature x (translation_frame = 2 x distance):
    # 0.03/m ~= 0.06 1/m urban curvature. 0 disables.
    hist_yaw_per_m: float = 0.03
    hist_yaw_scale_cap: float = 2.0

    # --- icp (main.py:94-98) ---
    thres_dist: float = 0.1
    max_points: int = 10000
    icp_max_iters: int = 100
    # consecutive iterations without a >icp_stall_rel improvement of a pair's
    # best rmse before that pair freezes at its best pose (ops/icp.py latch;
    # the reference instead runs the whole bucket until all pairs clear its
    # rel_rmse=1e-6 rule simultaneously, utils_icp_pytorch3d.py:209-211 —
    # the latch subsumes that knob, so there is no icp_rel_rmse here)
    icp_patience: int = 10
    # relative best-rmse improvement below which an iteration counts as stale
    # for the latch. Looser than the reference's 1e-6 on purpose: at rmse ~5 cm a
    # 1e-6-relative "improvement" is sub-micron per iteration — noise, not
    # progress worth burning an NN sweep on (demo sweep: 1e-6..1e-3 all safe,
    # 1e-3 slightly better on dynamic EPE)
    icp_stall_rel: float = 1e-3
    # per-iteration correspondence cap: the source side of the ICP NN sweep
    # is strided down to at most this many points (the sweep is the whole
    # iteration cost); 0 = full. Pose error from k correspondences is
    # O(1/sqrt(k)) of the full-set pose. Downstream evals stay full-res.
    icp_corr_cap: int = 1024
    # NN-error margin ICP must beat the init by, else roll back to the init
    # pose (ops/icp.py apply_icp; extends utils_icp.py:26-35 — marginal NN
    # gains on self-similar geometry indicate drift). The relative form
    # scales with the init error, so tight inits on clean small-gap movers
    # are not wrongly rolled back (an absolute 5 mm margin was).
    icp_init_margin: float = 0.0
    icp_init_margin_rel: float = 0.02
    # coarse-to-fine ICP (ops/icp.py icp_core): the first icp_coarse_iters
    # sweeps gate correspondences at thres_dist * icp_coarse_scale. A
    # histogram init can land a few tenths of a metre off (cluster-
    # membership bias in the centroid hypothesis; face-aligned vote peaks);
    # at the strict radius every true correspondence is gated out and ICP
    # stalls on accidental ones (the long-gap cliff, docs/ROUND3_NOTES.md).
    # The latch/best-pose bookkeeping only starts in the fine phase. 0
    # disables (exact reference single-radius behavior). The phase only
    # activates for pairs whose translation_frame >= icp_coarse_min_tf:
    # init uncertainty grows with the search window, and small-gap pairs
    # keep the exact single-radius trajectory the accuracy guardrails are
    # pinned on (the traced gate adds no compile variants).
    icp_coarse_iters: int = 6
    icp_coarse_scale: float = 3.0
    icp_coarse_min_tf: float = 10.0
    # ICP tail compaction (ops/icp.py icp_core): once at most B//shrink
    # pairs remain unfrozen, they compact into a bucket shrink-x smaller and
    # the convergence tail runs there at 1/shrink the sweep cost. Every body
    # kernel treats batch rows independently, so results are bit-identical
    # to the uncompacted loop; 0/1 disables.
    icp_shrink: int = 8

    # --- pair gating (main.py:101-110, utils_check.py) ---
    thres_box: float = 0.1
    thres_error: float = 0.2
    thres_iou: float = 0.2
    thres_rot: float = 0.1
    # range-adaptive inlier radius for the match statistics (framework
    # extension; 0.0 = exact reference behavior). LiDAR point spacing grows
    # linearly with range (beam divergence), so the fixed ``thres_dist``
    # inlier radius undercounts far clusters: a correctly posed sparse mover
    # at 35 m has ring spacing >> 0.1 m and can NEVER clear the IoU gate
    # (measured on the demo fixture: a 102-point car at 34 m peaks at IoU
    # 0.16 under its ground-truth pose). The statistics radius becomes
    # min(thres_dist * (1 + scale * range_m), inlier_radius_max); the ICP
    # correspondence gate and thres_error keep the fixed thres_dist.
    # Same philosophy as eps_scale_per_m for DBSCAN.
    inlier_scale_per_m: float = 0.0
    inlier_radius_max: float = 0.3
    # extension beyond the reference gate set (utils_check.py:51-66): reject
    # matches whose centroid shift has a large vertical component — ground
    # vehicles do not move vertically, and degenerate ICP solutions sliding
    # along walls/poles show up as z drift. <=0 disables.
    thres_z: float = 0.3
    # per-point identity refinement (framework extension): inside an accepted
    # moving match, points whose identity-NN distance is an inlier while
    # their transformed-NN distance is a clear outlier are static stowaways
    # of an under-segmented cluster; their flow reverts to ego-only.
    # Default off: on the demo fixture it trades +0.0000 static for
    # -0.005 dynamic (occluded mover points near static structure are
    # false positives). Useful on scenes with heavy under-segmentation.
    per_point_identity: bool = False
    # identity preference margin (framework extension, metres of NN error):
    # a matched transform is replaced by identity when the identity transform
    # matches the pair within this margin — self-similar geometry (walls,
    # rails) lets ICP slide to a marginally-lower NN error while the true
    # motion is zero. <=0 disables.
    identity_margin: float = 0.02

    # --- static shape buckets (TPU: shapes must be compile-time constants) ---
    max_points_scene: int = 131072   # padded full-cloud size per frame
    max_pairs: int = 256             # cluster-pair bucket per matcher stage
    # size-classed pair buckets: pairs whose clusters both fit in
    # ``max_points_small`` run in a compact bucket at that point count —
    # the vast majority of clusters are small, so this removes most of the
    # padding FLOPs of a single (max_pairs, max_points) bucket.
    max_points_small: int = 512
    pairs_small: int = 256
    pairs_large: int = 32
    # pair-bucket size ladder (match/matcher.py _solve_bucket_laddered):
    # each stage bucket solves at the smallest of {bucket//d for d in ladder}
    # that holds its valid pairs, picked by a runtime lax.switch — XLA runs
    # only the taken branch, so a 28-pair frame does not pay for 256 slots
    # and an EMPTY stage-2 bucket costs nothing. Results are bit-identical
    # (row-independent kernels; pure scheduling). (1,) disables.
    # Power-of-two rungs: the round-4 profile showed the stage-1 large
    # bucket (32 slots) solving 12 valid pairs at FULL size because the
    # (1,4,16) ladder jumps 8 -> 32 — that one bucket was ~84 of the
    # 96 ms matcher. Finer rungs halve it; more lax.switch branches cost
    # compile time, not run time (only the taken branch executes).
    pair_ladder: tuple = (1, 2, 4, 8, 16)
    nn_tile: int = 2048              # dst tile for the scan-based NN
    cluster_cell_cap: int = 64       # max points per voxel cell in DBSCAN
    cluster_max_iters: int = 100     # label-propagation iteration cap
    # DBSCAN voxel dedup (ops/cluster.py dbscan_dedup): cluster one weighted
    # representative per fine voxel instead of every point (~3.5x fewer at
    # demo scale), broadcast labels back. Must satisfy voxel*sqrt(3) < eps.
    # 0 disables (cluster the raw cloud; round-3 behavior).
    cluster_dedup_voxel: float = 0.0
    # representative bucket (static shape); occupied-voxel overflow falls
    # back to the full-cloud path in-graph — counted, never truncated
    cluster_rep_cap: int = 65536

    # --- ego motion (utils_ego_motion.py / config_kiss_icp.yaml) ---
    use_kiss_icp: bool = False
    ego_voxel_size: float = 0.64     # max_range / 100, kiss-icp default rule
    # map points kept per voxel (kiss-icp max_points_per_voxel = 20): a
    # 1-point-per-voxel map has a half-voxel NN floor that buries the
    # rotation signal — see ops/ego.py voxel_downsample_mask
    ego_map_per_voxel: int = 20
    ego_max_range: float = 64.0
    ego_min_range: float = 1.0
    ego_map_capacity: int = 262144
    # static bucket for the registration source (the 1.5x-voxel downsample
    # is a few thousand points; overflow truncates and is harmless — the
    # solve is a weighted mean over thousands of correspondences)
    ego_src_capacity: int = 16384
    ego_initial_threshold: float = 2.0
    ego_min_motion_th: float = 0.1
    # graduated tight-radius refinement after the adaptive-threshold
    # registration (framework extension beyond kiss-icp — see ops/ego.py):
    # the adaptive threshold cannot fall below the last deviation that
    # cleared min_motion_th, so the gate stays metres wide; movers inside
    # the wide gate can drag the solve into a spurious yaw (traced on the
    # heldout scene: 1-4 deg with no GT rotation), and a single tight pass
    # cannot remove yaw because the far-range witnesses of rotation sit
    # outside its gate (1.2 deg = 0.65 m at 32 m). The decreasing schedule
    # first suppresses movers with the GM kernel while keeping far static
    # structure in gate (yaw corrected), then polishes on near surfaces.
    # () disables (exact kiss-icp schedule).
    ego_refine_sigmas: tuple = (1.0, 0.3, 0.1)
    # registration iteration cap (kiss-icp MAX_NUM_ITERATIONS_ = 500; the
    # loop is convergence-terminated, the cap only bounds failure cases)
    ego_max_iters: int = 500

    # --- numerics ---
    dtype_points: str = "float32"

    @property
    def hist_bin(self) -> float:
        """Histogram bin width == icp inlier distance (utils_hist.py:63-65)."""
        return self.thres_dist

    def translation_frame(self, gap: int, ego_translation: float = 0.0) -> float:
        """Dynamic per-pair search radius, `main.py:200` semantics."""
        return max(self.speed * gap, ego_translation) * 2.0

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)

    def device_canonical(self) -> "PipelineConfig":
        """Config with host-only fields pinned to fixed values.

        The engine passes the config as a ``jax.jit`` static argument, so two
        configs differing ONLY in host-side fields (dataset name, frame
        count, crop ranges, ego knobs...) would otherwise compile separate
        copies of identical device programs — a multi-minute cost per copy on
        the tunnel-attached chip. Engine call sites canonicalise through this
        before jitting; every field listed here is provably unused inside the
        jitted pipeline (grep guard: tests/test_config.py).
        """
        return dataclasses.replace(self, **_HOST_ONLY_CANONICAL)


# Fields consumed only by host-side orchestration (dataset loaders, ground
# wrapper call sites, EgoOdometry, CLI/eval) — never read inside
# _track_pair_impl / _run_pair_fused_impl device code.
_HOST_ONLY_CANONICAL = dict(
    dataset="", num_frames=0, speed=0.0,
    range_x=0.0, range_y=0.0, range_z=0.0, ground_slack=0.0,
    eval_ground=False, use_kiss_icp=False,
    # clustering backend choice + hdbscan knobs: consumed by cluster_joint /
    # DatasetPCA on the host; the jitted matcher/flow never see them (the
    # fused impl is only reachable with use_hdbscan=False)
    use_hdbscan=False, hdbscan_edges=0, hdbscan_cells=(),
    hdbscan_cell_cap=0, hdbscan_exact=False, hdbscan_reclaim=0.0,
    hdbscan_dedup_voxel=0.0, hdbscan_rep_cap=0,
    ego_voxel_size=0.0, ego_max_range=0.0, ego_min_range=0.0,
    ego_map_capacity=0, ego_src_capacity=0, ego_map_per_voxel=0,
    ego_initial_threshold=0.0, ego_min_motion_th=0.0, ego_refine_sigmas=(),
    ego_max_iters=0,
)


# ---------------------------------------------------------------------------
# Presets mirroring the reference shell scripts (main.sh:3-43, demo.sh:3-15).
# ---------------------------------------------------------------------------

# All presets default to range-adaptive DBSCAN (base eps 0.6 +0.012/m, cap
# 0.8): it beats both the reference's shipped hdbscan result on the real
# demo fixture (EPE 0.0050 vs 0.0114) and our faithful hdbscan port on every
# dataset measured (demo: dyn 0.048 vs 0.27+; realistic synthetic waymo:
# 0.015 vs 0.027 overall). Pass --if_hdbscan / use_hdbscan=True for the
# reference-faithful hdbscan path (ops/hdbscan.py).
WAYMO = PipelineConfig(
    dataset="waymo", num_frames=5, range_x=32.0, range_y=32.0, range_z=0.04,
    ground_slack=0.3, num_clusters=200, min_cluster_size=30,
    epsilon=0.6, eps_scale_per_m=0.012, eps_max=0.8,
    speed=1.67, thres_dist=0.1, max_points=10000,
    thres_box=0.1, thres_rot=0.1, thres_error=0.3, thres_iou=0.2,
    inlier_scale_per_m=0.02,
)

NUSCENES = PipelineConfig(
    dataset="nuscene", num_frames=11, range_x=32.0, range_y=32.0, range_z=-1.84,
    ground_slack=0.3, num_clusters=200, min_cluster_size=20,
    epsilon=0.6, eps_scale_per_m=0.012, eps_max=0.8,
    speed=0.833333, thres_dist=0.1, max_points=5000,
    thres_box=0.1, thres_rot=0.1, thres_error=0.2, thres_iou=0.2,
    inlier_scale_per_m=0.02,
)

ARGO = PipelineConfig(
    dataset="argo", num_frames=2, range_x=10000.0, range_y=10000.0,
    range_z=-10000.0, ground_slack=0.0, use_hdbscan=False, num_clusters=200,
    min_cluster_size=20, epsilon=0.6, eps_scale_per_m=0.012, eps_max=0.8,
    speed=1.67, thres_dist=0.1,
    max_points=10000, thres_box=0.1, thres_rot=0.1, thres_error=0.2,
    thres_iou=0.2, inlier_scale_per_m=0.02,
)

DEMO = ARGO.replace(speed=1.0)

PRESETS = {"waymo": WAYMO, "nuscene": NUSCENES, "argo": ARGO, "demo": DEMO}
