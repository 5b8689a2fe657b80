"""Density clustering on TPU: voxel-hash DBSCAN with parallel label propagation.

Replaces the reference's host-side Open3D ``cluster_dbscan`` / hdbscan calls
(`utils_cluster.py:10-63`) with a static-shape JAX routine:

  1. bin points into eps-sized voxel cells (traced integer cell ids);
  2. sort by cell id; neighbor candidates of a point are the points of its 27
     adjacent cells. Because the flat cell id is z-minor, the 3 z-adjacent
     cells of each (dx, dy) offset form ONE contiguous run in the sorted
     layout, so candidates are fetched as 9 *windowed slices* of ``range_cap``
     consecutive points (one ``lax.gather`` with ``slice_sizes=(range_cap,3)``
     per tile). This layout matters enormously on TPU: per-candidate row
     gathers move ~10 ns/row through the gather unit (measured 17 s/frame-pair
     at demo scale), while contiguous slices stream at HBM bandwidth
     (milliseconds). Candidate validity, cell membership, and the adaptive
     radius are all derived arithmetically from the slice offsets and the
     gathered coordinates — the xyz slice is the ONLY gathered table.
     Run starts come from a single ``searchsorted(..., method='sort')`` over
     all (point, run-boundary) queries, hoisted out of the tile loop: the
     sort-merge form costs two device sorts instead of millions of pointer
     chases;
  3. core test: >= ``min_points`` neighbors within eps (count over *all*
     candidates, not the compacted edge list), rescaled per run by
     total/sampled so the cap stays unbiased;
  4. connected components of core points via iterative min-label propagation
     with pointer jumping over a fixed-degree edge list (``lax.while_loop``
     until fixpoint, bounded);
  5. border points adopt the smallest adjacent core label; remaining valid
     points are noise (-1);
  6. clusters are ranked by size and the top ``num_clusters`` kept, relabelled
     densely 0..C-1 in descending-size order (`utils_cluster.py:26-27,45-46`
     keep-top-K semantics).

Exact parity with Open3D's label *identities* is neither possible nor needed —
the framework gates clustering on end-to-end flow EPE (SURVEY §7 step 7).

Adaptive mode (``eps_scale_per_m > 0``) approximates the reference's primary
hdbscan configuration (`utils_cluster.py:10-29`, enabled by every main.sh
preset): lidar density falls with range, so a fixed eps either fragments far
objects or over-merges near ones. Each point gets eps_i = clip(eps +
scale * range_i, eps, eps_max); an edge requires d <= min(eps_i, eps_j)
(a mutual-reachability analogue), and neighbor counts are rescaled by the
per-cell sampling fraction so the core test stays unbiased under the
per-cell candidate cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_OFFSETS = [(dx, dy, dz)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
# center cell first so same-cell neighbors win edge-list slots
_OFFSETS.sort(key=lambda o: (o != (0, 0, 0), o))


_NBR9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
# center run first so same-cell neighbors win edge-list slots
_NBR9.sort(key=lambda o: (o != (0, 0), o))


@functools.partial(
    jax.jit,
    static_argnames=("eps", "min_points", "num_clusters", "cell_cap",
                     "max_iters", "tile", "eps_scale_per_m", "eps_max",
                     "range_cap", "debug_edges"),
)
def dbscan(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    mult: jnp.ndarray | None = None,
    *,
    eps: float = 0.25,
    min_points: int = 30,
    num_clusters: int = 200,
    cell_cap: int = 64,
    max_iters: int = 200,
    tile: int = 2048,
    eps_scale_per_m: float = 0.0,
    eps_max: float = 1.0,
    range_cap: int | None = None,
    debug_edges: bool = False,
) -> jnp.ndarray:
    """Labels (N,) int32: 0..C-1 size-ranked clusters, -1 noise/dropped.

    ``range_cap``: candidate cap per contiguous 3-z-cell run (default
    ``2 * cell_cap``; a lidar z column rarely occupies more than two cells, so
    this preserves the per-cell sampling budget of the 27-cell formulation).
    ``mult``: optional (N,) int32 point multiplicities (voxel-dedup
    representatives, see ``dbscan_dedup``): neighbor counts and cluster-size
    ranking weight each candidate by its multiplicity, reproducing raw-cloud
    density on the deduplicated cloud. None = all-ones (bit-identical to the
    unweighted path).
    """
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)
    valid = valid.astype(bool)
    adaptive = eps_scale_per_m > 0.0
    cell_size = eps_max if adaptive else eps
    rcap = min(2 * cell_cap if range_cap is None else range_cap, n)
    if adaptive:
        rng_xy = jnp.linalg.norm(xyz[:, :2], axis=1)
        eps_pt = jnp.clip(eps + eps_scale_per_m * rng_xy, eps, eps_max)
    else:
        eps_pt = jnp.full((n,), eps, f32)

    # --- 1. voxel cells (traced extents; ids fit easily in int32) --------
    cell = jnp.floor(xyz / cell_size).astype(jnp.int32)
    cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
    span = jnp.maximum(cmax - cmin + 3, 1)
    cc = cell - cmin + 1
    def cell_id(c3):
        return (c3[..., 0] * span[1] + c3[..., 1]) * span[2] + c3[..., 2]
    ids = jnp.where(valid, cell_id(cc), jnp.int32(2 ** 30))

    # --- 2. sort by cell (invalid ids sort to the back, so position <
    #        n_valid doubles as the validity test after the sort) ----------
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz_s = xyz[order]
    eps_s = eps_pt[order]
    valid_s = valid[order]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    weighted = mult is not None
    mult_s = (jnp.where(valid_s, mult[order], 0).astype(jnp.int32)
              if weighted else None)

    # --- 3a. candidate boundaries, hoisted out of the tile loop ----------
    # Boundary queries are answered from a DENSE exclusive-prefix table over
    # cell ids (one bincount scatter + one cumsum + plain gathers) — 2x
    # cheaper than the sort-merge searchsorted at demo scale (37 vs 77 ms).
    # Scenes whose cell space exceeds the table fall back to the sort form
    # (lax.cond: only the taken branch executes).
    ncell = span[0] * span[1] * span[2]
    table_cap = 1 << 22

    def bounds_for(queries):
        def bounds_table(_):
            # invalid ids (2^30) land in the last bucket, above every query
            iv = jnp.minimum(ids_s, table_cap + 1)
            cnt = jnp.zeros((table_cap + 2,), jnp.int32).at[iv].add(
                1, mode="drop")
            starts = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1]])
            q = jnp.clip(queries, 0, jnp.minimum(ncell, table_cap + 1))
            return starts[q]

        def bounds_sort(_):
            return jnp.searchsorted(
                ids_s, queries.reshape(-1),
                method="sort").reshape(queries.shape).astype(jnp.int32)

        return jax.lax.cond(ncell <= table_cap, bounds_table, bounds_sort,
                            operand=None)

    # --- 3b. candidate pass ------------------------------------------------
    # Emits (counts (N,), edges (N,9) sorted-layout, n = no edge). The 9
    # (dx, dy) 3-z-cell runs are fetched per point from an overlapped row
    # table (row i covers sorted positions [i*blk, i*blk + blk + rcap), so
    # any run window lives in one row and the fetch is a plain row gather —
    # the one gather pattern the TPU moves at full speed), with per-run
    # candidate cap ``rcap`` and unbiased count rescaling.
    #
    # A dense-bands variant (3 contiguous seg-slices per tile, no gathers,
    # exact counts) was built and measured slower end-to-end: candidates
    # 78 ms vs 57 ms here, and its band-extreme edges produced 437k unique
    # cell pairs vs 31k (first/last-per-run hits repeat across a cell's
    # points; band extremes don't), overflowing the contracted-propagation
    # buffer and forcing the 17-round compact path (+150 ms).
    pad_tile = (-n) % tile
    nt = (n + pad_tile) // tile
    xyz_pad = jnp.pad(xyz_s, ((0, pad_tile), (0, 0)))
    eps_pad = jnp.pad(eps_s, (0, pad_tile))

    def cand_eps(g):
        if adaptive:
            return jnp.clip(
                eps + eps_scale_per_m * jnp.linalg.norm(g[..., :2], axis=-1),
                eps, eps_max)
        return jnp.float32(eps)

    def windowed_pass(_):
        deltas = jnp.stack(
            [(jnp.int32(dx) * span[1] + jnp.int32(dy)) * span[2] - 1
             for dx, dy in _NBR9])                                # (9,)
        lo = ids_s[:, None] + deltas[None, :]                     # (N,9)
        bounds = bounds_for(jnp.concatenate([lo, lo + 3], axis=1))
        starts_all = bounds[:, :9]
        tots_all = bounds[:, 9:] - starts_all                     # (N,9)

        blk = 64
        width = ((blk + rcap + blk - 1) // blk) * blk   # row coverage
        nb = -(-n // blk)
        ch = 4 if weighted else 3
        xyzm_s = (jnp.concatenate([xyz_s, mult_s[:, None].astype(f32)], 1)
                  if weighted else xyz_s)
        xyz_sp = jnp.pad(xyzm_s, ((0, nb * blk + width - n), (0, 0)))
        blocks = jnp.concatenate(
            [xyz_sp[o:o + nb * blk].reshape(nb, blk, ch)
             for o in range(0, width, blk)], axis=1)              # (nb,W,ch)
        starts_pad = jnp.pad(starts_all, ((0, pad_tile), (0, 0)),
                             constant_values=n)
        tots_pad = jnp.pad(tots_all, ((0, pad_tile), (0, 0)))

        def tile_pass(t):
            base = t * tile
            rows = base + jnp.arange(tile)
            p = jax.lax.dynamic_slice_in_dim(xyz_pad, base, tile)   # (T,3)
            p_eps = jax.lax.dynamic_slice_in_dim(eps_pad, base, tile)
            st = jax.lax.dynamic_slice_in_dim(starts_pad, base, tile)
            tt = jax.lax.dynamic_slice_in_dim(tots_pad, base, tile)
            row_ok = rows < n_valid

            st_c = jnp.clip(st, 0, jnp.int32(n))
            bi = jnp.minimum(st_c // blk, nb - 1)                 # (T,9)
            gm = blocks[bi]                                       # (T,9,W,ch)
            g = gm[..., :3]
            k = jnp.arange(width, dtype=jnp.int32)
            pos = bi[:, :, None] * blk + k[None, None, :]         # (T,9,W)
            ok = ((pos >= st[:, :, None])
                  & (pos < st[:, :, None] + tt[:, :, None])
                  & (pos < jnp.minimum(st[:, :, None] + rcap, n_valid)))

            d_sq = jnp.sum((g - p[:, None, None, :]) ** 2, axis=-1)
            # mutual adaptive radius: edge iff d <= min(eps_i, eps_j)
            r_edge = jnp.minimum(p_eps[:, None, None], cand_eps(g))
            within = ok & (d_sq <= r_edge * r_edge) & row_ok[:, None, None]
            # materialize the (T,9,W) mask ONCE: without this barrier XLA
            # rematerializes the (T,9,W,3) row gather for every reduction
            # consumer below (count, first), which measured 184 ms of a
            # 205 ms standalone candidate pass at demo scale. ``pos`` is
            # affine (bi*blk + k) — cheaper to recompute than to spill.
            within = jax.lax.optimization_barrier(within)

            # unbiased neighbor count under the run cap: rescale each run's
            # sampled within-count by its total/sampled ratio. Weighted form
            # sums candidate multiplicities instead of counting candidates
            # (the rescale stays unbiased: runs are sampled uniformly).
            totf = tt.astype(f32)
            scale = totf / jnp.maximum(jnp.minimum(totf, rcap), 1.0)
            hits = (jnp.sum(jnp.where(within, gm[..., 3], 0.0), axis=2)
                    if weighted else jnp.sum(within, axis=2).astype(f32))
            count = jnp.round(jnp.sum(hits * scale, axis=1)).astype(jnp.int32)

            # compact to fixed-degree edges: the FIRST within-eps candidate
            # of every (dx, dy) run. Within a cell the sorted order is
            # arbitrary, so "first" is effectively a random within-eps
            # neighbor per run; across the 9 runs that is up to 9
            # edges/point — enough redundancy for core connectivity (run
            # firsts repeat across a cell's points, so they dedup to a
            # small multiple of the cell count downstream), and any point
            # with at least one within-eps hit keeps an edge for border
            # adoption. (The previous first+last 18-slot form doubles the
            # compaction/sort/border-scatter traffic of step 4 for edges
            # that dedup away.)
            pos_hit_min = jnp.min(jnp.where(within, pos, jnp.int32(2 ** 30)),
                                  axis=2)                         # (T,9)
            e_first = jnp.where(pos_hit_min < 2 ** 30, pos_hit_min, n)
            return count, e_first

        counts, edges = jax.lax.map(tile_pass, jnp.arange(nt))
        return counts.reshape(-1)[:n], edges.reshape(-1, 9)[:n]

    counts, edges = windowed_pass(None)

    core = (counts >= min_points) & valid_s
    if debug_edges:
        # profiling hook: sorted-layout edge slab + core mask + sort order
        return edges, core, order

    # --- 4. min-label propagation over core points -----------------------
    # Three propagation strategies, fastest valid one picked at runtime:
    #
    #  a. CONTRACTED (primary): core points sharing a fine voxel cell of
    #     side eps/sqrt(3) are mutually within eps (cell diameter == eps <=
    #     the mutual adaptive radius, whose floor is the base eps), so each
    #     such cell is a clique and contracts to one representative node
    #     (its min point index). The point edge list maps to cell pairs and
    #     is sorted + deduplicated: at demo scale 723k directed point edges
    #     become ~56k unique cell edges, and each relax round moves ~13x
    #     fewer elements through the gather/scatter units. The contraction
    #     only ADDS true within-eps connectivity, so labels can only get
    #     more complete than the fixed-degree point graph's.
    #  b. COMPACT point edges: when the fine-cell table would overflow or
    #     the deduplicated cell edges exceed their cap — compact the mostly
    #     empty (N, 9) slab once to a flat endpoint list.
    #  c. SLAB: when even the point edge list overflows its cap (dense toy
    #     blobs), relax over the full slab — exact, no caps.
    idx = jnp.arange(n, dtype=jnp.int32)
    core_pad = jnp.concatenate([core, jnp.zeros((1,), bool)])
    init_label = jnp.where(core, idx, n)

    flat_v = edges.reshape(-1)
    # 9-slot slab, ~2.8 real edges/pt at demo scale: 4n holds it with ~40%
    # headroom, and every compaction/sort/scatter stage below moves this
    # STATIC buffer — halving it (vs the old 8n) halves their cost
    ecap = min(4 * n, flat_v.shape[0])
    n_real = jnp.sum((flat_v < n).astype(jnp.int32))

    # point-level edge compaction (shared by paths a and b; path c is the
    # fallback when this overflows)
    (sel,) = jnp.nonzero(flat_v < n, size=ecap, fill_value=flat_v.shape[0])
    sel_c = jnp.minimum(sel, flat_v.shape[0] - 1)
    e_u_all = (sel_c // edges.shape[1]).astype(jnp.int32)
    e_v_all = flat_v[sel_c]
    e_real = sel < flat_v.shape[0]
    e_u_all = jnp.where(e_real, e_u_all, n)
    e_v_all = jnp.where(e_real, e_v_all, n)

    # fine-cell contraction: representative (min point index) per occupied
    # fine cell of side eps/sqrt(3), via one scatter-min into a dense table
    import math
    fside = eps / math.sqrt(3.0)
    fcell = jnp.floor(xyz_s / fside).astype(jnp.int32)
    fmin = jnp.min(jnp.where(valid_s[:, None], fcell, 2 ** 20), axis=0)
    fmax = jnp.max(jnp.where(valid_s[:, None], fcell, -(2 ** 20)), axis=0)
    fspan = jnp.maximum(fmax - fmin + 1, 1)
    fcc = fcell - fmin
    fid = (fcc[..., 0] * fspan[1] + fcc[..., 1]) * fspan[2] + fcc[..., 2]
    ftable_cap = 1 << 22
    nf = fspan[0] * fspan[1] * fspan[2]
    fine_ok = nf <= ftable_cap
    fid_c = jnp.clip(fid, 0, ftable_cap - 1)
    rep_table = jnp.full((ftable_cap + 1,), n, jnp.int32).at[
        jnp.where(core, fid_c, ftable_cap)].min(idx, mode="drop")
    rep = jnp.where(core, rep_table[fid_c], n)

    # cell edges: canonicalise, sort, mark-first, compact. Within-cell and
    # non-core-core edges die to (n, n); the two-key sort groups duplicates.
    rep_of = jnp.concatenate([rep, jnp.full((1,), n, jnp.int32)])
    cc_all = core_pad[e_u_all] & core_pad[e_v_all]
    ru = jnp.where(cc_all, rep_of[e_u_all], n)
    rv = jnp.where(cc_all, rep_of[e_v_all], n)
    ca = jnp.minimum(ru, rv)
    cb = jnp.maximum(ru, rv)
    dead = ca == cb
    ca = jnp.where(dead, n, ca)
    cb = jnp.where(dead, n, cb)
    ca_s, cb_s = jax.lax.sort((ca, cb), num_keys=2)
    first = (ca_s < n) & ((jnp.arange(ecap) == 0)
                          | (ca_s != jnp.roll(ca_s, 1))
                          | (cb_s != jnp.roll(cb_s, 1)))
    n_uni = jnp.sum(first.astype(jnp.int32))
    # deduplicated cell edges are ~4% of the point edges at demo scale
    # (31k of 724k): a half-n buffer (2x headroom over that) halves each
    # relax round's gather/scatter traffic vs the old n-sized one, and the
    # cond guard below (n_uni <= ccap) falls back to the compacted
    # point-edge path when a denser scene overflows it — correctness never
    # depends on the cap. (Relax rounds move the whole STATIC buffer, dead
    # slots included — a 4n buffer was measured 8x slower per round.)
    #
    # The floor is SCENE-scale, not point-scale: unique cell edges track
    # cell geometry, so a voxel-dedup REPRESENTATIVE cloud has ~as many as
    # its raw cloud (measured 34.9k at the 32768-rep demo bucket vs 31k
    # raw) — a n//2 floor of 16384 silently pushed the whole dedup path
    # onto the compact fallback whose relax rounds move 4n-slot buffers
    # (round-5 diagnosis; the round-4 profiler had proposed this floor and
    # it never landed — ADVICE r4).
    ccap = min(max(n // 2, 49152), ecap)
    (csel,) = jnp.nonzero(first, size=ccap, fill_value=ecap)
    csel_c = jnp.minimum(csel, ecap - 1)
    c_real = csel < ecap
    cu = jnp.where(c_real, ca_s[csel_c], n)
    cv = jnp.where(c_real, cb_s[csel_c], n)

    # representative list: pointer jumping inside the relax rounds only needs
    # to chase rep->rep chains, so it gathers over this compact list instead
    # of all n points (demo: 8k reps vs 131k points)
    rl_cap = max(1024, n // 4)
    is_rep = core & (rep == idx)
    n_reps = jnp.sum(is_rep.astype(jnp.int32))
    (rlist,) = jnp.nonzero(is_rep, size=rl_cap, fill_value=n)

    def jumps_twice(new):
        # two rounds of pointer doubling (measured: deeper jumping does not
        # reduce the relax-round count on lidar graphs, it only adds gathers)
        for _ in range(2):
            new_pad = jnp.concatenate([new, jnp.full((1,), n, jnp.int32)])
            new = jnp.where(core, jnp.minimum(new, new_pad[new_pad[new]]), n)
        return new

    def run_prop_init(body, init):
        label, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < max_iters), body,
            (init, jnp.bool_(True), jnp.int32(0)))
        return label

    def run_prop(body):
        return run_prop_init(body, init_label)

    def border_adopt(label):
        # border adoption: one symmetric scatter-min over the compacted
        # edges — a border endpoint adopts the smallest label among its core
        # neighbors in either direction (within-eps adjacency either way)
        lab_pad = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
        from_u = jnp.where(core_pad[e_u_all], lab_pad[e_u_all], n)
        from_v = jnp.where(core_pad[e_v_all], lab_pad[e_v_all], n)
        border_lab = (jnp.full((n + 1,), n, jnp.int32)
                      .at[e_u_all].min(from_v).at[e_v_all].min(from_u))[:n]
        return border_lab

    def contracted_path(_):
        # relax over the deduplicated cell edges; labels live in point-index
        # space but only representative entries carry information — rounds
        # touch ONLY the edge endpoints and the rep list, and a final gather
        # through ``rep`` resolves every core point
        def prop_body(state):
            lab, _, it = state
            lab_pad = jnp.concatenate([lab, jnp.full((1,), n, jnp.int32)])
            m = jnp.minimum(lab_pad[cu], lab_pad[cv])
            new = lab_pad.at[cu].min(m).at[cv].min(m)
            # pointer jump over the rep list: follow two levels of the
            # rep->rep chain (labels are rep indices, so a label's label is
            # further along the chain toward the component root)
            lr = new[rlist]
            jumped = jnp.minimum(lr, new[new[lr]])
            new = new.at[rlist].min(jumped)[:n]
            changed = jnp.any(new != lab)
            return new, changed, it + 1

        label = run_prop_init(prop_body, jnp.where(core, rep, n))
        # at the fixpoint every rep holds its component's root; one gather
        # through rep finalises non-rep members (min keeps the invariant
        # when the loop exits on max_iters before full convergence)
        lab_pad = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
        label = jnp.where(core, jnp.minimum(label, lab_pad[rep]), n)
        return label, border_adopt(label)

    def compact_path(_):
        # core-core endpoints (stored adjacency is directed "first K per
        # cell"; the symmetric min over both endpoints makes each compacted
        # edge bidirectional)
        cc_edge = core_pad[e_u_all] & core_pad[e_v_all]
        p_u = jnp.where(cc_edge, e_u_all, n)
        p_v = jnp.where(cc_edge, e_v_all, n)

        def prop_body(state):
            lab, _, it = state
            lab_pad = jnp.concatenate([lab, jnp.full((1,), n, jnp.int32)])
            m = jnp.minimum(lab_pad[p_u], lab_pad[p_v])      # (M,)
            new = lab_pad.at[p_u].min(m).at[p_v].min(m)[:n]
            new = jumps_twice(jnp.where(core, new, n))
            changed = jnp.any(new != lab)
            return new, changed, it + 1

        label = run_prop(prop_body)
        return label, border_adopt(label)

    def slab_path(_):
        # fallback when the graph is denser than the compaction cap (toy
        # blobs, pathological inputs): relax over the full (N, 9) slab
        core_edges = jnp.where(core_pad[edges] & core[:, None], edges, n)

        def prop_body(state):
            lab, _, it = state
            lab_pad = jnp.concatenate([lab, jnp.full((1,), n, jnp.int32)])
            pulled = jnp.min(lab_pad[core_edges], axis=1)
            pushed = jnp.full((n + 1,), n, jnp.int32).at[
                core_edges.reshape(-1)].min(
                jnp.broadcast_to(lab[:, None], core_edges.shape).reshape(-1)
            )[:n]
            new = jnp.minimum(lab, jnp.minimum(pulled, pushed))
            new = jumps_twice(jnp.where(core, new, n))
            changed = jnp.any(new != lab)
            return new, changed, it + 1

        label = run_prop(prop_body)
        lab_pad = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
        nbr_core_lab = jnp.where(core_pad[edges], lab_pad[edges], n)
        return label, jnp.min(nbr_core_lab, axis=1)

    can_compact = n_real <= ecap
    label, border_lab = jax.lax.cond(
        fine_ok & can_compact & (n_uni <= ccap) & (n_reps <= rl_cap),
        contracted_path,
        lambda _: jax.lax.cond(can_compact, compact_path, slab_path,
                               operand=None),
        operand=None)

    # --- 5. border points adopt an adjacent core label -------------------
    label = jnp.where(core, label,
                      jnp.where(valid_s & (border_lab < n), border_lab, n))

    # --- 6. size-ranked top-K relabelling (weighted: size = raw points) --
    if weighted:
        sizes = jnp.zeros((n + 1,), jnp.int32).at[
            jnp.minimum(label, n)].add(mult_s)[:n]
    else:
        sizes = jnp.bincount(jnp.minimum(label, n), length=n + 1)[:n]
    c = min(num_clusters, n)
    _, top_roots = jax.lax.top_k(sizes, c)
    keep = sizes[top_roots] > 0
    rank = jnp.full((n + 1,), -1, jnp.int32)
    rank = rank.at[jnp.where(keep, top_roots, n)].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")
    final_s = jnp.where(label < n, rank[jnp.minimum(label, n)], -1)

    # --- back to original point order ------------------------------------
    out = jnp.full((n,), -1, jnp.int32).at[order].set(final_s)
    return jnp.where(valid, out, -1)


def dbscan_dedup(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    dedup_voxel: float,
    rep_cap: int,
    **dbscan_kw,
) -> jnp.ndarray:
    """DBSCAN on voxel-dedup representatives; labels broadcast per point.

    The hdbscan speedup applied to the default clusterer: points sharing a
    fine voxel (diameter < eps: ``dedup_voxel`` must satisfy
    ``dedup_voxel * sqrt(3) < eps``) collapse to one representative point
    carrying an integer multiplicity; the weighted ``dbscan`` counts raw
    points, so core/border decisions and size ranking keep raw-cloud
    semantics while every per-point stage runs at the representative
    bucket (demo joint cloud: 126.6k -> 35.7k reps at 0.12 m, dedup cost
    1.2 ms). Scenes whose occupied-voxel count exceeds ``rep_cap`` take
    the full-cloud path via ``lax.cond`` — counted, never truncated.

    Approximation note (same as the hdbscan dedup, config.py
    ``hdbscan_dedup_voxel``): a raw point can sit up to half a voxel
    diagonal from its representative, so the effective eps wobbles by
    +-dedup_voxel*sqrt(3)/2 at cluster boundaries.
    """
    eps_floor = dbscan_kw.get("eps", 0.25)
    if dedup_voxel * 1.7320509 >= eps_floor:
        raise ValueError(
            f"cluster_dedup_voxel={dedup_voxel} too coarse for eps="
            f"{eps_floor}: points in one voxel must be mutually within eps "
            f"(voxel * sqrt(3) < eps)")
    rep_xyz, rep_valid, rep_mult, point_rep, n_unique = voxel_dedup_compact(
        xyz, valid, voxel=dedup_voxel, cap=rep_cap)

    def on_reps(_):
        lab_r = dbscan(rep_xyz, rep_valid, rep_mult, **dbscan_kw)
        lab_pad = jnp.concatenate([lab_r, jnp.full((1,), -1, jnp.int32)])
        return lab_pad[jnp.minimum(point_rep, rep_cap)]

    def on_full(_):
        return dbscan(xyz, valid, **dbscan_kw)

    return jax.lax.cond(n_unique <= rep_cap, on_reps, on_full, operand=None)


def _mre_level(xyz, valid, *, k_core: int, edges_per_point: int,
               cell_size: float, cell_cap: int, tile: int,
               core_full=None):
    """One resolution level of the mutual-reachability kernel.

    With ``core_full=None`` (pass 1) returns this level's per-point k-core
    distance estimate in ORIGINAL point order — an *upper bound* on the true
    d_k: candidates this level misses (outside the 27-cell neighborhood, or
    sampled out by ``cell_cap``) can only inflate the k-th sorted distance.
    Points with fewer than ``k_core`` usable candidates get 1e9 (unknown).

    With ``core_full`` given (pass 2, original order) returns this level's
    ``edges_per_point`` lightest mutual-reachability edges
    (edge_dst (N,E) int32 with N = "no edge", edge_w (N,E) f32).
    """
    n = xyz.shape[0]
    f32 = jnp.float32

    cell = jnp.floor(xyz / cell_size).astype(jnp.int32)
    cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
    span = jnp.maximum(cmax - cmin + 3, 1)
    cc = cell - cmin + 1

    def cell_id(c3):
        return (c3[..., 0] * span[1] + c3[..., 1]) * span[2] + c3[..., 2]

    ids = jnp.where(valid, cell_id(cc), jnp.int32(2 ** 30))
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz_s = xyz[order]
    valid_s = valid[order]
    core_s = None if core_full is None else core_full[order]

    pad_tile = (-n) % tile
    nt = (n + pad_tile) // tile

    def candidates(t):
        rows = t * tile + jnp.arange(tile)
        rows_c = jnp.minimum(rows, n - 1)
        p = xyz_s[rows_c]
        pc = cc[order[rows_c]]
        row_ok = (rows < n) & valid_s[rows_c]

        pos_l, ok_l = [], []
        for off in _OFFSETS:
            qid = cell_id(pc + jnp.array(off, jnp.int32))
            start = jnp.searchsorted(ids_s, qid)
            kk = jnp.arange(cell_cap)
            pos = start[:, None] + kk[None, :]
            pos_c = jnp.minimum(pos, n - 1)
            same = (ids_s[pos_c] == qid[:, None]) & (pos < n)
            pos_l.append(pos_c)
            ok_l.append(same)
        pos = jnp.concatenate(pos_l, axis=1)                 # (T, 27K)
        ok = jnp.concatenate(ok_l, axis=1)
        q = xyz_s[pos]
        d = jnp.sqrt(jnp.sum((q - p[:, None, :]) ** 2, axis=-1))
        is_self = pos == rows_c[:, None]
        usable = ok & valid_s[pos] & row_ok[:, None] & ~is_self
        d = jnp.where(usable, d, 1e9)
        return rows_c, pos, d

    if core_full is None:
        def core_pass(t):
            _, _, d = candidates(t)
            d_sorted = jnp.sort(d, axis=1)
            return jnp.minimum(d_sorted[:, k_core - 1], 1e9)

        core_tiles = jax.lax.map(core_pass, jnp.arange(nt))
        cs = core_tiles.reshape(-1)[:n]
        cs = jnp.where(valid_s, cs, 1e9)
        return jnp.full((n,), 1e9, f32).at[order].set(cs)

    def edge_pass(t):
        rows_c, pos, d = candidates(t)
        w = jnp.maximum(d, jnp.maximum(core_s[rows_c][:, None],
                                       core_s[pos]))
        w = jnp.where(d < 1e8, w, 1e9)
        order_e = jnp.argsort(w, axis=1)[:, :edges_per_point]
        ew = jnp.take_along_axis(w, order_e, axis=1)
        ep = jnp.take_along_axis(pos, order_e, axis=1)
        ep = jnp.where(ew < 1e8, ep, n)
        return ep, ew

    ep_t, ew_t = jax.lax.map(edge_pass, jnp.arange(nt))
    edge_dst_s = ep_t.reshape(-1, ep_t.shape[-1])[:n]
    edge_w_s = ew_t.reshape(-1, ew_t.shape[-1])[:n]

    # back to original order (edges reference sorted positions -> remap)
    orig_of_sorted = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((1,), n, jnp.int32)])
    edge_dst = jnp.full((n, edges_per_point), n, jnp.int32)
    edge_dst = edge_dst.at[order].set(
        orig_of_sorted[jnp.minimum(edge_dst_s, n)])
    edge_w = jnp.full((n, edges_per_point), 1e9, f32).at[order].set(edge_w_s)
    return edge_dst, edge_w


@functools.partial(
    jax.jit,
    static_argnames=("k_core", "edges_per_point", "cell_sizes", "cell_cap",
                     "tile"),
)
def mutual_reachability_edges(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    k_core: int = 15,
    edges_per_point: int = 8,
    cell_sizes: tuple = (0.35, 1.0, 3.0),
    cell_cap: int = 64,
    tile: int = 2048,
):
    """Device half of HDBSCAN: k-core distances + lightest mutual-reach edges.

    HDBSCAN's density model (the reference's primary clusterer,
    `utils_cluster.py:10-29`): core distance d_k(p) = distance to the k-th
    neighbor; mutual reachability w(p,q) = max(d_k(p), d_k(q), d(p,q)).

    Lidar scenes span ~2 orders of magnitude in density (a 0.35 m voxel holds
    hundreds of points at 5 m and is empty at 50 m), so a single voxel scale
    cannot both (a) keep per-cell candidate sampling unbiased in dense areas
    and (b) reach the k-th neighbor of sparse far-range points. The kernel
    therefore runs the 27-cell voxel-hash at several ``cell_sizes``:

      * every level's k-th-candidate distance is an UPPER bound on the true
        d_k (missed or sampled-out candidates only inflate it), so the final
        core distance is the min over levels — fine cells give the tight
        bound in dense areas, coarse cells in sparse ones;
      * each level contributes its ``edges_per_point`` lightest
        mutual-reachability edges (weighted with the final core vector); the
        union feeds the native MST, so short dense edges and long sparse
        bridges both survive.

    Points with fewer than ``k_core`` candidates even at the coarsest level
    keep core 1e9 — their edges are dropped and they become noise, hdbscan's
    high-lambda-noise semantics. Single-scale operation (the round-1 design,
    whose dense-cell sampling bias fragmented clusters and shed fringes) is
    just ``cell_sizes=(c,)``.

    The sequential half (MST -> condensed tree -> excess-of-mass selection)
    runs in native C++ (native/npz_reader.cc: ifh_hdbscan_labels).

    Returns: core_dist (N,), edge_dst (N, L*E) int32 (N = no edge),
             edge_w (N, L*E) float32.
    """
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)
    valid = valid.astype(bool)

    kw = dict(k_core=k_core, edges_per_point=edges_per_point,
              cell_cap=cell_cap, tile=tile)
    cores = [_mre_level(xyz, valid, cell_size=c, **kw) for c in cell_sizes]
    core_dist = cores[0]
    for c in cores[1:]:
        core_dist = jnp.minimum(core_dist, c)   # tightest upper bound on d_k

    ed_l, ew_l = [], []
    for c in cell_sizes:
        ed, ew = _mre_level(xyz, valid, cell_size=c, core_full=core_dist,
                            **kw)
        ed_l.append(ed)
        ew_l.append(ew)
    return (core_dist,
            jnp.concatenate(ed_l, axis=1),
            jnp.concatenate(ew_l, axis=1))


@functools.partial(
    jax.jit,
    static_argnames=("voxel", "cap"),
)
def voxel_dedup_compact(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel: float,
    cap: int,
):
    """Compact one representative per occupied voxel into a static bucket.

    The exact-kNN mutual-reachability graph (below) is O(N^2); points
    sharing a fine voxel are mutual near-duplicates whose presence changes
    the graph only through local density. Deduplicating to one
    representative per voxel and carrying the lost points as an integer
    MULTIPLICITY preserves that density exactly where it matters: weighted
    core distances (d_k counts duplicates) and weighted condensed-tree
    masses (native ifh_hdbscan_labels_weighted) reproduce the raw-cloud
    semantics at a fraction of the quadratic cost. The voxel grid is fixed
    to the coordinate origin, so — unlike a voxel CANDIDATE graph — dedup
    never changes the graph's connectivity structure, only its sampling; the
    translation-variance pathology documented on
    ``mutual_reachability_edges`` does not apply.

    Returns (rep_xyz (cap,3), rep_valid (cap,), rep_mult (cap,) int32,
             point_rep (N,) int32 — the point's representative slot, == cap
             for invalid points, n_unique () int32 — occupied voxel count;
             representatives beyond ``cap`` are dropped and their points map
             to slot cap; callers MUST check n_unique <= cap and fall back,
             never truncate silently).
    """
    n = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    valid = valid.astype(bool)
    cell = jnp.floor(xyz / voxel).astype(jnp.int32)
    cmin = jnp.min(jnp.where(valid[:, None], cell, 2 ** 20), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], cell, -(2 ** 20)), axis=0)
    span = jnp.maximum(cmax - cmin + 1, 1)
    cc = cell - cmin
    ids = (cc[:, 0] * span[1] + cc[:, 1]) * span[2] + cc[:, 2]
    ids = jnp.where(valid, ids, jnp.int32(2 ** 30))
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz_s = xyz[order]
    live = ids_s < 2 ** 30
    first = live & jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1       # slot per run
    rank = jnp.where(live, jnp.minimum(rank, cap), cap)  # overflow -> cap
    n_unique = jnp.sum(first.astype(jnp.int32))

    rep_xyz = jnp.zeros((cap + 1, 3), jnp.float32).at[
        jnp.where(first, rank, cap)].set(xyz_s, mode="drop")[:cap]
    rep_mult = jnp.zeros((cap + 1,), jnp.int32).at[rank].add(
        1, mode="drop")[:cap]
    rep_valid = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(n_unique, cap)
    point_rep = jnp.full((n,), cap, jnp.int32).at[order].set(rank)
    return rep_xyz, rep_valid, rep_mult, point_rep, n_unique


@functools.partial(
    jax.jit,
    static_argnames=("k", "src_tile", "dst_tile", "knn_recall"),
)
def exact_knn_mutual_reachability(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    mult: jnp.ndarray | None = None,
    *,
    k: int = 20,
    src_tile: int = 1024,
    dst_tile: int = 2048,
    knn_recall: float = 0.0,
):
    """Exact k-nearest-neighbor mutual-reachability graph (brute force).

    The voxel-hash kernel (`mutual_reachability_edges`) is fast but its
    candidate graph is TRANSLATION-VARIANT: the same object at two positions
    (the two ego-aligned copies of a mover in the joint cloud,
    `dataset_pca.py:171-182`) straddles different cell boundaries and can
    receive different spurious splits — the condensed tree then fragments
    the two copies inconsistently and cluster-to-cluster matching fails its
    shape gates. This kernel computes the EXACT kNN graph with tiled MXU
    distance blocks (|x|^2 - 2<x,y> + |y|^2 at HIGHEST precision), a
    translation-invariant graph matching upstream hdbscan's
    ``approx_min_span_tree`` kNN structure (`utils_cluster.py:11-13`).

    O(N^2) FLOPs, but they are matmul FLOPs: ~0.5-2 s for a 260k-point
    joint cloud on one TPU v5e chip. Peak memory is (src_tile, N).

    Returns: core_dist (N,), edge_dst (N, k) int32 (N = no edge),
             edge_w (N, k) f32 — same contract as the voxel kernel.

    ``mult``: optional (N,) int32 point multiplicities (voxel-dedup
    representatives, :func:`voxel_dedup_compact`). The core distance then
    counts POINTS rather than graph nodes: d_k(p) is the distance to the
    neighbor representative at which the cumulative multiplicity (including
    p's own mult-1 co-voxel duplicates) first reaches k — the d_k upstream
    hdbscan would compute on the raw cloud, up to sub-voxel quantisation.
    Each representative carries >= 1 point, so the k nearest representatives
    always suffice to reach mass k.
    """
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)
    valid = valid.astype(bool)
    big = jnp.asarray(1e9, f32)

    pad_s = (-n) % src_tile
    ns = (n + pad_s) // src_tile
    pad_d = (-n) % dst_tile
    nd = (n + pad_d) // dst_tile
    xyz_d = jnp.pad(xyz, ((0, pad_d), (0, 0)))
    valid_d = jnp.pad(valid, (0, pad_d))
    dsq_d = jnp.sum(xyz_d * xyz_d, axis=1)

    def src_pass(t):
        rows = t * src_tile + jnp.arange(src_tile)
        rows_c = jnp.minimum(rows, n - 1)
        p = xyz[rows_c]                                   # (S,3)
        psq = jnp.sum(p * p, axis=1)

        def dst_step(carry, td):
            best_d, best_i = carry                        # (S,k)
            j0 = td * dst_tile
            q = jax.lax.dynamic_slice_in_dim(xyz_d, j0, dst_tile, 0)
            qv = jax.lax.dynamic_slice_in_dim(valid_d, j0, dst_tile, 0)
            qsq = jax.lax.dynamic_slice_in_dim(dsq_d, j0, dst_tile, 0)
            cross = jnp.einsum("sd,td->st", p, q,
                               precision=jax.lax.Precision.HIGHEST)
            d2 = psq[:, None] - 2.0 * cross + qsq[None, :]
            jidx = j0 + jnp.arange(dst_tile)
            is_self = jidx[None, :] == rows_c[:, None]
            d2 = jnp.where(qv[None, :] & ~is_self, d2, big)
            if knn_recall > 0:
                # per-tile TPU-optimised approx top-k, then an EXACT merge
                # over the 2k survivors. The incremental exact merge
                # (top_k over best(k)++tile(2048) per tile) was the graph's
                # dominant cost (round-5 split: 752 ms of the 1.2 s
                # hdbscan call); the approximation affects only per-tile
                # CANDIDATE recall (>= knn_recall, value-based, hence
                # translation-invariant) and every surviving edge keeps
                # its exact distance.
                tile_d, tile_a = jax.lax.approx_min_k(
                    d2, k, recall_target=knn_recall)
                tile_i = j0 + tile_a.astype(jnp.int32)
                cat_d = jnp.concatenate([best_d, tile_d], axis=1)
                cat_i = jnp.concatenate([best_i, tile_i], axis=1)
            else:
                cat_d = jnp.concatenate([best_d, d2], axis=1)
                cat_i = jnp.concatenate(
                    [best_i, jnp.broadcast_to(jidx[None, :],
                                              (src_tile, dst_tile))], axis=1)
            neg, sel = jax.lax.top_k(-cat_d, k)
            return ((-neg, jnp.take_along_axis(cat_i, sel, axis=1)),
                    None)

        init = (jnp.full((src_tile, k), big),
                jnp.full((src_tile, k), n, jnp.int32))
        (bd, bi), _ = jax.lax.scan(dst_step, init, jnp.arange(nd))
        return bd, bi

    bd_t, bi_t = jax.lax.map(src_pass, jnp.arange(ns))
    d2_knn = bd_t.reshape(-1, k)[:n]                      # (N,k) squared
    idx_knn = bi_t.reshape(-1, k)[:n]
    d_knn = jnp.sqrt(jnp.maximum(d2_knn, 0.0))

    if mult is None:
        core = jnp.where(valid, d_knn[:, k - 1], 1e9)
    else:
        mult = mult.astype(jnp.int32)
        mpad = jnp.concatenate([mult, jnp.zeros((1,), jnp.int32)])
        nb_mult = jnp.where(d_knn < 1e8,
                            mpad[jnp.minimum(idx_knn, n)], 0)
        cum = (mult - 1)[:, None] + jnp.cumsum(nb_mult, axis=1)
        reached = cum >= k
        first = jnp.argmax(reached, axis=1)
        core_w = jnp.take_along_axis(d_knn, first[:, None], axis=1)[:, 0]
        core_w = jnp.where((mult - 1) >= k, 0.0, core_w)
        core = jnp.where(valid & jnp.any(reached, axis=1), core_w, 1e9)
    core_pad = jnp.concatenate([core, jnp.full((1,), 1e9, f32)])
    idx_c = jnp.minimum(idx_knn, n)
    w = jnp.maximum(d_knn, jnp.maximum(core[:, None], core_pad[idx_c]))
    w = jnp.where((d_knn < 1e8) & valid[:, None], w, 1e9)
    edge_dst = jnp.where(w < 1e8, idx_knn, n)
    return core, edge_dst, w
