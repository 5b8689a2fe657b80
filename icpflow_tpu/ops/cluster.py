"""Density clustering on TPU: voxel-hash DBSCAN with parallel label propagation.

Replaces the reference's host-side Open3D ``cluster_dbscan`` / hdbscan calls
(`utils_cluster.py:10-63`) with a static-shape JAX routine:

  1. bin points into eps-sized voxel cells (traced integer cell ids);
  2. sort by cell id; neighbor candidates of a point are the points of its 27
     adjacent cells, located with ``searchsorted`` and capped per cell;
  3. core test: >= ``min_points`` neighbors within eps (count over *all*
     candidates, not the compacted edge list);
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


@functools.partial(
    jax.jit,
    static_argnames=("eps", "min_points", "num_clusters", "cell_cap",
                     "edges_per_cell", "max_iters", "tile",
                     "eps_scale_per_m", "eps_max"),
)
def dbscan(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    eps: float = 0.25,
    min_points: int = 30,
    num_clusters: int = 200,
    cell_cap: int = 64,
    edges_per_cell: int = 2,
    max_iters: int = 200,
    tile: int = 2048,
    eps_scale_per_m: float = 0.0,
    eps_max: float = 1.0,
) -> jnp.ndarray:
    """Labels (N,) int32: 0..C-1 size-ranked clusters, -1 noise/dropped."""
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)
    valid = valid.astype(bool)
    adaptive = eps_scale_per_m > 0.0
    cell_size = eps_max if adaptive else eps
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

    # --- 2. sort by cell -------------------------------------------------
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz_s = xyz[order]
    valid_s = valid[order]

    # --- 3. neighbor candidates per point tile ---------------------------
    pad_tile = (-n) % tile
    nt = (n + pad_tile) // tile
    eps_s = eps_pt[order]

    def tile_pass(t):
        base = t * tile
        rows = base + jnp.arange(tile)
        rows_c = jnp.minimum(rows, n - 1)
        p = xyz_s[rows_c]                                    # (T,3)
        pc = cc[order[rows_c]]
        row_ok = (rows < n) & valid_s[rows_c]

        p_eps = eps_s[rows_c]                                # (T,)
        cand_list = []
        cell_tot = []
        for off in _OFFSETS:
            qid = cell_id(pc + jnp.array(off, jnp.int32))
            start = jnp.searchsorted(ids_s, qid)             # (T,)
            end = jnp.searchsorted(ids_s, qid, side="right")
            cell_tot.append(end - start)
            k = jnp.arange(cell_cap)
            pos = start[:, None] + k[None, :]                # (T,K)
            pos_c = jnp.minimum(pos, n - 1)
            same = (ids_s[pos_c] == qid[:, None]) & (pos < n)
            cand_list.append((pos_c, same))
        pos = jnp.concatenate([c[0] for c in cand_list], axis=1)   # (T,27K)
        ok = jnp.concatenate([c[1] for c in cand_list], axis=1)

        q = xyz_s[pos]                                       # (T,27K,3)
        d_sq = jnp.sum((q - p[:, None, :]) ** 2, axis=-1)
        # mutual adaptive radius: edge iff d <= min(eps_i, eps_j)
        r_edge = jnp.minimum(p_eps[:, None], eps_s[pos])
        within = ok & (d_sq <= r_edge * r_edge) & valid_s[pos] & row_ok[:, None]
        # unbiased neighbor count under the per-cell candidate cap: rescale
        # each cell's sampled within-count by its total/sampled ratio
        n_off = len(_OFFSETS)
        w3c = within.reshape(tile, n_off, cell_cap)
        tot = jnp.stack(cell_tot, axis=1).astype(jnp.float32)      # (T,27)
        sampled = jnp.minimum(tot, cell_cap)
        scale = tot / jnp.maximum(sampled, 1.0)
        count_f = jnp.sum(
            jnp.sum(w3c.astype(jnp.float32), axis=2) * scale, axis=1)
        count = jnp.round(count_f).astype(jnp.int32)

        # compact to fixed-degree edges. Crucial detail: keep the first
        # ``edges_per_cell`` within-eps candidates of EVERY neighboring cell
        # (not the globally-first ones) — same-cell candidates would otherwise
        # starve the cross-cell links that connect clusters spanning cells.
        w3 = w3c
        sel = jnp.argsort(~w3, axis=2, stable=True)[:, :, :edges_per_cell]
        p3 = pos.reshape(tile, n_off, cell_cap)
        e_pos = jnp.take_along_axis(p3, sel, axis=2)
        e_ok = jnp.take_along_axis(w3, sel, axis=2)
        e_pos = jnp.where(e_ok, e_pos, n)                    # n == "no edge"
        return count, e_pos.reshape(tile, n_off * edges_per_cell)

    counts, edges = jax.lax.map(tile_pass, jnp.arange(nt))
    counts = counts.reshape(-1)[:n]
    edges = edges.reshape(-1, len(_OFFSETS) * edges_per_cell)[:n]                 # sorted layout

    core = (counts >= min_points) & valid_s

    # --- 4. min-label propagation over core points -----------------------
    idx = jnp.arange(n, dtype=jnp.int32)
    core_pad = jnp.concatenate([core, jnp.zeros((1,), bool)])
    init_label = jnp.where(core, idx, n)

    # core->core edge targets (n == "no edge"); propagation must be symmetric
    # even though the stored adjacency is directed ("first K per cell"), so
    # each iteration both PULLS neighbor labels (gather) and PUSHES the own
    # label to neighbors (scatter-min along the reverse edges).
    core_edges = jnp.where(core_pad[edges] & core[:, None], edges, n)

    def prop_body(state):
        lab, _, it = state
        lab_pad = jnp.concatenate([lab, jnp.full((1,), n, jnp.int32)])
        pulled = jnp.min(lab_pad[core_edges], axis=1)        # (N,)
        pushed = jnp.full((n + 1,), n, jnp.int32).at[
            core_edges.reshape(-1)].min(
            jnp.broadcast_to(lab[:, None], core_edges.shape).reshape(-1))[:n]
        new = jnp.minimum(lab, jnp.minimum(pulled, pushed))
        new = jnp.where(core, new, n)
        # pointer jumping (path halving), twice
        new_pad = jnp.concatenate([new, jnp.full((1,), n, jnp.int32)])
        new = jnp.where(core, jnp.minimum(new, new_pad[new_pad[new]]), n)
        new_pad = jnp.concatenate([new, jnp.full((1,), n, jnp.int32)])
        new = jnp.where(core, jnp.minimum(new, new_pad[new_pad[new]]), n)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    label, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), prop_body,
        (init_label, jnp.bool_(True), jnp.int32(0)))

    # --- 5. border points adopt an adjacent core label -------------------
    lab_pad = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
    nbr_core_lab = jnp.where(core_pad[edges], lab_pad[edges], n)
    border_lab = jnp.min(nbr_core_lab, axis=1)
    label = jnp.where(core, label,
                      jnp.where(valid_s & (border_lab < n), border_lab, n))

    # --- 6. size-ranked top-K relabelling --------------------------------
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


@functools.partial(
    jax.jit,
    static_argnames=("k_core", "edges_per_point", "cell_size", "cell_cap",
                     "tile"),
)
def mutual_reachability_edges(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    k_core: int = 15,
    edges_per_point: int = 8,
    cell_size: float = 0.8,
    cell_cap: int = 64,
    tile: int = 2048,
):
    """Device half of HDBSCAN: k-core distances + lightest mutual-reach edges.

    HDBSCAN's density model (the reference's primary clusterer,
    `utils_cluster.py:10-29`): core distance d_k(p) = distance to the k-th
    neighbor; mutual reachability w(p,q) = max(d_k(p), d_k(q), d(p,q)).
    This kernel voxel-hashes candidates (27-cell neighborhoods, capped per
    cell), computes d_k per point, and emits each point's ``edges_per_point``
    lightest mutual-reachability edges — a kNN-graph whose MST approximates
    the full-graph MST. Candidates beyond the neighborhood cap d_k at
    1.5 * cell_size (sparse points become high-lambda noise, as in hdbscan).

    The sequential half (MST -> condensed tree -> excess-of-mass selection)
    runs in native C++ (native/npz_reader.cc: ifh_hdbscan_labels).

    Returns: core_dist (N,), edge_dst (N, E) int32 (N = no edge),
             edge_w (N, E) float32.
    """
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)
    valid = valid.astype(bool)
    cap_dist = jnp.asarray(1.5 * cell_size, f32)

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

    pad_tile = (-n) % tile
    nt = (n + pad_tile) // tile
    n_off = len(_OFFSETS)

    def tile_pass(t):
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
        d_sorted = jnp.sort(d, axis=1)
        core = jnp.minimum(d_sorted[:, k_core - 1], cap_dist)
        return core, pos, d

    # pass 1: core distances (sorted layout)
    core_tiles = jax.lax.map(lambda t: tile_pass(t)[0], jnp.arange(nt))
    core_s = core_tiles.reshape(-1)[:n]
    core_s = jnp.where(valid_s, core_s, 1e9)

    # pass 2: mutual-reachability edges using the full core vector
    def edge_pass(t):
        _, pos, d = tile_pass(t)
        rows = t * tile + jnp.arange(tile)
        rows_c = jnp.minimum(rows, n - 1)
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
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    orig_of_sorted = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((1,), n, jnp.int32)])
    core_dist = jnp.full((n,), 1e9, f32).at[order].set(core_s)
    edge_dst = jnp.full((n, edge_dst_s.shape[1]), n, jnp.int32)
    edge_dst = edge_dst.at[order].set(
        orig_of_sorted[jnp.minimum(edge_dst_s, n)])
    edge_w = jnp.full((n, edge_w_s.shape[1]), 1e9, f32).at[order].set(edge_w_s)
    return core_dist, edge_dst, edge_w
