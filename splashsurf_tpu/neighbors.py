"""Neighborhood machinery: sort-based cell binning + masked stencil gathers.

TPU-native replacement for the reference's spatial hashing
(splashsurf_lib/src/neighborhood_search.rs): instead of hashmaps of
cell -> particle lists, particles are sorted by their flat bin id; a bin's
particle segment is found by binary search over the sorted bin ids, and all
neighbor queries become fixed-shape masked gathers over the 27-bin stencil
with a static per-bin capacity. No locks, no thread-local merges —
everything is a pure array program.

Bin size must be >= the query radius so the 27-stencil covers the ball.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import kernels

_INT32_MAX = np.int32(2**31 - 1)


@dataclasses.dataclass(frozen=True)
class BinGrid:
    """Uniform binning lattice (host-static dims, hashable for jit)."""

    min: Tuple[float, float, float]
    bin_size: float
    dims: Tuple[int, int, int]

    @staticmethod
    def for_domain(aabb_min, aabb_max, bin_size: float) -> "BinGrid":
        mn = np.asarray(aabb_min, dtype=np.float64) - bin_size
        mx = np.asarray(aabb_max, dtype=np.float64) + bin_size
        dims = np.maximum(np.ceil((mx - mn) / bin_size).astype(np.int64), 1)
        total = int(dims[0]) * int(dims[1]) * int(dims[2])
        if total >= 2**31:
            raise ValueError(
                f"bin lattice too large for int32 flat ids: {tuple(dims)}"
            )
        return BinGrid(
            min=tuple(mn.tolist()), bin_size=float(bin_size), dims=tuple(int(d) for d in dims)
        )

    def bin_ijk(self, positions):
        x = jnp.asarray(positions)
        mn = jnp.asarray(self.min, dtype=x.dtype)
        ijk = jnp.floor((x - mn) / jnp.asarray(self.bin_size, x.dtype)).astype(jnp.int32)
        return jnp.clip(ijk, 0, jnp.asarray(self.dims, jnp.int32) - 1)

    def flatten(self, ijk):
        _, dy, dz = self.dims
        return ijk[..., 0] * (dy * dz) + ijk[..., 1] * dz + ijk[..., 2]


class CellList(NamedTuple):
    """Particles sorted by bin: the entire acceleration structure."""

    order: jax.Array  # (N,) int32: original particle index, bin-sorted
    sorted_bins: jax.Array  # (N,) int32: flat bin id per sorted slot
    sorted_positions: jax.Array  # (N, 3): positions gathered in sorted order
    bin_of_particle: jax.Array  # (N,) int32: flat bin id per original index


_STENCIL = np.array(
    [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.int32,
)


@functools.partial(jax.jit, static_argnames=("grid",))
def build_cell_list(positions, grid: BinGrid) -> CellList:
    positions = jnp.asarray(positions)
    bins = grid.flatten(grid.bin_ijk(positions))
    order = jnp.argsort(bins).astype(jnp.int32)
    sorted_bins = bins[order]
    return CellList(
        order=order,
        sorted_bins=sorted_bins,
        sorted_positions=positions[order],
        bin_of_particle=bins,
    )


def max_bin_occupancy(cell_list: CellList) -> int:
    """Largest particle count in any bin (host sync; sets gather capacity)."""
    return bin_stats(cell_list)[0]


@jax.jit
def _bin_stats_device(sb):
    change = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    seg_id = jnp.cumsum(change.astype(jnp.int32)) - 1
    counts = jnp.zeros(sb.shape[0], jnp.int32).at[seg_id].add(1)
    return jnp.max(counts), seg_id[-1] + 1


def bin_stats(cell_list: CellList):
    """(max occupancy, number of occupied bins) — one host sync."""
    mx, u = jax.device_get(_bin_stats_device(cell_list.sorted_bins))
    return int(mx), int(u)


def _stencil_segments(grid: BinGrid, cell_list: CellList, query_bin_ijk):
    """(starts, counts) of the 27 neighbor-bin segments per query.

    query_bin_ijk: (M, 3) int32. Returns starts (M, 27) int32 into the
    sorted particle order and counts (M, 27).
    """
    dims = jnp.asarray(grid.dims, jnp.int32)
    nb = query_bin_ijk[:, None, :] + jnp.asarray(_STENCIL)[None, :, :]  # (M,27,3)
    valid = jnp.all((nb >= 0) & (nb < dims), axis=-1)  # (M,27)
    nb_flat = grid.flatten(jnp.clip(nb, 0, dims - 1))  # (M,27)
    starts = jnp.searchsorted(cell_list.sorted_bins, nb_flat, side="left")
    ends = jnp.searchsorted(cell_list.sorted_bins, nb_flat, side="right")
    counts = jnp.where(valid, (ends - starts).astype(jnp.int32), 0)
    return starts.astype(jnp.int32), counts


@functools.partial(jax.jit, static_argnames=("grid", "capacity"))
def gather_candidates(
    query_positions, grid: BinGrid, cell_list: CellList, capacity: int
):
    """For each query point: candidate particle indices from the 27-stencil.

    Returns (idx (M, 27*capacity) int32 into original particle order,
    mask (M, 27*capacity) bool). Candidates are enumerated in canonical
    order (stencil offset major, bin-sorted order minor) so reductions over
    them are deterministic for a fixed particle sort.
    """
    q = jnp.asarray(query_positions)
    qb = grid.bin_ijk(q)
    starts, counts = _stencil_segments(grid, cell_list, qb)  # (M,27)
    slot = jnp.arange(capacity, dtype=jnp.int32)  # (K,)
    gather_pos = starts[:, :, None] + slot[None, None, :]  # (M,27,K)
    mask = slot[None, None, :] < counts[:, :, None]
    n = cell_list.order.shape[0]
    gather_pos = jnp.clip(gather_pos, 0, max(n - 1, 0))
    idx = cell_list.order[gather_pos]  # (M,27,K)
    m27k = mask.reshape(mask.shape[0], -1)
    return idx.reshape(idx.shape[0], -1), m27k


@functools.partial(jax.jit, static_argnames=("grid", "capacity"))
def neighbor_counts_and_distsq(
    positions, grid: BinGrid, cell_list: CellList, radius, capacity: int
):
    """Neighbor counts within ``radius`` per particle (excluding self)."""
    idx, mask = gather_candidates(positions, grid, cell_list, capacity)
    p = jnp.asarray(positions)
    cand = p[idx]  # (N, C, 3)
    d2 = jnp.sum((cand - p[:, None, :]) ** 2, axis=-1)
    r2 = jnp.asarray(radius, p.dtype) ** 2
    self_mask = idx != jnp.arange(p.shape[0], dtype=jnp.int32)[:, None]
    within = mask & self_mask & (d2 < r2)
    return jnp.sum(within, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("grid", "capacity", "max_neighbors"))
def neighbor_lists_padded(
    positions,
    grid: BinGrid,
    cell_list: CellList,
    radius,
    capacity: int,
    max_neighbors: int,
):
    """Fixed-width neighbor lists: (N, max_neighbors) int32, -1 padded.

    The flat-CSR analog of the reference's ``FlatNeighborhoodList``
    (neighborhood_search.rs:233-289); use :func:`to_csr` for ragged output.
    """
    idx, mask = gather_candidates(positions, grid, cell_list, capacity)
    p = jnp.asarray(positions)
    cand = p[idx]
    d2 = jnp.sum((cand - p[:, None, :]) ** 2, axis=-1)
    r2 = jnp.asarray(radius, p.dtype) ** 2
    self_mask = idx != jnp.arange(p.shape[0], dtype=jnp.int32)[:, None]
    within = mask & self_mask & (d2 < r2)
    # Stable compaction of each row into max_neighbors slots.
    rank = jnp.cumsum(within, axis=1) - 1
    dest = jnp.where(within, rank, max_neighbors)
    out = jnp.full((p.shape[0], max_neighbors), -1, dtype=jnp.int32)
    rows = jnp.broadcast_to(
        jnp.arange(p.shape[0], dtype=jnp.int32)[:, None], idx.shape
    )
    out = out.at[rows.reshape(-1), dest.reshape(-1)].set(
        idx.reshape(-1), mode="drop"
    )
    counts = jnp.sum(within, axis=1).astype(jnp.int32)
    return out, counts


def to_csr(padded_lists: np.ndarray, counts: np.ndarray):
    """Convert padded neighbor lists to CSR (offsets, indices) on host."""
    counts = np.asarray(counts)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    indices = np.empty(int(offsets[-1]), dtype=np.int32)
    padded = np.asarray(padded_lists)
    for i in range(len(counts)):
        indices[offsets[i] : offsets[i + 1]] = padded[i, : counts[i]]
    return offsets, indices


def neighborhood_search_spatial_hashing_parallel(
    positions, radius: float, max_neighbors: int = 256
):
    """Ragged neighbor lists for all particles (pysplashsurf parity:
    ``neighborhood_search_spatial_hashing_parallel``). Returns a list of
    int arrays; the device computation uses the sorted cell binning."""
    positions = jnp.asarray(positions)
    mn = np.asarray(jnp.min(positions, axis=0))
    mx = np.asarray(jnp.max(positions, axis=0))
    grid = BinGrid.for_domain(mn, mx, radius)
    cl = build_cell_list(positions, grid)
    capacity = _round_up(max_bin_occupancy(cl))
    lists, counts = neighbor_lists_padded(
        positions, grid, cl, radius, capacity, max_neighbors
    )
    lists, counts = np.asarray(lists), np.asarray(counts)
    return [lists[i, : counts[i]] for i in range(len(counts))]


def neighborhood_search_naive(positions: np.ndarray, radius: float):
    """O(N^2) oracle (neighborhood_search.rs:72-91), host-side."""
    p = np.asarray(positions, dtype=np.float64)
    d2 = np.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1)
    within = (d2 < radius * radius) & ~np.eye(len(p), dtype=bool)
    return [np.nonzero(row)[0] for row in within]


# ---------------------------------------------------------------------------
# per-particle SPH densities
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("grid", "capacity", "u_cap"))
def compute_particle_densities_binned(
    positions,
    grid: BinGrid,
    cell_list: CellList,
    compact_support_radius,
    particle_rest_mass,
    capacity: int,
    u_cap: int,
):
    """SPH density per particle: rho_i = m * sum_j W(|x_j - x_i|).

    Bin-table pair-sum formulation: particles are rasterized into dense
    (u_cap, K) per-occupied-bin tables (one unique-index scatter), then each
    of the 27 stencil offsets contributes a (U, K, K) pair block — row
    gathers of whole bins instead of per-particle random gathers, which is
    the difference between streaming and latency-bound HBM access on TPU.
    Empty slots carry far-away dummy positions, so W contributes exactly 0
    and no masking is needed; the self-term W(0) is included naturally
    (density_map.rs:169-185).

    ``capacity`` must be >= the max bin occupancy; ``u_cap`` >= the number
    of occupied bins.
    """
    p = jnp.asarray(positions)
    dtype = p.dtype
    h = jnp.asarray(compact_support_radius, dtype)
    n = p.shape[0]
    K = capacity
    sb = cell_list.sorted_bins  # (N,) sorted flat bin ids

    # occupied-bin ranks and slots (no binary search needed)
    is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    bin_rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # (N,)
    starts_per_rank = (
        jnp.zeros((u_cap,), jnp.int32)
        .at[jnp.where(is_start, bin_rank, u_cap)]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    slot = jnp.arange(n, dtype=jnp.int32) - starts_per_rank[bin_rank]

    occ_bins = (
        jnp.full((u_cap,), _INT32_MAX, jnp.int32)
        .at[jnp.where(is_start, bin_rank, u_cap)]
        .set(sb, mode="drop", unique_indices=True)
    )

    # bin tables: positions per (bin rank, slot); dummy = +inf -> W == 0
    dest = jnp.where(slot < K, bin_rank * K + slot, u_cap * K)
    tables = []
    for d in range(3):
        tables.append(
            jnp.full((u_cap * K,), jnp.inf, dtype)
            .at[dest]
            .set(cell_list.sorted_positions[:, d], mode="drop", unique_indices=True)
            .reshape(u_cap, K)
        )

    # per-offset neighbor bin rank (sorted queries over sorted occ_bins)
    _, dy, dz = grid.dims
    stencil_flat = jnp.asarray(
        _STENCIL[:, 0] * (dy * dz) + _STENCIL[:, 1] * dz + _STENCIL[:, 2]
    )

    # (K, U) layouts: the big bin axis stays minor (128 lanes); a (U, K, K)
    # block would pad K -> 128 lanes, an 8x waste at typical occupancies.
    tables_t = [t.T for t in tables]  # 3 x (K, U)

    # Neighbor-rank lookup: a dense O(1) rank table over the bin lattice when
    # it fits (27 binary searches over U queries are latency-bound otherwise).
    lattice = grid.dims[0] * grid.dims[1] * grid.dims[2]
    use_table = lattice <= (1 << 24)
    if use_table:
        rank_table = (
            jnp.full((lattice + 1,), -1, jnp.int32)
            .at[jnp.clip(occ_bins, 0, lattice)]
            .set(jnp.arange(u_cap, dtype=jnp.int32), mode="drop")
        )
        # the sentinel slot absorbed the padded occ entries; invalidate it
        rank_table = rank_table.at[lattice].set(-1)

    def body(acc, delta):
        target = occ_bins + delta  # sorted + const = sorted
        if use_table:
            nb_rank = rank_table[jnp.clip(target, 0, lattice)]
            present = (nb_rank >= 0) & (target >= 0) & (target < lattice)
            nb_row = jnp.where(present, nb_rank, u_cap - 1)
        else:
            nb_rank = jnp.searchsorted(occ_bins, target).astype(jnp.int32)
            nb_rank_c = jnp.clip(nb_rank, 0, u_cap - 1)
            present = occ_bins[nb_rank_c] == target
            nb_row = jnp.where(present, nb_rank_c, u_cap - 1)
        d2 = jnp.zeros((K, K, u_cap), dtype)
        for d in range(3):
            own = tables_t[d][:, None, :]  # (K, 1, U)
            # contiguous row gather in (U, K) layout, then relayout
            nb_tab = tables[d][nb_row].T[None, :, :]  # (1, K, U)
            diff = own - nb_tab
            # inf - inf = nan guard: dummy slots must yield W = 0
            diff = jnp.where(jnp.isfinite(diff), diff, jnp.inf)
            d2 = d2 + diff * diff
        w = kernels.cubic_kernel(jnp.sqrt(d2), h)
        contrib = jnp.where(present[None, :], jnp.sum(w, axis=1), 0.0)
        return acc + contrib, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((K, u_cap), dtype), stencil_flat
    )

    # read back per particle (sorted order), then undo the sort
    dest_t = jnp.where(slot < K, slot * u_cap + bin_rank, u_cap * K)
    rho_sorted = acc.reshape(-1)[jnp.clip(dest_t, 0, u_cap * K - 1)]
    rho = (
        jnp.zeros((n,), dtype)
        .at[cell_list.order]
        .set(rho_sorted, mode="drop", unique_indices=True)
    )
    return jnp.asarray(particle_rest_mass, dtype) * rho


def compute_particle_densities(
    positions,
    compact_support_radius: float,
    particle_rest_mass: float,
    capacity: int | None = None,
):
    """Convenience wrapper: builds the binning and picks capacities on host."""
    positions = jnp.asarray(positions)
    mn, mx = jax.device_get(
        (jnp.min(positions, axis=0), jnp.max(positions, axis=0))
    )
    grid = BinGrid.for_domain(mn, mx, compact_support_radius)
    cl = build_cell_list(positions, grid)
    max_occ, n_bins = bin_stats(cl)
    if capacity is None:
        capacity = _round_up(max_occ)
    u_cap = 1 << max(int(n_bins) - 1, 1).bit_length()
    return compute_particle_densities_binned(
        positions,
        grid,
        cl,
        compact_support_radius,
        particle_rest_mass,
        capacity,
        u_cap,
    )


def _round_up(n: int, m: int = 8) -> int:
    return ((max(int(n), 1) + m - 1) // m) * m
