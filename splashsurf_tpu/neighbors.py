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
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import kernels

_INT32_MAX = np.int32(2**31 - 1)


def _bucket_lattice_dim(n: int) -> int:
    """Round a bin-lattice dimension up to its compile-shape bucket.

    Every distinct lattice shape is a distinct XLA (seconds) or Mosaic
    (minutes, over the remote tunnel) compile of the density sweep.
    Bucketing to 32 steps/octave (<= ~3.1% padding per dim, <= ~10% extra
    lattice volume) collapses the shape space so nearby frames/datasets
    reuse compiled programs. Padded bins lie beyond the particle AABB
    margin: they are empty, hold inf bin fractions (kernel weight 0), and
    never change densities. Disable with SPLASHSURF_TPU_LATTICE_BUCKET=0.
    """
    import os

    if os.environ.get("SPLASHSURF_TPU_LATTICE_BUCKET", "1") == "0" or n <= 4:
        return n
    step = max(2, 1 << max(n.bit_length() - 6, 1))
    return -(-n // step) * step


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
        dims = [_bucket_lattice_dim(int(d)) for d in dims]
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
    """Particles sorted by bin: the entire acceleration structure.

    ``sorted_positions`` is a tuple of three (N,) component arrays, NOT an
    (N, 3) array: TPU tiling pads a minor dim of 3 to 128 lanes, so row
    gathers from (N, 3) read 512 B per particle (measured ~60 ms at 2M vs
    ~0 for flat per-component gathers).
    """

    order: jax.Array  # (N,) int32: original particle index, bin-sorted
    sorted_bins: jax.Array  # (N,) int32: flat bin id per sorted slot
    sorted_positions: Tuple[jax.Array, jax.Array, jax.Array]  # 3 x (N,)
    bin_of_particle: jax.Array  # (N,) int32: flat bin id per original index


_STENCIL = np.array(
    [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.int32,
)


@functools.partial(jax.jit, static_argnames=("grid", "has_n_valid"))
def build_cell_list(
    positions, grid: BinGrid, n_valid=None, has_n_valid: bool = False
) -> CellList:
    """Sort particles by flat bin id.

    With ``n_valid`` (a traced scalar; pass ``has_n_valid=True``), particles
    at index >= n_valid are count-padding dummies: they get the INT32_MAX
    sentinel bin, sort to the end, and are excluded from every density/
    neighbor structure — crucially they do NOT shift the lattice phase or
    the occupancy statistics (a dummy-extended lattice once re-phased bin
    boundaries onto the fluid's 2r lattice columns and pushed 6% of
    particles through the overflow path).
    """
    positions = jnp.asarray(positions)
    # per-component flat math: ops on a big (N, 3) pad the minor dim to 128
    # TPU lanes, so each component is pulled out once up front
    cols = [positions[:, d] for d in range(3)]
    bs = jnp.asarray(grid.bin_size, positions.dtype)
    dims = grid.dims
    strides = (dims[1] * dims[2], dims[2], 1)
    bins = jnp.zeros(positions.shape[:1], jnp.int32)
    for d in range(3):
        mn = jnp.asarray(grid.min[d], positions.dtype)
        c = jnp.clip(
            jnp.floor((cols[d] - mn) / bs).astype(jnp.int32), 0, dims[d] - 1
        )
        bins = bins + c * strides[d]
    if has_n_valid:
        n = positions.shape[0]
        bins = jnp.where(
            jnp.arange(n, dtype=jnp.int32) < jnp.asarray(n_valid, jnp.int32),
            bins,
            _INT32_MAX,
        )
    order = jnp.argsort(bins).astype(jnp.int32)
    sorted_bins = bins[order]
    return CellList(
        order=order,
        sorted_bins=sorted_bins,
        sorted_positions=tuple(cols[d][order] for d in range(3)),
        bin_of_particle=bins,
    )


def max_bin_occupancy(cell_list: CellList) -> int:
    """Largest particle count in any bin (host sync; sets gather capacity)."""
    return bin_stats(cell_list)[0]


@jax.jit
def _bin_stats_device(sb):
    valid = sb != _INT32_MAX  # sentinel run (count-padding dummies) excluded
    change = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    seg_id = jnp.cumsum(change.astype(jnp.int32)) - 1
    counts = (
        jnp.zeros(sb.shape[0], jnp.int32)
        .at[jnp.where(valid, seg_id, sb.shape[0])]
        .add(1, mode="drop")
    )
    # particles whose within-bin rank is >= 8 (size of the overflow set for
    # the K=8 fast density path)
    over8 = jnp.sum(jnp.maximum(counts - 8, 0))
    n_occupied = seg_id[-1] + 1 - jnp.any(~valid).astype(jnp.int32)
    return jnp.max(counts), n_occupied, over8


def bin_stats(cell_list: CellList):
    """(max occupancy, number of occupied bins) — one host sync."""
    mx, u, _ = jax.device_get(_bin_stats_device(cell_list.sorted_bins))
    return int(mx), int(u)


def bin_stats_ex(cell_list: CellList):
    """(max occupancy, occupied bins, #particles with bin-rank >= 8)."""
    mx, u, o8 = jax.device_get(_bin_stats_device(cell_list.sorted_bins))
    return int(mx), int(u), int(o8)


@functools.partial(jax.jit, static_argnames=("grid", "has_n_valid"))
def _build_cell_list_with_stats(
    positions, grid: BinGrid, n_valid=None, has_n_valid: bool = False
):
    """Cell list + occupancy stats in one dispatch (one host round trip)."""
    cl = build_cell_list(
        positions, grid, n_valid=n_valid, has_n_valid=has_n_valid
    )
    return cl, _bin_stats_device(cl.sorted_bins)


def _stencil_segments(grid: BinGrid, cell_list: CellList, query_bin_ijk):
    """(starts, counts) of the 27 neighbor-bin segments per query.

    query_bin_ijk: (M, 3) int32. Returns starts (M, 27) int32 into the
    sorted particle order and counts (M, 27).

    When the bin lattice is materializable (<= 2^24 bins) the lookup is two
    O(1) gathers from dense start/count tables built with one scatter each;
    ``searchsorted`` over the sorted bins (the fallback for huge lattices)
    lowers to ~21 serial gather rounds on TPU and is latency-bound.
    """
    dims = jnp.asarray(grid.dims, jnp.int32)
    nb = query_bin_ijk[:, None, :] + jnp.asarray(_STENCIL)[None, :, :]  # (M,27,3)
    valid = jnp.all((nb >= 0) & (nb < dims), axis=-1)  # (M,27)
    nb_flat = grid.flatten(jnp.clip(nb, 0, dims - 1))  # (M,27)
    sb = cell_list.sorted_bins
    n = sb.shape[0]
    lattice = grid.dims[0] * grid.dims[1] * grid.dims[2]
    if lattice <= (1 << 24):
        is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
        starts_table = (
            jnp.zeros((lattice,), jnp.int32)
            .at[jnp.where(is_start, sb, lattice)]
            .set(
                jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
            )
        )
        counts_table = jnp.zeros((lattice,), jnp.int32).at[sb].add(
            1, mode="drop"
        )
        starts = starts_table[nb_flat]
        counts = jnp.where(valid, counts_table[nb_flat], 0)
        return starts, counts
    starts = jnp.searchsorted(sb, nb_flat, side="left")
    ends = jnp.searchsorted(sb, nb_flat, side="right")
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
    padded = np.asarray(padded_lists)
    width = padded.shape[1] if padded.ndim == 2 else 0
    mask = np.arange(width)[None, :] < counts[:, None]
    indices = padded[mask].astype(np.int32)  # row-major: preserves order
    return offsets, indices


class NeighborhoodLists(list):
    """Per-particle neighborhood lists (pysplashsurf.pyi:169 parity): a
    list of per-particle neighbor index arrays. ``offsets``/``indices``
    expose the CSR form used by the device pipelines."""

    def get_neighborhood_lists(self):
        return [list(map(int, a)) for a in self]

    @property
    def offsets(self) -> np.ndarray:
        off = np.zeros(len(self) + 1, dtype=np.int64)
        np.cumsum([len(a) for a in self], out=off[1:])
        return off

    @property
    def indices(self) -> np.ndarray:
        if not len(self):
            return np.zeros(0, np.int32)
        return np.concatenate([np.asarray(a) for a in self]).astype(np.int32)

    @staticmethod
    def from_csr(offsets, indices) -> "NeighborhoodLists":
        return NeighborhoodLists(
            indices[offsets[i] : offsets[i + 1]]
            for i in range(len(offsets) - 1)
        )


def neighborhood_search_spatial_hashing_parallel(
    positions, radius=None, max_neighbors: int = 256, search_radius=None
):
    """Ragged neighbor lists for all particles (pysplashsurf parity:
    ``neighborhood_search_spatial_hashing_parallel``). Accepts either
    ``(positions, radius)`` or the reference's
    ``(particle_positions, domain: Aabb3d, search_radius)`` convention.
    Returns a :class:`NeighborhoodLists`; the device computation uses the
    sorted cell binning."""
    from splashsurf_tpu.aabb import Aabb3d

    positions = jnp.asarray(positions)
    if isinstance(radius, Aabb3d) or radius is None:
        domain = radius
        if search_radius is None:
            if isinstance(max_neighbors, (int, np.integer)):
                raise TypeError("search_radius required with a domain AABB")
            search_radius, max_neighbors = max_neighbors, 256
        radius = float(search_radius)
        if domain is not None:
            mn, mx = np.asarray(domain.min), np.asarray(domain.max)
        else:
            mn = np.asarray(jnp.min(positions, axis=0))
            mx = np.asarray(jnp.max(positions, axis=0))
    else:
        mn = np.asarray(jnp.min(positions, axis=0))
        mx = np.asarray(jnp.max(positions, axis=0))
    grid = BinGrid.for_domain(mn, mx, radius)
    cl = build_cell_list(positions, grid)
    capacity = _round_up(max_bin_occupancy(cl))
    lists, counts = neighbor_lists_padded(
        positions, grid, cl, radius, capacity, max_neighbors
    )
    lists, counts = np.asarray(lists), np.asarray(counts)
    return NeighborhoodLists(
        lists[i, : counts[i]] for i in range(len(counts))
    )


@dataclasses.dataclass
class NeighborhoodStats:
    """Neighbor-count statistics (neighborhood_search.rs:604-646 parity)."""

    histogram: np.ndarray  # histogram[k] = number of particles with k neighbors
    particles_with_neighbors: int
    max_neighbors: int
    avg_neighbors: float  # mean over particles with >= 1 neighbor

    def __str__(self) -> str:
        lines = [
            f"Max neighbors: {self.max_neighbors}, avg neighbors: "
            f"{self.avg_neighbors:.3f}, particles with neighbors: "
            f"{self.particles_with_neighbors}",
            "Histogram:",
        ]
        lines += [
            f"{i:2d} neighbors: {int(c):10d}"
            for i, c in enumerate(self.histogram)
        ]
        return "\n".join(lines)


def compute_neighborhood_stats(neighborhood_lists) -> NeighborhoodStats:
    """Histogram + min/max/avg of per-particle neighbor counts.

    Accepts ragged lists (as returned by
    ``neighborhood_search_spatial_hashing_parallel``) or a flat array of
    counts. Mirrors ``compute_neigborhood_stats``
    (neighborhood_search.rs:604-646).
    """
    if isinstance(neighborhood_lists, (list, tuple)):
        counts = np.asarray([len(l) for l in neighborhood_lists], np.int64)
    else:
        counts = np.asarray(neighborhood_lists, np.int64)
    hist = np.bincount(counts) if len(counts) else np.zeros(1, np.int64)
    with_n = int(np.count_nonzero(counts))
    return NeighborhoodStats(
        histogram=hist,
        particles_with_neighbors=with_n,
        max_neighbors=int(counts.max()) if len(counts) else 0,
        avg_neighbors=float(counts.sum() / with_n) if with_n else 0.0,
    )


def neighborhood_search_naive(positions: np.ndarray, radius: float):
    """O(N^2) oracle (neighborhood_search.rs:72-91), host-side."""
    p = np.asarray(positions, dtype=np.float64)
    d2 = np.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1)
    within = (d2 < radius * radius) & ~np.eye(len(p), dtype=bool)
    return [np.nonzero(row)[0] for row in within]


# ---------------------------------------------------------------------------
# per-particle SPH densities
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("grid", "capacity", "u_cap", "overflow_capacity", "candidate_capacity"),
)
def compute_particle_densities_binned(
    positions,
    grid: BinGrid,
    cell_list: CellList,
    compact_support_radius,
    particle_rest_mass,
    capacity: int,
    u_cap: int,
    overflow_capacity: int = 0,
    candidate_capacity: int = 0,
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

    ``capacity`` must be >= the max bin occupancy UNLESS ``overflow_capacity``
    is set: then particles with bin-rank >= capacity are excluded from the
    tables and handled exactly by a compact correction pass (their own rho
    via candidate gathers including the self-term; their contribution to
    table particles via one scatter-add). This keeps the dense pair blocks
    at K=8 — the TPU sublane granule — when a few bins exceed it, instead
    of padding every block to the global max occupancy.
    ``candidate_capacity`` must be >= the true max bin occupancy when
    ``overflow_capacity`` > 0; the number of rank>=capacity particles must
    be <= overflow_capacity (host checks via ``bin_stats_ex``).
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

    # bin tables: positions per (bin rank, slot); dummy = +inf -> W == 0.
    # The sentinel run (count-padding dummies) is excluded: its occ_bins
    # entry is INT32_MAX, unreachable from any stencil target.
    table_ok = (slot < K) & (sb != _INT32_MAX)
    dest = jnp.where(table_ok, bin_rank * K + slot, u_cap * K)
    tables = []
    far = jnp.asarray(kernels.far_fill(dtype), dtype)
    for d in range(3):
        tables.append(
            jnp.full((u_cap * K,), far, dtype)
            .at[dest]
            .set(cell_list.sorted_positions[d], mode="drop", unique_indices=True)
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
    dest_t = jnp.where(table_ok, slot * u_cap + bin_rank, u_cap * K)
    rho_sorted = acc.reshape(-1)[jnp.clip(dest_t, 0, u_cap * K - 1)]
    rho_sorted = jnp.where(table_ok, rho_sorted, 0.0)
    rho = (
        jnp.zeros((n,), dtype)
        .at[cell_list.order]
        .set(rho_sorted, mode="drop", unique_indices=True)
    )

    if overflow_capacity:
        rho = _overflow_correction(
            positions, grid, cell_list, slot, K,
            overflow_capacity, candidate_capacity, h, rho,
        )

    return jnp.asarray(particle_rest_mass, dtype) * rho


def _overflow_correction(
    positions, grid, cell_list, slot, K, OC, candidate_capacity, h, rho
):
    """Exact correction for rank>=K ("overflow") particles (traced helper).

    Overflow particles are absent from the dense tables: their own density
    is recomputed from full candidate gathers (incl. the self-term), and
    their symmetric contribution is scatter-added into table particles.

    Compaction works per overflow *bin* (sources = lattice/segment domain),
    never per particle: a full-N scatter costs ~12 ms at 2M on TPU, and the
    particle-mask formulation needed seven of them for <0.1% of particles.
    """
    p = jnp.asarray(positions)
    dtype = p.dtype
    n = p.shape[0]
    sb = cell_list.sorted_bins
    lattice = grid.dims[0] * grid.dims[1] * grid.dims[2]
    CAP = candidate_capacity

    # dense per-bin segment tables (shared with the stencil lookup via CSE)
    is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    starts_table = (
        jnp.zeros((lattice,), jnp.int32)
        .at[jnp.where(is_start, sb, lattice)]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    counts_table = jnp.zeros((lattice,), jnp.int32).at[sb].add(1, mode="drop")

    # compact overflow BINS (count > K); each holds <= CAP - K overflow slots
    over_bin = counts_table > K
    obin_dest = jnp.where(over_bin, jnp.cumsum(over_bin) - 1, OC)
    lat_ids = jnp.arange(lattice, dtype=jnp.int32)
    obin = (
        jnp.full((OC,), lattice, jnp.int32)
        .at[obin_dest]
        .set(lat_ids, mode="drop", unique_indices=True)
    )
    ob_valid = obin < lattice
    obin_c = jnp.where(ob_valid, obin, 0)
    base = starts_table[obin_c]  # (OC,)
    cnt = jnp.where(ob_valid, counts_table[obin_c], 0)

    # overflow slots: sorted indices base + r for r in [K, min(cnt, CAP));
    # then a second-level compaction over the small (OC, R) grid down to
    # (OC,) actual overflow particles (sources = OC*R, not N)
    R = CAP - K
    rr = jnp.arange(K, CAP, dtype=jnp.int32)[None, :]  # (1, R)
    sidx = base[:, None] + rr  # (OC, R) sorted-order indices
    pvalid = (ob_valid[:, None] & (rr < cnt[:, None])).reshape(-1)
    pdest = jnp.where(pvalid, jnp.cumsum(pvalid) - 1, OC)
    osid = (
        jnp.full((OC,), n, jnp.int32)
        .at[pdest]
        .set(sidx.reshape(-1), mode="drop", unique_indices=True)
    )
    ovalid = osid < n
    osid_c = jnp.where(ovalid, osid, 0)
    opos = [
        jnp.where(
            ovalid, cell_list.sorted_positions[d][osid_c],
            jnp.asarray(kernels.far_fill(dtype), dtype),
        )
        for d in range(3)
    ]  # 3 x (OC,)
    oidx = jnp.where(ovalid, cell_list.order[osid_c], n)  # (OC,)

    # candidate gathers over the full particle set (tables + overflow);
    # empty query slots carry +inf positions — clamp their query point to
    # the grid corner so index math stays in range (mask is False anyway)
    opos3 = jnp.stack(opos, axis=-1)  # (OC, 3) — small, layout is fine
    qpos3 = jnp.where(ovalid[:, None], opos3, jnp.asarray(grid.min, dtype))
    idx, cmask = gather_candidates(qpos3, grid, cell_list, CAP)
    cmask = cmask & ovalid[:, None]
    pcols = [p[:, d] for d in range(3)]  # flat columns once, then flat gathers
    d2o = jnp.zeros(idx.shape, dtype)
    for d in range(3):
        diff = pcols[d][idx] - opos[d][:, None]
        diff = jnp.where(jnp.isfinite(diff), diff, jnp.inf)
        d2o = d2o + diff * diff
    wo = jnp.where(cmask, kernels.cubic_kernel(jnp.sqrt(d2o), h), 0.0)
    # own density: every candidate within support, incl. the self-term
    rho_over = jnp.sum(wo, axis=1)
    # symmetric contribution into table particles only (overflow-vs-
    # overflow pairs are already counted in both rows' own sums); a
    # candidate's within-bin rank IS its stencil slot index — no
    # per-particle rank scatter needed
    slot_within = jnp.tile(
        jnp.arange(CAP, dtype=jnp.int32), 27
    )[None, :]  # (1, 27*CAP)
    to_table = cmask & (slot_within < K)
    rho = rho.at[idx.reshape(-1)].add(
        jnp.where(to_table, wo, 0.0).reshape(-1), mode="drop"
    )
    rho = rho.at[oidx].add(rho_over, mode="drop")
    return rho


def _raster_sweep_xla(rasters, LX, Yp, Zp, bs, h):
    """Dense 27-offset bin sweep over rasterized fracs (XLA formulation).

    ``rasters``: 3 per-component frac arrays of shape (slots, LX+2, Yp, Zp)
    (+inf in empty slots). Returns acc (slots, LX, LY*Zp) — per query-slot
    kernel sums over every source slot of the 27 neighbor bins. Shared by
    the single-device raster path and the sharded x-slab path
    (parallel/density.py), whose bit-identity depends on this exact
    accumulation order.
    """
    slots = rasters[0].shape[0]
    dtype = rasters[0].dtype
    LY = Yp - 2
    W = LY * Zp
    # +2 tail lanes: the widest window (shift 2*Zp+2, width W) ends
    # exactly 2 lanes past Yp*Zp
    flat = [
        jnp.pad(
            r.reshape(slots, LX + 2, Yp * Zp),
            ((0, 0), (0, 0), (0, 2)),
            constant_values=kernels.far_fill(dtype),
        )
        for r in rasters
    ]
    fq = [r[:, 1 : 1 + LX, Zp + 1 : Zp + 1 + W] for r in flat]
    acc = jnp.zeros((slots, LX, W), dtype)
    for o0 in (0, 1, 2):
        for o1 in (0, 1, 2):
            for o2 in (0, 1, 2):
                shift = o1 * Zp + o2
                wins = [
                    flat[d][:, o0 : o0 + LX, shift : shift + W]
                    for d in range(3)
                ]
                # explicit source-slot loop: leading-dim broadcasts of
                # (LX, W) against (slots, LX, W) vectorize far better
                # than the (q, s, LX, W) outer-product blocks XLA built
                # for the fused form
                for kj in range(slots):
                    d2 = jnp.zeros((slots, LX, W), dtype)
                    for d, od in enumerate((o0, o1, o2)):
                        # empty slots: inf fracs -> d2 = inf -> W = 0
                        # exactly; NaNs (inf - inf) only reach empty
                        # *query* slots, which the readback never reads.
                        diff = fq[d] - (
                            wins[d][kj]
                            + jnp.asarray(od - 1, dtype) * bs
                        )[None]
                        d2 = d2 + diff * diff
                    acc = acc + kernels.cubic_kernel(jnp.sqrt(d2), h)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "slots", "overflow_capacity", "candidate_capacity", "backend"
    ),
)
def compute_particle_densities_raster(
    positions,
    grid: BinGrid,
    cell_list: CellList,
    compact_support_radius,
    particle_rest_mass,
    slots: int = 8,
    overflow_capacity: int = 0,
    candidate_capacity: int = 0,
    backend: str | None = None,
):
    """SPH densities via a dense bin-raster sweep (no gathers in the hot loop).

    Particles are rasterized into (slots, LX+2, LY+2, LZ+2) per-component
    bin-fraction arrays over the *whole* bin lattice; every one of the 27
    stencil offsets is then a static shifted window: the pair distance is
    frac_q - (frac_src_window + offset * bin_size), a pure VPU expression.
    This is the density analog of the level-set raster sweep and avoids the
    per-offset row gathers/transposes that dominate the table formulation —
    the right shape for mostly-occupied lattices (dense fluids).

    Requires a lattice small enough to materialize (host wrapper gates it);
    rank>=slots particles go through the exact overflow correction.
    """
    p = jnp.asarray(positions)
    dtype = p.dtype
    h = jnp.asarray(compact_support_radius, dtype)
    n = p.shape[0]
    LX, LY, LZ = grid.dims
    sb = cell_list.sorted_bins
    valid = sb != _INT32_MAX  # count-padding dummies carry the sentinel bin

    # within-bin ranks in sorted order
    is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    run_starts = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(is_start, run_id, n)]
        .set(idx, mode="drop", unique_indices=True)
    )
    slot = idx - run_starts[run_id]

    # rasterize bin fractions, padded by one bin on every side
    Xp, Yp, Zp = LX + 2, LY + 2, LZ + 2
    sbc = jnp.where(valid, sb, 0)
    bx = sbc // (LY * LZ)
    by = (sbc // LZ) % LY
    bz = sbc % LZ
    ok = (slot < slots) & valid
    total = slots * Xp * Yp * Zp
    dest = jnp.where(
        ok,
        ((slot * Xp + bx + 1) * Yp + by + 1) * Zp + (bz + 1),
        total,
    )
    bs = jnp.asarray(grid.bin_size, dtype)
    mn = [jnp.asarray(grid.min[d], dtype) for d in range(3)]
    bcoord = [bx, by, bz]
    rasters = []
    for d in range(3):
        frac = cell_list.sorted_positions[d] - (
            mn[d] + bcoord[d].astype(dtype) * bs
        )
        rasters.append(
            jnp.full((total,), kernels.far_fill(dtype), dtype)
            .at[dest]
            .set(frac, mode="drop", unique_indices=True)
            .reshape(slots, Xp, Yp, Zp)
        )

    # dense 27-offset sweep: acc[si, bin] += sum_sj W(|dq - dsrc|).
    # The (y, z) plane is flattened into the minor (lane) dimension so a
    # (o1, o2) window shift is one contiguous lane slice — keeping LZ as the
    # minor dim would pad it to 128 TPU lanes (a 3.5x waste at typical
    # lattice shapes). Lane overrun past each row's LZ reads pad values
    # (inf -> W = 0), never out of range (Zp + 1 + W <= Yp*Zp).
    acc_flat, width = _sweep_dispatch(
        rasters, slots, LX, Yp, Zp, bs, h, backend, dtype
    )
    src = jnp.where(ok, (slot * LX + bx) * width + by * Zp + bz, 0)

    # read back per particle, undo the sort
    rho_sorted = jnp.where(ok, acc_flat[src], 0.0)
    rho = (
        jnp.zeros((n,), dtype)
        .at[cell_list.order]
        .set(rho_sorted, mode="drop", unique_indices=True)
    )
    if overflow_capacity:
        rho = _overflow_correction(
            positions, grid, cell_list, slot, slots,
            overflow_capacity, candidate_capacity, h, rho,
        )
    return jnp.asarray(particle_rest_mass, dtype) * rho


def _sweep_dispatch(rasters, slots, LX, Yp, Zp, bs, h, backend, dtype):
    """Run the 27-offset bin sweep over frac rasters with the selected
    backend; returns (acc_flat, row_width). A query sitting in
    (slot, bx, by, bz) reads ``acc_flat[(slot*LX+bx)*row_width + by*Zp+bz]``.
    """
    Xp = rasters[0].shape[1]
    W = (Yp - 2) * Zp
    if backend is None:
        # Default ON for TPU since the r4 A/B on the geoslot default path:
        # 2M dense frame 0.499 -> 0.464 s (the XLA sweep round-trips
        # (slots^2, LX, W) blocks through HBM; the Pallas plane sweep keeps
        # them in VMEM). Cost: Mosaic minutes of compile per new bin-lattice
        # shape — lattice dims are bucketed, so animation sequences pay it
        # once; set =0 for compile-sensitive one-off scenes.
        import os

        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("SPLASHSURF_TPU_DENSITY_PALLAS", "1") == "1"
        )
        backend = "pallas" if use_pallas else "xla"
    if backend.startswith("pallas") and dtype == jnp.float32:
        # Pallas plane sweep: lane width rounded to the 128-lane tiling;
        # all intermediates stay in VMEM (the XLA loop below round-trips
        # (slots^2, LX, W) blocks through HBM)
        from splashsurf_tpu.ops.splat_pallas import density_sweep_pallas

        Wout = -(-W // 128) * 128
        if Wout > 5376:
            # Scoped-VMEM gate: the kernel's working set scales with the
            # lane width (~18.4 KB/lane measured — the 10M dam-break's
            # Wout=5888 lattice needed 108.2M against the 100M scoped
            # limit and failed AOT). Wide lattices take the XLA sweep
            # until the kernel is lane-tiled like pair_sweep_pallas.
            backend = "xla"
    if backend.startswith("pallas") and dtype == jnp.float32:
        LANES = -(-(2 * Zp + 2 + Wout) // 128) * 128
        flat = [
            jnp.pad(
                r.reshape(slots, Xp, Yp * Zp),
                ((0, 0), (0, 0), (0, LANES - Yp * Zp)),
                constant_values=jnp.inf,
            )
            for r in rasters
        ]
        acc_p = density_sweep_pallas(
            flat[0], flat[1], flat[2],
            bin_size=bs,
            compact_support_radius=h,
            slots=slots, LX=LX, Zp=Zp, Wout=Wout,
            interpret=(backend == "pallas_interpret"),
        )
        sigma = 8.0 / (h * h * h)
        return (acc_p[:, :LX, :] * sigma).reshape(-1), Wout
    acc = _raster_sweep_xla(rasters, LX, Yp, Zp, bs, h)
    return acc.reshape(-1), W


@functools.partial(jax.jit, static_argnames=("has_n_valid",))
def _octant_phase(positions, period, n_valid=None, has_n_valid: bool = False):
    """Per-axis circular mean of ``x mod period``: the dominant particle
    phase, used to center half-bin octants on the particle lattice."""
    p = jnp.asarray(positions)
    dtype = p.dtype
    s = jnp.asarray(period, dtype)
    if has_n_valid:
        m = (
            jnp.arange(p.shape[0], dtype=jnp.int32)
            < jnp.asarray(n_valid, jnp.int32)
        )
    else:
        m = jnp.ones(p.shape[:1], bool)
    phis = []
    for d in range(3):
        x = p[:, d]
        frac = x - s * jnp.floor(x / s)
        ang = frac * (2.0 * np.pi) / s
        c = jnp.sum(jnp.where(m, jnp.cos(ang), 0.0))
        sn = jnp.sum(jnp.where(m, jnp.sin(ang), 0.0))
        phis.append(jnp.arctan2(sn, c) / (2.0 * np.pi) * s)
    return jnp.stack(phis)


def _phase_aligned_bingrid(
    aabb_min, aabb_max, bin_size: float, phases
) -> BinGrid:
    """BinGrid whose half-bin octant CENTERS sit on the dominant particle
    phase per axis (phases from :func:`_octant_phase`), so near-rest fluids
    land one particle per octant regardless of where their AABB falls.
    Same coverage contract as ``BinGrid.for_domain`` (>= one bin margin)."""
    s = float(bin_size) / 2.0
    mn = np.asarray(aabb_min, np.float64) - bin_size
    mx = np.asarray(aabb_max, np.float64) + bin_size
    # Quantize the phase estimate to s/4096: single-device and sharded
    # reductions sum in different orders, so raw phases differ in ulps —
    # quantization makes both sides construct the IDENTICAL lattice (the
    # estimate only needs ~s/4 accuracy).
    q = s / 4096.0
    phases = np.round(np.asarray(phases, np.float64) / q) * q
    o = phases - s / 2.0
    k = np.ceil((o - mn) / s)
    origin = o - k * s  # largest octant-phase-aligned origin <= mn
    dims = np.maximum(np.ceil((mx - origin) / bin_size).astype(np.int64), 1)
    dims = [_bucket_lattice_dim(int(d)) for d in dims]
    total = int(dims[0]) * int(dims[1]) * int(dims[2])
    if total >= 2**31:
        raise ValueError(f"bin lattice too large: {tuple(dims)}")
    return BinGrid(
        min=tuple(origin.tolist()),
        bin_size=float(bin_size),
        dims=tuple(int(d) for d in dims),
    )


@functools.partial(
    jax.jit, static_argnames=("grid", "has_n_valid", "backend")
)
def compute_particle_densities_geoslot(
    positions,
    grid: BinGrid,
    compact_support_radius,
    particle_rest_mass,
    n_valid=None,
    has_n_valid: bool = False,
    backend: str | None = None,
):
    """Sort-free SPH densities: slots from half-bin OCTANTS, not sorted
    ranks.

    The raster formulation needs a (slot, bin) address per particle; the
    sorted path derives ``slot`` from the within-bin rank, paying a full-N
    argsort + gathers + an unsort scatter per frame. At near-rest spacing
    (the common reconstruction input; bin = compact support = 2 rest
    spacings) each particle sits alone in its half-bin octant, so
    ``slot = octant index`` is a pure per-particle expression and the whole
    table build is two scatters. Octant collisions are DETECTED (one
    scatter-add + gather) and invalidate the frame via the returned check —
    the caller re-plans through the sorted path, so compressed fluids
    simply never enter this program (plans only select it after a
    zero-collision planning frame).

    Returns ``(rho, ok)``; ``rho`` is only valid when ``ok`` is True.
    Reference analog: the same density loops as the sorted raster path
    (dense_subdomains.rs:849-1133) — this is an addressing change, not a
    formulation change.
    """
    p = jnp.asarray(positions)
    dtype = p.dtype
    h = jnp.asarray(compact_support_radius, dtype)
    n = p.shape[0]
    LX, LY, LZ = grid.dims
    Xp, Yp, Zp = LX + 2, LY + 2, LZ + 2
    bs = jnp.asarray(grid.bin_size, dtype)
    half = bs * jnp.asarray(0.5, dtype)
    cols = [p[:, d] for d in range(3)]
    idx = jnp.arange(n, dtype=jnp.int32)
    if has_n_valid:
        valid = idx < jnp.asarray(n_valid, jnp.int32)
    else:
        valid = jnp.ones((n,), bool)

    bcoord, frac, oct_bits = [], [], []
    in_lattice = jnp.asarray(True)
    for d, dim in enumerate((LX, LY, LZ)):
        mn = jnp.asarray(grid.min[d], dtype)
        raw = jnp.floor((cols[d] - mn) / bs).astype(jnp.int32)
        in_lattice = in_lattice & ~jnp.any(
            valid & ((raw < 0) | (raw >= dim))
        )
        c = jnp.clip(raw, 0, dim - 1)
        f = cols[d] - (mn + c.astype(dtype) * bs)
        bcoord.append(c)
        frac.append(f)
        oct_bits.append((f >= half).astype(jnp.int32))
    bx, by, bz = bcoord
    slot = (oct_bits[0] << 2) | (oct_bits[1] << 1) | oct_bits[2]

    total = 8 * Xp * Yp * Zp
    dest = jnp.where(
        valid,
        ((slot * Xp + bx + 1) * Yp + by + 1) * Zp + (bz + 1),
        total,
    )
    counts = jnp.zeros((total,), jnp.int32).at[dest].add(1, mode="drop")
    # Collision detect on the TABLE side (one VPU reduction over the slot
    # table, ~56 MB at 900 GB/s) instead of a per-particle count gather
    # (~13 ms at 2M — a full scatter-equivalent row pass). On accepted
    # frames every valid particle's slot count is exactly 1, so masking the
    # frac scatters by ``valid`` alone is bit-identical to the old
    # ``cme == 1`` mask; on COLLISION frames the frac scatters see
    # duplicate destinations (unique_indices becomes a lie -> unspecified
    # slot values), but the frame is discarded via ``no_collision`` (which
    # depends only on ``counts``, so the flag itself stays deterministic).
    no_collision = ~jnp.any(counts > 1)
    ok = valid

    rdest = jnp.where(ok, dest, total)
    if (
        os.environ.get("SPLASHSURF_TPU_PACK_SCATTER", "0") == "1"
        and dtype == jnp.float32
    ):
        # Scatter cost is per update row (~6 ms/M rows at 2M): pack two
        # frac components into one complex scatter (real/imag extraction is
        # exact, so results stay bit-identical). 3 scatters -> 2. f32-only:
        # the TPU X64 rewriter cannot rewrite complex128 HLOs.
        cdt = jnp.complex64
        packed = (
            jnp.full((total,), complex(np.inf, np.inf), cdt)
            .at[rdest]
            .set(
                jax.lax.complex(frac[0], frac[1]),
                mode="drop",
                unique_indices=True,
            )
            .reshape(8, Xp, Yp, Zp)
        )
        rasters = [
            jnp.real(packed),
            jnp.imag(packed),
            jnp.full((total,), jnp.inf, dtype)
            .at[rdest]
            .set(frac[2], mode="drop", unique_indices=True)
            .reshape(8, Xp, Yp, Zp),
        ]
    else:
        rasters = [
            jnp.full((total,), kernels.far_fill(dtype), dtype)
            .at[rdest]
            .set(frac[d], mode="drop", unique_indices=True)
            .reshape(8, Xp, Yp, Zp)
            for d in range(3)
        ]
    acc_flat, width = _sweep_dispatch(
        rasters, 8, LX, Yp, Zp, bs, h, backend, dtype
    )
    src = jnp.where(ok, (slot * LX + bx) * width + by * Zp + bz, 0)
    rho = jnp.where(ok, acc_flat[src], 0.0)
    return (
        jnp.asarray(particle_rest_mass, dtype) * rho,
        in_lattice & no_collision,
    )


# Speculative per-frame plan: an animation sequence reuses the previous
# frame's bin lattice and capacities, turning the two mid-frame host round
# trips (AABB pull, occupancy-stats pull) into one deferred validity flag
# pulled with the final mesh. The reference's workspace reuse
# (workspace.rs:12-79) is the moral analog.
_DENSITY_PLAN: dict = {}


class DensityPlanMiss(RuntimeError):
    """A speculative density plan was violated; clear and recompute."""


def clear_density_plan():
    _DENSITY_PLAN.clear()


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "kind", "slots", "u_cap", "ocap", "ccap", "has_n_valid"
    ),
)
def _plan_check(
    positions, sb, grid: BinGrid, kind: str, slots: int, u_cap: int,
    ocap: int, ccap: int = 0, n_valid=None, has_n_valid: bool = False,
):
    """Device-side validity of a speculative plan: positions inside the
    lattice (no bin clipping) and capacities still sufficient."""
    p = jnp.asarray(positions)
    if has_n_valid:
        m = (
            jnp.arange(p.shape[0], dtype=jnp.int32)
            < jnp.asarray(n_valid, jnp.int32)
        )[:, None]
        lo = jnp.min(jnp.where(m, p, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(m, p, -jnp.inf), axis=0)
    else:
        lo = jnp.min(p, axis=0)
        hi = jnp.max(p, axis=0)
    gmin = jnp.asarray(grid.min, p.dtype)
    gmax = gmin + jnp.asarray(grid.dims, p.dtype) * jnp.asarray(
        grid.bin_size, p.dtype
    )
    ok = jnp.all(lo >= gmin) & jnp.all(hi < gmax)
    mx, u, o8 = _bin_stats_device(sb)
    ok = ok & (u <= u_cap)
    if kind in ("raster", "binned8"):
        # the overflow path truncates candidates/bin at ccap — drifting
        # past either capacity must miss the plan, not corrupt sums
        ok = ok & (
            (mx <= slots)
            | ((ocap > 0) & (o8 <= ocap) & (mx <= max(ccap, slots)))
        )
    else:  # binned with K = slots >= max occupancy
        ok = ok & (mx <= slots)
    return ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "kind", "slots", "u_cap", "ocap", "ccap", "has_n_valid"
    ),
)
def _densities_planned(
    positions,
    compact_support_radius,
    particle_rest_mass,
    grid: BinGrid,
    kind: str,
    slots: int,
    u_cap: int,
    ocap: int,
    ccap: int,
    n_valid=None,
    has_n_valid: bool = False,
):
    """Speculative-hit density frame in ONE dispatch: cell list + plan
    validity + densities, sharing the sort and segment passes. The
    ``geoslot`` kind skips the sort entirely (its validity check — octant
    uniqueness — is computed inside the same program)."""
    if kind == "geoslot":
        return compute_particle_densities_geoslot(
            positions, grid, compact_support_radius, particle_rest_mass,
            n_valid=n_valid, has_n_valid=has_n_valid,
        )
    cl = build_cell_list(
        positions, grid, n_valid=n_valid, has_n_valid=has_n_valid
    )
    check = _plan_check(
        positions, cl.sorted_bins, grid,
        kind=kind, slots=slots, u_cap=u_cap, ocap=ocap, ccap=ccap,
        n_valid=n_valid, has_n_valid=has_n_valid,
    )
    if kind == "raster":
        rho = compute_particle_densities_raster(
            positions, grid, cl, compact_support_radius,
            particle_rest_mass, slots=slots,
            overflow_capacity=ocap, candidate_capacity=ccap,
        )
    else:
        rho = compute_particle_densities_binned(
            positions, grid, cl, compact_support_radius,
            particle_rest_mass, slots, u_cap,
            overflow_capacity=ocap, candidate_capacity=ccap,
        )
    return rho, check


def compute_particle_densities(
    positions,
    compact_support_radius: float,
    particle_rest_mass: float,
    capacity: int | None = None,
    speculate: bool = False,
    n_valid: int | None = None,
):
    """Convenience wrapper: builds the binning and picks capacities on host.

    With ``speculate=True``, returns ``(rho, check)`` where ``check`` is a
    device boolean (or None on the planning frame) that the caller must
    verify before trusting ``rho`` — raise-and-retry via
    :func:`clear_density_plan` on False.
    """
    positions = jnp.asarray(positions)
    key = (
        positions.shape[0],
        str(positions.dtype),
        float(compact_support_radius),
        None if capacity is None else int(capacity),
        None if n_valid is None else int(n_valid),
    )
    has_nv = n_valid is not None and n_valid < positions.shape[0]
    nv = jnp.asarray(0 if n_valid is None else n_valid, jnp.int32)
    plan = _DENSITY_PLAN.get(key) if speculate else None
    if plan is not None:
        return _densities_planned(
            positions, compact_support_radius, particle_rest_mass,
            plan["grid"], kind=plan["kind"], slots=plan["slots"],
            u_cap=plan["u_cap"], ocap=plan["ocap"], ccap=plan["ccap"],
            n_valid=nv, has_n_valid=has_nv,
        )

    if has_nv:
        # count-padding dummies must not shape the lattice (a dummy-shifted
        # origin once re-phased bins onto the fluid's 2r columns at 8M and
        # pushed 6% of particles through the overflow path)
        m = (
            jnp.arange(positions.shape[0], dtype=jnp.int32) < nv
        )[:, None]
        mn, mx = jax.device_get(
            (
                jnp.min(jnp.where(m, positions, jnp.inf), axis=0),
                jnp.max(jnp.where(m, positions, -jnp.inf), axis=0),
            )
        )
    else:
        mn, mx = jax.device_get(
            (jnp.min(positions, axis=0), jnp.max(positions, axis=0))
        )
    grid = BinGrid.for_domain(mn, mx, compact_support_radius)
    cl, stats = _build_cell_list_with_stats(
        positions, grid, n_valid=nv, has_n_valid=has_nv
    )
    max_occ, n_bins, over8 = (int(x) for x in jax.device_get(stats))
    n = positions.shape[0]
    over_budget = density_over_budget(n)

    if capacity is None and density_phase_retry(n, over8):
        # Lattice-phase landmine: a fluid resting on a 2r lattice (half the
        # bin size) tie-breaks onto bin boundaries for unlucky origins —
        # occupancy jumps from 8 to 12+ per bin and the fast K=8 paths
        # collapse to K=max_occ pair blocks. Retry once with the origin
        # shifted by half a bin; keep whichever phase overflows less.
        grid2 = phase_shifted_bingrid(grid, compact_support_radius)
        cl2, stats2 = _build_cell_list_with_stats(
            positions, grid2, n_valid=nv, has_n_valid=has_nv
        )
        mx2, nb2, o82 = (int(x) for x in jax.device_get(stats2))
        if o82 < over8:
            grid, cl = grid2, cl2
            max_occ, n_bins, over8 = mx2, nb2, o82

    u_cap = 1 << max(int(n_bins) - 1, 1).bit_length()
    overflow_capacity = 0
    candidate_capacity = 0

    # Dense bin lattices (the common dense-fluid case) take the raster-sweep
    # formulation: shifted windows instead of per-offset row gathers.
    lattice = grid.dims[0] * grid.dims[1] * grid.dims[2]
    gate = (
        density_gate(n, lattice, n_bins, max_occ, over8, which="single")
        if capacity is None
        else dict(try_geoslot=False, use_raster=False, ocap=0, ccap=0)
    )

    if gate["try_geoslot"]:
        # Sort-free fast path: valid only when every particle owns its
        # half-bin octant of a lattice PHASE-ALIGNED to the particle
        # structure (an arbitrary AABB phase straddles octant boundaries
        # even at rest spacing). The planning frame validates the octant
        # check synchronously (one scalar pull) before recording the plan;
        # warm frames re-validate through the deferred check.
        phases = jax.device_get(
            _octant_phase(
                positions, compact_support_radius / 2.0,
                n_valid=nv, has_n_valid=has_nv,
            )
        )
        agrid = _phase_aligned_bingrid(mn, mx, compact_support_radius, phases)
        alat = agrid.dims[0] * agrid.dims[1] * agrid.dims[2]
        if alat > GATE_LATTICE_MAX:
            # phase-aligned lattice bucketed past the gate: skip the attempt
            # (the sharded wrapper applies the same guard — keep in sync)
            ok_g = False
        else:
            rho_g, ok_g = compute_particle_densities_geoslot(
                positions, agrid, compact_support_radius, particle_rest_mass,
                n_valid=nv, has_n_valid=has_nv,
            )
            ok_g = bool(jax.device_get(ok_g))
            _note_geoslot_outcome(ok_g)
        if ok_g:
            if speculate:
                _DENSITY_PLAN[key] = dict(
                    grid=agrid, kind="geoslot", slots=8, u_cap=u_cap,
                    ocap=0, ccap=0,
                )
                return rho_g, None
            return rho_g
        # collisions: fall through to the sorted formulations

    if gate["use_raster"]:
        overflow_capacity = gate["ocap"]
        candidate_capacity = gate["ccap"]
        rho = compute_particle_densities_raster(
            positions,
            grid,
            cl,
            compact_support_radius,
            particle_rest_mass,
            slots=8,
            overflow_capacity=overflow_capacity,
            candidate_capacity=candidate_capacity,
        )
        if speculate:
            _DENSITY_PLAN[key] = dict(
                grid=grid, kind="raster", slots=8, u_cap=u_cap,
                ocap=overflow_capacity, ccap=candidate_capacity,
            )
            return rho, None
        return rho

    kind = "binned"
    if capacity is None:
        if max_occ <= 8:
            capacity = 8
            kind = "binned8"
        elif over8 <= over_budget and lattice <= (1 << 24):
            # K=8 fast path: the few rank>=8 particles go through the exact
            # overflow correction instead of padding every pair block (its
            # per-bin compaction needs a materializable lattice)
            capacity = 8
            kind = "binned8"
            overflow_capacity = _round_up(max(2 * over8, 256), 256)
            candidate_capacity = _round_up(max_occ + 8)
        else:
            capacity = _round_up(max_occ)
    elif capacity < max_occ:
        # an insufficient explicit capacity would silently truncate sums
        capacity = _round_up(max_occ)
    rho = compute_particle_densities_binned(
        positions,
        grid,
        cl,
        compact_support_radius,
        particle_rest_mass,
        capacity,
        u_cap,
        overflow_capacity=overflow_capacity,
        candidate_capacity=candidate_capacity,
    )
    if speculate:
        _DENSITY_PLAN[key] = dict(
            grid=grid, kind=kind, slots=capacity, u_cap=u_cap,
            ocap=overflow_capacity, ccap=candidate_capacity,
        )
        return rho, None
    return rho


def _round_up(n: int, m: int = 8) -> int:
    return ((max(int(n), 1) + m - 1) // m) * m


# --- density-formulation gate (single source of truth) ----------------------
#
# Both compute_particle_densities (above) and the sharded
# parallel.density.compute_particle_densities_sharded consume THESE decisions;
# the sharded subdomain pipeline's bit-identity contract depends on both
# paths picking the same formulation on the same scene, so the selection
# logic must never be duplicated (it diverges silently otherwise).

# Largest materializable bin lattice for the raster/geoslot formulations.
GATE_LATTICE_MAX = 8_000_000

# Diagnostic: the last decision taken by each wrapper ("single"/"sharded"),
# for tests asserting the two paths agree near the gate boundaries.
LAST_GATE: dict = {}


def density_over_budget(n: int) -> int:
    """Overflow-correction budget: past this many rank>=8 particles the K=8
    fast paths stop paying off and occupancy-K pair blocks win."""
    return max(4096, int(n) // 128)


def density_phase_retry(n: int, over8: int) -> bool:
    """Whether to retry binning with the origin shifted by half a bin
    (the lattice-phase landmine: fluids resting on a 2r lattice tie-break
    onto bin boundaries for unlucky origins)."""
    return over8 > density_over_budget(n)


def phase_shifted_bingrid(grid: BinGrid, compact_support_radius: float) -> BinGrid:
    """The half-bin-shifted retry lattice for :func:`density_phase_retry`."""
    half = compact_support_radius / 2.0
    return BinGrid(
        min=tuple(m - half for m in grid.min),
        bin_size=grid.bin_size,
        dims=tuple(_bucket_lattice_dim(d + 1) for d in grid.dims),
    )


def density_gate(
    n: int, lattice: int, n_bins: int, max_occ: int, over8: int,
    which: str = "single",
):
    """Pick the density formulation for a scene's binning statistics.

    Returns a dict with:
      try_geoslot: attempt the sort-free octant path (still subject to the
        per-frame octant-collision check — a True here is not a commitment);
      use_raster: dense raster-sweep formulation (with the K=8 overflow
        correction capacities ``ocap``/``ccap`` when max_occ > 8);
      otherwise the caller falls back to the binned formulations.
    """
    import os

    over_budget = density_over_budget(n)
    dense_enough = lattice <= GATE_LATTICE_MAX and n_bins >= lattice // 4
    try_geoslot = (
        dense_enough
        and os.environ.get("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1") == "1"
        and _geoslot_wanted()
    )
    use_raster = dense_enough and (max_occ <= 8 or over8 <= over_budget)
    ocap = ccap = 0
    if use_raster and max_occ > 8:
        # headroom so frame-to-frame occupancy drift keeps the plan valid;
        # 256-step bucketing keeps the correction's pair block small
        ocap = _round_up(max(2 * over8, 256), 256)
        ccap = _round_up(max_occ + 8)
    decision = dict(
        try_geoslot=try_geoslot,
        use_raster=use_raster,
        ocap=ocap,
        ccap=ccap,
        over_budget=over_budget,
    )
    LAST_GATE[which] = dict(
        decision,
        n=n, lattice=lattice, n_bins=n_bins, max_occ=max_occ, over8=over8,
    )
    return decision


# Geoslot hysteresis: scenes that keep colliding (compressed fluids) pay the
# full failed attempt (octant program + device round trip) every planning
# frame before falling back to the sorted paths. After
# _GEOSLOT_MAX_CONSECUTIVE_MISSES consecutive collisions the wrapper stops
# attempting geoslot for the rest of the process (a success resets the
# counter). State is process-global — sequences switch scenes rarely, and a
# false negative only costs the sorted path's speed, never correctness.
_GEOSLOT_MISSES = [0]
_GEOSLOT_MAX_CONSECUTIVE_MISSES = 3


def _geoslot_wanted() -> bool:
    return _GEOSLOT_MISSES[0] < _GEOSLOT_MAX_CONSECUTIVE_MISSES


def _note_geoslot_outcome(ok: bool) -> None:
    _GEOSLOT_MISSES[0] = 0 if ok else _GEOSLOT_MISSES[0] + 1


def reset_geoslot_hysteresis() -> None:
    _GEOSLOT_MISSES[0] = 0
