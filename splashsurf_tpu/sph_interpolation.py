"""SPH interpolation of particle quantities to arbitrary points.

Replaces the reference's R-tree-accelerated interpolator
(splashsurf_lib/src/sph_interpolation.rs:14-290) with the same sorted cell
binning used everywhere else: queries stream over the 27-bin stencil with a
scan, so peak memory is O(M * bin_capacity).

Semantics mirror the reference exactly:
  - normals: normalized SPH gradient of the indicator (density) field,
    sum_j vol_j * (dx/r) * dW/dr  with dx = x_j - x_i (rs:94-121)
  - quantities: sum_j vol_j * W_ij * A_j, optionally Shepard-corrected by
    1 / sum_j vol_j W_ij (rs:205-258)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import kernels
from splashsurf_tpu.neighbors import BinGrid, CellList, build_cell_list, max_bin_occupancy, _STENCIL, _round_up


class SphInterpolator:
    """Interpolates fluid quantities to arbitrary points (rs:58-74)."""

    def __init__(
        self,
        particle_positions,
        particle_densities,
        particle_rest_mass: float,
        compact_support_radius: float,
    ):
        self.positions = jnp.asarray(particle_positions)
        rho = jnp.asarray(particle_densities)
        assert self.positions.shape[0] == rho.shape[0]
        self.volumes = jnp.asarray(particle_rest_mass, rho.dtype) / rho
        self.compact_support_radius = float(compact_support_radius)
        mn = np.asarray(jnp.min(self.positions, axis=0))
        mx = np.asarray(jnp.max(self.positions, axis=0))
        self.grid = BinGrid.for_domain(mn, mx, self.compact_support_radius)
        self.cell_list = build_cell_list(self.positions, self.grid)
        self.capacity = _round_up(max_bin_occupancy(self.cell_list))

    def size(self) -> int:
        return int(self.positions.shape[0])

    # -- public API (mirrors SphInterpolator) --------------------------------

    def interpolate_normals(self, points) -> np.ndarray:
        out = _interpolate_normals(
            jnp.asarray(points),
            self.positions,
            self.volumes,
            self.grid,
            self.cell_list,
            self.compact_support_radius,
            self.capacity,
        )
        return np.asarray(out)

    def interpolate_scalar_quantity(
        self, particle_quantity, points, first_order_correction: bool = False
    ) -> np.ndarray:
        q = jnp.asarray(particle_quantity)[:, None]
        out = _interpolate_quantity(
            jnp.asarray(points),
            self.positions,
            self.volumes,
            q,
            self.grid,
            self.cell_list,
            self.compact_support_radius,
            self.capacity,
            first_order_correction,
        )
        return np.asarray(out[:, 0])

    def interpolate_vector_quantity(
        self, particle_quantity, points, first_order_correction: bool = False
    ) -> np.ndarray:
        out = _interpolate_quantity(
            jnp.asarray(points),
            self.positions,
            self.volumes,
            jnp.asarray(particle_quantity),
            self.grid,
            self.cell_list,
            self.compact_support_radius,
            self.capacity,
            first_order_correction,
        )
        return np.asarray(out)


def _stencil_scan(points, positions, grid, cell_list, capacity, step_fn, init):
    """Scan helper: for each stencil offset, gather (M, K) candidates and
    call step_fn(carry, cand_pos (M,K,3), cand_idx (M,K), mask) -> carry."""
    qb = grid.bin_ijk(points)
    dims = jnp.asarray(grid.dims, jnp.int32)
    n = positions.shape[0]
    slot = jnp.arange(capacity, dtype=jnp.int32)

    def body(carry, offset):
        nb = qb + offset[None, :]
        valid = jnp.all((nb >= 0) & (nb < dims), axis=-1)
        nb_flat = grid.flatten(jnp.clip(nb, 0, dims - 1))
        starts = jnp.searchsorted(cell_list.sorted_bins, nb_flat, side="left")
        ends = jnp.searchsorted(cell_list.sorted_bins, nb_flat, side="right")
        counts = jnp.where(valid, (ends - starts).astype(jnp.int32), 0)
        gpos = jnp.clip(
            starts.astype(jnp.int32)[:, None] + slot[None, :], 0, max(n - 1, 0)
        )
        cand_pos = cell_list.sorted_positions[gpos]
        cand_idx = cell_list.order[gpos]
        mask = slot[None, :] < counts[:, None]
        return step_fn(carry, cand_pos, cand_idx, mask), None

    carry, _ = jax.lax.scan(body, init, jnp.asarray(_STENCIL))
    return carry


@functools.partial(jax.jit, static_argnames=("grid", "capacity"))
def _interpolate_normals(
    points, positions, volumes, grid: BinGrid, cell_list: CellList, support, capacity
):
    points = jnp.asarray(points)
    h = jnp.asarray(support, points.dtype)

    def step(acc, cand_pos, cand_idx, mask):
        dx = cand_pos - points[:, None, :]  # x_j - x_i
        r = jnp.linalg.norm(dx, axis=-1)
        safe_r = jnp.where(r > 0, r, 1.0)
        gnorm = kernels.cubic_kernel_gradient_norm(r, h)
        vol = volumes[cand_idx]
        contrib = dx / safe_r[..., None] * (gnorm * vol)[..., None]
        contrib = jnp.where((mask & (r > 0) & (r < h))[..., None], contrib, 0)
        return acc + jnp.sum(contrib, axis=1)

    grad = _stencil_scan(
        points, positions, grid, cell_list, capacity, step, jnp.zeros_like(points)
    )
    norm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    return grad / jnp.where(norm > 0, norm, 1.0)


@functools.partial(
    jax.jit, static_argnames=("grid", "capacity", "first_order_correction")
)
def _interpolate_quantity(
    points,
    positions,
    volumes,
    quantity,  # (N, D)
    grid: BinGrid,
    cell_list: CellList,
    support,
    capacity,
    first_order_correction: bool,
):
    points = jnp.asarray(points)
    h = jnp.asarray(support, points.dtype)
    D = quantity.shape[1]

    def step(carry, cand_pos, cand_idx, mask):
        acc, corr = carry
        dx = cand_pos - points[:, None, :]
        r = jnp.linalg.norm(dx, axis=-1)
        w = kernels.cubic_kernel(r, h)
        vol_w = jnp.where(mask & (r < h), volumes[cand_idx] * w, 0)
        acc = acc + jnp.sum(vol_w[..., None] * quantity[cand_idx], axis=1)
        corr = corr + jnp.sum(vol_w, axis=1)
        return (acc, corr)

    acc, corr = _stencil_scan(
        points,
        positions,
        grid,
        cell_list,
        capacity,
        step,
        (
            jnp.zeros((points.shape[0], D), points.dtype),
            jnp.zeros((points.shape[0],), points.dtype),
        ),
    )
    if first_order_correction:
        factor = jnp.where(corr > 0, 1.0 / jnp.where(corr > 0, corr, 1.0), 1.0)
        acc = acc * factor[:, None]
    return acc


def compute_weighted_neighbor_counts(
    positions, compact_support_radius: float
) -> np.ndarray:
    """Distance-weighted neighbor counts, the smoothing-weight ingredient
    (splashsurf/src/reconstruct.rs:1190-1206):
    sum_j (1 - clamp(r^2/R^2, 0, 1)) over neighbors j != i."""
    positions = jnp.asarray(positions)
    mn = np.asarray(jnp.min(positions, axis=0))
    mx = np.asarray(jnp.max(positions, axis=0))
    grid = BinGrid.for_domain(mn, mx, compact_support_radius)
    cl = build_cell_list(positions, grid)
    capacity = _round_up(max_bin_occupancy(cl))
    return np.asarray(
        _weighted_ncounts(positions, grid, cl, compact_support_radius, capacity)
    )


@functools.partial(jax.jit, static_argnames=("grid", "capacity"))
def _weighted_ncounts(positions, grid: BinGrid, cl: CellList, support, capacity):
    p = jnp.asarray(positions)
    r2 = jnp.asarray(support, p.dtype) ** 2
    n = p.shape[0]

    def step(acc, cand_pos, cand_idx, mask):
        d2 = jnp.sum((cand_pos - p[:, None, :]) ** 2, axis=-1)
        wc = 1.0 - jnp.clip(d2 / r2, 0.0, 1.0)
        not_self = cand_idx != jnp.arange(n, dtype=jnp.int32)[:, None]
        # a neighbor is j with r < support (weight at r >= support is 0 anyway)
        return acc + jnp.sum(jnp.where(mask & not_self, wc, 0), axis=1)

    return _stencil_scan(
        p, p, grid, cl, capacity, step, jnp.zeros((n,), p.dtype)
    )


def smooth_step(x):
    """6x^5 - 15x^4 + 10x^3 smooth-step (reconstruct.rs:1227-1233)."""
    x = np.clip(np.asarray(x), 0.0, 1.0)
    return x**3 * (10.0 + x * (-15.0 + 6.0 * x))
