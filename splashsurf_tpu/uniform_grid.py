"""Implicit uniform cartesian cube grid.

The grid is *virtual*: a pure coordinate/topology calculator with no storage
(reference: splashsurf_lib/src/uniform_grid.rs:132-1165). Grid dimensions are
host-side Python ints so they can serve as static shapes for jitted array
programs; coordinate/index math is vectorized and jittable.

Index flattening follows the reference convention ``i*ny*nz + j*nz + k``
(uniform_grid.rs:342-411) so intermediate results can be compared 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from splashsurf_tpu.aabb import Aabb3d


@dataclasses.dataclass(frozen=True)
class KernelExtents:
    """Grid extents affected by a particle's kernel support.

    Mirrors ``compute_kernel_evaluation_radius`` (density_map.rs:551-580):
    ``half_supported_cells`` = ceil(support/cube); the kernel evaluation
    radius is slightly padded so that grid points exactly on the support
    boundary are treated consistently.
    """

    half_supported_cells: int
    supported_points: int
    kernel_evaluation_radius: float


def kernel_extents(
    compact_support_radius: float, cube_size: float, dtype=np.float32
) -> KernelExtents:
    assert compact_support_radius >= 0.0
    assert cube_size > 0.0
    half_supported_cells_real = math.ceil(compact_support_radius / cube_size)
    half_supported_cells = int(half_supported_cells_real)
    supported_cells = 2 * half_supported_cells + 1
    supported_points = supported_cells + 1
    eps = float(np.sqrt(np.finfo(np.dtype(dtype)).eps))
    kernel_evaluation_radius = cube_size * half_supported_cells_real * (1.0 + eps)
    return KernelExtents(
        half_supported_cells=half_supported_cells,
        supported_points=supported_points,
        kernel_evaluation_radius=float(kernel_evaluation_radius),
    )


@dataclasses.dataclass(frozen=True)
class UniformGrid:
    """Implicit uniform cube grid: AABB min + cell size + cell counts.

    ``n_cells`` cells per dimension implies ``n_cells + 1`` points per
    dimension. Hashable/frozen so it can be a static argument under jit.
    """

    min: Tuple[float, float, float]
    cell_size: float
    n_cells: Tuple[int, int, int]

    def __post_init__(self):
        object.__setattr__(self, "min", tuple(float(x) for x in self.min))
        object.__setattr__(self, "cell_size", float(self.cell_size))
        object.__setattr__(self, "n_cells", tuple(int(x) for x in self.n_cells))

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_aabb(aabb: Aabb3d, cell_size: float) -> "UniformGrid":
        """Grid enclosing ``aabb``, min aligned down to integer multiples of
        ``cell_size`` for frame-to-frame coherent grids (uniform_grid.rs:188-194)."""
        if not cell_size > 0.0:
            raise ValueError(f"invalid cell size {cell_size}")
        if aabb.is_degenerate() or not aabb.is_consistent():
            raise ValueError(f"degenerate or inconsistent AABB: {aabb}")
        aligned_min = np.floor(aabb.mins / cell_size) * cell_size
        n_cells = np.ceil((aabb.maxs - aligned_min) / cell_size).astype(np.int64)
        n_cells = np.maximum(n_cells, 1)
        return UniformGrid(
            min=tuple(aligned_min.tolist()),
            cell_size=cell_size,
            n_cells=tuple(int(c) for c in n_cells),
        )

    # -- basic queries ---------------------------------------------------------

    @property
    def n_points(self) -> Tuple[int, int, int]:
        return tuple(c + 1 for c in self.n_cells)

    def ncells_per_dim(self) -> list:
        """pysplashsurf.pyi parity: cells per dimension as a list."""
        return list(self.n_cells)

    def npoints_per_dim(self) -> list:
        """pysplashsurf.pyi:295 parity: points per dimension as a list."""
        return list(self.n_points)

    @property
    def total_cells(self) -> int:
        nx, ny, nz = self.n_cells
        return nx * ny * nz

    @property
    def total_points(self) -> int:
        nx, ny, nz = self.n_points
        return nx * ny * nz

    def aabb(self) -> Aabb3d:
        mx = tuple(m + c * self.cell_size for m, c in zip(self.min, self.n_cells))
        return Aabb3d(self.min, mx)

    # -- coordinate math (jittable) ---------------------------------------------

    def point_coordinates(self, ijk, dtype=jnp.float32):
        """Coordinates of grid point(s) ijk: (..., 3) int -> (..., 3) float."""
        ijk = jnp.asarray(ijk)
        mn = jnp.asarray(self.min, dtype=dtype)
        return mn + ijk.astype(dtype) * jnp.asarray(self.cell_size, dtype=dtype)

    def enclosing_cell(self, x):
        """Cell index containing position(s) x: (..., 3) float -> (..., 3) int32.

        May return out-of-range indices for points outside the grid (the
        reference relies on this for ghost particles,
        dense_subdomains.rs:667-668).
        """
        x = jnp.asarray(x)
        mn = jnp.asarray(self.min, dtype=x.dtype)
        cs = jnp.asarray(self.cell_size, dtype=x.dtype)
        return jnp.floor((x - mn) / cs).astype(jnp.int32)

    # -- index flattening ----------------------------------------------------------

    def flatten_point_index(self, ijk):
        ijk = jnp.asarray(ijk)
        _, ny, nz = self.n_points
        return (ijk[..., 0] * (ny * nz) + ijk[..., 1] * nz + ijk[..., 2]).astype(
            ijk.dtype
        )

    def flatten_cell_index(self, ijk):
        ijk = jnp.asarray(ijk)
        _, ny, nz = self.n_cells
        return (ijk[..., 0] * (ny * nz) + ijk[..., 1] * nz + ijk[..., 2]).astype(
            ijk.dtype
        )

    def unflatten_point_index(self, flat):
        flat = jnp.asarray(flat)
        _, ny, nz = self.n_points
        i = flat // (ny * nz)
        j = (flat // nz) % ny
        k = flat % nz
        return jnp.stack([i, j, k], axis=-1)

    def unflatten_cell_index(self, flat):
        flat = jnp.asarray(flat)
        _, ny, nz = self.n_cells
        i = flat // (ny * nz)
        j = (flat // nz) % ny
        k = flat % nz
        return jnp.stack([i, j, k], axis=-1)

    # -- validity / boundary predicates -----------------------------------------

    def point_in_grid(self, ijk):
        ijk = jnp.asarray(ijk)
        npts = jnp.asarray(self.n_points)
        return jnp.all((ijk >= 0) & (ijk < npts), axis=-1)

    def cell_in_grid(self, ijk):
        ijk = jnp.asarray(ijk)
        ncells = jnp.asarray(self.n_cells)
        return jnp.all((ijk >= 0) & (ijk < ncells), axis=-1)

    def is_boundary_point(self, ijk):
        ijk = jnp.asarray(ijk)
        npts = jnp.asarray(self.n_points)
        return jnp.any((ijk == 0) | (ijk == npts - 1), axis=-1)

    def is_boundary_cell(self, ijk):
        ijk = jnp.asarray(ijk)
        ncells = jnp.asarray(self.n_cells)
        return jnp.any((ijk == 0) | (ijk == ncells - 1), axis=-1)
