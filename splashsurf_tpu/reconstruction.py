"""Surface reconstruction orchestration.

Host-side driver that mirrors the public API of the reference
(``reconstruct_surface`` / ``SurfaceReconstruction``, lib.rs:330-473 and
reconstruction.rs:17-194) while dispatching to fully vectorized device
pipelines: a single dense global grid for small domains and the
subdomain-batched pipeline for large ones.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from splashsurf_tpu.aabb import Aabb3d
from splashsurf_tpu.mesh import TriMesh3d
from splashsurf_tpu.params import Parameters, SpatialDecomposition
from splashsurf_tpu.uniform_grid import UniformGrid, kernel_extents


@dataclasses.dataclass
class SurfaceReconstruction:
    """Result of a surface reconstruction (lib.rs:246-277)."""

    grid: UniformGrid
    mesh: TriMesh3d
    subdomain_grid: Optional[UniformGrid] = None
    particle_densities: Optional[np.ndarray] = None
    particle_neighbors: Optional[tuple] = None  # CSR: (offsets, neighbors)
    particle_inside_aabb: Optional[np.ndarray] = None


def grid_for_reconstruction(
    particle_positions,
    particle_radius: float,
    compact_support_radius: float,
    cube_size: float,
    particle_aabb: Optional[Aabb3d] = None,
) -> UniformGrid:
    """Construct the implicit background grid for marching cubes (lib.rs:476-516).

    The particle AABB is grown by the particle radius plus the kernel
    evaluation radius so every particle's kernel support lies inside the
    domain, guaranteeing closed surfaces.
    """
    if particle_aabb is None:
        aabb = Aabb3d.from_points(particle_positions)
        aabb = aabb.grow_uniformly(particle_radius)
    else:
        aabb = particle_aabb
    margin = kernel_extents(compact_support_radius, cube_size).kernel_evaluation_radius
    aabb = aabb.grow_uniformly(margin)
    return UniformGrid.from_aabb(aabb, cube_size)


def _global_dense_max_cells() -> int:
    """Largest grid (in cells) routed to the dense global pipeline.

    ~40 bytes/cell peak (slot rasters + level set + MC masks); the default
    48M cells ≈ 2 GB comfortably fits a single v5e/v5p chip's HBM.
    """
    import os

    return int(os.environ.get("SPLASHSURF_TPU_GLOBAL_DENSE_MAX_CELLS", 48_000_000))


def reconstruct_surface(particle_positions, parameters: Parameters) -> SurfaceReconstruction:
    """Reconstruct a closed triangle mesh of the fluid surface.

    Dispatches between the global dense pipeline and the subdomain-grid
    pipeline depending on ``parameters.spatial_decomposition`` and the
    auto-disable heuristic (lib.rs:422-443).
    """
    import jax

    # Device arrays stay on device end to end (a frame fed from a previous
    # device computation must not bounce through host memory).
    on_device = isinstance(particle_positions, jax.Array)
    if on_device:
        if particle_positions.dtype != parameters.np_dtype:
            particle_positions = particle_positions.astype(parameters.np_dtype)
    else:
        particle_positions = np.ascontiguousarray(
            np.asarray(particle_positions), dtype=parameters.np_dtype
        )
    if particle_positions.ndim != 2 or particle_positions.shape[1] != 3:
        raise ValueError(
            f"particle positions must have shape (N, 3), got {particle_positions.shape}"
        )
    if particle_positions.shape[0] == 0:
        raise ValueError("cannot reconstruct a surface from zero particles")

    inside_aabb = None
    if parameters.particle_aabb is not None:
        mask = np.asarray(parameters.particle_aabb.contains_points(particle_positions))
        inside_aabb = mask
        particle_positions = particle_positions[mask]

    grid = grid_for_reconstruction(
        particle_positions,
        parameters.particle_radius,
        parameters.compact_support_radius,
        parameters.cube_size,
        parameters.particle_aabb,
    )

    # Bucket the particle count so animation sequences with varying N reuse
    # compiled programs (remote TPU compiles cost minutes). Padding dummies
    # form a compact block at ordinary particle spacing just outside the
    # grid: they occupy no subdomain, contribute exactly W=0 to every real
    # particle/grid point (>= 3 support radii away), and keep the density
    # bin lattice small (a support-spaced block would inflate the lattice —
    # and the dense density sweep — by an order of magnitude).
    n_real = len(particle_positions)
    granularity = 1 << max(n_real.bit_length() - 3, 6)
    n_padded = -(-n_real // granularity) * granularity
    if n_padded > n_real:
        pad = n_padded - n_real
        support = parameters.compact_support_radius
        # 0.51 support: at most 2 dummies per axis land in any
        # support-sized density bin (8 per bin), and never 3 — an exact
        # half-bin lattice would tie-break on float rounding into 27/bin,
        # forcing thousands of particles through the overflow path.
        spacing = 0.51 * support
        side = int(np.ceil(pad ** (1.0 / 3.0)))
        ii = np.arange(pad)
        cube = np.stack(
            [ii // (side * side), (ii // side) % side, ii % side], axis=1
        ).astype(particle_positions.dtype)
        # Offset along -x only, flush with the grid corner in y/z: the
        # density bin lattice spans the union box of real+dummy particles,
        # so a diagonal offset would inflate it in every dimension.
        start = np.asarray(grid.min, dtype=particle_positions.dtype).copy()
        start[0] -= 4.0 * support + side * spacing
        dummies = start + cube * spacing
        if on_device:
            import jax.numpy as jnp

            particle_positions = jnp.concatenate(
                [particle_positions, jnp.asarray(dummies)], axis=0
            )
        else:
            particle_positions = np.concatenate(
                [particle_positions, dummies], axis=0
            )

    decomposition = parameters.spatial_decomposition
    if decomposition == SpatialDecomposition.UNIFORM_GRID:
        n_sub = parameters.grid_decomposition.subdomain_num_cubes_per_dim
        if parameters.grid_decomposition.auto_disable:
            # Auto-disable decomposition if the domain is hardly larger than a
            # single subdomain (lib.rs:422-443).
            max_cells = max(grid.n_cells)
            if max_cells <= 1.2 * n_sub:
                decomposition = SpatialDecomposition.NONE
            elif grid.total_cells <= _global_dense_max_cells():
                # TPU dispatch: when the whole background grid fits in HBM,
                # the dense global raster sweep beats the decomposition
                # pipeline outright (no pair expansion/sort, no halo, no
                # stitching). Decomposition remains the scalable path for
                # sparse/huge domains (dense_subdomains.rs rationale).
                decomposition = SpatialDecomposition.NONE

    if decomposition == SpatialDecomposition.UNIFORM_GRID:
        from splashsurf_tpu.subdomains import reconstruct_surface_subdomain_grid

        rec = reconstruct_surface_subdomain_grid(
            particle_positions, parameters, grid, particle_inside_aabb=inside_aabb
        )
    else:
        if grid.total_cells > 128_000_000:
            raise ValueError(
                f"global reconstruction would materialize a dense "
                f"{grid.n_cells} grid ({grid.total_cells} cells); use "
                f"SpatialDecomposition.UNIFORM_GRID for domains this large"
            )
        from splashsurf_tpu.global_pipeline import reconstruct_surface_global

        rec = reconstruct_surface_global(
            particle_positions, parameters, grid, particle_inside_aabb=inside_aabb
        )

    # Trim count-padding dummies out of per-particle outputs.
    if n_padded > n_real:
        if rec.particle_densities is not None:
            rec.particle_densities = rec.particle_densities[:n_real]
        if rec.particle_neighbors is not None:
            offsets, indices = rec.particle_neighbors
            rec.particle_neighbors = (
                offsets[: n_real + 1],
                indices[: offsets[n_real]],
            )
    return rec
