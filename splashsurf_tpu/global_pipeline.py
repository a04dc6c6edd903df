"""Global (single dense grid) reconstruction pipeline.

The analog of the reference's global path (reconstruction.rs:65-194):
densities -> level set on the full background grid -> marching cubes. Only
viable when the whole grid fits in memory; the subdomain pipeline is the
scalable path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import density as density_mod
from splashsurf_tpu import mc
from splashsurf_tpu import neighbors
from splashsurf_tpu.mesh import TriMesh3d
from splashsurf_tpu.params import Parameters
from splashsurf_tpu.reconstruction import SurfaceReconstruction
from splashsurf_tpu.uniform_grid import UniformGrid


def compute_densities(positions, parameters: Parameters):
    """Per-particle SPH densities via the sort-based cell binning."""
    return neighbors.compute_particle_densities(
        positions,
        parameters.compact_support_radius,
        parameters.particle_rest_mass,
    )


def reconstruct_surface_global(
    positions,
    parameters: Parameters,
    grid: UniformGrid,
    particle_inside_aabb: Optional[np.ndarray] = None,
) -> SurfaceReconstruction:
    positions = jnp.asarray(positions)

    # 1. per-particle densities (self-contribution included)
    rho = compute_densities(positions, parameters)

    # 2. level set splat onto the dense background grid
    values = jnp.asarray(parameters.particle_rest_mass, rho.dtype) / rho
    levelset = density_mod.splat_level_set_auto(
        positions, values, grid, parameters.compact_support_radius
    )

    # 3. marching cubes (exact-size host wrapper)
    mesh = mc.marching_cubes(
        levelset,
        parameters.iso_surface_threshold,
        grid.cell_size,
        grid.min,
    )

    particle_neighbors = None
    if parameters.global_neighborhood_list:
        lists = neighbors.neighborhood_search_spatial_hashing_parallel(
            positions, parameters.compact_support_radius
        )
        particle_neighbors = _lists_to_csr(lists)

    return SurfaceReconstruction(
        grid=grid,
        mesh=mesh,
        particle_densities=np.asarray(rho),
        particle_neighbors=particle_neighbors,
        particle_inside_aabb=particle_inside_aabb,
    )


def _lists_to_csr(lists):
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=offsets[1:])
    indices = (
        np.concatenate(lists) if lists else np.zeros(0, np.int32)
    ).astype(np.int32)
    return offsets, indices
