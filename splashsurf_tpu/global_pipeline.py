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
    from splashsurf_tpu.ops.global_sweep import reconstruct_global_dense
    from splashsurf_tpu.profiling import profile
    from splashsurf_tpu.uniform_grid import kernel_extents

    positions = jnp.asarray(positions)
    hsc = kernel_extents(
        parameters.compact_support_radius, grid.cell_size
    ).half_supported_cells

    # Densities run under a speculative frame plan (previous frame's bin
    # lattice + capacities); its validity flag is pulled together with the
    # final mesh totals, and a miss recomputes the frame from scratch.
    for _attempt in range(2):
        with profile("compute particle densities"):
            rho, check = neighbors.compute_particle_densities(
                positions,
                parameters.compact_support_radius,
                parameters.particle_rest_mass,
                speculate=True,
            )
        values = jnp.asarray(parameters.particle_rest_mass, rho.dtype) / rho
        try:
            verts, tris = reconstruct_global_dense(
                positions,
                values,
                grid,
                parameters.compact_support_radius,
                hsc,
                parameters.iso_surface_threshold,
                deferred_checks=() if check is None else (check,),
            )
            break
        except neighbors.DensityPlanMiss:
            neighbors.clear_density_plan()
    mesh = TriMesh3d(vertices=verts, triangles=tris)

    particle_neighbors = None
    if parameters.global_neighborhood_list:
        lists = neighbors.neighborhood_search_spatial_hashing_parallel(
            positions, parameters.compact_support_radius
        )
        particle_neighbors = _lists_to_csr(lists)

    return SurfaceReconstruction(
        grid=grid,
        mesh=mesh,
        particle_densities=rho,  # device array; pulled lazily by consumers
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
