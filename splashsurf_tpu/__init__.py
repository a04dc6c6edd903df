"""splashsurf_tpu — TPU-native surface reconstruction of SPH particle data.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`InteractiveComputerGraphics/splashsurf` (reference: splashsurf_lib): given
particle positions plus particle radius / kernel support radius / marching
cubes cell size, produce a closed triangle mesh of the fluid surface, with
optional post-processing (weighted Laplacian smoothing, SPH-gradient normals,
attribute interpolation, mesh cleanup/decimation, tri->quad conversion).

Architecture (TPU-first, not a port):
  - sort-based cell binning + masked stencil gathers instead of spatial
    hashmaps (reference: neighborhood_search.rs),
  - dense per-cell particle rasters + static spherical stencil offsets for
    the SPH density splat instead of per-particle scatter loops
    (reference: dense_subdomains.rs density_grid_loop_*),
  - fully vectorized marching cubes with a programmatically generated case
    table and cumsum stream compaction (reference: marching_cubes/),
  - a subdomain batch axis mapped onto the TPU device mesh via shard_map
    instead of a Rayon task queue (reference: reconstruction.rs).
"""

from splashsurf_tpu.params import (
    Parameters,
    GridDecompositionParameters,
    SpatialDecomposition,
)
from splashsurf_tpu.aabb import Aabb3d
from splashsurf_tpu.uniform_grid import UniformGrid, kernel_extents
from splashsurf_tpu import kernels
from splashsurf_tpu.mesh import TriMesh3d, MeshWithData, MeshAttribute
from splashsurf_tpu.reconstruction import (
    reconstruct_surface,
    SurfaceReconstruction,
    grid_for_reconstruction,
)

__version__ = "0.1.0"

__all__ = [
    "Parameters",
    "GridDecompositionParameters",
    "SpatialDecomposition",
    "Aabb3d",
    "UniformGrid",
    "kernel_extents",
    "kernels",
    "TriMesh3d",
    "MeshWithData",
    "MeshAttribute",
    "reconstruct_surface",
    "SurfaceReconstruction",
    "grid_for_reconstruction",
]
