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
from splashsurf_tpu.mesh import (
    TriMesh3d,
    MixedTriQuadMesh3d,
    MeshWithData,
    MeshAttribute,
    check_mesh_consistency,
)
from splashsurf_tpu.reconstruction import (
    reconstruct_surface,
    reconstruct_sequence,
    SurfaceReconstruction,
    grid_for_reconstruction,
)


# ---------------------------------------------------------------------------
# pysplashsurf-parity function surface (pysplashsurf/src/lib.rs:29-79): the
# full Python API a pysplashsurf user expects, re-exported at top level.
# ---------------------------------------------------------------------------

def __getattr__(name):
    # Lazy imports keep `import splashsurf_tpu` light.
    if name == "reconstruction_pipeline":
        from splashsurf_tpu.pipeline import reconstruction_pipeline

        return reconstruction_pipeline
    if name == "PostprocessingParameters":
        from splashsurf_tpu.pipeline import PostprocessingParameters

        return PostprocessingParameters
    if name == "marching_cubes":
        from splashsurf_tpu.mc import marching_cubes

        return marching_cubes
    if name == "marching_cubes_cleanup":
        from splashsurf_tpu.postprocess import marching_cubes_cleanup

        return marching_cubes_cleanup
    if name in ("marching_cubes_cleanup_with_data", "decimation_with_data"):
        from splashsurf_tpu import postprocess as _pp

        return getattr(_pp, name)
    if name == "convert_tris_to_quads":
        from splashsurf_tpu.postprocess import convert_tris_to_quads

        return convert_tris_to_quads
    if name == "barnacle_decimation":
        from splashsurf_tpu.postprocess import decimation

        return decimation
    if name == "laplacian_smoothing_parallel":
        from splashsurf_tpu.postprocess import laplacian_smoothing

        return laplacian_smoothing
    if name == "laplacian_smoothing_normals_parallel":
        from splashsurf_tpu.postprocess import laplacian_smoothing_normals

        return laplacian_smoothing_normals
    if name == "neighborhood_search_spatial_hashing_parallel":
        from splashsurf_tpu.neighbors import (
            neighborhood_search_spatial_hashing_parallel,
        )

        return neighborhood_search_spatial_hashing_parallel
    if name in (
        "compute_neighborhood_stats", "NeighborhoodStats",
        "NeighborhoodLists",
    ):
        from splashsurf_tpu import neighbors as _nb

        return getattr(_nb, name)
    if name in ("MeshType", "VertexVertexConnectivity"):
        from splashsurf_tpu import mesh as _mesh

        return getattr(_mesh, name)
    if name == "SphInterpolator":
        from splashsurf_tpu.sph_interpolation import SphInterpolator

        return SphInterpolator
    if name == "run_splashsurf":
        from splashsurf_tpu.cli import run_splashsurf

        return run_splashsurf
    if name in ("io", "mesh", "profiling", "postprocess", "pipeline", "mc",
                "neighbors", "density", "subdomains", "sph_interpolation",
                "sequence", "parallel", "cli", "studio"):
        import importlib

        return importlib.import_module(f"splashsurf_tpu.{name}")
    raise AttributeError(f"module 'splashsurf_tpu' has no attribute {name!r}")


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
    "MixedTriQuadMesh3d",
    "MeshWithData",
    "MeshAttribute",
    "check_mesh_consistency",
    "reconstruct_surface",
    "reconstruct_sequence",
    "SurfaceReconstruction",
    "grid_for_reconstruction",
    "reconstruction_pipeline",
    "PostprocessingParameters",
    "marching_cubes",
    "marching_cubes_cleanup",
    "marching_cubes_cleanup_with_data",
    "decimation_with_data",
    "convert_tris_to_quads",
    "barnacle_decimation",
    "laplacian_smoothing_parallel",
    "laplacian_smoothing_normals_parallel",
    "neighborhood_search_spatial_hashing_parallel",
    "compute_neighborhood_stats",
    "NeighborhoodStats",
    "NeighborhoodLists",
    "MeshType",
    "VertexVertexConnectivity",
    "SphInterpolator",
    "run_splashsurf",
]
