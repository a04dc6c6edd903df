"""Accuracy oracles for the BASELINE north star (vertices to 1e-4).

Two oracles, mirroring the reference's strongest numeric tests:

1. Analytic sphere SDF at the reference's exact resolution
   (pysplashsurf/tests/test_sdf.py:5-41): every reconstructed vertex lies
   within 1e-4 of the unit sphere, in f32 and f64.
2. Cross-path equality: the global dense pipeline and the subdomain-grid
   pipeline are independent implementations sharing only the grid
   definition; in f64 their meshes must agree to ~machine precision on
   real particle fixtures (far inside the 1e-4 budget). The reference
   lists this cross-check as a TODO (splashsurf_lib tests/test_full.rs:11).
"""

import dataclasses

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu import mc
from splashsurf_tpu.global_pipeline import reconstruct_surface_global
from splashsurf_tpu.io.vtk import particles_from_vtk
from splashsurf_tpu.mesh import check_mesh_consistency
from splashsurf_tpu.params import (
    GridDecompositionParameters,
    SpatialDecomposition,
)
from splashsurf_tpu.reconstruction import grid_for_reconstruction
from splashsurf_tpu.subdomains import reconstruct_surface_subdomain_grid


class TestSphereSdf1e4:
    """pysplashsurf test_sdf parity: 100^3 points over a 2.2-wide box."""

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_sphere_vertices_within_1e4(self, dtype):
        radius = 1.0
        num_verts = 100
        grid_size = radius * 2.2
        dx = grid_size / (num_verts - 1)
        translation = -0.5 * grid_size
        coords = np.arange(num_verts, dtype=dtype) * dx + translation
        X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
        # inside > iso convention: density-like field
        values = radius - np.sqrt(X**2 + Y**2 + Z**2)
        mesh = mc.marching_cubes(values.astype(dtype), 0.0, dx, (translation,) * 3)
        assert mesh.num_vertices > 0
        norms = np.linalg.norm(mesh.vertices, axis=1)
        assert norms.min() > radius - 1e-4
        assert norms.max() < radius + 1e-4
        assert check_mesh_consistency(mesh.vertices, mesh.triangles) is None


FIXTURES = [
    "cube_2366_particles.vtk",
    "double_dam_break_frame_26_4732_particles.vtk",
    "bunny_frame_14_7705_particles.vtk",
]


class TestCrossPathF64:
    @pytest.mark.parametrize("fixture", FIXTURES)
    def test_global_equals_subdomain_f64(self, data_dir, fixture):
        from scipy.spatial import cKDTree

        pts, _ = particles_from_vtk(f"{data_dir}/{fixture}")
        pts = np.asarray(pts, dtype=np.float64)
        p = st.Parameters.new_relative(
            0.025,
            4.0,
            1.1,
            spatial_decomposition=SpatialDecomposition.UNIFORM_GRID,
            grid_decomposition=GridDecompositionParameters(32, auto_disable=False),
        )
        p = p.try_convert("float64")
        grid = grid_for_reconstruction(
            pts, p.particle_radius, p.compact_support_radius, p.cube_size
        )
        rec_s = reconstruct_surface_subdomain_grid(pts, p, grid, sharded=False)
        rec_g = reconstruct_surface_global(pts, p, grid)
        assert rec_s.mesh.num_vertices == rec_g.mesh.num_vertices
        assert rec_s.mesh.num_triangles == rec_g.mesh.num_triangles
        d, _ = cKDTree(rec_g.mesh.vertices).query(rec_s.mesh.vertices)
        # independent implementations agree to f64 roundoff — and a fortiori
        # to the 1e-4 north-star budget
        assert d.max() < 1e-9, f"max vertex deviation {d.max()}"
        assert d.max() < 1e-4
        assert (
            check_mesh_consistency(rec_s.mesh.vertices, rec_s.mesh.triangles)
            is None
        )
