"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

Guards the driver's multi-chip dry run (`__graft_entry__.dryrun_multichip`)
and the sharded reconstruction path (reference analog: Rayon task
parallelism over subdomains, dense_subdomains.rs:521-526; here the
subdomain batch axis is sharded over a jax device mesh).
"""

import jax
import numpy as np
import pytest

from splashsurf_tpu.parallel.mesh import sharded_reconstruction_demo


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_reconstruction_demo_8dev():
    info = sharded_reconstruction_demo(8)
    assert info["devices"] == 8
    assert info["subdomains"] > 8
    assert info["triangles"] > 0
    assert info["vertices"] > 0


def test_dryrun_multichip_entry():
    # The driver's exact call; must be green without env preparation.
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedProductionPath:
    """The production pipeline sharded over the device mesh must reproduce
    the single-device result (bit-identical on the raster splat path)."""

    @pytest.fixture(scope="class")
    def scene(self, data_dir):
        import splashsurf_tpu as st
        from splashsurf_tpu.io.vtk import particles_from_vtk
        from splashsurf_tpu.params import (
            GridDecompositionParameters,
            SpatialDecomposition,
        )
        from splashsurf_tpu.reconstruction import grid_for_reconstruction

        pts, _ = particles_from_vtk(f"{data_dir}/cube_2366_particles.vtk")
        pts = np.asarray(pts)
        p = st.Parameters.new_relative(
            0.025,
            4.0,
            1.0,
            spatial_decomposition=SpatialDecomposition.UNIFORM_GRID,
            grid_decomposition=GridDecompositionParameters(16, auto_disable=False),
        )
        grid = grid_for_reconstruction(pts, 0.025, 0.1, 0.025)
        return pts, p, grid

    def test_raster_path_bit_identical(self, scene):
        from splashsurf_tpu.subdomains import reconstruct_surface_subdomain_grid

        pts, p, grid = scene
        r1 = reconstruct_surface_subdomain_grid(
            pts, p, grid, sharded=False, raster_threshold=0
        )
        rn = reconstruct_surface_subdomain_grid(
            pts, p, grid, sharded=True, raster_threshold=0
        )
        assert np.array_equal(r1.mesh.vertices, rn.mesh.vertices)
        t1 = np.sort(np.sort(r1.mesh.triangles, axis=1), axis=0)
        tn = np.sort(np.sort(rn.mesh.triangles, axis=1), axis=0)
        assert np.array_equal(t1, tn)

    def test_scatter_path_topology_and_tolerance(self, scene):
        # scatter-add association order varies with the local program shape;
        # topology must match exactly, positions to float32 roundoff
        from splashsurf_tpu.mesh import check_mesh_consistency
        from splashsurf_tpu.subdomains import reconstruct_surface_subdomain_grid

        pts, p, grid = scene
        r1 = reconstruct_surface_subdomain_grid(pts, p, grid, sharded=False)
        rn = reconstruct_surface_subdomain_grid(pts, p, grid, sharded=True)
        assert r1.mesh.num_vertices == rn.mesh.num_vertices
        assert r1.mesh.num_triangles == rn.mesh.num_triangles
        np.testing.assert_allclose(
            r1.mesh.vertices, rn.mesh.vertices, atol=1e-6
        )
        assert check_mesh_consistency(rn.mesh.vertices, rn.mesh.triangles) is None
