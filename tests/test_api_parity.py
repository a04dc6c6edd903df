"""pysplashsurf API-surface parity (pysplashsurf.pyi as the contract)."""

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.aabb import Aabb3d


@pytest.fixture(scope="module")
def cloud():
    return np.random.default_rng(0).uniform(0, 1, (1500, 3)).astype(
        np.float32
    )


class TestPyiSurface:
    def test_top_level_names(self):
        for name in [
            "barnacle_decimation", "check_mesh_consistency",
            "convert_tris_to_quads", "laplacian_smoothing_parallel",
            "laplacian_smoothing_normals_parallel", "marching_cubes",
            "marching_cubes_cleanup",
            "neighborhood_search_spatial_hashing_parallel",
            "reconstruct_surface", "reconstruction_pipeline",
            "run_splashsurf", "Aabb3d", "MeshAttribute", "MeshType",
            "MeshWithData", "MixedTriQuadMesh3d", "NeighborhoodLists",
            "SphInterpolator", "SurfaceReconstruction", "TriMesh3d",
            "UniformGrid", "VertexVertexConnectivity",
        ]:
            assert hasattr(st, name), name

    def test_neighborhood_lists_type(self, cloud):
        nl = st.neighborhood_search_spatial_hashing_parallel(cloud, 0.1)
        assert isinstance(nl, st.NeighborhoodLists)
        assert len(nl) == len(cloud)
        assert isinstance(nl[0], np.ndarray)
        lists = nl.get_neighborhood_lists()
        assert isinstance(lists[0], list)
        off, idx = nl.offsets, nl.indices
        assert off.shape == (len(cloud) + 1,) and off[-1] == len(idx)

    def test_neighborhood_domain_convention(self, cloud):
        """Reference convention: (positions, domain: Aabb3d, search_radius)."""
        nl1 = st.neighborhood_search_spatial_hashing_parallel(cloud, 0.1)
        nl2 = st.neighborhood_search_spatial_hashing_parallel(
            cloud, Aabb3d.from_points(cloud), 0.1
        )
        assert len(nl1) == len(nl2)
        for a, b in zip(nl1, nl2):
            assert (np.sort(a) == np.sort(b)).all()

    def test_mesh_type_and_connectivity(self, cloud):
        p = st.Parameters.new_relative(0.025, 4.0, 1.1)
        rec = st.reconstruct_surface(cloud[:400] * 0.02, p)
        mesh = rec.mesh
        assert np.allclose(
            mesh.vertex_normals_parallel(), mesh.vertex_normals()
        )
        vv = mesh.vertex_vertex_connectivity()
        assert isinstance(vv, st.VertexVertexConnectivity)
        copied = vv.copy_connectivity()
        assert isinstance(copied[0], list) and len(copied) == len(vv)
        taken = vv.take_connectivity()
        assert len(taken) == len(copied) and len(vv) == 0
        mwd = st.MeshWithData(mesh=mesh)
        assert mwd.mesh_type == st.MeshType.Tri3d

    def test_interpolate_quantity_dispatch(self, cloud):
        pts = cloud[:400] * 0.02
        p = st.Parameters.new_relative(0.025, 4.0, 1.1)
        rec = st.reconstruct_surface(pts, p)
        rho = np.asarray(rec.particle_densities)
        si = st.SphInterpolator(
            pts, rho, p.particle_rest_mass, p.compact_support_radius
        )
        q = np.asarray(rec.mesh.vertices)[:8]
        s = si.interpolate_quantity(rho, q)
        v = si.interpolate_quantity(np.tile(rho[:, None], (1, 3)), q)
        assert s.shape == (8,) and v.shape == (8, 3)
        np.testing.assert_allclose(v[:, 0], s, rtol=1e-6)

    def test_reconstruction_carries_neighborhood_lists(self, cloud):
        p = st.Parameters.new_relative(
            0.025, 4.0, 1.1, global_neighborhood_list=True
        )
        rec = st.reconstruct_surface(cloud[:400] * 0.02, p)
        assert isinstance(rec.particle_neighbors, st.NeighborhoodLists)
        assert len(rec.particle_neighbors) == 400

    def test_thin_method_parity(self, cloud, tmp_path):
        pts = cloud[:400] * 0.02
        p = st.Parameters.new_relative(0.025, 4.0, 1.1)
        rec = st.reconstruct_surface(pts, p)
        m = rec.mesh
        assert m.nvertices() == m.num_vertices
        m2 = m.copy()
        m2.vertices[0] += 1.0
        assert not np.allclose(np.asarray(m.vertices)[0], m2.vertices[0])
        m.write_to_file(tmp_path / "m.vtk")
        assert (tmp_path / "m.vtk").stat().st_size > 0
        a = st.Aabb3d.from_min_max([0, 0, 0], [1, 2, 3])
        assert a.max == (1.0, 2.0, 3.0)
        g = rec.grid
        assert g.ncells_per_dim() == list(g.n_cells)
        assert g.npoints_per_dim() == list(g.n_points)
        mwd = st.MeshWithData(mesh=m)
        mwd.add_point_attribute("t", np.zeros(m.num_vertices, np.float32))
        mwd.add_cell_attribute(
            "c", np.arange(len(np.asarray(m.triangles)), dtype=np.int32)
        )
        with pytest.raises(ValueError):
            mwd.add_point_attribute("bad", np.zeros(3))
        with pytest.raises(ValueError):
            mwd.add_cell_attribute("bad", np.zeros(3))
        cp = mwd.copy()
        cp.point_attributes[0].data[0] = 7
        assert mwd.point_attributes[0].data[0] == 0
        assert isinstance(mwd.copy_mesh(), st.TriMesh3d)
        mwd.write_to_file(tmp_path / "mwd.vtu")
        assert (tmp_path / "mwd.vtu").stat().st_size > 0
        q = st.MixedTriQuadMesh3d(
            np.zeros((4, 3), np.float32),
            np.array([[0, 1, 2]]),
            np.array([[0, 1, 2, 3]]),
        )
        assert q.get_triangles().dtype == np.uint64
        assert q.get_quads().shape == (1, 4)
        assert q.nvertices() == 4
        assert q.copy().vertices is not q.vertices
