"""Post-processing tests: Laplacian smoothing, half-edge collapse, MC
cleanup, barnacle decimation, tri->quad, SPH interpolation, smoothing
weights (mirrors test_mesh.rs half-edge invariants + pipeline behavior)."""

import numpy as np
import pytest

from splashsurf_tpu import mc, postprocess
from splashsurf_tpu.halfedge import HalfEdgeTriMesh, IllegalCollapse
from splashsurf_tpu.mesh import TriMesh3d, check_mesh_consistency, vertex_normals
from splashsurf_tpu.sph_interpolation import (
    SphInterpolator,
    compute_weighted_neighbor_counts,
    smooth_step,
)


def _sphere_mesh(n=41):
    coords = np.linspace(-1.5, 1.5, n)
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    values = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)
    return mc.marching_cubes(
        values.astype(np.float32), 0.0, coords[1] - coords[0], (-1.5,) * 3
    )


def _icosphere():
    """Load the reference icosphere fixture."""
    from splashsurf_tpu.io import mesh_from_file

    return mesh_from_file("/root/reference/data/icosphere.obj")


class TestLaplacianSmoothing:
    def test_smoothing_shrinks_sphere(self):
        mesh = _sphere_mesh()
        w = np.ones(mesh.num_vertices, np.float32)
        smoothed = postprocess.laplacian_smoothing(
            mesh.vertices, mesh.triangles, 5, 1.0, w
        )
        r_before = np.linalg.norm(mesh.vertices, axis=1).mean()
        r_after = np.linalg.norm(smoothed, axis=1).mean()
        assert r_after < r_before  # Laplacian smoothing shrinks closed surfaces
        assert r_after > 0.8 * r_before
        # smoothing reduces the Laplacian residual (distance to neighbor mean)
        from splashsurf_tpu.mesh import vertex_vertex_connectivity_csr

        def residual(verts):
            off, nb = vertex_vertex_connectivity_csr(
                mesh.triangles, mesh.num_vertices
            )
            res = 0.0
            for i in range(mesh.num_vertices):
                mean = verts[nb[off[i] : off[i + 1]]].mean(axis=0)
                res += np.sum((verts[i] - mean) ** 2)
            return res

        assert residual(smoothed) < 0.5 * residual(mesh.vertices)

    def test_zero_weights_freeze_vertices(self):
        mesh = _sphere_mesh(17)
        w = np.zeros(mesh.num_vertices, np.float32)
        smoothed = postprocess.laplacian_smoothing(
            mesh.vertices, mesh.triangles, 10, 1.0, w
        )
        np.testing.assert_allclose(smoothed, mesh.vertices, atol=1e-7)

    def test_normals_smoothing_normalized(self):
        mesh = _sphere_mesh(17)
        n = np.asarray(vertex_normals(mesh.vertices, mesh.triangles))
        sm = postprocess.laplacian_smoothing_normals(
            n, mesh.triangles, mesh.num_vertices, 3
        )
        np.testing.assert_allclose(np.linalg.norm(sm, axis=1), 1.0, atol=1e-5)
        assert np.mean(np.sum(sm * n, axis=1)) > 0.95  # direction preserved


class TestHalfEdge:
    def test_collapse_tetrahedron_rejected(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
        tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
        he = HalfEdgeTriMesh(verts, tris)
        with pytest.raises(IllegalCollapse):
            he.try_collapse(0, 1)

    def test_collapse_on_icosphere_keeps_manifold(self):
        mesh = _icosphere()
        he = HalfEdgeTriMesh(mesh.vertices, mesh.triangles)
        collapsed = 0
        for v in range(mesh.num_vertices):
            if collapsed >= 10:
                break
            for u in list(he.adj[v]):
                try:
                    he.try_collapse(u, v)
                    collapsed += 1
                    break
                except IllegalCollapse:
                    continue
        assert collapsed == 10
        out, vmap = he.into_parts()
        assert check_mesh_consistency(out.vertices, out.triangles) is None
        assert out.num_vertices == mesh.num_vertices - 10
        # merged vertices recorded in the map
        assert sum(len(m) for m in vmap) == mesh.num_vertices

    def test_into_parts_keep_vertices(self):
        mesh = _icosphere()
        he = HalfEdgeTriMesh(mesh.vertices, mesh.triangles)
        v = 0
        u = next(iter(he.adj[v]))
        he.try_collapse(u, v)
        out, _ = he.into_parts(keep_vertices=True)
        assert out.num_vertices == mesh.num_vertices


class TestCleanupAndDecimation:
    def test_mc_cleanup_reduces_triangles(self):
        from splashsurf_tpu.uniform_grid import UniformGrid
        from splashsurf_tpu.aabb import Aabb3d

        mesh = _sphere_mesh(33)
        grid = UniformGrid.from_aabb(
            Aabb3d((-1.6,) * 3, (1.6,) * 3), 3.0 / 32
        )
        before = mesh.num_triangles
        cleaned, vmap = postprocess.marching_cubes_cleanup(mesh, grid)
        assert cleaned.num_triangles < before
        assert cleaned.num_triangles > before // 10
        assert check_mesh_consistency(cleaned.vertices, cleaned.triangles) is None
        assert sum(len(m) for m in vmap) == mesh.num_vertices

    def test_cleanup_with_data_remaps_attributes(self):
        from splashsurf_tpu.uniform_grid import UniformGrid
        from splashsurf_tpu.aabb import Aabb3d
        from splashsurf_tpu.mesh import MeshAttribute, MeshWithData

        mesh = _sphere_mesh(33)
        grid = UniformGrid.from_aabb(
            Aabb3d((-1.6,) * 3, (1.6,) * 3), 3.0 / 32
        )
        # point attribute = x coordinate, cell attribute = triangle index
        px = np.asarray(mesh.vertices)[:, 0].astype(np.float32)
        cid = np.arange(mesh.num_triangles, dtype=np.int64)
        md = MeshWithData(
            mesh=mesh,
            point_attributes=[MeshAttribute("px", px)],
            cell_attributes=[MeshAttribute("cid", cid)],
        )
        out = postprocess.marching_cubes_cleanup_with_data(md, grid)
        assert out.mesh.num_triangles < mesh.num_triangles
        # cell attribute follows surviving triangles: values are a subset of
        # the original ids, one per output triangle, strictly increasing
        ocid = out.cell_attributes[0].data
        assert len(ocid) == out.mesh.num_triangles
        assert np.all(np.diff(ocid) > 0) and ocid[-1] < mesh.num_triangles
        # point attribute: averaged x stays close to the collapsed vertex x
        opx = out.point_attributes[0].data
        assert len(opx) == out.mesh.num_vertices
        dx = np.abs(opx - np.asarray(out.mesh.vertices)[:, 0])
        assert float(np.quantile(dx, 0.9)) < 0.2  # merged-within-cell scale

    def test_decimation_with_data_shapes(self):
        from splashsurf_tpu.mesh import MeshAttribute, MeshWithData

        mesh = _sphere_mesh(21)
        md = MeshWithData(
            mesh=mesh,
            point_attributes=[
                MeshAttribute(
                    "v3", np.asarray(mesh.vertices, dtype=np.float64)
                )
            ],
            cell_attributes=[
                MeshAttribute(
                    "area1", np.ones(mesh.num_triangles, np.float32)
                )
            ],
        )
        out = postprocess.decimation_with_data(md)
        assert len(out.point_attributes[0].data) == out.mesh.num_vertices
        assert out.point_attributes[0].data.shape[1] == 3
        assert len(out.cell_attributes[0].data) == out.mesh.num_triangles

    def test_decimation_runs_and_stays_manifold(self):
        mesh = _sphere_mesh(21)
        out, _ = postprocess.decimation(mesh)
        assert check_mesh_consistency(out.vertices, out.triangles) is None
        assert out.num_triangles <= mesh.num_triangles


class TestTriToQuad:
    def test_two_right_triangles_merge_to_square(self):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        out = postprocess.convert_tris_to_quads(TriMesh3d(verts, tris))
        assert len(out.quads) == 1
        assert len(out.triangles) == 0
        assert sorted(out.quads[0].tolist()) == [0, 1, 2, 3]

    def test_sliver_pair_not_merged(self):
        verts = np.array(
            [[0, 0, 0], [4, 0, 0], [4, 0.2, 0], [0, 0.2, 0]], np.float32
        )
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        out = postprocess.convert_tris_to_quads(TriMesh3d(verts, tris))
        assert len(out.quads) == 0
        assert len(out.triangles) == 2

    def test_sphere_mesh_partial_conversion(self):
        mesh = _sphere_mesh(21)
        out = postprocess.convert_tris_to_quads(mesh)
        total = len(out.triangles) + 2 * len(out.quads)
        assert total == mesh.num_triangles  # each quad replaces 2 tris
        assert len(out.quads) > 0


class TestSphInterpolation:
    @pytest.fixture(scope="class")
    def block(self):
        r = 0.025
        n = 10
        coords = (np.arange(n) + 0.5) * 2 * r
        X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
        from splashsurf_tpu.neighbors import compute_particle_densities

        mass = 1000.0 * (2 * r) ** 3
        rho = np.asarray(compute_particle_densities(pts, 4 * r, mass))
        return pts, rho, mass, 4 * r

    def test_constant_field_reproduced(self, block):
        pts, rho, mass, support = block
        interp = SphInterpolator(pts, rho, mass, support)
        q = np.full(len(pts), 7.5, np.float32)
        # with Shepard correction a constant field is reproduced exactly
        out = interp.interpolate_scalar_quantity(q, pts, first_order_correction=True)
        np.testing.assert_allclose(out, 7.5, rtol=1e-4)

    def test_linear_field_approximation(self, block):
        pts, rho, mass, support = block
        interp = SphInterpolator(pts, rho, mass, support)
        q = pts[:, 0].astype(np.float32)
        out = interp.interpolate_scalar_quantity(q, pts, first_order_correction=True)
        interior = np.all(np.abs(pts - 0.25) < 0.15, axis=1)
        np.testing.assert_allclose(out[interior], q[interior], atol=5e-3)

    def test_vector_quantity(self, block):
        pts, rho, mass, support = block
        interp = SphInterpolator(pts, rho, mass, support)
        q = np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (len(pts), 1))
        out = interp.interpolate_vector_quantity(q, pts[:5], first_order_correction=True)
        np.testing.assert_allclose(out, q[:5], rtol=1e-4)

    def test_normals_point_outward_on_block_surface(self, block):
        pts, rho, mass, support = block
        interp = SphInterpolator(pts, rho, mass, support)
        # sample just outside the +x face: gradient must point in +x
        probe = np.array([[0.52, 0.25, 0.25]], np.float32)
        n = interp.interpolate_normals(probe)
        assert n[0, 0] > 0.9

    def test_weighted_neighbor_counts(self, block):
        pts, rho, mass, support = block
        wnn = compute_weighted_neighbor_counts(pts, support)
        assert wnn.shape == (len(pts),)
        interior = np.all(np.abs(pts - 0.25) < 0.15, axis=1)
        assert wnn[interior].min() > wnn[~interior].min()
        # oracle on a few particles
        d2 = np.sum((pts[None, :, :] - pts[:, None, :]) ** 2, axis=-1)
        expected = (
            np.clip(1 - d2 / support**2, 0, 1).sum(axis=1) - 1.0
        )  # minus self
        np.testing.assert_allclose(wnn[:20], expected[:20], rtol=1e-4)

    def test_smooth_step(self):
        assert smooth_step(0.0) == 0.0
        assert smooth_step(1.0) == 1.0
        assert abs(smooth_step(0.5) - 0.5) < 1e-12


class TestNativeEngine:
    def test_native_available_and_matches_python(self):
        from splashsurf_tpu import native

        if not native.available():
            pytest.skip("no C++ toolchain")
        mesh = _sphere_mesh(33)
        from splashsurf_tpu.uniform_grid import UniformGrid
        from splashsurf_tpu.aabb import Aabb3d

        grid = UniformGrid.from_aabb(Aabb3d((-1.6,) * 3, (1.6,) * 3), 3.0 / 32)
        cleaned_native, vmap_n = postprocess.marching_cubes_cleanup(mesh, grid)
        # force the Python path on a fresh mesh
        import splashsurf_tpu.native as nat

        saved = (nat._lib, nat._tried)
        try:
            nat._lib, nat._tried = None, True
            mesh2 = _sphere_mesh(33)
            cleaned_py, vmap_p = postprocess.marching_cubes_cleanup(mesh2, grid)
        finally:
            nat._lib, nat._tried = saved
        assert cleaned_native.num_triangles == cleaned_py.num_triangles
        assert cleaned_native.num_vertices == cleaned_py.num_vertices
        assert check_mesh_consistency(
            cleaned_native.vertices, cleaned_native.triangles
        ) is None
        assert sum(len(m) for m in vmap_n) == mesh.num_vertices

    def test_ring_sizes(self):
        from splashsurf_tpu import native

        if not native.available():
            pytest.skip("no C++ toolchain")
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        rings = native.vertex_ring_sizes(tris, 4)
        assert rings.tolist() == [3, 2, 3, 2]
