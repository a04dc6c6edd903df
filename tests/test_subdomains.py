"""Subdomain-grid pipeline tests (mirrors test_subdomains.rs:9-105 and the
global-vs-decomposed equivalence the reference checks per dataset)."""

import dataclasses

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.global_pipeline import reconstruct_surface_global
from splashsurf_tpu.io.vtk import particles_from_vtk
from splashsurf_tpu.mesh import check_mesh_consistency
from splashsurf_tpu.params import (
    GridDecompositionParameters,
    SpatialDecomposition,
)
from splashsurf_tpu.reconstruction import grid_for_reconstruction
from splashsurf_tpu.subdomains import (
    decompose,
    initialize_parameters,
    reconstruct_surface_subdomain_grid,
)


def _params(rel_cube=1.0, n_sub=16):
    return st.Parameters.new_relative(
        0.025,
        4.0,
        rel_cube,
        spatial_decomposition=SpatialDecomposition.UNIFORM_GRID,
        grid_decomposition=GridDecompositionParameters(n_sub, auto_disable=False),
    )


@pytest.fixture(scope="module")
def cube_cloud(data_dir):
    pts, _ = particles_from_vtk(f"{data_dir}/cube_2366_particles.vtk")
    return np.asarray(pts)


class TestDecomposition:
    def test_single_particle_ghost_expansion(self):
        # A particle in the interior of one subdomain belongs only to it;
        # near a corner it must appear in up to 8 subdomains.
        p = _params(n_sub=16)
        pts_center = np.array([[0.0, 0.0, 0.0]], np.float32)
        grid = grid_for_reconstruction(pts_center, 0.025, 0.1, 0.025)
        sd = initialize_parameters(p, grid)
        tgt, pid, _c, _r, n_pairs = decompose(pts_center, sd, 64)
        assert int(n_pairs) >= 1
        tgt = np.asarray(tgt[: int(n_pairs)])
        assert len(np.unique(tgt)) == int(n_pairs)  # distinct subdomains

    def test_pair_count_bounded(self, cube_cloud):
        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        sd = initialize_parameters(p, grid)
        tgt, pid, _c, _r, n_pairs = decompose(cube_cloud, sd, 1 << 17)
        n_pairs = int(n_pairs)
        n = len(cube_cloud)
        assert n <= n_pairs <= 27 * n
        # every particle appears at least once
        assert len(np.unique(np.asarray(pid[:n_pairs]))) == n


class TestSingleParticle:
    @pytest.mark.parametrize("rel_cube", [0.5, 1.0, 1.5])
    def test_closed_at_cube_sizes(self, rel_cube):
        # test_subdomains.rs: single particle at several cube sizes stays
        # closed and manifold through the subdomain pipeline.
        p = _params(rel_cube=rel_cube, n_sub=8)
        rec = st.reconstruct_surface(np.array([[0.01, -0.02, 0.03]], np.float32), p)
        assert rec.mesh.num_triangles >= 8
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None
        assert rec.subdomain_grid is not None


class TestEquivalence:
    def test_matches_global_path(self, cube_cloud):
        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        rec_s = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        rec_g = reconstruct_surface_global(cube_cloud, p, grid)
        assert rec_s.mesh.num_vertices == rec_g.mesh.num_vertices
        assert rec_s.mesh.num_triangles == rec_g.mesh.num_triangles
        from scipy.spatial import cKDTree

        d, _ = cKDTree(rec_g.mesh.vertices).query(rec_s.mesh.vertices)
        assert d.max() < 1e-4  # the BASELINE.json vertex tolerance

    def test_raster_matches_scatter_path(self, cube_cloud):
        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        rec_s = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        rec_r = reconstruct_surface_subdomain_grid(
            cube_cloud, p, grid, raster_threshold=0
        )
        assert rec_s.mesh.num_triangles == rec_r.mesh.num_triangles
        assert check_mesh_consistency(rec_r.mesh.vertices, rec_r.mesh.triangles) is None
        from scipy.spatial import cKDTree

        d, _ = cKDTree(rec_s.mesh.vertices).query(rec_r.mesh.vertices)
        assert d.max() < 1e-5

    @pytest.mark.full
    def test_chunk_size_invariance(self, cube_cloud):
        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        rec_a = reconstruct_surface_subdomain_grid(cube_cloud, p, grid, chunk_size=4)
        rec_b = reconstruct_surface_subdomain_grid(cube_cloud, p, grid, chunk_size=64)
        assert rec_a.mesh.num_vertices == rec_b.mesh.num_vertices
        assert rec_a.mesh.num_triangles == rec_b.mesh.num_triangles


@pytest.mark.full
class TestDamBreakSubdomains:
    def test_closed_manifold_with_decomposition(self, data_dir):
        pts, _ = particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        p = st.Parameters.new_relative(
            0.025,
            4.0,
            1.1,
            grid_decomposition=GridDecompositionParameters(32, auto_disable=False),
        )
        rec = st.reconstruct_surface(pts, p)
        assert 50_000 < rec.mesh.num_triangles < 85_000
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None


class TestAutoDisable:
    def test_small_domain_disables_decomposition(self):
        p = st.Parameters.new_relative(0.025, 4.0, 1.5)  # default: auto_disable on
        rec = st.reconstruct_surface(np.array([[0.0, 0.0, 0.0]], np.float32), p)
        assert rec.subdomain_grid is None  # fell back to global path

    def test_global_path_guard_on_huge_grid(self):
        p = st.Parameters.new_relative(
            0.025,
            4.0,
            1.0,
            spatial_decomposition=SpatialDecomposition.NONE,
            particle_aabb=st.Aabb3d((-10.0,) * 3, (10.0,) * 3),
        )
        with pytest.raises(ValueError, match="dense"):
            st.reconstruct_surface(np.zeros((1, 3), np.float32), p)


@pytest.mark.full
class TestPallasKernel:
    def test_pallas_interpret_matches_scan(self, cube_cloud):
        """The Pallas splat kernel (interpret mode) must match the XLA scan
        sweep bit-closely."""
        import jax.numpy as jnp
        from splashsurf_tpu import neighbors
        from splashsurf_tpu.subdomains import (
            _gather_plists,
            _pow2_at_least,
            _segments,
            chunk_levelset_raster,
        )

        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        sd = initialize_parameters(p, grid)
        rho = neighbors.compute_particle_densities(
            cube_cloud, p.compact_support_radius, p.particle_rest_mass
        )
        values = jnp.asarray(p.particle_rest_mass, jnp.float32) / rho
        pe = jnp.concatenate(
            [jnp.asarray(cube_cloud), jnp.full((1, 3), 1e30, jnp.float32)]
        )
        ve = jnp.concatenate([values, jnp.zeros((1,), jnp.float32)])
        tgt, pid, cell, rank, n_pairs = decompose(jnp.asarray(cube_cloud), sd, 1 << 15)
        occ, starts, counts = _segments(np.asarray(tgt[: int(n_pairs)]))
        K = _pow2_at_least(int(counts.max()), lo=32)
        rows = np.arange(len(occ))
        gather = lambda a, fill: _gather_plists(
            a, jnp.asarray(starts), jnp.asarray(counts), jnp.asarray(rows),
            K, fill,
        )
        pl_ = gather(pid, len(cube_cloud))
        plocal = gather(cell, 0)
        prank = gather(rank, 1 << 30)
        ns = sd.num_subdomains
        sub_ijk = jnp.asarray(
            np.stack(
                [occ // (ns[1] * ns[2]), (occ // ns[2]) % ns[1], occ % ns[2]], 1
            ).astype(np.int32)
        )
        args = (pe, ve, pl_, plocal, prank, sub_ijk, sd,
                p.compact_support_radius, sd.margin_cells)
        ls_scan, _ = chunk_levelset_raster(*args, unroll=False)
        ls_pal, _ = chunk_levelset_raster(*args, unroll="pallas_interpret")
        np.testing.assert_allclose(
            np.asarray(ls_pal), np.asarray(ls_scan), atol=2e-5, rtol=1e-5
        )


class TestDoublePrecisionSubdomains:
    def test_f64_subdomain_path(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 0.25, (800, 3))
        p = st.Parameters.new_relative(
            0.02, 4.0, 1.0, dtype="float64",
            grid_decomposition=GridDecompositionParameters(16, auto_disable=False),
        )
        rec = st.reconstruct_surface(pts, p)
        assert rec.mesh.vertices.dtype == np.float64
        assert rec.subdomain_grid is not None
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None


class TestEncodedPull:
    """The owned-point encoded mesh transfer (subdomains._mc_encoded_mesh)
    must produce the same surface as the device-stitch path: same counts,
    same triangle-soup multiset (vertex ORDER differs by design — stream
    order vs interior-then-boundary stitch order)."""

    @staticmethod
    def _soup(mesh, cell_size):
        v = np.asarray(mesh.vertices)
        tri = v[np.asarray(mesh.triangles)]  # (T, 3, 3)
        tri = np.round(tri / cell_size, 3)
        out = []
        for t in tri:
            corners = sorted(map(tuple, t))
            out.append(corners[0] + corners[1] + corners[2])
        return sorted(out)

    def test_matches_stitch_path(self, cube_cloud, monkeypatch):
        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        # quantization off: the stitch path ships full-precision floats, so
        # the soup comparison needs the unquantized t stream
        monkeypatch.setenv("SPLASHSURF_TPU_PULL_QUANT", "0")
        monkeypatch.setenv("SPLASHSURF_TPU_SUB_ENCODED_PULL", "0")
        rec_s = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        monkeypatch.setenv("SPLASHSURF_TPU_SUB_ENCODED_PULL", "1")
        rec_e = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        assert rec_e.mesh.num_vertices == rec_s.mesh.num_vertices
        assert rec_e.mesh.num_triangles == rec_s.mesh.num_triangles
        assert (
            check_mesh_consistency(rec_e.mesh.vertices, rec_e.mesh.triangles)
            is None
        )
        assert self._soup(rec_e.mesh, grid.cell_size) == self._soup(
            rec_s.mesh, grid.cell_size
        )

    def test_numpy_decoder_matches_native(self, cube_cloud, monkeypatch):
        from splashsurf_tpu import native

        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        monkeypatch.setenv("SPLASHSURF_TPU_SUB_ENCODED_PULL", "1")
        rec_n = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        if not native.available():
            pytest.skip("native decoder unavailable")
        monkeypatch.setattr(native, "mc_decode_sub", lambda *a, **k: None)
        rec_f = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        # triangle INDICES must be identical (same stream, same conventions);
        # positions agree up to FMA contraction differences (g++ may fuse)
        np.testing.assert_array_equal(rec_f.mesh.triangles, rec_n.mesh.triangles)
        np.testing.assert_allclose(
            rec_f.mesh.vertices, rec_n.mesh.vertices, atol=1e-6
        )

    def test_quant_off_still_matches(self, cube_cloud, monkeypatch):
        p = _params(n_sub=16)
        grid = grid_for_reconstruction(cube_cloud, 0.025, 0.1, 0.025)
        monkeypatch.setenv("SPLASHSURF_TPU_SUB_ENCODED_PULL", "1")
        monkeypatch.setenv("SPLASHSURF_TPU_PULL_QUANT", "0")
        rec_a = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        monkeypatch.setenv("SPLASHSURF_TPU_PULL_QUANT", "1")
        rec_b = reconstruct_surface_subdomain_grid(cube_cloud, p, grid)
        np.testing.assert_array_equal(rec_a.mesh.triangles, rec_b.mesh.triangles)
        # quantization error bound: cell_size / 65535
        np.testing.assert_allclose(
            rec_a.mesh.vertices, rec_b.mesh.vertices,
            atol=1.5 * grid.cell_size / 65535.0,
        )

    def test_f64_encoded(self, monkeypatch):
        monkeypatch.setenv("SPLASHSURF_TPU_SUB_ENCODED_PULL", "1")
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 0.25, (800, 3))
        p = st.Parameters.new_relative(
            0.02, 4.0, 1.0, dtype="float64",
            grid_decomposition=GridDecompositionParameters(16, auto_disable=False),
        )
        rec = st.reconstruct_surface(pts, p)
        assert rec.mesh.vertices.dtype == np.float64
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None


class TestEmptySurface:
    def test_threshold_above_everything(self):
        # iso threshold unreachable -> empty mesh, no crash
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 0.2, (500, 3)).astype(np.float32)
        p = st.Parameters.new_relative(
            0.02, 4.0, 1.0, iso_surface_threshold=100.0,
            grid_decomposition=GridDecompositionParameters(16, auto_disable=False),
        )
        rec = st.reconstruct_surface(pts, p)
        assert rec.mesh.num_triangles == 0
        assert rec.mesh.num_vertices == 0
