"""End-to-end global-path reconstruction tests on reference fixtures
(mirrors test_full.rs / test_simple.rs) plus splat-path equivalence."""

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu import density as D
from splashsurf_tpu.aabb import Aabb3d
from splashsurf_tpu.io.vtk import particles_from_vtk
from splashsurf_tpu.mesh import check_mesh_consistency
from splashsurf_tpu.params import SpatialDecomposition
from splashsurf_tpu.uniform_grid import UniformGrid, kernel_extents


def _global_params(radius, rel_support, rel_cube, threshold=0.6):
    return st.Parameters.new_relative(
        radius,
        rel_support,
        rel_cube,
        iso_surface_threshold=threshold,
        spatial_decomposition=SpatialDecomposition.NONE,
    )


class TestSplatEquivalence:
    @pytest.mark.full
    def test_global_sweep_pallas_interpret_matches_scan(self, rng):
        # The TPU plane-sweep kernel must agree with the portable scan
        # backend (the only way to exercise it off-TPU).
        from splashsurf_tpu.ops import global_sweep as gs

        pts = rng.uniform(0.1, 0.9, (800, 3)).astype(np.float32)
        vals = rng.uniform(0.5, 2.0, (800,)).astype(np.float32)
        support = 0.1
        grid = UniformGrid.from_aabb(Aabb3d((-0.1,) * 3, (1.1,) * 3), 0.0375)
        hsc = kernel_extents(support, grid.cell_size).half_supported_cells
        r = gs.rasterize_global(
            pts, vals, grid, 4, hsc, 4096, lane_align=128
        )
        ls_scan = np.asarray(
            gs.sweep_global(*r[:8], grid, support, hsc, "scan")
        )
        ls_pal = np.asarray(
            gs.sweep_global(*r[:8], grid, support, hsc, "pallas_interpret")
        )
        np.testing.assert_allclose(ls_pal, ls_scan, rtol=2e-5, atol=1e-5)

    def test_global_sweep_pallas_far_corner_particle(self):
        # Regression: with an unaligned (1, PY, PZ) output block Mosaic
        # mis-stored the final partial tile of the last grid step — a
        # particle in the LAST cell produced zeros (or garbage) in the last
        # (x, y) row on real TPU hardware at 2M scale. The output block is
        # now (8, 128)-tile aligned; this pins the contract in interpret
        # mode with a deliberately unaligned grid.
        from splashsurf_tpu.ops import global_sweep as gs

        grid = UniformGrid(
            min=(0.0, 0.0, 0.0), cell_size=0.0375, n_cells=(30, 21, 27)
        )
        support = 0.1
        hsc = kernel_extents(support, grid.cell_size).half_supported_cells
        # particle inside the last cell, near the far corner
        far = np.asarray(grid.min) + np.asarray(grid.n_cells) * grid.cell_size
        pts = (far - 0.2 * grid.cell_size)[None].astype(np.float32)
        vals = np.ones((1,), np.float32)
        r = gs.rasterize_global(pts, vals, grid, 2, hsc, 1024, lane_align=128)
        ls_scan = np.asarray(
            gs.sweep_global(*r[:8], grid, support, hsc, "scan")
        )
        ls_pal = np.asarray(
            gs.sweep_global(*r[:8], grid, support, hsc, "pallas_interpret")
        )
        assert ls_scan[-1].max() > 0  # the far plane genuinely sees it
        np.testing.assert_allclose(ls_pal, ls_scan, rtol=2e-5, atol=1e-5)

    def test_raster_tile_alignment(self, rng):
        # Mosaic DMA slices need 8-sublane / 128-lane alignment; a grid
        # whose Yp = ncy + 2*(hsc+1) is not a multiple of 8 crashed the
        # sweep kernel compile at 4M ("Slice shape along dimension 2 must
        # be aligned to tiling (8), but is 191").
        from splashsurf_tpu.ops import global_sweep as gs

        pts = rng.uniform(0.1, 0.9, (200, 3)).astype(np.float32)
        vals = jnp_ones = np.ones((200,), np.float32)
        support = 0.1
        # ncy chosen so ncy + 2*(hsc+1) % 8 != 0 without alignment
        grid = UniformGrid(min=(0.0, 0.0, 0.0), cell_size=0.0375,
                           n_cells=(32, 27, 32))
        hsc = kernel_extents(support, grid.cell_size).half_supported_cells
        r = gs.rasterize_global(
            pts, vals, grid, 2, hsc, 1024, lane_align=128
        )
        assert r[0].shape[2] % 8 == 0, r[0].shape
        assert r[0].shape[3] % 128 == 0, r[0].shape

    def test_raster_matches_scatter(self, rng):
        pts = rng.uniform(0.1, 0.9, (1500, 3)).astype(np.float32)
        vals = rng.uniform(0.5, 2.0, (1500,)).astype(np.float32)
        support = 0.1
        grid = UniformGrid.from_aabb(Aabb3d((-0.1,) * 3, (1.1,) * 3), 0.0375)
        hsc = kernel_extents(support, grid.cell_size).half_supported_cells
        ref = np.asarray(
            D.splat_level_set_scatter(pts, vals, grid, support, hsc)
        )
        out, n_over = D.splat_level_set(
            pts, vals, grid, support, hsc, slots=4, overflow_capacity=4096
        )
        assert int(n_over) == 0
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)

    def test_overflow_path_matches(self, rng):
        pts = rng.uniform(0.1, 0.9, (800, 3)).astype(np.float32)
        vals = np.ones(800, np.float32)
        support = 0.1
        grid = UniformGrid.from_aabb(Aabb3d((-0.1,) * 3, (1.1,) * 3), 0.0375)
        hsc = kernel_extents(support, grid.cell_size).half_supported_cells
        ref = np.asarray(
            D.splat_level_set_scatter(pts, vals, grid, support, hsc)
        )
        out, n_over = D.splat_level_set(
            pts, vals, grid, support, hsc, slots=1, overflow_capacity=2048
        )
        assert 0 < int(n_over) <= 2048  # slots=1 must overflow on this cloud
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)

    @pytest.mark.parametrize(
        "flag",
        [
            "SPLASHSURF_TPU_RASTER_SORTFREE",
            "SPLASHSURF_TPU_MXU_CUMSUM",
            "SPLASHSURF_TPU_PACK_SCATTER",
        ],
    )
    def test_raster_env_fallbacks_bit_identical(self, rng, flag, monkeypatch):
        """The legacy sorted-rank / VPU-cumsum branches must stay live and
        BIT-identical to the default sort-free/MXU formulations (the rank
        assignment contract: rank r -> (r+1)-th smallest particle index in
        the cell) on a multi-occupancy scene with overflow."""
        from splashsurf_tpu.ops import global_sweep as gs

        # dense cloud + a clump so some cells hold >slots particles
        pts = rng.uniform(0.1, 0.9, (1200, 3)).astype(np.float32)
        pts = np.concatenate(
            [pts, pts[:40] + np.float32(1e-4), pts[:7] + np.float32(2e-4)]
        )
        vals = rng.uniform(0.5, 2.0, (len(pts),)).astype(np.float32)
        support = 0.1
        grid = UniformGrid.from_aabb(Aabb3d((-0.1,) * 3, (1.1,) * 3), 0.0375)
        hsc = kernel_extents(support, grid.cell_size).half_supported_cells

        def run():
            gs.rasterize_global.clear_cache()  # env flags are trace-time
            return [
                np.asarray(x)
                for x in gs.rasterize_global(
                    pts, vals, grid, 2, hsc, 1024, lane_align=1
                )
            ]

        monkeypatch.setenv(flag, "1")
        on = run()
        monkeypatch.setenv(flag, "0")
        off = run()
        for a, b in zip(on, off):
            assert np.array_equal(a, b, equal_nan=True)

    def test_geoslot_pack_scatter_bit_identical(self, rng, monkeypatch):
        """The complex-packed frac scatter in the geoslot density path must
        stay bit-identical to the plain 3-scatter formulation."""
        from splashsurf_tpu import neighbors as N

        r = 0.025
        pts = (
            np.mgrid[0:10, 0:10, 0:10].reshape(3, -1).T * 2 * r
        ).astype(np.float32)
        pts += rng.uniform(-0.2 * r, 0.2 * r, pts.shape).astype(np.float32)
        support = 4 * r
        phases = np.asarray(N._octant_phase(pts, support / 2.0))
        grid = N._phase_aligned_bingrid(
            pts.min(0), pts.max(0), support, phases
        )

        def run():
            rho, ok = N.compute_particle_densities_geoslot(
                pts, grid, support, 1.0
            )
            assert bool(ok)
            return np.asarray(rho)

        monkeypatch.setenv("SPLASHSURF_TPU_PACK_SCATTER", "1")
        on = run()
        monkeypatch.setenv("SPLASHSURF_TPU_PACK_SCATTER", "0")
        off = run()
        assert np.array_equal(on, off)


class TestCellRasterDensity:
    """Cell-raster density fast path (rho from the level-set rasters, no
    separate density stage): must match the legacy path's mesh topology
    exactly and rho/vertices to float tolerance, and fall back cleanly on
    raster slot overflow."""

    def _scene(self, seed=0, n=12):
        rng = np.random.default_rng(seed)
        r = 0.025
        pts = (
            np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).T * 2 * r
            + rng.uniform(-0.25, 0.25, (n ** 3, 3)) * 2 * r
        ).astype(np.float32)
        return pts, st.Parameters.new_relative(r, 4.0, 1.5)

    def test_matches_legacy_warm_frame(self, monkeypatch):
        import jax

        from splashsurf_tpu import reconstruction as R
        from splashsurf_tpu.ops import global_sweep as gs

        pts, params = self._scene()
        f0 = jax.device_put(pts)
        f1 = jax.device_put(pts + np.float32(1e-5))
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_CELLRASTER", "0")
        st.reconstruct_surface(f0, params)  # planning frame
        recA = st.reconstruct_surface(f1, params)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_CELLRASTER", "1cpu")
        recB = st.reconstruct_surface(f1, params)
        assert recA.mesh.num_vertices == recB.mesh.num_vertices
        assert recA.mesh.num_triangles == recB.mesh.num_triangles
        np.testing.assert_allclose(
            np.asarray(recB.particle_densities),
            np.asarray(recA.particle_densities),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(recB.mesh.vertices),
            np.asarray(recA.mesh.vertices),
            atol=1e-5,
        )
        assert (
            check_mesh_consistency(recB.mesh.vertices, recB.mesh.triangles)
            is None
        )

    @pytest.mark.full
    def test_overflow_scene_falls_back(self, monkeypatch):
        """A clump that overflows the 2 raster slots must invalidate the
        cell-raster frame (deferred n_overflow check) and reproduce the
        legacy result via the fallback."""
        import jax

        pts, params = self._scene(seed=3)
        f0 = jax.device_put(pts)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_CELLRASTER", "1cpu")
        st.reconstruct_surface(f0, params)  # planning (legacy, fits ocap=0)
        # clumped warm frame: >2 particles in one cell -> overflow appears
        rng = np.random.default_rng(7)
        clump = (
            pts[100][None, :]
            + rng.uniform(-0.2, 0.2, (6, 3)).astype(np.float32) * 0.025
        )
        fc = jax.device_put(
            np.concatenate([pts[: len(pts) - 6], clump]).astype(np.float32)
        )
        recB = st.reconstruct_surface(fc, params)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_CELLRASTER", "0")
        from splashsurf_tpu import neighbors as N

        N.clear_density_plan()
        recA = st.reconstruct_surface(fc, params)
        assert recA.mesh.num_triangles == recB.mesh.num_triangles
        np.testing.assert_allclose(
            np.asarray(recB.mesh.vertices),
            np.asarray(recA.mesh.vertices),
            atol=1e-5,
        )


class TestSimpleCases:
    def test_single_particle_octahedron(self):
        # One particle; choose the cube size so exactly one grid point lies
        # above the threshold -> the surface is the 6-vertex/8-triangle
        # octahedron (reference: test_simple.rs:70-126 asserts 6/8).
        params = _global_params(0.025, 4.0, 1.5)
        rec = st.reconstruct_surface(
            np.array([[0.0, 0.0, 0.0]], np.float32), params
        )
        assert rec.mesh.num_vertices == 6
        assert rec.mesh.num_triangles == 8
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None

    def test_single_particle_off_grid_alignment(self):
        # The reference stresses a particle whose support crosses into "no
        # data" territory; the mesh must still be closed.
        params = _global_params(0.025, 4.0, 0.8)
        rec = st.reconstruct_surface(
            np.array([[0.0131, 0.0071, -0.0023]], np.float32), params
        )
        assert rec.mesh.num_triangles >= 8
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None

    def test_cube_8_particles(self, data_dir):
        pts, _ = particles_from_vtk(f"{data_dir}/cube_8_particles.vtk")
        params = _global_params(0.25, 4.0, 0.5)
        rec = st.reconstruct_surface(pts, params)
        assert rec.mesh.num_triangles > 50
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None
        # The mesh must enclose all particles (closed surface around them).
        assert rec.mesh.vertices.min() < pts.min()
        assert rec.mesh.vertices.max() > pts.max()


class TestDamBreak:
    @pytest.fixture(scope="class")
    def reconstruction(self, data_dir):
        pts, _ = particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        params = _global_params(0.025, 4.0, 1.1)
        return pts, st.reconstruct_surface(pts, params)

    def test_triangle_band(self, reconstruction):
        _, rec = reconstruction
        # Band chosen like the reference's per-dataset bands (test_full.rs).
        assert 50_000 < rec.mesh.num_triangles < 85_000

    def test_closed_manifold(self, reconstruction):
        _, rec = reconstruction
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None

    def test_densities_near_rest_in_bulk(self, reconstruction):
        pts, rec = reconstruction
        rho = rec.particle_densities
        assert rho.shape == (len(pts),)
        # Bulk particles should sit near the rest density of 1000 (this frame
        # is mid-splash, so the median sits below rest).
        assert 700 < np.median(rho) < 1300
        assert 950 < rho.max() < 1500  # densest packing near rest density
        assert rho.min() > 100  # isolated particles still have self-term

    def test_mesh_encloses_particles(self, reconstruction):
        pts, rec = reconstruction
        assert np.all(rec.mesh.vertices.min(axis=0) <= pts.min(axis=0))
        assert np.all(rec.mesh.vertices.max(axis=0) >= pts.max(axis=0))


@pytest.mark.full
class TestDatasetMatrix:
    """test_full.rs dataset x band matrix (subset that runs quickly on CPU)."""

    def test_sailors_knot_band(self, data_dir):
        pts, _ = particles_from_vtk(f"{data_dir}/sailors_knot_19539_particles.vtk")
        params = st.Parameters.new_relative(
            0.025, 4.0, 1.1,
            grid_decomposition=st.GridDecompositionParameters(32, auto_disable=False),
        )
        rec = st.reconstruct_surface(pts, params)
        # reference band (test_full.rs): 40k-70k triangles
        assert 40_000 < rec.mesh.num_triangles < 70_000
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None

    def test_octocat_bgeo_subdomains(self, data_dir):
        from splashsurf_tpu.io import particles_from_file

        pts = particles_from_file(f"{data_dir}/octocat_32614_particles.bgeo")
        params = st.Parameters.new_relative(
            0.025, 4.0, 1.5,  # coarser cube than the reference test for CPU speed
            grid_decomposition=st.GridDecompositionParameters(32, auto_disable=False),
        )
        rec = st.reconstruct_surface(pts, params)
        assert rec.mesh.num_triangles > 20_000
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None


class TestOverflowPlan:
    def test_plan_fits_then_retries_on_miss(self, data_dir):
        """The speculative raster-overflow capacity fits to the observed
        count (0 for a typical scene -> the overflow scatter is statically
        skipped), and a later frame that DOES overflow past the plan is
        re-rasterized, not silently dropped."""
        from splashsurf_tpu.global_pipeline import SPECULATION_STATS
        from splashsurf_tpu.ops import global_sweep as gs

        gs._OVER_PLAN.clear()
        pts, _ = particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        pts = np.asarray(pts)
        params = _global_params(0.025, 4.0, 1.1)
        rec0 = st.reconstruct_surface(pts, params)
        assert 0 in gs._OVER_PLAN.values(), gs._OVER_PLAN
        # warm frame with capacity 0: identical mesh
        rec1 = st.reconstruct_surface(pts, params)
        assert rec1.mesh.num_triangles == rec0.mesh.num_triangles

        # collapse 64 particles onto one point: raster rank overflows the
        # slot budget, the 0-capacity plan misses, the frame must retry
        pts_over = pts.copy()
        pts_over[:64] = pts_over[64]
        before = SPECULATION_STATS["overflow_retry"]
        rec2 = st.reconstruct_surface(pts_over, params)
        assert SPECULATION_STATS["overflow_retry"] > before
        # correctness vs a cold frame at conservative capacity
        gs._OVER_PLAN.clear()
        rec_ref = st.reconstruct_surface(pts_over, params)
        assert rec2.mesh.num_vertices == rec_ref.mesh.num_vertices
        assert rec2.mesh.num_triangles == rec_ref.mesh.num_triangles


class TestGridBucketing:
    def test_bucket_ladder(self):
        from splashsurf_tpu.reconstruction import _bucket_grid_dim

        # <= 6.25% padding, monotone, idempotent, step >= 8
        for n in [1, 7, 8, 9, 100, 127, 128, 129, 300, 1000, 4097]:
            b = _bucket_grid_dim(n)
            assert b >= n and b % 8 == 0
            assert b <= max(-(-n // 8) * 8, int(n * 1.0625) + 8)
            assert _bucket_grid_dim(b) == b
        # distinct shapes per octave is bounded (compile-cache reuse)
        octave = {_bucket_grid_dim(n) for n in range(512, 1024)}
        assert len(octave) <= 17

    def test_bucketing_preserves_geometry(self, data_dir, monkeypatch):
        from splashsurf_tpu import reconstruction as rc

        pts, _ = particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        params = _global_params(0.025, 4.0, 1.1)
        rec_b = st.reconstruct_surface(pts, params)
        monkeypatch.setenv("SPLASHSURF_TPU_GRID_BUCKET", "0")
        rec_r = st.reconstruct_surface(pts, params)
        assert any(
            b != r for b, r in zip(rec_b.grid.n_cells, rec_r.grid.n_cells)
        ), "fixture does not exercise bucketing"
        # identical geometry as a SET: padded cells shift flat cell indices,
        # so vertex/triangle ORDER may differ
        assert rec_b.mesh.num_vertices == rec_r.mesh.num_vertices
        assert rec_b.mesh.num_triangles == rec_r.mesh.num_triangles
        vb = np.asarray(rec_b.mesh.vertices, np.float64)
        vr = np.asarray(rec_r.mesh.vertices, np.float64)
        sb = vb[np.lexsort(vb.T)]
        sr = vr[np.lexsort(vr.T)]
        np.testing.assert_allclose(sb, sr, rtol=0, atol=1e-6)


class TestQuantizedPull:
    """u16 edge-parameter transfer quantization (SPLASHSURF_TPU_PULL_QUANT)."""

    def test_quant_matches_full_precision(self, data_dir, monkeypatch):
        import splashsurf_tpu.ops.global_sweep as gs

        pts, _ = particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        pts = pts.astype(np.float32)
        params = _global_params(0.025, 4.0, 1.1)
        monkeypatch.setenv("SPLASHSURF_TPU_PULL_QUANT", "0")
        r0 = st.reconstruct_surface(pts, params)
        gs._PULL_PLAN_ENC.clear()
        monkeypatch.setenv("SPLASHSURF_TPU_PULL_QUANT", "1")
        r1 = st.reconstruct_surface(pts, params)
        t0 = np.asarray(r0.mesh.triangles)
        t1 = np.asarray(r1.mesh.triangles)
        assert t0.shape == t1.shape and (t0 == t1).all()
        v0 = np.asarray(r0.mesh.vertices)
        v1 = np.asarray(r1.mesh.vertices)
        # max error is one u16 step of a cell edge
        cs = r0.grid.cell_size
        assert np.abs(v0 - v1).max() <= cs / 65535 * 1.01
        assert check_mesh_consistency(v1, t1) is None

    def test_f64_stays_full_precision(self, data_dir):
        """f64 frames must not quantize (the stream stays f64)."""
        pts, _ = particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        params = _global_params(0.025, 4.0, 1.1).try_convert("float64")
        rec = st.reconstruct_surface(pts.astype(np.float64), params)
        v = np.asarray(rec.mesh.vertices)
        assert v.dtype == np.float64
        assert check_mesh_consistency(v, np.asarray(rec.mesh.triangles)) is None


class TestMcBitmaskCompaction:
    def test_bitmask_matches_scatter_bitwise(self, monkeypatch):
        """The bitmask point-compaction (mask32 + popcount bit-select) must
        produce the exact streams of the legacy grid-wide u16 scatter —
        same mesh, bitwise."""
        from splashsurf_tpu import neighbors
        from splashsurf_tpu.ops import global_sweep as gs
        from splashsurf_tpu.reconstruction import grid_for_reconstruction

        rng = np.random.default_rng(0)
        R = 0.025
        pts = (
            np.mgrid[0:20, 0:9, 0:9].reshape(3, -1).T * 2 * R
            + rng.uniform(-0.2, 0.2, (1620, 3)) * 2 * R
        ).astype(np.float32)
        p = st.Parameters.new_relative(R, 4.0, 1.5)
        grid = grid_for_reconstruction(
            pts, R, p.compact_support_radius, p.cube_size
        )
        support = p.compact_support_radius
        hsc = int(np.ceil(support / grid.cell_size))
        rho = neighbors.compute_particle_densities(
            pts, support, p.particle_rest_mass
        )
        import jax.numpy as jnp

        values = jnp.asarray(p.particle_rest_mass, jnp.float32) / rho
        iso = p.iso_surface_threshold

        def run():
            gs.mc_global_cells.clear_cache()
            gs._MC_CAPS.clear()
            gs._PULL_PLAN_ENC.clear()
            gs._PULL_PLAN.clear()
            return gs.reconstruct_global_dense(
                pts, values, grid, support, hsc, iso
            )

        monkeypatch.setenv("SPLASHSURF_TPU_MC_BITMASK", "1")
        v1, t1 = run()
        monkeypatch.setenv("SPLASHSURF_TPU_MC_BITMASK", "0")
        v0, t0 = run()
        assert t1.shape[0] > 0
        assert np.array_equal(v0, v1)
        assert np.array_equal(t0, t1)
