"""Unit tests for core types: AABB, uniform grid, SPH kernels, parameters.

Mirrors the reference's inline unit tests: kernel normalization/support
(kernel.rs:143-180), LUT kernel error bound (kernel.rs:547-579), grid
alignment (uniform_grid.rs:188-194).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from splashsurf_tpu import Aabb3d, Parameters, UniformGrid, kernel_extents, kernels


class TestAabb:
    def test_from_points(self, rng):
        pts = rng.uniform(-3.0, 5.0, size=(1000, 3)).astype(np.float32)
        aabb = Aabb3d.from_points(pts)
        np.testing.assert_allclose(aabb.mins, pts.min(axis=0), rtol=1e-6)
        np.testing.assert_allclose(aabb.maxs, pts.max(axis=0), rtol=1e-6)
        assert aabb.is_consistent() and not aabb.is_degenerate()

    def test_grow_join_contains(self):
        a = Aabb3d((0, 0, 0), (1, 1, 1)).grow_uniformly(0.5)
        assert a.min == (-0.5, -0.5, -0.5) and a.max == (1.5, 1.5, 1.5)
        b = Aabb3d((2, 2, 2), (3, 3, 3))
        j = a.join(b)
        assert j.min == (-0.5, -0.5, -0.5) and j.max == (3.0, 3.0, 3.0)
        assert a.contains_point([0.0, 0.0, 0.0])
        assert not a.contains_point([2.0, 0.0, 0.0])
        mask = np.asarray(a.contains_points(np.array([[0, 0, 0], [9, 9, 9]], np.float32)))
        assert mask.tolist() == [True, False]


class TestUniformGrid:
    def test_from_aabb_alignment(self):
        # Min must be aligned down to integer multiples of the cell size
        # (uniform_grid.rs:188-194) for frame-to-frame consistency.
        grid = UniformGrid.from_aabb(Aabb3d((0.55, -0.3, 1.21), (2.0, 1.0, 2.0)), 0.5)
        np.testing.assert_allclose(grid.min, (0.5, -0.5, 1.0))
        assert grid.n_cells == (3, 3, 2)
        assert grid.n_points == (4, 4, 3)

    def test_point_coords_and_enclosing_cell(self):
        grid = UniformGrid(min=(0.0, 0.0, 0.0), cell_size=0.5, n_cells=(4, 4, 4))
        pc = np.asarray(grid.point_coordinates(np.array([[1, 2, 3]])))
        np.testing.assert_allclose(pc, [[0.5, 1.0, 1.5]])
        cell = np.asarray(grid.enclosing_cell(np.array([[0.6, 0.1, 1.9]], np.float32)))
        np.testing.assert_array_equal(cell, [[1, 0, 3]])
        # Outside the grid: negative indices allowed (ghost particles).
        cell = np.asarray(grid.enclosing_cell(np.array([[-0.2, 0.0, 0.0]], np.float32)))
        assert cell[0, 0] == -1

    def test_flatten_roundtrip(self):
        grid = UniformGrid(min=(0.0, 0.0, 0.0), cell_size=1.0, n_cells=(3, 4, 5))
        ijk = np.stack(
            np.meshgrid(np.arange(4), np.arange(5), np.arange(6), indexing="ij"),
            axis=-1,
        ).reshape(-1, 3)
        flat = np.asarray(grid.flatten_point_index(jnp.asarray(ijk)))
        # reference order: i*ny*nz + j*nz + k
        expected = ijk[:, 0] * 30 + ijk[:, 1] * 6 + ijk[:, 2]
        np.testing.assert_array_equal(flat, expected)
        back = np.asarray(grid.unflatten_point_index(jnp.asarray(flat)))
        np.testing.assert_array_equal(back, ijk)

    def test_boundary_predicates(self):
        grid = UniformGrid(min=(0.0, 0.0, 0.0), cell_size=1.0, n_cells=(2, 2, 2))
        assert bool(grid.is_boundary_point(np.array([0, 1, 1])))
        assert not bool(grid.is_boundary_point(np.array([1, 1, 1])))
        assert bool(grid.point_in_grid(np.array([2, 2, 2])))
        assert not bool(grid.point_in_grid(np.array([3, 0, 0])))

    def test_kernel_extents(self):
        ext = kernel_extents(0.044, 0.0165)  # canyon params: support=4r, cube=1.5r
        assert ext.half_supported_cells == 3
        assert ext.supported_points == 8
        assert ext.kernel_evaluation_radius == pytest.approx(0.0495, rel=1e-3)


class TestCubicKernel:
    def test_compact_support(self):
        # kernel.rs:143-152: W vanishes at r >= h.
        for h in [0.025, 0.1, 2.0]:
            r = jnp.asarray([h, 2 * h, 10 * h], dtype=jnp.float64)
            w = np.asarray(kernels.cubic_kernel(r, h))
            np.testing.assert_array_equal(w, 0.0)

    def test_piecewise_equivalence(self):
        # Branch-free form must equal the reference's piecewise definition.
        q = np.linspace(0.0, 2.5, 401)
        ours = np.asarray(kernels.cubic_function(jnp.asarray(q)))
        ref = np.where(
            q < 1.0,
            (3.0 / (2.0 * np.pi)) * (2.0 / 3.0 - q**2 + 0.5 * q**3),
            np.where(q < 2.0, (1.0 / (4.0 * np.pi)) * (2.0 - q) ** 3, 0.0),
        )
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_unit_integral(self):
        # kernel.rs:154-180: midpoint-rule integral over the support ~ 1.
        for h in [0.025, 0.1, 2.0]:
            n = 10
            dr = h / n
            coords = (np.arange(-n, n) + 0.5) * dr
            X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
            r = np.sqrt(X**2 + Y**2 + Z**2)
            w = np.asarray(kernels.cubic_kernel(jnp.asarray(r), h))
            integral = float(np.sum(w) * dr**3)
            assert abs(integral - 1.0) <= 1e-5

    def test_gradient_matches_finite_differences(self):
        h = 0.5
        pts = np.array(
            [[0.1, 0.05, -0.02], [0.2, 0.2, 0.2], [-0.3, 0.1, 0.0], [0.4, -0.2, 0.1]]
        )
        grad = np.asarray(kernels.cubic_kernel_gradient(jnp.asarray(pts), h))
        eps = 1e-6
        for d in range(3):
            dp = pts.copy()
            dm = pts.copy()
            dp[:, d] += eps
            dm[:, d] -= eps
            rp = np.linalg.norm(dp, axis=1)
            rm = np.linalg.norm(dm, axis=1)
            fd = (
                np.asarray(kernels.cubic_kernel(jnp.asarray(rp), h))
                - np.asarray(kernels.cubic_kernel(jnp.asarray(rm), h))
            ) / (2 * eps)
            np.testing.assert_allclose(grad[:, d], fd, rtol=1e-4, atol=1e-4)

    def test_gradient_zero_at_origin(self):
        g = np.asarray(kernels.cubic_kernel_gradient(jnp.zeros((1, 3)), 1.0))
        np.testing.assert_array_equal(g, 0.0)

    def test_discrete_kernel_error_bound(self):
        # kernel.rs:547-579: LUT kernel error within tolerance of exact kernel.
        h = 0.1
        lut = kernels.DiscreteSquaredDistanceCubicKernel(1000, h, dtype=np.float64)
        r = np.linspace(0.0, h, 500)
        exact = np.asarray(kernels.cubic_kernel(jnp.asarray(r), h))
        approx = np.asarray(lut.evaluate(jnp.asarray(r**2)))
        w0 = float(kernels.cubic_kernel(jnp.asarray(0.0), h))
        assert np.max(np.abs(exact - approx)) / w0 < 5e-3


class TestParameters:
    def test_relative(self):
        p = Parameters.new_relative(0.011, 4.0, 1.5)
        assert p.compact_support_radius == pytest.approx(0.044)
        assert p.cube_size == pytest.approx(0.0165)
        assert p.iso_surface_threshold == 0.6
        assert p.rest_density == 1000.0

    def test_rest_mass(self):
        p = Parameters.new(0.5, 2.0, 0.75)
        assert p.particle_rest_volume == pytest.approx(1.0)
        assert p.particle_rest_mass == pytest.approx(1000.0)

    def test_validation(self):
        with pytest.raises(ValueError):
            Parameters.new(0.0, 1.0, 1.0)
        with pytest.raises(ValueError):
            Parameters.new(1.0, 1.0, -1.0)

    def test_hashable_static_arg(self):
        p = Parameters.new(0.025, 0.1, 0.05)
        assert hash(p) == hash(Parameters.new(0.025, 0.1, 0.05))


class TestDoublePrecision:
    def test_f64_reconstruction(self):
        # The reference is generic over f32/f64; verify the f64 path
        # end-to-end (requires the x64 flag, enabled in conftest).
        import splashsurf_tpu as st
        from splashsurf_tpu.mesh import check_mesh_consistency
        from splashsurf_tpu.params import SpatialDecomposition

        rng = np.random.default_rng(11)
        points = rng.uniform(0, 0.2, (300, 3))
        p = st.Parameters.new_relative(
            0.02, 4.0, 1.0, dtype="float64",
            spatial_decomposition=SpatialDecomposition.NONE,
        )
        rec = st.reconstruct_surface(points, p)
        assert rec.mesh.vertices.dtype == np.float64
        assert rec.particle_densities.dtype == np.float64
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None


class TestWorkspace:
    def test_persistent_cache_setup(self, tmp_path):
        from splashsurf_tpu.workspace import enable_persistent_cache

        d = enable_persistent_cache(str(tmp_path / "cache"))
        import os

        assert os.path.isdir(d)

    def test_memory_stats(self):
        from splashsurf_tpu.workspace import device_memory_stats

        assert isinstance(device_memory_stats(), dict)


class TestTopology:
    def test_directed_axes(self):
        from splashsurf_tpu.topology import Axis, DirectedAxis, Direction, checked_apply_step

        assert len(DirectedAxis.all()) == 6
        da = DirectedAxis(Axis.X, Direction.POSITIVE)
        np.testing.assert_array_equal(da.offset, [1, 0, 0])
        np.testing.assert_array_equal(da.opposite().offset, [-1, 0, 0])
        assert checked_apply_step([0, 0, 0], da.opposite(), (4, 4, 4)) is None
        np.testing.assert_array_equal(
            checked_apply_step([1, 1, 1], da, (4, 4, 4)), [2, 1, 1]
        )
        assert Axis.Y.orthogonal_axes() == (Axis.X, Axis.Z)


class TestMeshUtils:
    def test_vertex_cell_connectivity(self):
        from splashsurf_tpu.mesh import vertex_cell_connectivity

        tris = np.array([[0, 1, 2], [0, 2, 3]])
        vc = vertex_cell_connectivity(tris, 4)
        assert sorted(vc[0].tolist()) == [0, 1]
        assert vc[1].tolist() == [0]
        assert sorted(vc[2].tolist()) == [0, 1]

    def test_density_map_to_hex_mesh(self):
        from splashsurf_tpu.mesh import density_map_to_hex_mesh
        from splashsurf_tpu import UniformGrid

        grid = UniformGrid(min=(0.0, 0.0, 0.0), cell_size=1.0, n_cells=(3, 3, 3))
        ls = np.zeros((4, 4, 4), np.float32)
        ls[1, 1, 1] = 2.0
        ls[2, 1, 1] = 3.0
        verts, cells, vals = density_map_to_hex_mesh(ls, grid, 1.0)
        assert cells.shape == (2, 8)
        assert len(verts) == 12  # two adjacent hexes share 4 corners
        assert sorted(vals.tolist()) == [2.0, 3.0]


class TestDebugDiagnostics:
    def test_defect_location_with_grid(self):
        from splashsurf_tpu.mesh import check_mesh_consistency
        from splashsurf_tpu import UniformGrid

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2]], np.int32)  # open
        grid = UniformGrid(min=(0.0, 0.0, 0.0), cell_size=0.5, n_cells=(4, 4, 4))
        msg = check_mesh_consistency(verts, tris, debug=True, grid=grid)
        assert "hole edge" in msg and "cell (" in msg


class TestFarFillSentinel:
    """f64 empty-slot sentinels must be FINITE: the TPU X64 rewriter's
    float64 emulation mishandles IEEE inf (W(inf)*0 -> NaN, which NaN'ed
    the r4 f64 densities and silently emptied the mesh — tools/f64_probe
    r5 bisection)."""

    def test_values(self):
        import numpy as np
        from splashsurf_tpu import kernels

        assert kernels.far_fill(np.float32) == float("inf")
        assert kernels.far_fill(np.float64) == 1.0e15
        assert kernels.far_fill(jnp.float64) == 1.0e15

    def test_kernel_evaluates_to_exact_zero(self):
        import numpy as np
        from splashsurf_tpu import kernels

        for dt in (np.float32, np.float64):
            far = jnp.asarray(kernels.far_fill(dt), dt)
            d2 = far * far * 3
            w = kernels.cubic_kernel(jnp.sqrt(d2), jnp.asarray(0.1, dt))
            assert float(w) == 0.0


class TestEmptyFieldGuard:
    def test_raises_on_nan_zero_and_crossing(self):
        import pytest as _pytest
        from splashsurf_tpu.ops.global_sweep import (
            EmptyFieldError,
            check_empty_field,
        )

        check_empty_field(10, 0.0, 0.6)  # non-empty: never raises
        check_empty_field(0, 0.3, 0.6)  # genuine empty: 0 < max < iso
        with _pytest.raises(EmptyFieldError):
            check_empty_field(0, float("nan"), 0.6)
        with _pytest.raises(EmptyFieldError):
            check_empty_field(0, 0.0, 0.6)
        with _pytest.raises(EmptyFieldError):
            check_empty_field(0, 0.9, 0.6)
