"""Marching cubes tests: generated case-table invariants, analytic sphere
reconstruction (mirrors pysplashsurf/tests/test_sdf.py:5-41), and
closed/manifold checks on random fields (the watertightness oracle)."""

import numpy as np
import pytest

from splashsurf_tpu import mc
from splashsurf_tpu.mc import lut
from splashsurf_tpu.mesh import check_mesh_consistency, vertex_normals


class TestCaseTable:
    def test_empty_cases(self):
        assert lut.TRI_COUNT[0] == 0
        assert lut.TRI_COUNT[255] == 0

    def test_single_corner_cases(self):
        # One corner inside (or outside) -> exactly one triangle.
        for c in range(8):
            assert lut.TRI_COUNT[1 << c] == 1
            assert lut.TRI_COUNT[255 ^ (1 << c)] == 1

    def test_triangle_edges_are_active(self):
        # Every triangle may only reference edges whose endpoints straddle.
        for case in range(256):
            inside = [(case >> c) & 1 for c in range(8)]
            for t in range(lut.TRI_COUNT[case]):
                for e in lut.TRI_TABLE[case, t]:
                    c0, c1 = lut._EDGE_CORNERS[e]
                    assert inside[c0] != inside[c1], (case, t, e)

    def test_face_compatibility_between_complement_configs(self):
        # The resolution rule must depend only on the face's corner signs:
        # for every case, each face's active edges pair identically to the
        # pairing computed from the face restriction alone. (Guards the
        # watertight-by-construction property.)
        for case in range(256):
            inside = [(case >> c) & 1 for c in range(8)]
            active = [
                e
                for e in range(lut.NUM_EDGES)
                if inside[lut._EDGE_CORNERS[e, 0]] != inside[lut._EDGE_CORNERS[e, 1]]
            ]
            for f in range(6):
                pairs = lut._face_pairing(case, f, active)
                for e, p in pairs.items():
                    assert pairs[p] == e

    def test_orientation_single_corner(self):
        # Case 1: corner (0,0,0) inside; normal must point away from it.
        tri = lut.TRI_TABLE[1, 0]
        mids = []
        for e in tri:
            m = lut.EDGE_BASE_OFFSET[e].astype(float) + 0.5 * np.eye(3)[lut.EDGE_AXIS[e]]
            mids.append(m)
        a, b, c = mids
        n = np.cross(b - a, c - a)
        # inside corner at origin; outward means positive components
        assert np.dot(n, np.array([1.0, 1.0, 1.0])) > 0


def _sphere_sdf(n: int, radius: float = 1.0, extent: float = 1.5):
    # Point grid centered on the origin; value = radius - |x| (inside > 0).
    coords = np.linspace(-extent, extent, n)
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    values = radius - np.sqrt(X**2 + Y**2 + Z**2)
    cell = coords[1] - coords[0]
    return values.astype(np.float32), cell, (-extent, -extent, -extent)


class TestDenseMarchingCubes:
    def test_sphere_vertices_on_surface(self):
        values, cell, translation = _sphere_sdf(81)
        mesh = mc.marching_cubes(values, 0.0, cell, translation)
        assert mesh.num_vertices > 1000
        norms = np.linalg.norm(mesh.vertices, axis=1)
        # Linear interpolation error of the SDF sphere at this resolution.
        np.testing.assert_allclose(norms, 1.0, atol=2e-3)
        assert check_mesh_consistency(mesh.vertices, mesh.triangles) is None

    def test_sphere_normals_outward(self):
        values, cell, translation = _sphere_sdf(41)
        mesh = mc.marching_cubes(values, 0.0, cell, translation)
        n = np.asarray(vertex_normals(mesh.vertices, mesh.triangles))
        radial = mesh.vertices / np.linalg.norm(mesh.vertices, axis=1, keepdims=True)
        dots = np.sum(n * radial, axis=1)
        assert np.all(dots > 0.5), f"min dot {dots.min()}"

    def test_sphere_euler_characteristic(self):
        values, cell, translation = _sphere_sdf(33)
        mesh = mc.marching_cubes(values, 0.0, cell, translation)
        from splashsurf_tpu.mesh import edge_information

        edges, counts = edge_information(mesh.triangles)
        assert np.all(counts == 2)
        euler = mesh.num_vertices - len(edges) + mesh.num_triangles
        assert euler == 2  # topological sphere

    def test_sphere_area_and_volume(self):
        values, cell, translation = _sphere_sdf(81)
        mesh = mc.marching_cubes(values, 0.0, cell, translation)
        v = mesh.vertices
        t = mesh.triangles
        cross = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        area = 0.5 * np.linalg.norm(cross, axis=1).sum()
        # signed volume via divergence theorem (needs consistent orientation)
        vol = np.abs(np.einsum("ij,ij->", v[t[:, 0]], cross)) / 6.0
        assert area == pytest.approx(4 * np.pi, rel=5e-3)
        assert vol == pytest.approx(4 * np.pi / 3, rel=5e-3)

    def test_random_fields_watertight(self, rng):
        # The real oracle: any random field on a zero-padded grid must
        # produce a closed manifold surface (exercises ambiguous cases).
        for trial in range(20):
            n = 8
            values = rng.normal(size=(n, n, n)).astype(np.float32)
            padded = np.full((n + 2, n + 2, n + 2), -10.0, dtype=np.float32)
            padded[1:-1, 1:-1, 1:-1] = values
            mesh = mc.marching_cubes(padded, 0.0, 1.0)
            if mesh.num_triangles == 0:
                continue
            err = check_mesh_consistency(mesh.vertices, mesh.triangles)
            assert err is None, f"trial {trial}: {err}"

    def test_all_cases_watertight_pairwise(self):
        # Exhaustive 2-cell compatibility: every pair of cases meeting at a
        # shared face must produce matching segments on that face. Build a
        # 2x1x1-cell block from two random corner configs and check closed-
        # ness after padding.
        rng = np.random.default_rng(7)
        for _ in range(60):
            vals = rng.choice([-1.0, 1.0], size=(3, 2, 2)).astype(np.float32)
            padded = np.full((5, 4, 4), -5.0, dtype=np.float32)
            padded[1:-1, 1:-1, 1:-1] = vals
            mesh = mc.marching_cubes(padded, 0.0, 1.0)
            err = check_mesh_consistency(mesh.vertices, mesh.triangles)
            assert err is None, err

    def test_capacity_overflow_reports_counts(self):
        import jax.numpy as jnp

        values, cell, translation = _sphere_sdf(17)
        res = mc.marching_cubes_padded(
            jnp.asarray(values), 0.0, jnp.asarray(translation, jnp.float32), cell,
            vertex_capacity=8, triangle_capacity=8,
        )
        assert int(res.num_vertices) > 8  # true count reported despite overflow
        assert int(res.num_triangles) > 8

    def test_translation_and_scale(self):
        values, cell, translation = _sphere_sdf(41)
        m1 = mc.marching_cubes(values, 0.0, cell, translation)
        m2 = mc.marching_cubes(values, 0.0, 2 * cell, (0.0, 0.0, 0.0))
        c2 = m2.vertices.mean(axis=0)
        np.testing.assert_allclose(
            np.linalg.norm(m2.vertices - c2, axis=1), 2.0, atol=5e-3
        )
