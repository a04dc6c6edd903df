"""IO tests: legacy VTK (ascii/binary, v4/v5), XML VTU (appended/compressed),
XYZ, JSON; write/read roundtrips."""

import numpy as np
import pytest

from splashsurf_tpu import io as st_io
from splashsurf_tpu.io import vtk as vtk_io
from splashsurf_tpu.io import xyz as xyz_io
from splashsurf_tpu.io import json_format as json_io
from splashsurf_tpu.mesh import TriMesh3d


class TestVtkRead:
    def test_ascii_v51(self, data_dir):
        pts, attrs = vtk_io.particles_from_vtk(f"{data_dir}/cube_8_particles.vtk")
        assert pts.shape == (8, 3)
        assert pts.dtype == np.float32

    def test_binary_v41_with_attributes(self, data_dir):
        pts, attrs = vtk_io.particles_from_vtk(
            f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
        )
        assert pts.shape == (4732, 3)
        assert "velocity" in attrs and attrs["velocity"].shape == (4732, 3)

    def test_vtu_appended_compressed(self, data_dir):
        pts_vtu, _ = vtk_io.particles_from_vtu(f"{data_dir}/cube_8_particles.vtu")
        pts_vtk, _ = vtk_io.particles_from_vtk(f"{data_dir}/cube_8_particles.vtk")
        assert pts_vtu.shape == (8, 3)
        np.testing.assert_allclose(
            np.sort(pts_vtu, axis=0), np.sort(pts_vtk, axis=0), atol=1e-6
        )

    def test_vtu_compressed_vs_uncompressed(self, data_dir):
        a, attrs_a = vtk_io.particles_from_vtu(f"{data_dir}/fluid_250_particles.vtu")
        b, attrs_b = vtk_io.particles_from_vtu(
            f"{data_dir}/fluid_encoded_250_particles.vtu"
        )
        assert a.shape == b.shape == (250, 3)
        np.testing.assert_allclose(np.sort(a, 0), np.sort(b, 0), atol=1e-6)


class TestRoundtrips:
    def test_particles_vtk_roundtrip(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        attrs = {"density": rng.uniform(900, 1100, 100).astype(np.float32)}
        path = str(tmp_path / "p.vtk")
        st_io.write_particles(path, pts, attrs)
        back, battrs = vtk_io.particles_from_vtk(path)
        np.testing.assert_allclose(back, pts, atol=1e-6)
        np.testing.assert_allclose(battrs["density"], attrs["density"], rtol=1e-6)

    def test_mesh_vtk_roundtrip(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
        path = str(tmp_path / "m.vtk")
        st_io.write_mesh(path, TriMesh3d(verts, tris), {"ids": np.arange(4)})
        mesh = vtk_io.mesh_from_vtk(path)
        np.testing.assert_allclose(mesh.vertices, verts, atol=1e-6)
        np.testing.assert_array_equal(mesh.triangles, tris)

    def test_xyz_roundtrip(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (57, 3)).astype(np.float32)
        path = str(tmp_path / "p.xyz")
        xyz_io.write_particles_xyz(path, pts)
        np.testing.assert_array_equal(xyz_io.particles_from_xyz(path), pts)

    def test_json_roundtrip(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (13, 3)).astype(np.float32)
        path = str(tmp_path / "p.json")
        json_io.write_particles_json(path, pts)
        np.testing.assert_allclose(json_io.particles_from_json(path), pts, rtol=1e-6)

    def test_dispatch(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        for ext in ("vtk", "xyz", "json"):
            path = str(tmp_path / f"d.{ext}")
            st_io.write_particles(path, pts)
            back = st_io.particles_from_file(path)
            np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_unsupported_extension(self, tmp_path):
        with pytest.raises(ValueError, match="unsupported"):
            st_io.particles_from_file(str(tmp_path / "x.abc"))


class TestVtuWrite:
    def test_mesh_vtu_roundtrip(self, tmp_path, rng):
        from splashsurf_tpu.io.vtk import write_mesh_vtu, mesh_from_vtu

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
        path = str(tmp_path / "m.vtu")
        write_mesh_vtu(path, TriMesh3d(verts, tris), {"q": rng.normal(size=4)})
        back = mesh_from_vtu(path)
        np.testing.assert_allclose(back.vertices, verts, atol=1e-6)
        np.testing.assert_array_equal(back.triangles, tris)

    def test_dispatch_vtu(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
        path = str(tmp_path / "d.vtu")
        st_io.write_mesh(path, TriMesh3d(verts, tris))
        m = st_io.mesh_from_file(path)
        assert m.num_triangles == 4
