"""Pipeline + CLI tests (mirrors splashsurf/tests/test_pipeline.rs:8-120 and
cli arg invariants cli.rs:181-327), plus sequence expansion and BGEO IO."""

import os

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.cli import make_parser, run_splashsurf
from splashsurf_tpu.io import bgeo as bgeo_io
from splashsurf_tpu.io.vtk import particles_from_vtk, mesh_from_vtk
from splashsurf_tpu.mesh import check_mesh_consistency
from splashsurf_tpu.params import GridDecompositionParameters
from splashsurf_tpu.pipeline import (
    PostprocessingParameters,
    reconstruction_pipeline,
)
from splashsurf_tpu.sequence import collect_sequence, default_output_name, is_sequence


@pytest.fixture(scope="module")
def bunny(data_dir):
    pts, _ = particles_from_vtk(f"{data_dir}/bunny_frame_14_7705_particles.vtk")
    return np.asarray(pts)


def _params(rel_cube=1.1):
    return st.Parameters.new_relative(
        0.025,
        4.0,
        rel_cube,
        grid_decomposition=GridDecompositionParameters(32, auto_disable=False),
    )


class TestPipeline:
    def test_no_postprocessing_equals_raw(self, bunny):
        # test_pipeline.rs: raw == final when no post-processing requested
        res = reconstruction_pipeline(
            bunny, _params(), PostprocessingParameters(output_raw_mesh=True)
        )
        final = res.tri_mesh.mesh
        raw = res.raw_reconstruction.mesh
        assert final.num_triangles == raw.num_triangles
        np.testing.assert_array_equal(final.triangles, raw.triangles)

    def test_bunny_band_and_consistency(self, bunny):
        res = reconstruction_pipeline(bunny, _params())
        mesh = res.tri_mesh.mesh
        # reference band for bunny at cube=0.75 is 60-80k; at cube=1.1 fewer
        assert 20_000 < mesh.num_triangles < 80_000
        assert check_mesh_consistency(mesh.vertices, mesh.triangles) is None

    def test_full_postprocessing_chain(self, bunny):
        post = PostprocessingParameters(
            mesh_cleanup=True,
            decimate_barnacles=True,
            compute_normals=True,
            sph_normals=True,
            normals_smoothing_iters=2,
            mesh_smoothing_iters=10,
            mesh_smoothing_weights=True,
            output_mesh_smoothing_weights=True,
            check_mesh_closed=True,
            check_mesh_manifold=True,
        )
        res = reconstruction_pipeline(bunny, _params(), post)
        mwd = res.tri_mesh
        names = {a.name for a in mwd.point_attributes}
        assert {"normals", "wnn", "sw"} <= names
        nrm = next(a.data for a in mwd.point_attributes if a.name == "normals")
        assert nrm.shape == (mwd.mesh.num_vertices, 3)
        np.testing.assert_allclose(
            np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4
        )

    def test_quads_output(self, bunny):
        res = reconstruction_pipeline(
            bunny, _params(), PostprocessingParameters(generate_quads=True)
        )
        assert res.tri_quad_mesh is not None
        assert len(res.tri_quad_mesh.mesh.quads) > 0

    def test_attribute_interpolation_missing_raises(self, bunny):
        with pytest.raises(KeyError):
            reconstruction_pipeline(
                bunny,
                _params(),
                PostprocessingParameters(interpolate_attributes=["nope"]),
                attributes={},
            )


class TestSequence:
    def test_expand_and_sort(self, tmp_path):
        for i in [3, 1, 2, 10]:
            (tmp_path / f"frame_{i}.xyz").write_bytes(b"")
        (tmp_path / "other.xyz").write_bytes(b"")
        jobs = collect_sequence(
            str(tmp_path / "frame_{}.xyz"), str(tmp_path / "out_{}.vtk")
        )
        assert [j.index for j in jobs] == [1, 2, 3, 10]  # natural sort
        assert jobs[0].output_file.endswith("out_1.vtk")

    def test_start_end_index(self, tmp_path):
        for i in range(6):
            (tmp_path / f"f_{i}.xyz").write_bytes(b"")
        jobs = collect_sequence(
            str(tmp_path / "f_{}.xyz"), str(tmp_path / "o_{}.vtk"), 2, 4
        )
        assert [j.index for j in jobs] == [2, 3, 4]

    def test_is_sequence_and_default_name(self):
        assert is_sequence("a/b/frame_{}.vtk")
        assert not is_sequence("a/b/frame_1.vtk")
        assert default_output_name("/x/bunny.vtk").endswith("bunny_surface.vtk")


class TestBgeo:
    def test_read_fixtures(self, data_dir):
        pts, _ = bgeo_io.particles_from_bgeo(f"{data_dir}/octocat_32614_particles.bgeo")
        assert pts.shape == (32614, 3)
        pts2, _ = bgeo_io.particles_from_bgeo(
            f"{data_dir}/hilbert_46843_particles.bgeo"
        )
        assert pts2.shape == (46843, 3)

    def test_roundtrip_with_attributes(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        attrs = {
            "id": np.arange(64, dtype=np.int32),
            "velocity": rng.normal(size=(64, 3)).astype(np.float32),
        }
        path = str(tmp_path / "p.bgeo")
        bgeo_io.write_particles_bgeo(path, pts, attrs)
        back, battrs = bgeo_io.particles_from_bgeo(path)
        np.testing.assert_allclose(back, pts, atol=1e-6)
        np.testing.assert_array_equal(battrs["id"], attrs["id"])
        np.testing.assert_allclose(battrs["velocity"], attrs["velocity"], atol=1e-6)


class TestCli:
    def test_parser_relative_params(self):
        args = make_parser().parse_args(
            ["reconstruct", "in.vtk", "-r", "0.025", "-l", "2.0", "-c", "0.5"]
        )
        assert args.particle_radius == 0.025
        assert args.smoothing_length == 2.0
        assert args.surface_threshold == 0.6
        assert args.subdomain_grid is True

    def test_switch_parsing(self):
        args = make_parser().parse_args(
            [
                "reconstruct", "in.vtk", "-r", "1", "-l", "2", "-c", "1",
                "--subdomain-grid=off", "--normals=on",
            ]
        )
        assert args.subdomain_grid is False
        assert args.normals is True
        with pytest.raises(SystemExit):
            make_parser().parse_args(
                ["reconstruct", "in.vtk", "-r", "1", "-l", "2", "-c", "1",
                 "--normals=maybe"]
            )

    def test_end_to_end_reconstruct(self, tmp_path, data_dir):
        out = str(tmp_path / "out.vtk")
        rc = run_splashsurf(
            [
                "-q",
                "reconstruct",
                f"{data_dir}/cube_2366_particles.vtk",
                "-r", "0.025", "-l", "2.0", "-c", "1.0",
                "-o", out,
                "--subdomain-cubes", "32",
            ]
        )
        assert rc == 0
        mesh = mesh_from_vtk(out)
        assert mesh.num_triangles > 5000
        assert check_mesh_consistency(mesh.vertices, mesh.triangles) is None

    def test_convert_subcommand(self, tmp_path, data_dir):
        out = str(tmp_path / "conv.bgeo")
        rc = run_splashsurf(
            ["-q", "convert", "--particles",
             f"{data_dir}/cube_8_particles.vtk", "-o", out]
        )
        assert rc == 0
        pts, _ = bgeo_io.particles_from_bgeo(out)
        assert pts.shape == (8, 3)

    def test_convert_refuses_overwrite(self, tmp_path, data_dir):
        out = tmp_path / "x.xyz"
        out.write_bytes(b"")
        rc = run_splashsurf(
            ["-q", "convert", "--particles",
             f"{data_dir}/cube_8_particles.vtk", "-o", str(out)]
        )
        assert rc == 1  # error: exists without --overwrite


class TestPipelineExtras:
    def test_mesh_aabb_filter_and_clamp(self, bunny):
        from splashsurf_tpu.aabb import Aabb3d

        box = Aabb3d((-0.6, 0.7, -0.9), (0.6, 1.5, 0.6))
        res = reconstruction_pipeline(
            bunny, _params(),
            PostprocessingParameters(mesh_aabb=box),
        )
        v = res.tri_mesh.mesh.vertices
        # Reference semantics (mesh.rs:334-371): keep every triangle with at
        # least one vertex inside the AABB; WITHOUT clamp_vertices the kept
        # triangles' outside vertices protrude — but never by more than one
        # triangle's extent (bounded by the kernel support here).
        slack = 4.0 * 0.025  # compact support radius of _params()
        assert np.all(v.min(axis=0) >= np.asarray(box.min) - slack)
        assert np.all(v.max(axis=0) <= np.asarray(box.max) + slack)
        assert len(v) > 0
        res2 = reconstruction_pipeline(
            bunny, _params(),
            PostprocessingParameters(mesh_aabb=box, mesh_aabb_clamp_vertices=True),
        )
        v2 = res2.tri_mesh.mesh.vertices
        # with clamping every vertex lands exactly inside the box
        assert np.all(v2.min(axis=0) >= np.asarray(box.min) - 1e-6)
        assert np.all(v2.max(axis=0) <= np.asarray(box.max) + 1e-6)
        # clamping squashes rather than deletes: same mesh size
        assert res2.tri_mesh.mesh.num_vertices == res.tri_mesh.mesh.num_vertices

    def test_attribute_interpolation_via_cli(self, tmp_path, data_dir):
        out = str(tmp_path / "attr.vtk")
        rc = run_splashsurf(
            ["-q", "reconstruct",
             f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk",
             "-r", "0.025", "-l", "2.0", "-c", "1.5",
             "-a", "velocity", "-o", out, "--subdomain-cubes", "32"]
        )
        assert rc == 0
        from splashsurf_tpu.io.vtk import _read_legacy

        _pts, pdata, _c, _o, _t = _read_legacy(out)
        assert "velocity" in pdata and pdata["velocity"].shape[1] == 3

    def test_attribute_through_mesh_cleanup(self, bunny):
        # point attributes must land on the FINAL (cleaned-up) mesh vertices
        attrs = {"height": np.ascontiguousarray(bunny[:, 1]).astype(np.float32)}
        res = reconstruction_pipeline(
            bunny, _params(),
            PostprocessingParameters(
                mesh_cleanup=True, interpolate_attributes=["height"]
            ),
            attributes=attrs,
        )
        mesh = res.tri_mesh.mesh
        by_name = {a.name: a for a in res.tri_mesh.point_attributes}
        assert by_name["height"].data.shape[0] == mesh.num_vertices
        # interpolated heights track vertex y within the kernel radius
        err = np.abs(np.asarray(by_name["height"].data) - mesh.vertices[:, 1])
        assert np.median(err) < 0.1

    def test_meshwithdata_attribute_remap(self):
        from splashsurf_tpu.mesh import MeshAttribute, MeshWithData, TriMesh3d

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [2, 0, 0]], np.float32
        )
        tris = np.array([[0, 1, 2], [1, 3, 2], [1, 4, 3]], np.int32)
        md = MeshWithData(
            mesh=TriMesh3d(verts, tris),
            point_attributes=[MeshAttribute("vid", np.arange(5.0))],
            cell_attributes=[MeshAttribute("cid", np.arange(3.0))],
        )
        kept = md.keep_cells(np.array([0, 2]))
        assert kept.mesh.num_triangles == 2
        np.testing.assert_array_equal(kept.cell_attributes[0].data, [0.0, 2.0])
        # all 5 vertices are referenced by cells 0 and 2
        np.testing.assert_array_equal(kept.point_attributes[0].data, np.arange(5.0))

        kv = md.keep_vertices(np.array([True, True, True, True, False]))
        assert kv.mesh.num_triangles == 2  # cell 2 lost vertex 4
        np.testing.assert_array_equal(kv.cell_attributes[0].data, [0.0, 1.0])
        np.testing.assert_array_equal(kv.point_attributes[0].data, np.arange(4.0))

    def test_mesh_convert_roundtrip(self, tmp_path):
        # icosphere OBJ -> PLY -> VTK through the convert subcommand
        p1 = str(tmp_path / "ico.ply")
        p2 = str(tmp_path / "ico.vtk")
        rc1 = run_splashsurf(
            ["-q", "convert", "--mesh", "/root/reference/data/icosphere.obj", "-o", p1]
        )
        from splashsurf_tpu.io import mesh_from_file

        rc2 = run_splashsurf(["-q", "convert", "--mesh", p1, "-o", p2])
        assert rc1 == 0 and rc2 == 0
        a = mesh_from_file("/root/reference/data/icosphere.obj")
        b = mesh_from_file(p2)
        assert a.num_vertices == b.num_vertices
        assert a.num_triangles == b.num_triangles


class TestProgress:
    def test_progress_bar_render_and_inc(self):
        import io as _io

        from splashsurf_tpu.progress import ProgressBar

        class Tty(_io.StringIO):
            def isatty(self):
                return True

        out = Tty()
        pb = ProgressBar(4, stream=out, width=8)
        pb.inc()
        pb.inc(2)
        line = out.getvalue().split("\r")[-1]
        assert "3/4" in line and "(75%)" in line and "remaining" in line
        pb.finish()
        assert out.getvalue().endswith("\n")
        assert "4/4" in out.getvalue().split("\r")[-1]

    def test_progress_bar_noop_without_tty(self):
        import io as _io

        from splashsurf_tpu.progress import ProgressBar

        out = _io.StringIO()
        pb = ProgressBar(2, stream=out)
        pb.inc()
        pb.finish()
        assert out.getvalue() == ""  # headless: nothing rendered

    def test_log_records_suspend_the_bar(self):
        import io as _io
        import logging as _logging

        from splashsurf_tpu.progress import (
            ProgressAwareStreamHandler,
            ProgressBar,
            set_progress_bar,
        )

        class Tty(_io.StringIO):
            def isatty(self):
                return True

        bar_out, log_out = Tty(), _io.StringIO()
        pb = ProgressBar(2, stream=bar_out)
        set_progress_bar(pb)
        try:
            h = ProgressAwareStreamHandler(log_out)
            rec = _logging.LogRecord(
                "t", _logging.INFO, __file__, 1, "hello %d", (7,), None
            )
            h.emit(rec)
            # the record text lands on its own stream; the bar clears then
            # redraws around it (ends with a redraw, not a clear)
            assert "hello 7" in log_out.getvalue()
            # last write is a redraw (bar line), not the clear sequence
            assert bar_out.getvalue().endswith("[--:--:--]\x1b[K")
        finally:
            set_progress_bar(None)

    def test_sequence_run_with_progress(self, tmp_path, data_dir):
        # multi-file sequence through the CLI exercises the bar plumbing
        # (headless stderr -> bar disabled but inc/finish still run)
        import shutil

        src = f"{data_dir}/cube_8_particles.vtk"
        for k in (1, 2):
            shutil.copy(src, tmp_path / f"p_{k}.vtk")
        rc = run_splashsurf(
            ["reconstruct", str(tmp_path / "p_{}.vtk"),
             "-r", "0.5", "-l", "2.0", "-c", "1.0", "-t", "0.6",
             "-o", str(tmp_path / "out_{}.vtk")]
        )
        assert rc == 0
        assert (tmp_path / "out_1.vtk").exists()
        assert (tmp_path / "out_2.vtk").exists()
