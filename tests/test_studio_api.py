"""Studio add-on logic (bpy-free parts) + top-level API parity tests."""

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.studio.properties import SimpleProps, parameters_from_props
from splashsurf_tpu.studio.operators import props_to_cli_string, cli_string_to_props
from splashsurf_tpu.studio.utils import reconstruct_from_props


class TestStudioLogic:
    def test_props_to_parameters(self):
        props = SimpleProps(particle_radius=0.05, smoothing_length=2.0, cube_size=1.0)
        params, post = parameters_from_props(props)
        assert params.compact_support_radius == pytest.approx(0.2)
        assert params.cube_size == pytest.approx(0.05)
        assert post.mesh_smoothing_weights is True

    def test_cli_roundtrip(self):
        props = SimpleProps(particle_radius=0.07, generate_quads=True, sph_normals=True)
        cli = props_to_cli_string(props)
        assert "-r 0.07" in cli and "--generate-quads=on" in cli
        other = SimpleProps()
        cli_string_to_props(cli, other)
        assert other.particle_radius == pytest.approx(0.07)
        assert other.generate_quads is True
        assert other.sph_normals is True

    def test_reconstruct_from_props(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 0.3, (500, 3)).astype(np.float32)
        props = SimpleProps(
            particle_radius=0.02,
            cube_size=1.0,
            mesh_smoothing_iters=5,
            normals=True,
        )
        verts, faces, attrs = reconstruct_from_props(pts, props)
        assert len(verts) > 100
        assert all(len(f) == 3 for f in faces)
        assert any(a.name == "normals" for a in attrs)

    def test_studio_requires_bpy(self):
        import splashsurf_tpu.studio as studio

        assert not studio.HAS_BPY
        with pytest.raises(RuntimeError, match="bpy"):
            studio.register()


class TestTopLevelApi:
    def test_pysplashsurf_parity_names(self):
        # pysplashsurf/src/lib.rs:29-79 function surface
        for name in [
            "reconstruct_surface",
            "reconstruction_pipeline",
            "marching_cubes",
            "check_mesh_consistency",
            "marching_cubes_cleanup",
            "convert_tris_to_quads",
            "barnacle_decimation",
            "laplacian_smoothing_parallel",
            "laplacian_smoothing_normals_parallel",
            "neighborhood_search_spatial_hashing_parallel",
            "run_splashsurf",
            "SphInterpolator",
        ]:
            assert callable(getattr(st, name)), name

    def test_neighborhood_search_parity(self, rng):
        pts = rng.uniform(0, 1, (200, 3)).astype(np.float32)
        nl = st.neighborhood_search_spatial_hashing_parallel(pts, 0.2)
        assert len(nl) == 200
        from splashsurf_tpu.neighbors import neighborhood_search_naive

        oracle = neighborhood_search_naive(pts, 0.2)
        for a, b in zip(nl, oracle):
            assert sorted(a.tolist()) == sorted(b.tolist())

    def test_marching_cubes_array_entry(self):
        # pysplashsurf.marching_cubes on a raw array (no SPH at all)
        c = np.linspace(-1.4, 1.4, 31)
        X, Y, Z = np.meshgrid(c, c, c, indexing="ij")
        sdf = (1.0 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)
        mesh = st.marching_cubes(sdf, 0.0, c[1] - c[0], (-1.4,) * 3)
        assert st.check_mesh_consistency(mesh.vertices, mesh.triangles) is None


class TestStudioHandlers:
    def test_render_phase_toggle(self):
        from splashsurf_tpu.studio import handlers as h

        assert h.is_rendering() is False
        h.toggle_rendering_on(None)
        assert h.is_rendering() is True
        h.toggle_rendering_off(None)
        assert h.is_rendering() is False

    def test_active_props_group(self):
        from types import SimpleNamespace

        from splashsurf_tpu.studio import handlers as h

        s = SimpleNamespace(use_render_params_in_viewport=False)
        assert h.active_props_group(s, rendering=False) == "viewport"
        assert h.active_props_group(s, rendering=True) == "render"
        s.use_render_params_in_viewport = True
        assert h.active_props_group(s, rendering=False) == "render"

    def test_edit_triggers_update(self):
        from types import SimpleNamespace

        from splashsurf_tpu.studio import handlers as h

        s = SimpleNamespace(
            use_render_params_in_viewport=False,
            update_on_change=True,
            enabled=True,
        )
        # viewport edit applies in viewport mode, render edit does not
        assert h.edit_triggers_update(s, "viewport", rendering=False)
        assert not h.edit_triggers_update(s, "render", rendering=False)
        # while rendering the render group is live
        assert h.edit_triggers_update(s, "render", rendering=True)
        # live updates off / object disabled -> never
        s.update_on_change = False
        assert not h.edit_triggers_update(s, "viewport", rendering=False)
        s.update_on_change = True
        s.enabled = False
        assert not h.edit_triggers_update(s, "viewport", rendering=False)

    def test_cache_invalidate(self):
        from splashsurf_tpu.studio import updater

        updater.clear_cache()
        updater._FRAME_CACHE[("obj", 3, False)] = ("v", "f")
        updater._FRAME_CACHE[("obj", 3, True)] = ("v", "f")
        updater._FRAME_CACHE[("obj", 4, False)] = ("v", "f")
        updater.invalidate("obj", 3)
        assert ("obj", 3, False) not in updater._FRAME_CACHE
        assert ("obj", 3, True) not in updater._FRAME_CACHE
        assert ("obj", 4, False) in updater._FRAME_CACHE
        updater.clear_cache()
