"""Speculative frame-plan tests: the density stage reuses the previous
frame's bin lattice/capacities and validates via a deferred device flag
(pulled with the mesh totals). A violated plan must be detected and the
frame recomputed exactly."""

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu import neighbors as nb
from splashsurf_tpu.io.vtk import particles_from_vtk


@pytest.fixture(autouse=True)
def _fresh_plans():
    nb.clear_density_plan()
    yield
    nb.clear_density_plan()


def test_plan_reuse_matches_cold_frame(data_dir):
    pts, _ = particles_from_vtk(f"{data_dir}/cube_2366_particles.vtk")
    pts = np.asarray(pts)
    h, m = 0.1, 0.42

    rho0, chk0 = nb.compute_particle_densities(pts, h, m, speculate=True)
    assert chk0 is None  # planning frame
    # jittered second frame -> plan hit, deferred check true
    pts2 = pts + np.float32(1e-6)
    rho1, chk1 = nb.compute_particle_densities(pts2, h, m, speculate=True)
    assert chk1 is not None and bool(chk1)
    # identical to a cold computation of the same frame
    nb.clear_density_plan()
    rho_ref = nb.compute_particle_densities(pts2, h, m)
    # the speculated lattice has a (slightly) different origin than the
    # cold frame's -> f32 summation reorder only
    np.testing.assert_allclose(
        np.asarray(rho1), np.asarray(rho_ref), rtol=1e-5
    )


def test_plan_violation_detected(data_dir):
    pts, _ = particles_from_vtk(f"{data_dir}/cube_2366_particles.vtk")
    pts = np.asarray(pts)
    h, m = 0.1, 0.42
    nb.compute_particle_densities(pts, h, m, speculate=True)
    # same particle count, completely different domain -> positions leave
    # the speculated lattice -> check must be False
    far = pts * 3.0 + 5.0
    _rho, chk = nb.compute_particle_densities(far, h, m, speculate=True)
    assert chk is not None and not bool(chk)


def test_reconstruct_sequence_stays_correct(data_dir):
    # end-to-end: a 3-frame jittered sequence through reconstruct_surface
    # produces consistent meshes with the plan warm
    from splashsurf_tpu.mesh import check_mesh_consistency

    pts, _ = particles_from_vtk(
        f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
    )
    pts = np.asarray(pts)
    p = st.Parameters.new_relative(0.025, 4.0, 1.1)
    counts = []
    for k in range(3):
        rec = st.reconstruct_surface(pts + np.float32(k * 1e-6), p)
        assert check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles) is None
        counts.append(rec.mesh.num_triangles)
    assert max(counts) - min(counts) <= 4  # jitter-level variation only


def test_grid_plan_reused_on_device_frames(data_dir):
    # device-array frames: the second jittered frame must reuse the cached
    # grid (same aligned grid) and produce the same mesh as a cold run
    import jax
    import jax.numpy as jnp

    from splashsurf_tpu import reconstruction as rc

    rc.clear_grid_plan()
    pts, _ = particles_from_vtk(
        f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
    )
    pts = jnp.asarray(np.asarray(pts))
    p = st.Parameters.new_relative(0.025, 4.0, 1.1)
    rec1 = st.reconstruct_surface(pts, p)
    assert len(rc._GRID_PLAN) == 1
    rec2 = st.reconstruct_surface(pts + np.float32(1e-6), p)
    assert rec2.grid == rec1.grid  # warm frame rode the cached grid
    rc.clear_grid_plan()
    nb.clear_density_plan()
    rec_cold = st.reconstruct_surface(pts + np.float32(1e-6), p)
    np.testing.assert_array_equal(
        np.asarray(rec2.mesh.triangles), np.asarray(rec_cold.mesh.triangles)
    )
    np.testing.assert_allclose(
        np.asarray(rec2.mesh.vertices),
        np.asarray(rec_cold.mesh.vertices),
        rtol=2e-5, atol=1e-6,
    )
    rc.clear_grid_plan()


def test_grid_plan_jump_recovers(data_dir):
    # a domain jump with device arrays must miss the grid plan and still
    # produce a consistent mesh
    import jax.numpy as jnp

    from splashsurf_tpu.mesh import check_mesh_consistency
    from splashsurf_tpu import reconstruction as rc

    rc.clear_grid_plan()
    pts, _ = particles_from_vtk(
        f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
    )
    pts = jnp.asarray(np.asarray(pts))
    p = st.Parameters.new_relative(0.025, 4.0, 1.1)
    rec1 = st.reconstruct_surface(pts, p)
    shift = np.float32(91 * p.cube_size)
    rec2 = st.reconstruct_surface(pts + shift, p)
    assert abs(rec1.mesh.num_triangles - rec2.mesh.num_triangles) <= 8
    assert check_mesh_consistency(rec2.mesh.vertices, rec2.mesh.triangles) is None
    rc.clear_grid_plan()


def test_domain_jump_recovers(data_dir):
    # a hard scene change (same N, shifted domain) must transparently
    # recompute, not produce garbage
    from splashsurf_tpu.mesh import check_mesh_consistency

    pts, _ = particles_from_vtk(
        f"{data_dir}/double_dam_break_frame_26_4732_particles.vtk"
    )
    pts = np.asarray(pts)
    p = st.Parameters.new_relative(0.025, 4.0, 1.1)
    rec1 = st.reconstruct_surface(pts, p)
    # translate by an exact multiple of the cube size: the aligned grid
    # shifts with the particles, so the mesh topology is preserved while
    # the speculated density lattice is left far behind (plan miss)
    shift = np.float32(91 * p.cube_size)
    rec2 = st.reconstruct_surface(pts + shift, p)
    assert abs(rec1.mesh.num_triangles - rec2.mesh.num_triangles) <= 8
    assert check_mesh_consistency(rec2.mesh.vertices, rec2.mesh.triangles) is None
