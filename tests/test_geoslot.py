"""Sort-free (geoslot) density path: octant addressing + phase alignment.

The geoslot program replaces the per-frame argsort/rank machinery of the
raster density path with a pure per-particle octant address; validity
(one particle per half-bin octant) is detected in-program and rides the
speculative-plan check. See neighbors.compute_particle_densities_geoslot.
"""

import numpy as np
import pytest

import jax

from splashsurf_tpu import neighbors as N

RADIUS = 0.011
SUPPORT = 4 * RADIUS
MASS = 1.0


def _lattice_block(n_side=28, jitter=0.25, seed=3):
    rng = np.random.default_rng(seed)
    spacing = 2.0 * RADIUS
    c = (np.arange(n_side) + 0.5) * spacing
    X, Y, Z = np.meshgrid(c, c[: n_side // 2], c[: n_side // 2], indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    pts += (rng.uniform(-jitter, jitter, pts.shape) * spacing).astype(
        np.float32
    )
    # arbitrary global offset: the AABB phase must not matter
    return pts + np.float32(0.317)


@pytest.fixture(autouse=True)
def _clear_plans():
    N.clear_density_plan()
    yield
    N.clear_density_plan()


class TestGeoslot:
    def test_plans_geoslot_and_matches_sorted(self, monkeypatch):
        pts = _lattice_block()
        a = jax.device_put(pts)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "0")
        rho0 = N.compute_particle_densities(a, SUPPORT, MASS)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        N.clear_density_plan()
        rho1, chk = N.compute_particle_densities(
            a, SUPPORT, MASS, speculate=True
        )
        (plan,) = N._DENSITY_PLAN.values()
        assert plan["kind"] == "geoslot"
        assert chk is None  # planning frame validated synchronously
        r0, r1 = np.asarray(rho0), np.asarray(rho1)
        rel = np.abs(r0 - r1) / np.maximum(np.abs(r0), 1e-30)
        # different lattice origin + slot order: f32 reordering noise only
        assert rel.max() < 5e-5

    def test_warm_frame_check_passes(self, monkeypatch):
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        pts = _lattice_block()
        N.compute_particle_densities(
            jax.device_put(pts), SUPPORT, MASS, speculate=True
        )
        rho, chk = N.compute_particle_densities(
            jax.device_put(pts + np.float32(1e-5 * RADIUS)),
            SUPPORT,
            MASS,
            speculate=True,
        )
        assert bool(jax.device_get(chk))
        assert np.isfinite(np.asarray(rho)).all()

    def test_collisions_fall_back_to_sorted(self, monkeypatch):
        """Overlapping particles cannot share an octant: the planning frame
        must decline geoslot and produce exact sorted-path densities."""
        pts = _lattice_block()
        pts[1] = pts[0] + 1e-6
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        rho1, _ = N.compute_particle_densities(
            jax.device_put(pts), SUPPORT, MASS, speculate=True
        )
        (plan,) = N._DENSITY_PLAN.values()
        assert plan["kind"] != "geoslot"
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "0")
        N.clear_density_plan()
        rho0 = N.compute_particle_densities(jax.device_put(pts), SUPPORT, MASS)
        r0, r1 = np.asarray(rho0), np.asarray(rho1)
        rel = np.abs(r0 - r1) / np.maximum(np.abs(r0), 1e-30)
        assert rel.max() < 5e-5

    def test_stale_plan_check_fails_on_drift(self, monkeypatch):
        """A frame whose particles drift outside the planned lattice (or
        collide) must flip the deferred check, not corrupt densities."""
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        pts = _lattice_block()
        N.compute_particle_densities(
            jax.device_put(pts), SUPPORT, MASS, speculate=True
        )
        moved = pts + np.float32(10 * SUPPORT)  # out of planned lattice
        _, chk = N.compute_particle_densities(
            jax.device_put(moved), SUPPORT, MASS, speculate=True
        )
        assert not bool(jax.device_get(chk))

    def test_phase_alignment_centers_octants(self):
        pts = _lattice_block(jitter=0.0)
        ph = np.asarray(
            jax.device_get(_phase := N._octant_phase(jax.device_put(pts), SUPPORT / 2.0))
        )
        agrid = N._phase_aligned_bingrid(
            pts.min(0), pts.max(0), SUPPORT, ph
        )
        s = SUPPORT / 2.0
        frac = (pts - np.asarray(agrid.min)[None]) % s
        # every particle sits in the middle half of its octant
        assert ((frac > 0.2 * s) & (frac < 0.8 * s)).all()

    def test_end_to_end_mesh_topology(self, monkeypatch):
        import splashsurf_tpu as st
        import splashsurf_tpu.ops.global_sweep as gs

        pts = _lattice_block()
        p = st.Parameters.new_relative(RADIUS, 4.0, 1.5)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "0")
        r0 = st.reconstruct_surface(pts, p)
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        N.clear_density_plan()
        r1 = st.reconstruct_surface(pts, p)
        t0 = np.asarray(r0.mesh.triangles)
        t1 = np.asarray(r1.mesh.triangles)
        assert t0.shape == t1.shape and (t0 == t1).all()
        v0 = np.asarray(r0.mesh.vertices)
        v1 = np.asarray(r1.mesh.vertices)
        assert np.abs(v0 - v1).max() < 5e-5
        from splashsurf_tpu.mesh import check_mesh_consistency

        assert check_mesh_consistency(v1, t1) is None
