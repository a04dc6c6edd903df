"""The density-formulation gate: single source of truth + hysteresis.

VERDICT r3 items 8/10: the geoslot/raster/binned selection must live in ONE
function consumed by both neighbors.compute_particle_densities and
parallel.density.compute_particle_densities_sharded, with a test sweeping
the gate boundaries asserting both paths choose identically (the sharded
subdomain pipeline's bit-identity contract depends on it), plus hysteresis
so collision-heavy scenes stop paying the failed geoslot attempt.
"""

import numpy as np
import pytest

from splashsurf_tpu import neighbors
from splashsurf_tpu.neighbors import (
    GATE_LATTICE_MAX,
    density_gate,
    density_over_budget,
    density_phase_retry,
)

SUPPORT = 0.1
MASS = 0.37


def _mesh():
    import jax

    from splashsurf_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return make_mesh()


def _grid_cloud(side=12, jitter=0.3, seed=0):
    rng = np.random.default_rng(seed)
    coords = (np.arange(side) + 0.5) * SUPPORT
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    pts += (rng.uniform(-jitter, jitter, pts.shape) * SUPPORT).astype(
        np.float32
    )
    return pts


class TestGateFunction:
    """Boundary sweep of the pure decision function."""

    def test_lattice_gate_boundary(self):
        n = 1_000_000
        for lattice in (GATE_LATTICE_MAX, GATE_LATTICE_MAX + 1):
            g = density_gate(n, lattice, lattice // 2, 4, 0)
            dense_ok = lattice <= GATE_LATTICE_MAX
            assert g["use_raster"] == dense_ok
            assert g["try_geoslot"] == dense_ok

    def test_occupancy_density_boundary(self):
        n, lattice = 1_000_000, 1_000_000
        for n_bins in (lattice // 4, lattice // 4 - 1):
            g = density_gate(n, lattice, n_bins, 4, 0)
            assert g["use_raster"] == (n_bins >= lattice // 4)
            assert g["try_geoslot"] == (n_bins >= lattice // 4)

    def test_over8_budget_boundary(self):
        n, lattice = 1_000_000, 1_000_000
        budget = density_over_budget(n)
        ok = density_gate(n, lattice, lattice // 2, 12, budget)
        assert ok["use_raster"] and ok["ocap"] > 0 and ok["ccap"] >= 12
        miss = density_gate(n, lattice, lattice // 2, 12, budget + 1)
        assert not miss["use_raster"]
        # max_occ <= 8 never needs the overflow correction regardless of over8
        k8 = density_gate(n, lattice, lattice // 2, 8, 0)
        assert k8["use_raster"] and k8["ocap"] == 0 and k8["ccap"] == 0

    def test_phase_retry_boundary(self):
        n = 1_000_000
        b = density_over_budget(n)
        assert not density_phase_retry(n, b)
        assert density_phase_retry(n, b + 1)

    def test_geoslot_env_off(self, monkeypatch):
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "0")
        g = density_gate(1000, 1000, 900, 4, 0)
        assert not g["try_geoslot"] and g["use_raster"]


class TestWrappersAgree:
    """Both wrappers consume density_gate with the SAME statistics.

    The decision logic is shared by construction; what can still diverge is
    the (lattice, n_bins, max_occ, over8) statistics each path computes.
    Run both wrappers on the same scene and assert the recorded gate inputs
    and decisions are identical.
    """

    def _assert_agree(self, pts, **kw):
        from splashsurf_tpu.parallel.density import (
            compute_particle_densities_sharded,
        )

        mesh = _mesh()
        neighbors.clear_density_plan()
        neighbors.LAST_GATE.clear()
        rho_1 = np.asarray(
            neighbors.compute_particle_densities(pts, SUPPORT, MASS, **kw)
        )
        rho_s = np.asarray(
            compute_particle_densities_sharded(
                pts, SUPPORT, MASS, mesh=mesh, **kw
            )
        )
        single = neighbors.LAST_GATE.get("single")
        sharded = neighbors.LAST_GATE.get("sharded")
        assert single is not None and sharded is not None
        assert single == sharded, (single, sharded)
        return rho_1, rho_s

    def test_plain_cloud(self):
        self._assert_agree(_grid_cloud())

    def test_overflow_scene(self):
        """A >8-occupancy clump sits right on the over8/ocap machinery."""
        pts = _grid_cloud(seed=3)
        clump = np.tile(pts[50:51], (20, 1)) + (
            np.random.default_rng(7)
            .uniform(-0.01, 0.01, (20, 3))
            .astype(np.float32)
            * SUPPORT
        )
        rho_1, rho_s = self._assert_agree(
            np.concatenate([pts, clump]).astype(np.float32)
        )
        np.testing.assert_allclose(rho_s, rho_1, rtol=2e-6, atol=0)

    def test_rest_lattice_phase(self):
        """Fluid resting on a 2r lattice: the phase-retry + geoslot corner."""
        spacing = SUPPORT / 2.0
        coords = (np.arange(14) + 0.5) * spacing
        X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
        pts += np.float32(0.137)
        self._assert_agree(pts)


class TestGeoslotHysteresis:
    def test_stops_attempting_after_consecutive_misses(self, monkeypatch):
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        neighbors.reset_geoslot_hysteresis()
        pts = _grid_cloud(side=8)
        pts[1] = pts[0] + 1e-6  # octant collision -> geoslot attempt fails
        lim = neighbors._GEOSLOT_MAX_CONSECUTIVE_MISSES
        for k in range(lim):
            neighbors.clear_density_plan()
            neighbors.LAST_GATE.clear()
            neighbors.compute_particle_densities(
                pts + np.float32(k * 1e-5), SUPPORT, MASS
            )
            assert neighbors.LAST_GATE["single"]["try_geoslot"]
        # past the limit the gate stops attempting geoslot entirely
        neighbors.clear_density_plan()
        neighbors.LAST_GATE.clear()
        neighbors.compute_particle_densities(pts, SUPPORT, MASS)
        assert not neighbors.LAST_GATE["single"]["try_geoslot"]

    def test_success_resets_counter(self, monkeypatch):
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        neighbors.reset_geoslot_hysteresis()
        neighbors._note_geoslot_outcome(False)
        neighbors._note_geoslot_outcome(False)
        assert neighbors._geoslot_wanted()
        neighbors._note_geoslot_outcome(True)
        assert neighbors._GEOSLOT_MISSES[0] == 0
