"""Sharded density (parallel/density.py) vs the single-device wrapper.

VERDICT r2 item 4: the density stage must execute sharded over the device
mesh with no full-N replicated array on any device, and stay bit-identical
to the single-device raster path (the sharded subdomain pipeline's
bit-identity contract).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from splashsurf_tpu import neighbors
from splashsurf_tpu.parallel.density import compute_particle_densities_sharded
from splashsurf_tpu.parallel.mesh import make_mesh

SUPPORT = 0.1
MASS = 0.37


def _mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return make_mesh()


def _grid_cloud(side=14, jitter=0.3, seed=0):
    """~1 particle per bin: no slot overflow -> the bitwise raster path."""
    rng = np.random.default_rng(seed)
    coords = (np.arange(side) + 0.5) * SUPPORT
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    pts += (rng.uniform(-jitter, jitter, pts.shape) * SUPPORT).astype(
        np.float32
    )
    return pts


class TestShardedDensity:
    def test_bitwise_matches_single_device(self):
        mesh = _mesh()
        pts = _grid_cloud()
        rho_s = compute_particle_densities_sharded(
            pts, SUPPORT, MASS, mesh=mesh
        )
        rho_1 = neighbors.compute_particle_densities(pts, SUPPORT, MASS)
        assert np.array_equal(np.asarray(rho_s), np.asarray(rho_1)), (
            np.max(np.abs(np.asarray(rho_s) - np.asarray(rho_1)))
        )

    def test_result_and_inputs_stay_sharded(self):
        """No full-N array on any device: the routed per-device blocks are
        O(N/D) by shard_map construction; assert the OUTPUT layout is the
        sharded particle axis (P('sub')) with N/D-sized addressable shards."""
        mesh = _mesh()
        D = len(mesh.devices.ravel())
        pts = _grid_cloud(side=16)
        n = len(pts)
        rho_s = compute_particle_densities_sharded(
            pts, SUPPORT, MASS, mesh=mesh
        )
        # output stays distributed over the mesh axis
        spec = rho_s.sharding.spec
        assert tuple(spec) in ((("sub",),), ("sub",)), spec
        shard_rows = {s.data.shape[0] for s in rho_s.addressable_shards}
        assert all(r <= -(-n // D) + 1 for r in shard_rows), shard_rows
        assert len(rho_s.addressable_shards) == D

    def test_overflow_scene_matches_to_tolerance(self):
        """>8 particles in one bin exercises the local exact overflow
        correction; enumeration order differs from single-device, so
        equality is to float tolerance."""
        mesh = _mesh()
        pts = _grid_cloud(side=12, seed=3)
        clump = np.tile(pts[100:101], (20, 1)) + (
            np.random.default_rng(7)
            .uniform(-0.01, 0.01, (20, 3))
            .astype(np.float32)
            * SUPPORT
        ).astype(np.float32)
        pts = np.concatenate([pts, clump]).astype(np.float32)
        rho_s = np.asarray(
            compute_particle_densities_sharded(pts, SUPPORT, MASS, mesh=mesh)
        )
        rho_1 = np.asarray(
            neighbors.compute_particle_densities(pts, SUPPORT, MASS)
        )
        np.testing.assert_allclose(rho_s, rho_1, rtol=2e-6, atol=0)

    def test_count_padding_dummies(self):
        """Rows past n_valid must not contribute and must come back 0."""
        mesh = _mesh()
        pts = _grid_cloud(side=10, seed=5)
        n = len(pts)
        dummies = np.full((37, 3), -50.0, np.float32)
        ext = np.concatenate([pts, dummies])
        rho_s = np.asarray(
            compute_particle_densities_sharded(
                ext, SUPPORT, MASS, mesh=mesh, n_valid=n
            )
        )
        rho_1 = np.asarray(
            neighbors.compute_particle_densities(ext, SUPPORT, MASS, n_valid=n)
        )
        assert np.array_equal(rho_s[:n], rho_1[:n])
        assert np.all(rho_s[n:] == 0.0)

    def test_uneven_particle_count(self):
        """N not divisible by the device count pads internally."""
        mesh = _mesh()
        pts = _grid_cloud(side=9, seed=11)[:-3]
        rho_s = np.asarray(
            compute_particle_densities_sharded(pts, SUPPORT, MASS, mesh=mesh)
        )
        rho_1 = np.asarray(
            neighbors.compute_particle_densities(pts, SUPPORT, MASS)
        )
        assert rho_s.shape == rho_1.shape == (len(pts),)
        assert np.array_equal(rho_s, rho_1)


class TestShardedGeoslot:
    """Sharded sort-free octant density == single-device geoslot, bitwise.

    Octant addressing is a pure function of position and the (quantized)
    phase-aligned lattice, so sharded == single-device needs no order
    reproduction at all — assert it bitwise, and assert the collision
    fallback keeps both wrappers on the sorted path together.
    """

    def test_bitwise_matches_single_device_geoslot(self, monkeypatch):
        mesh = _mesh()
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        neighbors.clear_density_plan()
        # rest-spacing lattice: bin = support -> octant = support/2 spacing
        rng = np.random.default_rng(1)
        spacing = SUPPORT / 2.0
        coords = (np.arange(16) + 0.5) * spacing
        X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
        pts += (rng.uniform(-0.2, 0.2, pts.shape) * spacing).astype(
            np.float32
        )
        pts += np.float32(0.2345)  # arbitrary AABB phase
        rho_s = compute_particle_densities_sharded(
            pts, SUPPORT, MASS, mesh=mesh
        )
        rho_1 = neighbors.compute_particle_densities(pts, SUPPORT, MASS)
        assert np.array_equal(np.asarray(rho_s), np.asarray(rho_1)), (
            np.max(np.abs(np.asarray(rho_s) - np.asarray(rho_1)))
        )
        # sanity: the single-device side actually took geoslot
        rho_p, chk = neighbors.compute_particle_densities(
            pts, SUPPORT, MASS, speculate=True
        )
        (plan,) = neighbors._DENSITY_PLAN.values()
        assert plan["kind"] == "geoslot"

    def test_collision_falls_back_in_both_wrappers(self, monkeypatch):
        mesh = _mesh()
        monkeypatch.setenv("SPLASHSURF_TPU_DENSITY_GEOSLOT", "1")
        neighbors.clear_density_plan()
        pts = _grid_cloud()
        pts[1] = pts[0] + 1e-6  # octant collision everywhere-fallback
        rho_s = compute_particle_densities_sharded(
            pts, SUPPORT, MASS, mesh=mesh
        )
        rho_1 = neighbors.compute_particle_densities(pts, SUPPORT, MASS)
        assert np.array_equal(np.asarray(rho_s), np.asarray(rho_1))
