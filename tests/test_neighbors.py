"""Neighborhood search + density tests: binned results must equal the naive
O(N^2) oracle (mirrors test_neighborhood_search.rs:183-239)."""

import jax.numpy as jnp
import numpy as np
import pytest

from splashsurf_tpu import neighbors
from splashsurf_tpu.neighbors import (
    BinGrid,
    build_cell_list,
    compute_particle_densities,
    gather_candidates,
    max_bin_occupancy,
    neighbor_counts_and_distsq,
    neighbor_lists_padded,
    neighborhood_search_naive,
    to_csr,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(123)
    return rng.uniform(0.0, 1.0, size=(400, 3)).astype(np.float32)


RADIUS = 0.15


class TestCellList:
    def test_sorted_by_bin(self, cloud):
        grid = BinGrid.for_domain(cloud.min(0), cloud.max(0), RADIUS)
        cl = build_cell_list(cloud, grid)
        sb = np.asarray(cl.sorted_bins)
        assert np.all(sb[1:] >= sb[:-1])
        # order is a permutation
        assert sorted(np.asarray(cl.order).tolist()) == list(range(len(cloud)))

    def test_max_occupancy(self, cloud):
        grid = BinGrid.for_domain(cloud.min(0), cloud.max(0), RADIUS)
        cl = build_cell_list(cloud, grid)
        k = max_bin_occupancy(cl)
        bins = np.asarray(cl.bin_of_particle)
        assert k == np.bincount(bins).max()

    def test_candidates_superset_of_neighbors(self, cloud):
        grid = BinGrid.for_domain(cloud.min(0), cloud.max(0), RADIUS)
        cl = build_cell_list(cloud, grid)
        k = max_bin_occupancy(cl)
        idx, mask = gather_candidates(cloud, grid, cl, k)
        idx, mask = np.asarray(idx), np.asarray(mask)
        oracle = neighborhood_search_naive(cloud, RADIUS)
        for i in range(len(cloud)):
            cands = set(idx[i][mask[i]].tolist())
            for j in oracle[i]:
                assert j in cands, (i, j)


class TestNeighborLists:
    def test_matches_naive_oracle(self, cloud):
        grid = BinGrid.for_domain(cloud.min(0), cloud.max(0), RADIUS)
        cl = build_cell_list(cloud, grid)
        k = max_bin_occupancy(cl)
        lists, counts = neighbor_lists_padded(cloud, grid, cl, RADIUS, k, 128)
        lists, counts = np.asarray(lists), np.asarray(counts)
        oracle = neighborhood_search_naive(cloud, RADIUS)
        for i in range(len(cloud)):
            mine = sorted(lists[i, : counts[i]].tolist())
            ref = sorted(oracle[i].tolist())
            assert mine == ref, i

    def test_counts_match(self, cloud):
        grid = BinGrid.for_domain(cloud.min(0), cloud.max(0), RADIUS)
        cl = build_cell_list(cloud, grid)
        k = max_bin_occupancy(cl)
        counts = np.asarray(
            neighbor_counts_and_distsq(cloud, grid, cl, RADIUS, k)
        )
        oracle = neighborhood_search_naive(cloud, RADIUS)
        np.testing.assert_array_equal(counts, [len(o) for o in oracle])

    def test_csr_roundtrip(self, cloud):
        grid = BinGrid.for_domain(cloud.min(0), cloud.max(0), RADIUS)
        cl = build_cell_list(cloud, grid)
        k = max_bin_occupancy(cl)
        lists, counts = neighbor_lists_padded(cloud, grid, cl, RADIUS, k, 128)
        offsets, indices = to_csr(lists, counts)
        assert offsets[-1] == np.asarray(counts).sum()
        oracle = neighborhood_search_naive(cloud, RADIUS)
        for i in range(len(cloud)):
            assert sorted(indices[offsets[i] : offsets[i + 1]].tolist()) == sorted(
                oracle[i].tolist()
            )


class TestDensities:
    def test_against_direct_sum(self, cloud):
        h = RADIUS
        mass = 0.37
        rho = np.asarray(compute_particle_densities(cloud, h, mass))
        # direct O(N^2) reference including self-contribution
        from splashsurf_tpu import kernels

        p = cloud.astype(np.float64)
        d = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
        w = np.asarray(kernels.cubic_kernel(jnp.asarray(d), h))
        expected = mass * w.sum(axis=1)
        np.testing.assert_allclose(rho, expected, rtol=2e-4)

    def test_isolated_particle(self):
        # A single particle's density is m * W(0).
        from splashsurf_tpu import kernels

        h, mass = 0.2, 1.5
        rho = np.asarray(
            compute_particle_densities(np.zeros((1, 3), np.float32), h, mass)
        )
        expected = mass * float(kernels.cubic_kernel(jnp.asarray(0.0), h))
        np.testing.assert_allclose(rho, [expected], rtol=1e-6)

    def test_raster_overflow_matches_direct_sum(self):
        # A dense cluster forces bin occupancy > 8, exercising the per-bin
        # overflow compaction + exact correction path.
        from splashsurf_tpu import kernels
        from splashsurf_tpu.neighbors import (
            compute_particle_densities_raster,
        )

        rng = np.random.default_rng(7)
        h, mass = 0.15, 0.5
        # 300 background particles + a 40-particle clump in one bin
        pts = rng.uniform(0.0, 1.0, size=(300, 3)).astype(np.float32)
        clump = (0.5 + rng.uniform(-0.03, 0.03, size=(40, 3))).astype(
            np.float32
        )
        pts = np.concatenate([pts, clump])
        grid = BinGrid.for_domain(pts.min(axis=0), pts.max(axis=0), h)
        cl = build_cell_list(pts, grid)
        mx = max_bin_occupancy(cl)
        assert mx > 8  # the clump must overflow K=8
        rho = np.asarray(
            compute_particle_densities_raster(
                pts, grid, cl, h, mass, slots=8,
                overflow_capacity=1024,
                candidate_capacity=int(np.ceil((mx + 8) / 8) * 8),
            )
        )
        p = pts.astype(np.float64)
        d = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
        w = np.asarray(kernels.cubic_kernel(jnp.asarray(d), h))
        np.testing.assert_allclose(rho, mass * w.sum(axis=1), rtol=2e-4)

    def test_raster_pallas_interpret_matches_xla(self):
        from splashsurf_tpu.neighbors import (
            compute_particle_densities_raster,
        )

        rng = np.random.default_rng(11)
        h, mass = 0.2, 0.8
        pts = rng.uniform(0.0, 1.0, size=(500, 3)).astype(np.float32)
        grid = BinGrid.for_domain(pts.min(axis=0), pts.max(axis=0), h)
        cl = build_cell_list(pts, grid)
        args = (pts, grid, cl, h, mass)
        r_xla = np.asarray(
            compute_particle_densities_raster(*args, slots=8, backend="xla")
        )
        r_pal = np.asarray(
            compute_particle_densities_raster(
                *args, slots=8, backend="pallas_interpret"
            )
        )
        np.testing.assert_allclose(r_pal, r_xla, rtol=1e-5)

    def test_n_valid_masks_count_padding_dummies(self):
        # Count-padding dummies must not affect real densities, the bin
        # lattice, or the occupancy stats (an off-grid dummy block once
        # re-phased the lattice onto the fluid's 2r columns at 8M and sent
        # 6% of particles through the overflow path).
        rng = np.random.default_rng(3)
        h, mass = 0.15, 0.5
        pts = rng.uniform(0.0, 1.0, size=(300, 3)).astype(np.float32)
        dummies = (
            np.array([-5.0, 0.0, 0.0], np.float32)
            + rng.uniform(0, 0.5, size=(212, 3)).astype(np.float32)
        )
        padded = np.concatenate([pts, dummies])
        rho_ref = np.asarray(compute_particle_densities(pts, h, mass))
        rho_pad = np.asarray(
            compute_particle_densities(padded, h, mass, n_valid=len(pts))
        )
        np.testing.assert_allclose(rho_pad[: len(pts)], rho_ref, rtol=1e-6)
        # stats must see ONLY the real particles
        grid = BinGrid.for_domain(pts.min(axis=0), pts.max(axis=0), h)
        cl = build_cell_list(
            padded, grid, n_valid=len(pts), has_n_valid=True
        )
        mx_p, u_p = neighbors.bin_stats(cl)
        cl_ref = build_cell_list(pts, grid)
        mx_r, u_r = neighbors.bin_stats(cl_ref)
        assert (mx_p, u_p) == (mx_r, u_r)

    def test_phase_aligned_lattice_stays_correct(self):
        # A fluid EXACTLY on a 2r lattice whose columns coincide with bin
        # boundaries (the worst-case phase): the origin-retry should avoid
        # the occupancy blowup, and densities must match the direct sum
        # regardless of which path runs.
        from splashsurf_tpu import kernels

        r = 0.05
        h = 4 * r  # bin size = h = 8r -> particle spacing 2r = bin/4
        nside = 12
        # place columns so that BinGrid.for_domain's origin (min - h) puts
        # boundaries exactly on particle columns: positions at k * (h/4)
        coords = np.arange(nside, dtype=np.float64) * (h / 4.0)
        X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
        rng = np.random.default_rng(5)
        pts += (rng.uniform(-0.01, 0.01, pts.shape) * r).astype(np.float32)
        mass = 0.7
        rho = np.asarray(compute_particle_densities(pts, h, mass))
        p = pts.astype(np.float64)
        d = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
        w = np.asarray(kernels.cubic_kernel(jnp.asarray(d), h))
        np.testing.assert_allclose(rho, mass * w.sum(axis=1), rtol=2e-4)

    def test_uniform_block_density_near_rest(self):
        # Particles on a 2r lattice with support 4r approximate rest density
        # in the bulk (the standard SPH sanity check).
        r = 0.025
        n = 8
        coords = (np.arange(n) + 0.5) * 2 * r
        X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
        rest_density = 1000.0
        mass = rest_density * (2 * r) ** 3
        rho = np.asarray(compute_particle_densities(pts, 4 * r, mass))
        center = np.all(np.abs(pts - n * r) < (n - 4) * r, axis=1)
        assert np.all(np.abs(rho[center] / rest_density - 1.0) < 0.05)
