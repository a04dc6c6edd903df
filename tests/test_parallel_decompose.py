"""Sharded decomposition == single-device decompose, segment for segment.

VERDICT r3 item 4: no full-N pair array on any device, with the
(subdomain, particle) pair segments — the only thing the splat consumes —
bit-identical to subdomains.decompose's global sort.
"""

import jax
import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.params import SpatialDecomposition
from splashsurf_tpu.reconstruction import grid_for_reconstruction
from splashsurf_tpu.subdomains import (
    _INT32_MAX,
    decompose,
    initialize_parameters,
)

R = 0.025


def _mesh():
    from splashsurf_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return make_mesh()


def _params():
    return st.Parameters.new_relative(
        R, 4.0, 1.5, spatial_decomposition=SpatialDecomposition.UNIFORM_GRID
    )


def _scene(nx=30, ny=8, nz=8, seed=0):
    rng = np.random.default_rng(seed)
    pts = (
        np.mgrid[0:nx, 0:ny, 0:nz].reshape(3, -1).T * 2 * R
        + rng.uniform(-0.2, 0.2, (nx * ny * nz, 3)) * 2 * R
    ).astype(np.float32)
    return pts


def _single_segments(pts, sd):
    cap = 1
    while True:
        tgt, pid, cell, rank, n_pairs = decompose(pts, sd, cap)
        n_pairs = int(n_pairs)
        if n_pairs <= cap:
            break
        cap = 1 << (n_pairs - 1).bit_length()
    tgt, pid, cell, rank = (np.asarray(x)[:n_pairs] for x in (tgt, pid, cell, rank))
    segs = {}
    ids, starts, counts = np.unique(tgt, return_index=True, return_counts=True)
    for i, s, c in zip(ids, starts, counts):
        segs[int(i)] = (pid[s : s + c], cell[s : s + c], rank[s : s + c])
    return segs, n_pairs


class TestShardedDecompose:
    def _run(self, pts, n_valid=None):
        from splashsurf_tpu.parallel.decompose import decompose_sharded

        mesh = _mesh()
        params = _params()
        grid = grid_for_reconstruction(
            pts, R, params.compact_support_radius, params.cube_size
        )
        sd = initialize_parameters(params, grid)
        out = decompose_sharded(pts, sd, mesh, n_valid=n_valid)
        real = pts if n_valid is None else pts[:n_valid]
        segs1, n_pairs1 = _single_segments(np.asarray(real, np.float32), sd)
        assert out["n_pairs"] == n_pairs1
        D, Lp, b_cap = out["D"], out["Lp"], out["b_cap"]
        tgt_s = np.asarray(out["tgt_s"]).reshape(D, Lp)
        pid_s = np.asarray(out["pid_s"]).reshape(D, Lp)
        cell_s = np.asarray(out["cell_s"]).reshape(D, Lp)
        rank_s = np.asarray(out["rank_s"]).reshape(D, Lp)
        seen = {}
        prev_max = -1
        for d in range(D):
            for b in range(int(out["n_occ_d"][d])):
                sub = int(out["occ"][d, b])
                assert sub != _INT32_MAX
                s = int(out["starts"][d, b])
                c = int(out["counts"][d, b])
                seen[sub] = (
                    pid_s[d, s : s + c],
                    cell_s[d, s : s + c],
                    rank_s[d, s : s + c],
                )
                # slab ownership: ascending across devices
                assert sub > prev_max
                prev_max = sub
        assert set(seen) == set(segs1), (
            sorted(set(segs1) ^ set(seen))[:10]
        )
        for sub, (p1, c1, r1) in segs1.items():
            p2, c2, r2 = seen[sub]
            assert np.array_equal(p1, p2), sub
            assert np.array_equal(c1, c2), sub
            assert np.array_equal(r1, r2), sub

    def test_matches_single_device(self):
        self._run(_scene())

    def test_no_full_pair_array_per_device(self):
        from splashsurf_tpu.parallel.decompose import decompose_sharded

        from splashsurf_tpu.params import GridDecompositionParameters

        mesh = _mesh()
        pts = _scene(64, 12, 12, seed=3)
        # small subdomains so the x-subdomain count exceeds the device
        # count (x-slab ownership degenerates otherwise — with the default
        # 64^3 subdomains this scene has only 2 x-slabs for 8 devices)
        params = st.Parameters.new_relative(
            R, 4.0, 1.5,
            spatial_decomposition=SpatialDecomposition.UNIFORM_GRID,
            grid_decomposition=GridDecompositionParameters(
                subdomain_num_cubes_per_dim=8
            ),
        )
        grid = grid_for_reconstruction(
            pts, R, params.compact_support_radius, params.cube_size
        )
        sd = initialize_parameters(params, grid)
        out = decompose_sharded(pts, sd, mesh)
        # per-device pair buffer (Lp = D * pow2(max send bucket)) must stay
        # below the GLOBAL pair count — the replicated-full-N failure mode
        # this stage replaces. (Exact per-device load is n_pairs/D plus
        # routing imbalance; tiny scenes bottom out at the pow2 floor.)
        assert out["Lp"] < out["n_pairs"], (out["Lp"], out["n_pairs"])
        spec = out["tgt_s"].sharding.spec
        assert tuple(spec) in ((("sub",),), ("sub",)), spec

    def test_count_padding_dummies(self):
        pts = _scene(seed=5)
        support = _params().compact_support_radius
        dummies = np.full((29, 3), -40.0 * support, np.float32)
        ext = np.concatenate([pts, dummies]).astype(np.float32)
        self._run(ext, n_valid=len(pts))

    def test_uneven_particle_count(self):
        self._run(_scene(seed=7)[:-5])
