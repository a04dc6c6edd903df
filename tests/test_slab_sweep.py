"""x-slab streamed dense path (ops/slab_sweep.py).

Contract: the slabbed reconstruction is BIT-identical to the unsplit dense
global path — same vertices (same order), same triangles. The pillars are
(a) global-origin cell/frac arithmetic in the slab raster, so kernel
contributions are bitwise the same regardless of which slab evaluates
them, and (b) canonical far-plane ownership (descending-x plane handoff +
own_px word mask), so every global point is emitted exactly once and the
merged streams feed the ordinary global decoder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import splashsurf_tpu as st
from splashsurf_tpu import neighbors
from splashsurf_tpu.mesh import check_mesh_consistency
from splashsurf_tpu.ops import global_sweep as gs
from splashsurf_tpu.ops.slab_sweep import (
    reconstruct_global_slabbed,
    slab_width_cells,
)
from splashsurf_tpu.reconstruction import grid_for_reconstruction

R = 0.025


def _scene(seed=0, shape=(24, 10, 10), jitter=0.2, extra=None):
    rng = np.random.default_rng(seed)
    nx, ny, nz = shape
    pts = (
        np.mgrid[0:nx, 0:ny, 0:nz].reshape(3, -1).T * 2 * R
        + rng.uniform(-jitter, jitter, (nx * ny * nz, 3)) * 2 * R
    ).astype(np.float32)
    if extra is not None:
        pts = np.concatenate([pts, extra]).astype(np.float32)
    return pts


def _both(pts, n_slabs_target=4):
    """Slabbed vs unsplit dense, both at slots=2 (the production slab
    default): the bitwise contract holds at EQUAL slots — the raster sum
    order per cell depends on the slot count once cells overflow."""
    p = st.Parameters.new_relative(R, 4.0, 1.5)
    grid = grid_for_reconstruction(
        pts, R, p.compact_support_radius, p.cube_size
    )
    support = p.compact_support_radius
    hsc = int(np.ceil(support / grid.cell_size))
    rho = neighbors.compute_particle_densities(
        pts, support, p.particle_rest_mass
    )
    values = jnp.asarray(p.particle_rest_mass, jnp.float32) / rho
    iso = p.iso_surface_threshold
    v0, t0 = gs.reconstruct_global_dense(
        pts, values, grid, support, hsc, iso
    )
    maxc = grid.total_cells // n_slabs_target + 1
    v1, t1 = reconstruct_global_slabbed(
        pts, values, grid, float(support), hsc, float(iso), slots=2,
        max_cells=maxc,
    )
    return (v0, t0), (v1, t1), grid


class TestSlabBitIdentity:
    def test_matches_dense_bitwise(self):
        (v0, t0), (v1, t1), _ = _both(_scene())
        assert t1.shape[0] > 0
        assert np.array_equal(v0, v1)
        assert np.array_equal(t0, t1)
        assert check_mesh_consistency(v1, t1) is None

    def test_many_narrow_slabs(self):
        """Slab width down to the minimum (8 cells) — maximum boundary
        plane count relative to volume."""
        (v0, t0), (v1, t1), grid = _both(_scene(seed=1), n_slabs_target=64)
        assert np.array_equal(v0, v1) and np.array_equal(t0, t1)

    def test_overflow_particles(self):
        """A dense clump pushes cells past the raster slots: the overflow
        scatter path must agree bitwise across slab boundaries too."""
        rng = np.random.default_rng(3)
        base = _scene(seed=2, shape=(20, 8, 8))
        clump = (
            base[555][None, :]
            + rng.uniform(-0.6, 0.6, (300, 3)).astype(np.float32) * R
        ).astype(np.float32)
        (v0, t0), (v1, t1), _ = _both(
            np.concatenate([base, clump]).astype(np.float32)
        )
        assert np.array_equal(v0, v1) and np.array_equal(t0, t1)

    @pytest.mark.parametrize("quant", ["0", "1"])
    def test_quant_settings(self, monkeypatch, quant):
        monkeypatch.setenv("SPLASHSURF_TPU_PULL_QUANT", quant)
        gs._PULL_PLAN_ENC.clear()
        (v0, t0), (v1, t1), _ = _both(_scene(seed=4, shape=(20, 8, 8)))
        assert np.array_equal(v0, v1) and np.array_equal(t0, t1)

    def test_production_slots_watertight(self):
        """slots=4 (tunable via SPLASHSURF_TPU_SLAB_SLOTS) changes
        per-cell sum order vs slots=2 — still the same surface to float
        tolerance and watertight by construction (ownership + handoff)."""
        from splashsurf_tpu import neighbors as nb

        pts = _scene(seed=7)
        p = st.Parameters.new_relative(R, 4.0, 1.5)
        grid = grid_for_reconstruction(
            pts, R, p.compact_support_radius, p.cube_size
        )
        support = p.compact_support_radius
        hsc = int(np.ceil(support / grid.cell_size))
        rho = nb.compute_particle_densities(
            pts, support, p.particle_rest_mass
        )
        values = jnp.asarray(p.particle_rest_mass, jnp.float32) / rho
        iso = p.iso_surface_threshold
        maxc = grid.total_cells // 4 + 1
        v4, t4 = reconstruct_global_slabbed(
            pts, values, grid, float(support), hsc, float(iso), slots=4,
            max_cells=maxc,
        )
        assert t4.shape[0] > 0
        assert check_mesh_consistency(v4, t4) is None
        v2, t2 = reconstruct_global_slabbed(
            pts, values, grid, float(support), hsc, float(iso), slots=2,
            max_cells=maxc,
        )
        assert abs(t4.shape[0] - t2.shape[0]) <= max(8, t2.shape[0] // 500)


class TestSlabRouting:
    def test_reconstruct_surface_routes_slabbed(self, monkeypatch):
        """Past the dense gate, single-device reconstruction routes through
        the slab path and the result matches the subdomain path's mesh."""
        pts = _scene(seed=5, shape=(28, 8, 8))
        p = st.Parameters.new_relative(R, 4.0, 1.5)
        # shrink the dense gate so this small grid is "past" it
        monkeypatch.setenv("SPLASHSURF_TPU_GLOBAL_DENSE_MAX_CELLS", "2000")
        monkeypatch.setenv("SPLASHSURF_TPU_SLAB_DENSE", "1")
        rec_s = st.reconstruct_surface(pts, p)
        assert rec_s.mesh.num_triangles > 0
        assert (
            check_mesh_consistency(rec_s.mesh.vertices, rec_s.mesh.triangles)
            is None
        )
        monkeypatch.setenv("SPLASHSURF_TPU_SLAB_DENSE", "0")
        rec_d = st.reconstruct_surface(pts, p)
        # subdomain path emits a different vertex order; compare soups
        assert rec_s.mesh.num_vertices == rec_d.mesh.num_vertices
        assert rec_s.mesh.num_triangles == rec_d.mesh.num_triangles
        vs = np.asarray(rec_s.mesh.vertices, np.float64)
        vd = np.asarray(rec_d.mesh.vertices, np.float64)
        np.testing.assert_allclose(
            vs[np.lexsort(vs.T)], vd[np.lexsort(vd.T)], rtol=0, atol=1e-5
        )

    def test_width_selection(self):
        pts = _scene(seed=6, shape=(16, 6, 6))
        p = st.Parameters.new_relative(R, 4.0, 1.5)
        grid = grid_for_reconstruction(
            pts, R, p.compact_support_radius, p.cube_size
        )
        w = slab_width_cells(grid, 10**9)
        assert w == grid.n_cells[0]  # budget covers the whole grid
        w2 = slab_width_cells(grid, grid.n_cells[1] * grid.n_cells[2] * 9)
        assert 8 <= w2 <= 9


class TestNativeUnpack:
    def test_matches_numpy(self):
        from splashsurf_tpu import native
        from splashsurf_tpu.ops import global_sweep as gs

        if not native.available():
            pytest.skip("native unavailable")
        rng = np.random.default_rng(3)
        bsum = rng.integers(0, 33, 400).astype(np.uint8)
        total_c = int(bsum.sum())
        packed = []
        for c in bsum:
            locs = np.sort(rng.choice(32, int(c), replace=False))
            for loc in locs:
                packed.append((int(loc) << 11) | int(rng.integers(1, 0x7FF)))
        packed = np.array(packed, np.uint16)
        p_np, w_np = gs._unpack_compact(packed, bsum, total_c)
        p_c, w_c = native.unpack_compact(packed, bsum, total_c)
        assert np.array_equal(p_np, p_c)
        assert np.array_equal(w_np.astype(np.uint16), w_c)
        p_o, _ = native.unpack_compact(packed, bsum, total_c, point_offset=7777)
        assert np.array_equal(p_np + 7777, p_o)

    def test_inconsistent_counts_raise(self):
        from splashsurf_tpu import native

        if not native.available():
            pytest.skip("native unavailable")
        with pytest.raises(RuntimeError):
            native.unpack_compact(
                np.zeros(2, np.uint16), np.array([1], np.uint8), 2
            )
