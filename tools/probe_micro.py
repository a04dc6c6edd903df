#!/usr/bin/env python
"""Within-stage attribution for rasterize_global and mc_global_cells on TPU.

Cumulative prefixes WITHIN one stage (fed by precomputed device inputs), one
scalar output per probe. Relative signal only — accept/reject stays
end-to-end (CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench(fn, frames, label, prev=0.0):
    import jax

    fn(frames[0]).block_until_ready()
    times = []
    for f in frames:
        t0 = time.perf_counter()
        fn(f).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:24s} cum {best*1e3:8.1f} ms   marg {(best-prev)*1e3:8.1f} ms")
    return best


def main():
    import jax
    import jax.numpy as jnp

    import splashsurf_tpu as st
    from splashsurf_tpu import kernels, neighbors
    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.ops.prefix import cumsum_small_i32
    from splashsurf_tpu.mc import lut
    from splashsurf_tpu.reconstruction import (
        _bucket_grid,
        grid_for_reconstruction,
    )
    from splashsurf_tpu.uniform_grid import kernel_extents
    from splashsurf_tpu.workspace import enable_persistent_cache

    enable_persistent_cache()
    from bench import make_dam_break

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    radius = 0.011
    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    csr = float(params.compact_support_radius)
    mass = float(params.particle_rest_mass)
    iso = float(params.iso_surface_threshold)
    pts_np = make_dam_break(n_target, radius)
    n = len(pts_np)
    grid = _bucket_grid(grid_for_reconstruction(pts_np, radius, csr, params.cube_size))
    hsc = kernel_extents(csr, grid.cell_size).half_supported_cells
    ncx, ncy, ncz = grid.n_cells
    ncells = ncx * ncy * ncz
    print(f"# n={n} grid={grid.n_cells} hsc={hsc}", file=sys.stderr)

    frames = [
        jax.device_put(pts_np + np.float32(1e-5 * radius * (k + 1)))
        for k in range(3)
    ]
    jax.block_until_ready(frames)

    # ---- raster internals -------------------------------------------------
    pad = hsc + 1
    Xp = ncx + 2 * pad
    Yp = -(-(ncy + 2 * pad) // 8) * 8
    Yo = -(-(ncy + 1) // 8) * 8
    Yp = max(Yp, -(-(2 * pad - 1 + Yo) // 8) * 8)
    Zp = -(-(ncz + 2 * pad) // 128) * 128
    slots = 2

    def cells_of(p):
        cs = jnp.float32(grid.cell_size)
        mn = [jnp.float32(grid.min[d]) for d in range(3)]
        px = [p[:, d] for d in range(3)]
        cell = [jnp.floor((px[d] - mn[d]) / cs).astype(jnp.int32) for d in range(3)]
        valid = (
            (cell[0] >= 0) & (cell[0] < ncx)
            & (cell[1] >= 0) & (cell[1] < ncy)
            & (cell[2] >= 0) & (cell[2] < ncz)
        )
        cflat = jnp.where(valid, (cell[0] * ncy + cell[1]) * ncz + cell[2], ncells)
        return cell, valid, cflat, px, mn, cs

    @jax.jit
    def p_cellids(p):
        _, _, cflat, _, _, _ = cells_of(p)
        return jnp.sum(cflat.astype(jnp.float32))

    @jax.jit
    def p_rank(p):
        _, valid, cflat, _, _, _ = cells_of(p)
        idx = jnp.arange(n, dtype=jnp.int32)
        sentinel = jnp.int32(n)
        rank = jnp.full((n,), slots, jnp.int32)
        remaining = valid
        for r in range(slots):
            tbl = (
                jnp.full((ncells + 1,), sentinel)
                .at[jnp.where(remaining, cflat, ncells)]
                .min(idx)
            )
            won = remaining & (tbl[cflat] == idx)
            rank = jnp.where(won, r, rank)
            remaining = remaining & ~won
        return jnp.sum(rank)

    @jax.jit
    def p_scatter1(p):
        cell, valid, cflat, px, mn, cs = cells_of(p)
        total = slots * Xp * Yp * Zp
        dest = jnp.where(
            valid,
            ((0 * Xp + (cell[0] + pad)) * Yp + (cell[1] + pad)) * Zp
            + (cell[2] + pad),
            total,
        )
        frac = px[0] - (mn[0] + cell[0].astype(jnp.float32) * cs)
        r = (
            jnp.full((total,), jnp.inf, jnp.float32)
            .at[dest]
            .set(frac, mode="drop", unique_indices=True)
        )
        return jnp.sum(jnp.where(jnp.isfinite(r), r, 0.0))

    @jax.jit
    def p_full_raster(p):
        rho = jnp.ones((n,), jnp.float32)
        r = gs.rasterize_global(p, rho, grid, slots, hsc, 0, lane_align=128)
        return sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in r[:4])

    print("== raster internals ==")
    t = bench(p_cellids, frames, "cell ids")
    t = bench(p_rank, frames, "rank loop (2 rounds)", t)
    bench(p_scatter1, frames, "one raster scatter", 0.0)
    bench(p_full_raster, frames, "full rasterize", 0.0)

    # ---- mc internals ------------------------------------------------------
    rho0, _ = neighbors.compute_particle_densities(frames[0], csr, mass, speculate=True)
    dkey = (n, "float32", csr, None, None)
    plan = neighbors._DENSITY_PLAN[dkey]

    @jax.jit
    def make_ls(p):
        rho, _ = neighbors._densities_planned(
            p, csr, mass, plan["grid"], kind=plan["kind"], slots=plan["slots"],
            u_cap=plan["u_cap"], ocap=plan["ocap"], ccap=plan["ccap"],
            n_valid=jnp.asarray(n, jnp.int32), has_n_valid=False,
        )
        r = gs.rasterize_global(p, jnp.float32(mass) / rho, grid, 2, hsc, 0, lane_align=128)
        return gs.sweep_global(*r[:8], grid, csr, hsc, "pallas")

    lss = [make_ls(f) for f in frames]
    jax.block_until_ready(lss)
    PX, PY, PZ = lss[0].shape
    n_pts = PX * PY * PZ
    nv, nt = jax.device_get(
        __import__("splashsurf_tpu.mc.dense", fromlist=["x"])._mc_counts(
            lss[0], jnp.float32(iso)
        )
    )
    vcap = gs._bucket16(int(nv) * 5 // 4)
    tcap = gs._bucket16(int(nt) * 5 // 4)

    def words_of(ls):
        inside = ls >= jnp.float32(iso)

        def pad_to_points(x):
            return jnp.pad(
                x,
                [(0, PX - x.shape[0]), (0, PY - x.shape[1]), (0, PZ - x.shape[2])],
            )

        case = jnp.zeros((PX - 1, PY - 1, PZ - 1), jnp.int32)
        for c8 in range(8):
            oi, oj, ok = (c8 >> 2) & 1, (c8 >> 1) & 1, c8 & 1
            corner = inside[oi : oi + PX - 1, oj : oj + PY - 1, ok : ok + PZ - 1]
            case = case | (corner.astype(jnp.int32) << c8)
        word = pad_to_points(jnp.where((case != 0) & (case != 255), case, 0))
        for a, bit in ((0, 8), (1, 9), (2, 10)):
            sl0 = tuple(slice(0, -1) if d == a else slice(None) for d in range(3))
            sl1 = tuple(slice(1, None) if d == a else slice(None) for d in range(3))
            em = inside[sl0] != inside[sl1]
            word = word | (pad_to_points(em.astype(jnp.int32)) << bit)
        return word.reshape(-1)

    @jax.jit
    def p_words(ls):
        return jnp.sum(words_of(ls))

    @jax.jit
    def p_cumsum(ls):
        w = words_of(ls)
        return cumsum_small_i32(w != 0)[-1]

    @jax.jit
    def p_compact(ls):
        w = words_of(ls)
        active = w != 0
        acum = cumsum_small_i32(active)
        ucdest = jnp.where(active, acum - 1, tcap)
        points_c = (
            jnp.zeros((tcap,), jnp.int32)
            .at[ucdest]
            .set(jnp.arange(n_pts, dtype=jnp.int32), mode="drop", unique_indices=True)
        )
        words_c = (
            jnp.zeros((tcap,), jnp.int32)
            .at[ucdest]
            .set(w, mode="drop", unique_indices=True)
        )
        return jnp.sum(points_c) + jnp.sum(words_c)

    @jax.jit
    def p_mc_full(ls):
        out = gs.mc_global_cells(
            ls, grid, jnp.float32(iso), vcap, tcap, encode=True, quant_t=True
        )
        return (
            jnp.sum(out[0].astype(jnp.float32))
            + out[3].astype(jnp.float32)
            + out[4].astype(jnp.float32)
        )

    print("== mc internals ==")
    t = bench(p_words, lss, "word build")
    t = bench(p_cumsum, lss, "+ cumsum", t)
    t = bench(p_compact, lss, "+ compaction scatters", t)
    bench(p_mc_full, lss, "full mc encode", 0.0)


if __name__ == "__main__":
    main()
