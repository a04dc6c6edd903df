#!/usr/bin/env python
"""Isolate the slab-ls wall on TPU: partition, raster-only, +sweep,
+overflow — at bucketed per-slab row counts (the production path).

Methodology per CLAUDE.md: consume each stage through a single scalar,
time warm repeats with jittered inputs (the tunnel caches identical
(program, input) executions).
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import splashsurf_tpu as st
    from splashsurf_tpu import neighbors
    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.ops import slab_sweep as sl
    from splashsurf_tpu.reconstruction import grid_for_reconstruction, _bucket_grid
    from splashsurf_tpu.workspace import enable_persistent_cache
    from bench import make_canyon

    enable_persistent_cache()
    radius = 0.011
    pts = make_canyon(8_000_000, radius)
    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    grid = _bucket_grid(grid_for_reconstruction(
        pts, radius, params.compact_support_radius, params.cube_size
    ))
    support = float(params.compact_support_radius)
    hsc = int(np.ceil(support / grid.cell_size))
    pad = hsc + 1
    W = 340
    n_slabs = -(-grid.n_cells[0] // W)
    n = len(pts)
    K = gs._bucket16(max(-(-n // n_slabs) * 5 // 4, 4096))
    ocap = gs._pow2(K // 64, lo=4096)
    print(f"# grid {grid.n_cells} hsc={hsc} W={W} K={K} ocap={ocap}",
          flush=True)

    pts_d = jax.device_put(pts)
    rho = neighbors.compute_particle_densities(
        pts_d, support, params.particle_rest_mass
    )
    values = (jnp.asarray(params.particle_rest_mass, jnp.float32) / rho)
    jax.block_until_ready(values)

    @jax.jit
    def part(p, v):
        pbuf, vbuf, counts = sl._slab_partition(
            p, v, grid, W, n_slabs, K, pad
        )
        return pbuf, vbuf, counts

    pbuf, vbuf, counts = part(pts_d, values)
    jax.block_until_ready(pbuf)
    print("  counts:", np.asarray(counts).tolist(), flush=True)

    @functools.partial(jax.jit, static_argnames=("what",))
    def probe(pb, vb, sidx, x0, what: str):
        p = jax.lax.dynamic_slice(pb, (sidx * K, jnp.int32(0)), (K, 3))
        v = jax.lax.dynamic_slice(vb, (sidx * K,), (K,))
        out = gs.rasterize_global(
            p, v, grid, 2, hsc, ocap, lane_align=128, slab_ncx=W, slab_x0=x0
        )
        fx, fy, fz, fv, opx, opy, opz, oval, n_over = out
        if what == "raster":
            return fx[0, 5].sum() + fv[1, 7].sum() + n_over
        if what == "sweep":
            ls = gs.sweep_global(
                fx, fy, fz, fv, opx[:0], opy[:0], opz[:0], oval[:0],
                grid, support, hsc, "pallas", slab_npx=W + 1, slab_x0=x0,
            )
            return jnp.max(ls)
        ls = gs.sweep_global(
            fx, fy, fz, fv, opx, opy, opz, oval,
            grid, support, hsc, "pallas", slab_npx=W + 1, slab_x0=x0,
        )
        if what == "full":
            return jnp.max(ls)
        enc = gs.mc_global_cells(
            ls, grid, jnp.asarray(0.6, jnp.float32), 1 << 21, 1 << 22,
            encode=True, quant_t=True, own_px=jnp.int32(W),
        )
        return enc[3] + enc[4] + jnp.max(ls)

    # partition timing
    ts = []
    for rep in range(3):
        pj = pts_d + np.float32(1e-6 * (rep + 1))
        jax.block_until_ready(pj)
        t0 = time.perf_counter()
        o = part(pj, values)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    print(f"  partition: {['%.3f' % t for t in ts]}", flush=True)

    # full production loop: 8 slabs of _slab_ls + _slab_enc, async like the
    # bench (one block at the end) — isolates loop-context overheads
    vcap, tcap = gs._bucket16(1_800_000), gs._bucket16(3_000_000)
    for slots in (2,):
        kw = dict(grid=grid, W=W, K=K, slots=slots, hsc=hsc,
                  ocap=ocap, backend="pallas", support=support)
        def run_loop(pb):
            plane = jnp.zeros((grid.n_cells[1] + 1, grid.n_cells[2] + 1),
                              jnp.float32)
            use_plane = jnp.asarray(False)
            outs = []
            for s in reversed(range(n_slabs)):
                ls, plane, n_over = sl._slab_ls(
                    pb, vbuf, jnp.int32(s), plane, use_plane,
                    jnp.int32(s * W), **kw)
                use_plane = jnp.asarray(True)
                enc = sl._slab_enc(
                    ls, jnp.asarray(0.6, jnp.float32), jnp.int32(W), grid,
                    vcap, tcap, True)
                outs.append(enc)
            return jax.device_get(outs)
        run_loop(pbuf)
        ts = []
        for rep in range(2):
            pj = pbuf + np.float32(1e-6 * (rep + 1))
            jax.block_until_ready(pj)
            t0 = time.perf_counter()
            run_loop(pj)
            ts.append(time.perf_counter() - t0)
        print(f"  prod_loop slots={slots}: {['%.3f' % t for t in ts]}",
              flush=True)

    # production _slab_ls (materialized ls output + plane chain), slots 2/4
    for slots in (2, 4):
        plane0 = jnp.zeros((grid.n_cells[1] + 1, grid.n_cells[2] + 1),
                           jnp.float32)
        args = (pbuf, vbuf, jnp.int32(1), plane0, jnp.asarray(True),
                jnp.int32(340))
        kw = dict(grid=grid, W=W, K=K, slots=slots, hsc=hsc,
                  ocap=ocap, backend="pallas", support=support)
        jax.block_until_ready(sl._slab_ls(*args, **kw))
        ts = []
        for rep in range(3):
            pj = pbuf + np.float32(1e-6 * (rep + 1))
            jax.block_until_ready(pj)
            t0 = time.perf_counter()
            out = sl._slab_ls(pj, vbuf, jnp.int32(1), plane0,
                              jnp.asarray(True), jnp.int32(340), **kw)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"  prod_ls slots={slots}: {['%.3f' % t for t in ts]}",
              flush=True)

    for what in ("raster", "sweep", "full", "mc"):
        float(probe(pbuf, vbuf, jnp.int32(1), jnp.int32(340), what))
        ts = []
        for rep in range(3):
            pj = pbuf + np.float32(1e-6 * (rep + 1))
            jax.block_until_ready(pj)
            t0 = time.perf_counter()
            r = float(probe(pj, vbuf, jnp.int32(1), jnp.int32(340), what))
            ts.append(time.perf_counter() - t0)
        print(f"  {what}: {['%.3f' % t for t in ts]} (r={r:.4g})", flush=True)


if __name__ == "__main__":
    main()
