#!/usr/bin/env python
"""Isolate the slab-ls wall on TPU: raster-only vs +sweep vs +overflow.

Methodology per CLAUDE.md: consume each stage through a single scalar,
time warm repeats with jittered inputs (the tunnel caches identical
(program, input) executions).
"""

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
    from splashsurf_tpu.reconstruction import grid_for_reconstruction
    from splashsurf_tpu.workspace import enable_persistent_cache
    from bench import make_canyon

    enable_persistent_cache()
    radius = 0.011
    pts = make_canyon(8_000_000, radius)
    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    grid0 = grid_for_reconstruction(
        pts, radius, params.compact_support_radius, params.cube_size
    )
    from splashsurf_tpu.reconstruction import _bucket_grid

    grid = _bucket_grid(grid0)
    support = float(params.compact_support_radius)
    hsc = int(np.ceil(support / grid.cell_size))
    W = 340
    ocap = gs._pow2(len(pts) // 64, lo=4096)
    print(f"# grid {grid.n_cells} hsc={hsc} W={W} ocap={ocap}", flush=True)

    pts_d = jax.device_put(pts)
    rho = neighbors.compute_particle_densities(
        pts_d, support, params.particle_rest_mass
    )
    values = (jnp.asarray(params.particle_rest_mass, jnp.float32) / rho)
    jax.block_until_ready(values)

    import functools

    @functools.partial(jax.jit, static_argnames=("what",))
    def probe(p, v, x0, what: str):
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
        return jnp.max(ls)

    for what in ("raster", "sweep", "full"):
        # warm compile
        float(probe(pts_d, values, jnp.int32(340), what))
        ts = []
        for rep in range(3):
            pj = pts_d + np.float32(1e-6 * (rep + 1))
            jax.block_until_ready(pj)
            t0 = time.perf_counter()
            r = float(probe(pj, values, jnp.int32(340), what))
            ts.append(time.perf_counter() - t0)
        print(f"  {what}: {['%.3f' % t for t in ts]} (r={r:.4g})", flush=True)


if __name__ == "__main__":
    main()
