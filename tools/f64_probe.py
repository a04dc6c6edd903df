#!/usr/bin/env python
"""Per-stage f64-on-TPU bisection probe (VERDICT r5 item 3).

The r4 f64 smoke compiled but returned an EMPTY mesh (0v/0t). This probe
runs the dense global path stage by stage at small n in BOTH dtypes and
prints scalar summaries after each stage, so the stage where the f64 field
dies is visible. Run on the real TPU (default env) — CPU passes already.

Usage: python tools/f64_probe.py [n_particles]
"""

import sys
import time

import numpy as np


def stats(name, x):
    import jax.numpy as jnp

    x = jnp.asarray(x)
    mn = float(jnp.min(x))
    mx = float(jnp.max(x))
    nan = int(jnp.sum(jnp.isnan(x.astype(jnp.float32))))
    print(f"  {name}: dtype={x.dtype} shape={x.shape} min={mn:.6g} "
          f"max={mx:.6g} nans={nan}", flush=True)
    return mn, mx


def main():
    import os

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    # Pallas density compiles minutes per new (x64-variant) shape over the
    # tunnel and is irrelevant to the f64 question — probe on the XLA path.
    os.environ.setdefault("SPLASHSURF_TPU_DENSITY_PALLAS", "0")
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import splashsurf_tpu as st
    from splashsurf_tpu import neighbors
    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.reconstruction import grid_for_reconstruction
    from splashsurf_tpu.workspace import enable_persistent_cache
    from bench import make_dam_break

    enable_persistent_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    radius = 0.011
    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    support = params.compact_support_radius
    pts32 = make_dam_break(n, radius)

    dtypes = ((np.float32, "f32"), (np.float64, "f64"))
    if "--f64-only" in sys.argv:
        dtypes = ((np.float64, "f64"),)
    for dtype, tag in dtypes:
        print(f"== {tag} ==", flush=True)
        pts = jnp.asarray(pts32.astype(dtype))
        p = params if dtype == np.float32 else params.try_convert("float64")
        grid = grid_for_reconstruction(
            np.asarray(pts), p.particle_radius, p.compact_support_radius,
            p.cube_size,
        )
        print(f"  grid: n_points={grid.n_points} cell={grid.cell_size}",
              flush=True)
        t0 = time.perf_counter()
        rho = neighbors.compute_particle_densities(
            pts, float(p.compact_support_radius), float(p.particle_rest_mass)
        )
        rho.block_until_ready()
        print(f"  [density {time.perf_counter()-t0:.1f}s]", flush=True)
        stats("rho", rho)
        values = jnp.asarray(p.particle_rest_mass, pts.dtype) / rho
        stats("values", values)

        hsc = int(np.ceil(support / grid.cell_size))
        t0 = time.perf_counter()
        out = gs.rasterize_global(pts, values, grid, 2, hsc, 4096)
        jax.block_until_ready(out)
        print(f"  [rasterize {time.perf_counter()-t0:.1f}s]", flush=True)
        fx, fy, fz, fv, opx, opy, opz, oval, n_over = out
        stats("fv (splat table)", fv)
        stats("fx", fx)
        stats("opx (overflow fill)", opx)
        print(f"  n_over={int(n_over)}", flush=True)
        t0 = time.perf_counter()
        ls = gs.sweep_global(
            fx, fy, fz, fv, opx, opy, opz, oval, grid, float(support), hsc,
            "scan",
        )
        ls.block_until_ready()
        print(f"  [sweep {time.perf_counter()-t0:.1f}s]", flush=True)
        stats("ls", ls)
        ls_h = np.asarray(ls)
        bad = np.argwhere(np.isnan(ls_h))
        if len(bad):
            print(f"  NaN ijk (first 12 of {len(bad)}): {bad[:12].tolist()}",
                  flush=True)
            # isolate: dense sweep only (no overflow scatter)
            ls2 = gs.sweep_global(
                fx, fy, fz, fv,
                opx[:0], opy[:0], opz[:0], oval[:0],
                grid, float(support), hsc, "scan",
            )
            n2 = int(np.isnan(np.asarray(ls2)).sum())
            print(f"  NaNs with overflow scatter OFF: {n2}", flush=True)
        iso = float(p.iso_surface_threshold)
        n_in = int(jnp.sum(ls >= jnp.asarray(iso, ls.dtype)))
        print(f"  points >= iso({iso}): {n_in}", flush=True)

        from splashsurf_tpu.mc import dense as mc_dense

        nv, nt = mc_dense._mc_counts(ls, jnp.asarray(iso, ls.dtype))
        print(f"  mc counts: nv={int(nv)} nt={int(nt)}", flush=True)


if __name__ == "__main__":
    main()
