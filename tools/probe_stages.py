#!/usr/bin/env python
"""Cumulative-prefix stage attribution for the dense global frame on TPU.

CLAUDE.md timing rules: per-stage costs are NOT compositional and
block_until_ready pays ~28 ms per OUTPUT ARRAY over the tunnel, so each
probe below jits a PREFIX of the frame pipeline reduced to ONE scalar.
The marginal cost of stage k is T(prefix_k) - T(prefix_{k-1}) with fusion
effects included — the only per-stage number worth optimizing against.

Usage: python tools/probe_stages.py [--n 2000000] [--repeats 3]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import splashsurf_tpu as st
    from splashsurf_tpu import neighbors
    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.reconstruction import (
        _bucket_grid,
        grid_for_reconstruction,
    )
    from splashsurf_tpu.uniform_grid import kernel_extents
    from splashsurf_tpu.workspace import enable_persistent_cache

    enable_persistent_cache()
    sys.path.insert(0, "/root/repo")
    from bench import make_dam_break

    radius = 0.011
    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    csr = float(params.compact_support_radius)
    mass = float(params.particle_rest_mass)
    iso = float(params.iso_surface_threshold)

    pts_np = make_dam_break(args.n, radius)
    n = len(pts_np)
    grid = _bucket_grid(grid_for_reconstruction(pts_np, radius, csr, params.cube_size))
    hsc = kernel_extents(csr, grid.cell_size).half_supported_cells
    print(f"# n={n} grid={grid.n_cells} cells={grid.total_cells/1e6:.1f}M hsc={hsc}",
          file=sys.stderr)

    # plan the density formulation once (host-side planning, like warmup)
    pts0 = jax.device_put(pts_np)
    rho0, _ = neighbors.compute_particle_densities(
        pts0, csr, mass, speculate=True
    )
    dkey = (n, str(pts0.dtype), csr, None, None)
    plan = neighbors._DENSITY_PLAN[dkey]
    print(f"# density plan: kind={plan['kind']}", file=sys.stderr)
    backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    lane_align = 128 if backend == "pallas" else 1
    caps_nv, caps_nt = jax.device_get(
        __import__("splashsurf_tpu.mc.dense", fromlist=["x"])._mc_counts(
            gs.sweep_global(
                *gs.rasterize_global(
                    pts0, jnp.float32(mass) / rho0, grid, 2, hsc, 4096,
                    lane_align=lane_align,
                )[:8],
                grid, csr, hsc, backend,
            ),
            jnp.float32(iso),
        )
    )
    vcap = gs._bucket16(int(caps_nv) * 5 // 4)
    tcap = gs._bucket16(int(caps_nt) * 5 // 4)
    print(f"# caps: v={vcap} t={tcap}", file=sys.stderr)

    nvj = jnp.asarray(n, jnp.int32)

    def density(p):
        rho, chk = neighbors._densities_planned(
            p, csr, mass, plan["grid"], kind=plan["kind"],
            slots=plan["slots"], u_cap=plan["u_cap"], ocap=plan["ocap"],
            ccap=plan["ccap"], n_valid=nvj, has_n_valid=False,
        )
        return rho

    def raster(p):
        rho = density(p)
        return gs.rasterize_global(
            p, jnp.float32(mass) / rho, grid, 2, hsc, 0,
            lane_align=lane_align,
        )

    def sweep(p):
        r = raster(p)
        return gs.sweep_global(*r[:8], grid, csr, hsc, backend)

    def mc(p):
        ls = sweep(p)
        return gs.mc_global_cells(
            ls, grid, jnp.float32(iso), vcap, tcap, encode=True, quant_t=True
        )

    def _raster_scalar(p):
        r = raster(p)
        return sum(jnp.sum(x) for x in r[:4]) + r[8].astype(jnp.float32)

    def _mc_scalar(p):
        out = mc(p)
        return (
            jnp.sum(out[0].astype(jnp.float32))
            + out[3].astype(jnp.float32)
            + out[4].astype(jnp.float32)
        )

    probes = [
        ("density", jax.jit(lambda p: jnp.sum(density(p)))),
        ("raster", jax.jit(_raster_scalar)),
        ("sweep", jax.jit(lambda p: jnp.sum(sweep(p)))),
        ("mc", jax.jit(_mc_scalar)),
    ]

    frames = [
        jax.device_put(pts_np + np.float32(1e-5 * radius * (k + 1)))
        for k in range(args.repeats)
    ]
    jax.block_until_ready(frames)

    prev = 0.0
    for name, fn in probes:
        fn(frames[0]).block_until_ready()  # compile
        times = []
        for f in frames:
            t0 = time.perf_counter()
            fn(f).block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"{name:10s} cumulative {best*1e3:8.1f} ms   marginal "
            f"{(best-prev)*1e3:8.1f} ms   times={[f'{t*1e3:.0f}' for t in times]}"
        )
        prev = best


if __name__ == "__main__":
    main()
