#!/usr/bin/env python
"""End-to-end reconstruction benchmark on real TPU hardware.

Reconstructs a synthetic dam-break-like block of jittered lattice particles
with canyon-scale parameters (BASELINE.md: r=0.011, support=4r, cube=1.5r,
threshold 0.6) and reports end-to-end particle throughput.

Baseline: the reference's README benchmark processes 13,353,401 particles in
2.467 s on an Apple M4 Pro == 5.41 Mparticles/s end-to-end (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_MPPS = 13_353_401 / 2.467 / 1e6  # 5.413 Mparticles/s (M4 Pro, Rust)


def make_dam_break(n_target: int, radius: float, seed: int = 0) -> np.ndarray:
    """Jittered-lattice fluid block with ~8:3:2 aspect (dam-break-like)."""
    rng = np.random.default_rng(seed)
    spacing = 2.0 * radius
    # nx:ny:nz ~ 8:3:2 with nx*ny*nz ~ n_target
    base = (n_target / (8 * 3 * 2)) ** (1.0 / 3.0)
    nx, ny, nz = int(8 * base), int(3 * base), int(2 * base)
    coords = lambda n: (np.arange(n) + 0.5) * spacing
    X, Y, Z = np.meshgrid(coords(nx), coords(ny), coords(nz), indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
    pts += (rng.uniform(-0.25, 0.25, pts.shape) * spacing).astype(np.float32)
    return pts


def make_canyon(
    n_target: int, radius: float, seed: int = 0, layers: int = 8
) -> np.ndarray:
    """Sparse benchmark fluid: a thin terrain-following sheet over a large
    horizontal extent (the shape of the reference's canyon headline run,
    README.md:169-199 — 13.4M particles over a 21.5B-cell grid). The fluid
    AABB grid far exceeds the dense-path gate, so reconstruction routes
    through the subdomain pipeline. Fewer ``layers`` spread the same
    particle count over more area (more occupied subdomains)."""
    rng = np.random.default_rng(seed)
    spacing = 2.0 * radius
    base = (n_target / (4 * layers)) ** 0.5
    nx, nz = int(4 * base), int(base)
    x = (np.arange(nx) + 0.5) * spacing
    z = (np.arange(nz) + 0.5) * spacing
    X, Z = np.meshgrid(x, z, indexing="ij")
    # rolling terrain: two incommensurate waves, amplitude >> sheet depth
    H = 0.9 * (np.sin(X * 1.7) * np.cos(Z * 2.3) + 0.6 * np.sin(X * 0.4 + Z))
    pts = np.empty((nx * nz * layers, 3), np.float32)
    k = 0
    for l in range(layers):
        Y = H + (l + 0.5) * spacing
        sl = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
        pts[k : k + nx * nz] = sl
        k += nx * nz
    pts += (rng.uniform(-0.25, 0.25, pts.shape) * spacing).astype(np.float32)
    return pts


def bench_stage(stage: str, n: int, repeats: int):
    """Micro-benchmarks of isolated stages (criterion-bench analogs:
    bench_grid_loop / bench_neighborhood / bench_mesh / bench_aabb)."""
    import jax
    import jax.numpy as jnp

    import splashsurf_tpu as st
    from splashsurf_tpu import neighbors

    radius = 0.011
    pts = jax.device_put(make_dam_break(n, radius))
    params = st.Parameters.new_relative(radius, 4.0, 1.5)

    if stage == "density":
        f = lambda: neighbors.compute_particle_densities(
            pts, params.compact_support_radius, params.particle_rest_mass
        )
        unit, scale = "Mparticles/s", n / 1e6
    elif stage == "aabb":
        from splashsurf_tpu.aabb import aabb_from_points

        f = lambda: aabb_from_points(pts)
        unit, scale = "Mparticles/s", n / 1e6
    elif stage == "normals":
        rec = st.reconstruct_surface(pts, params)
        from splashsurf_tpu.mesh import vertex_normals

        v = jnp.asarray(rec.mesh.vertices)
        t = jnp.asarray(rec.mesh.triangles)
        nf = jax.jit(vertex_normals)
        f = lambda: nf(v, t)
        unit, scale = "Mtris/s", len(rec.mesh.triangles) / 1e6
    elif stage == "mc":
        # isolated marching cubes over the dense level set (BASELINE.json
        # metric 3: Mcells/s)
        from splashsurf_tpu.ops import global_sweep as gs
        from splashsurf_tpu.reconstruction import grid_for_reconstruction
        from splashsurf_tpu.uniform_grid import kernel_extents

        h = params.compact_support_radius
        grid = grid_for_reconstruction(
            np.asarray(pts), radius, h, params.cube_size
        )
        hsc = kernel_extents(h, grid.cell_size).half_supported_cells
        rho = neighbors.compute_particle_densities(
            pts, h, params.particle_rest_mass
        )
        values = jnp.asarray(params.particle_rest_mass, jnp.float32) / rho
        on_tpu = jax.default_backend() == "tpu"
        r = gs.rasterize_global(
            pts, values, grid, 2, hsc, gs._pow2(n // 64, lo=4096),
            lane_align=128 if on_tpu else 1,
        )
        ls = gs.sweep_global(
            *r[:8], grid, float(h), hsc, "pallas" if on_tpu else "scan"
        )
        ls.block_until_ready()
        from splashsurf_tpu.mc.dense import _mc_counts

        iso = jnp.float32(params.iso_surface_threshold)
        nv, nt = jax.device_get(_mc_counts(ls, iso))
        vcap = gs._bucket16(int(nv) * 5 // 4)
        tcap = gs._bucket16(int(nt) * 5 // 4)
        f = lambda: gs.mc_global_packed(ls, grid, iso, vcap, tcap)
        unit, scale = "Mcells/s", grid.total_cells / 1e6
    else:
        raise SystemExit(f"unknown stage {stage}")

    jax.block_until_ready(f())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "metric": f"stage_{stage}",
                "value": round(scale / best, 3),
                "unit": unit,
                "vs_baseline": 0.0,
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000, help="particle count")
    ap.add_argument("--smoke", action="store_true", help="small fast run")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--profile", action="store_true", help="print stage timings")
    ap.add_argument(
        "--stage",
        default=None,
        choices=["density", "aabb", "normals", "mc"],
        help="micro-benchmark one stage instead of the full frame",
    )
    ap.add_argument(
        "--frames",
        type=int,
        default=0,
        help="sequence mode: reconstruct N jittered frames back to back "
        "and report frames/s (the --mt-files analog on-device)",
    )
    ap.add_argument(
        "--sparse",
        action="store_true",
        help="canyon-like sparse sheet over a huge grid: routes through "
        "the subdomain pipeline (the reference headline configuration)",
    )
    ap.add_argument(
        "--layers",
        type=int,
        default=8,
        help="sheet thickness of the --sparse canyon in particle layers; "
        "fewer layers -> more occupied subdomains at the same N "
        "(--layers 2 at 13.4M exercises the >=20k-subdomain streaming "
        "regime of the reference headline scale)",
    )
    args = ap.parse_args()
    if args.stage:
        from splashsurf_tpu.workspace import enable_persistent_cache

        enable_persistent_cache()
        bench_stage(args.stage, args.n, args.repeats)
        return
    if args.smoke:
        args.n = min(args.n, 100_000)
        args.repeats = 1

    import jax

    import splashsurf_tpu as st
    from splashsurf_tpu.workspace import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    print(f"# compilation cache: {cache_dir}", file=sys.stderr)

    radius = 0.011
    if args.sparse:
        if args.n == 2_000_000 and not args.smoke:
            args.n = 8_000_000  # default sparse scale
        pts = make_canyon(args.n, radius, layers=args.layers)
    else:
        pts = make_dam_break(args.n, radius)
    n = len(pts)
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    print(f"# particles: {n}", file=sys.stderr)

    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    if args.sparse:
        from splashsurf_tpu.reconstruction import grid_for_reconstruction

        g = grid_for_reconstruction(
            pts, radius, params.compact_support_radius, params.cube_size
        )
        nc = g.n_cells
        print(
            f"# sparse grid: {nc[0]}x{nc[1]}x{nc[2]} = "
            f"{nc[0] * nc[1] * nc[2] / 1e6:.0f}M cells (dense gate: 48M)",
            file=sys.stderr,
        )

    # Pre-upload the jittered frames: the serving tunnel moves host<->device
    # data at ~25 MB/s, which models no real TPU ingest path (the reference
    # benchmark similarly reads its input from the OS page cache). Each
    # repeat gets its own jittered frame because the tunnel caches identical
    # (program, input) executions. The mesh download stays inside the timed
    # region - it is the output.
    frames = [
        jax.device_put(pts + np.float32(1e-5 * radius * (rep + 1)))
        for rep in range(args.repeats)
    ]
    jax.block_until_ready(frames)

    # Warmup (compiles every stage for this frame's shapes), with
    # persistent-cache accountability: count hits/misses so a slow warmup is
    # attributable (cache mismatch vs genuinely cold compile).
    import logging

    class _CacheCounter(logging.Handler):
        def __init__(self):
            super().__init__(level=logging.DEBUG)
            self.hits = 0
            self.misses = []

        def emit(self, record):
            msg = record.getMessage()
            if "Persistent compilation cache hit" in msg:
                self.hits += 1
            elif "PERSISTENT COMPILATION CACHE MISS" in msg:
                self.misses.append(msg.split("'")[1] if "'" in msg else "?")

    counter = _CacheCounter()
    clog = logging.getLogger("jax._src.compiler")
    old_level = clog.level
    old_prop = clog.propagate
    clog.addHandler(counter)
    clog.setLevel(logging.DEBUG)
    clog.propagate = False  # count, don't spam stderr with DEBUG records
    t0 = time.perf_counter()
    rec = st.reconstruct_surface(jax.device_put(pts), params)
    warm = time.perf_counter() - t0
    clog.removeHandler(counter)
    clog.setLevel(old_level)
    clog.propagate = old_prop
    print(
        f"# warmup (incl. compile): {warm:.2f}s; mesh: "
        f"{rec.mesh.num_vertices} verts / {rec.mesh.num_triangles} tris",
        file=sys.stderr,
    )
    print(
        f"# warmup cache: {counter.hits} hits, {len(counter.misses)} misses"
        + (
            " (miss: " + ", ".join(sorted(set(counter.misses))[:12]) + ")"
            if counter.misses
            else ""
        ),
        file=sys.stderr,
    )
    if args.sparse:
        from splashsurf_tpu import subdomains as sub_mod

        line = f"# subdomain run: {dict(sub_mod.LAST_RUN)}"
        try:
            ms = jax.devices()[0].memory_stats() or {}
            peak = ms.get("peak_bytes_in_use")
            if peak:
                line += f"; peak HBM {peak / 1e9:.2f} GB"
        except Exception:
            pass
        print(line, file=sys.stderr)

    if args.frames:
        # sequence mode: steady-state frames/s over a longer run (frame t+1
        # is already on device while t finishes — dispatch overlap counts)
        seq = [
            jax.device_put(pts + np.float32(1e-5 * radius * (k + 7)))
            for k in range(args.frames)
        ]
        jax.block_until_ready(seq)
        t0 = time.perf_counter()
        for rec in st.reconstruct_sequence(seq, params):
            assert rec.mesh.num_triangles > 0
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "sequence_frames_per_second",
                    "value": round(args.frames / dt, 3),
                    "unit": "frames/s",
                    "vs_baseline": round(
                        (args.frames / dt) / (13_353_401 / 2.467 / n), 3
                    ),
                }
            )
        )
        return

    times = []
    for frame in frames:
        if args.profile:
            from splashsurf_tpu import profiling

            profiling.reset()
        t0 = time.perf_counter()
        rec = st.reconstruct_surface(frame, params)
        times.append(time.perf_counter() - t0)
        if args.profile:
            print(f"# frame {times[-1]:.3f}s", file=sys.stderr)
            print(profiling.write_to_string(), file=sys.stderr)
    best = min(times)
    mpps = n / best / 1e6
    med = sorted(times)[len(times) // 2]
    print(f"# frame times: {[f'{t:.3f}' for t in times]}", file=sys.stderr)
    print(
        f"# median {med:.3f}s ({n / med / 1e6:.3f} Mp/s), "
        f"max/min {max(times) / best:.2f}; note: the reference baseline "
        f"(2.467 s) INCLUDES xyz load (58.6 ms) + VTK write (94.2 ms) "
        f"(~6% of frame) which this metric excludes",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": (
                    "sparse_subdomain_reconstruction_throughput"
                    if args.sparse
                    else "end_to_end_reconstruction_throughput"
                ),
                "value": round(mpps, 3),
                "unit": "Mparticles/s",
                "vs_baseline": round(mpps / BASELINE_MPPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
