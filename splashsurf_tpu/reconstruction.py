"""Surface reconstruction orchestration.

Host-side driver that mirrors the public API of the reference
(``reconstruct_surface`` / ``SurfaceReconstruction``, lib.rs:330-473 and
reconstruction.rs:17-194) while dispatching to fully vectorized device
pipelines: a single dense global grid for small domains and the
subdomain-batched pipeline for large ones.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from splashsurf_tpu.aabb import Aabb3d
from splashsurf_tpu.mesh import TriMesh3d
from splashsurf_tpu.params import Parameters, SpatialDecomposition
from splashsurf_tpu.uniform_grid import UniformGrid, kernel_extents


@dataclasses.dataclass
class SurfaceReconstruction:
    """Result of a surface reconstruction (lib.rs:246-277).

    In pipelined sequence mode (:func:`reconstruct_sequence`) the mesh
    pull may be deferred: ``mesh`` is None until :meth:`resolve` performs
    the host round trip. The sequence driver always resolves before
    yielding, so public consumers never observe a pending result.
    """

    grid: UniformGrid
    mesh: TriMesh3d
    subdomain_grid: Optional[UniformGrid] = None
    particle_densities: Optional[np.ndarray] = None
    # NeighborhoodLists (list of per-particle neighbor index arrays;
    # .offsets/.indices expose the CSR form)
    particle_neighbors: Optional[list] = None
    particle_inside_aabb: Optional[np.ndarray] = None
    _pending_mesh: Optional[object] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def resolve(self) -> "SurfaceReconstruction":
        """Finalize a deferred mesh pull (no-op when already resolved)."""
        if self._pending_mesh is not None:
            fn, self._pending_mesh = self._pending_mesh, None
            self.mesh = fn()
        return self


# Speculative background-grid plan: jittered animation frames keep the same
# aligned grid, so warm frames skip the AABB host round trip and validate a
# device flag pulled with the mesh totals instead (a miss recomputes cold).
_GRID_PLAN: dict = {}
# Keys whose grid misses even though the cold recompute reproduces the same
# grid (domain extent straddling an alignment boundary): speculating again
# would double-compute every frame, so these pay the cheap AABB pull instead.
_GRID_NOSPEC: set = set()
_PENDING_NOSPEC: dict = {}
# Keys whose warm-frame program set has been pre-traced (see planned_cold in
# reconstruct_surface): once per key is enough — re-planning after a miss
# reuses the already-compiled warm programs.
_WARMED: set = set()


class GridPlanMiss(RuntimeError):
    """A speculated background grid no longer matches the particle AABB."""


def clear_grid_plan():
    _GRID_PLAN.clear()
    _GRID_NOSPEC.clear()
    _WARMED.clear()


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _grid_check_jit():
    import jax

    return jax.jit(
        _grid_check_device_impl, static_argnames=("grid", "grow", "raw_nc")
    )


def _grid_check_device(positions, grid: UniformGrid, grow: float, raw_nc):
    """Jitted device bool (one dispatch — eager jnp ops would each pay a
    tunnel round trip)."""
    return _grid_check_jit()(
        positions, grid=grid, grow=float(grow), raw_nc=tuple(raw_nc)
    )


def _grid_check_device_impl(positions, grid: UniformGrid, grow: float, raw_nc=None):
    """Device bool: would ``grid_for_reconstruction`` on these positions
    reproduce ``grid``? Conservative: alignment quantities landing within
    1e-3 cells of an integer boundary (where f32 device math could disagree
    with the host's f64) report a miss rather than risk a stale grid."""
    import jax.numpy as jnp

    p = jnp.asarray(positions)
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    dt = p.dtype
    cs = jnp.asarray(grid.cell_size, dt)
    glo = lo - jnp.asarray(grow, dt)
    ghi = hi + jnp.asarray(grow, dt)
    q = glo / cs
    mi = jnp.floor(q)
    amin = mi * cs
    q2 = (ghi - amin) / cs
    nc = jnp.ceil(q2)
    exp_mi = jnp.asarray(
        np.round(np.asarray(grid.min) / grid.cell_size), dt
    )
    # compare against the RAW (pre-bucketing) cell counts: the plan's grid
    # dims are padded to compile-shape buckets (_bucket_grid), but the AABB
    # recompute below reproduces the unpadded counts
    exp_nc = jnp.asarray(raw_nc if raw_nc is not None else grid.n_cells, dt)
    # "unsafe" band where f32 device math could floor/ceil differently from
    # the host's f64: 16 ulps covers the ~5-op rounding chain with margin.
    # (An absolute 1e-3 band misfired: a dam-break whose extent lands
    # 9e-4 cells from an integer missed the plan on EVERY frame.)
    ulp = jnp.asarray(np.float32(1.2e-7), dt)
    eps_q = 16.0 * ulp * jnp.maximum(jnp.abs(q), 1.0)
    eps_q2 = 16.0 * ulp * jnp.maximum(jnp.abs(q2), 1.0)
    safe = jnp.all(jnp.abs(q - jnp.round(q)) > eps_q) & jnp.all(
        jnp.abs(q2 - jnp.round(q2)) > eps_q2
    )
    return safe & jnp.all(mi == exp_mi) & jnp.all(nc == exp_nc)


def grid_for_reconstruction(
    particle_positions,
    particle_radius: float,
    compact_support_radius: float,
    cube_size: float,
    particle_aabb: Optional[Aabb3d] = None,
) -> UniformGrid:
    """Construct the implicit background grid for marching cubes (lib.rs:476-516).

    The particle AABB is grown by the particle radius plus the kernel
    evaluation radius so every particle's kernel support lies inside the
    domain, guaranteeing closed surfaces.
    """
    if particle_aabb is None:
        aabb = Aabb3d.from_points(particle_positions)
        aabb = aabb.grow_uniformly(particle_radius)
    else:
        aabb = particle_aabb
    margin = kernel_extents(compact_support_radius, cube_size).kernel_evaluation_radius
    aabb = aabb.grow_uniformly(margin)
    return UniformGrid.from_aabb(aabb, cube_size)


def _bucket_grid_dim(n: int) -> int:
    """Round a grid dimension up to its compile-shape bucket.

    Remote TPU compiles cost minutes per distinct grid shape; bucketing to
    16 steps per octave (step = octave/16, floored at 8 cells) collapses
    the shape space so nearby datasets/resolutions reuse compiled programs
    while padding the cell count by < 6.25% per dimension. Padded cells sit
    beyond the particle AABB margin, hold zero density, and produce no
    surface — the mesh is geometrically identical (triangle ORDER may
    differ because flat cell indices shift; tests assert set-equality).
    """
    step = max(8, 1 << max(n.bit_length() - 5, 3))
    return -(-n // step) * step


def _bucket_grid(grid: UniformGrid) -> UniformGrid:
    import os

    if os.environ.get("SPLASHSURF_TPU_GRID_BUCKET", "1") == "0":
        return grid
    dims = tuple(_bucket_grid_dim(int(c)) for c in grid.n_cells)
    if dims == grid.n_cells:
        return grid
    return UniformGrid(min=grid.min, cell_size=grid.cell_size, n_cells=dims)


def _global_dense_max_cells() -> int:
    """Largest grid (in cells) routed to the dense global pipeline.

    ~40 bytes/cell peak (slot rasters + level set + MC masks); 160M cells
    ≈ 6.4 GB fits a 16 GB v5e with headroom. Raised from 48M in r5: the
    reference-headline 13.35M dam-break (127M cells) measured 3.32 s
    resident vs 3.66 s through the x-slab route (BENCHLOG r5_07); the
    slab path now starts where residency genuinely ends.
    """
    import os

    return int(
        os.environ.get("SPLASHSURF_TPU_GLOBAL_DENSE_MAX_CELLS", 160_000_000)
    )


def reconstruct_surface(
    particle_positions, parameters: Parameters, _defer_pull: bool = False
) -> SurfaceReconstruction:
    """Reconstruct a closed triangle mesh of the fluid surface.

    Dispatches between the global dense pipeline and the subdomain-grid
    pipeline depending on ``parameters.spatial_decomposition`` and the
    auto-disable heuristic (lib.rs:422-443).

    ``_defer_pull`` (internal; used by :func:`reconstruct_sequence`):
    dispatch the frame's device programs but defer the mesh pull — the
    returned object must be :meth:`SurfaceReconstruction.resolve`-d.
    """
    import jax

    _orig_input = particle_positions  # for the deferred-miss redo path

    # Device arrays stay on device end to end (a frame fed from a previous
    # device computation must not bounce through host memory).
    on_device = isinstance(particle_positions, jax.Array)
    if on_device:
        if particle_positions.dtype != parameters.np_dtype:
            particle_positions = particle_positions.astype(parameters.np_dtype)
    else:
        particle_positions = np.ascontiguousarray(
            np.asarray(particle_positions), dtype=parameters.np_dtype
        )
    if particle_positions.ndim != 2 or particle_positions.shape[1] != 3:
        raise ValueError(
            f"particle positions must have shape (N, 3), got {particle_positions.shape}"
        )
    if particle_positions.shape[0] == 0:
        raise ValueError("cannot reconstruct a surface from zero particles")

    inside_aabb = None
    if parameters.particle_aabb is not None:
        mask = np.asarray(parameters.particle_aabb.contains_points(particle_positions))
        inside_aabb = mask
        particle_positions = particle_positions[mask]

    # Warm frames of a sequence reuse the previous frame's aligned grid and
    # defer validation to a device flag pulled with the mesh (saves the
    # per-frame AABB round trip); a miss re-derives the grid cold.
    gkey = None
    if on_device and parameters.particle_aabb is None:
        gkey = (
            int(particle_positions.shape[0]),
            str(particle_positions.dtype),
            float(parameters.particle_radius),
            float(parameters.compact_support_radius),
            float(parameters.cube_size),
        )
    base_positions = particle_positions

    rec = None
    planned_cold = False
    for attempt in range(2):
        use_cached_grid = (
            attempt == 0
            and gkey is not None
            and gkey in _GRID_PLAN
            and gkey not in _GRID_NOSPEC
        )
        grid_check = None
        if use_cached_grid:
            grid, raw_nc = _GRID_PLAN[gkey]
            grow = (
                parameters.particle_radius
                + kernel_extents(
                    parameters.compact_support_radius, parameters.cube_size
                ).kernel_evaluation_radius
            )
            grid_check = _grid_check_device(base_positions, grid, grow, raw_nc)
        else:
            grid = grid_for_reconstruction(
                base_positions,
                parameters.particle_radius,
                parameters.compact_support_radius,
                parameters.cube_size,
                parameters.particle_aabb,
            )
            raw_nc = grid.n_cells
            grid = _bucket_grid(grid)
        particle_positions = base_positions

        # Bucket the particle count so animation sequences with varying N
        # reuse compiled programs (remote TPU compiles cost minutes).
        # Padding dummies form a compact block at ordinary particle spacing
        # just outside the grid: they occupy no subdomain, contribute
        # exactly W=0 to every real particle/grid point (>= 3 support radii
        # away), and keep the density bin lattice small (a support-spaced
        # block would inflate the lattice — and the dense density sweep —
        # by an order of magnitude).
        n_real = len(particle_positions)
        granularity = 1 << max(n_real.bit_length() - 3, 6)
        n_padded = -(-n_real // granularity) * granularity
        if n_padded > n_real:
            pad = n_padded - n_real
            support = parameters.compact_support_radius
            # 0.51 support: at most 2 dummies per axis land in any
            # support-sized density bin (8 per bin), and never 3 — an exact
            # half-bin lattice would tie-break on float rounding into
            # 27/bin, forcing thousands of particles through the overflow
            # path.
            spacing = 0.51 * support
            side = int(np.ceil(pad ** (1.0 / 3.0)))
            ii = np.arange(pad)
            cube = np.stack(
                [ii // (side * side), (ii // side) % side, ii % side], axis=1
            ).astype(particle_positions.dtype)
            # Offset along -x only, flush with the grid corner in y/z: the
            # density bin lattice spans the union box of real+dummy
            # particles, so a diagonal offset would inflate it in every
            # dimension.
            start = np.asarray(grid.min, dtype=particle_positions.dtype).copy()
            start[0] -= 4.0 * support + side * spacing
            dummies = start + cube * spacing
            if on_device:
                import jax.numpy as jnp

                particle_positions = jnp.concatenate(
                    [particle_positions, jnp.asarray(dummies)], axis=0
                )
            else:
                particle_positions = np.concatenate(
                    [particle_positions, dummies], axis=0
                )

        decomposition = parameters.spatial_decomposition
        use_slabbed = False
        if decomposition == SpatialDecomposition.UNIFORM_GRID:
            n_sub = parameters.grid_decomposition.subdomain_num_cubes_per_dim
            if parameters.grid_decomposition.auto_disable:
                # Auto-disable decomposition if the domain is hardly larger
                # than a single subdomain (lib.rs:422-443).
                max_cells = max(grid.n_cells)
                if max_cells <= 1.2 * n_sub:
                    decomposition = SpatialDecomposition.NONE
                elif grid.total_cells <= _global_dense_max_cells():
                    # TPU dispatch: when the whole background grid fits in
                    # HBM, the dense global raster sweep beats the
                    # decomposition pipeline outright (no pair
                    # expansion/sort, no halo, no stitching). Decomposition
                    # remains the scalable path for sparse/huge domains
                    # (dense_subdomains.rs rationale).
                    decomposition = SpatialDecomposition.NONE
                else:
                    # Mid-scale grids (past the resident dense gate but a
                    # bounded number of x-slabs): the streamed dense path
                    # keeps the dense cost structure — no pair sort, no
                    # per-subdomain machinery, no stitch (r4's 8M sparse
                    # walls; ops/slab_sweep.py). Single-device only; the
                    # subdomain path remains for multi-device + huge grids.
                    import os as _os
                    import jax as _jax

                    if (
                        _os.environ.get("SPLASHSURF_TPU_SLAB_DENSE", "1")
                        == "1"
                        and len(_jax.devices()) == 1
                        and int(np.prod(np.asarray(grid.n_points, np.int64)))
                        < 2**31
                    ):
                        from splashsurf_tpu.ops.slab_sweep import (
                            gs_dense_gate,
                            slab_width_cells,
                        )

                        W = slab_width_cells(grid, gs_dense_gate())
                        n_slabs = -(-grid.n_cells[0] // W)
                        max_slabs = int(
                            _os.environ.get(
                                "SPLASHSURF_TPU_SLAB_MAX_SLABS", "64"
                            )
                        )
                        use_slabbed = n_slabs <= max_slabs

        if decomposition == SpatialDecomposition.UNIFORM_GRID:
            if use_cached_grid:
                # the subdomain pipeline has no deferred-check hook; fall
                # back to a cold grid rather than trust the speculation
                _GRID_PLAN.pop(gkey, None)
                continue
            if use_slabbed:
                from splashsurf_tpu.ops.slab_sweep import (
                    reconstruct_surface_slabbed,
                )

                rec = reconstruct_surface_slabbed(
                    particle_positions, parameters, grid,
                    particle_inside_aabb=inside_aabb,
                    n_valid=n_real if n_padded > n_real else None,
                )
            else:
                from splashsurf_tpu.subdomains import (
                    reconstruct_surface_subdomain_grid,
                )

                rec = reconstruct_surface_subdomain_grid(
                    particle_positions, parameters, grid,
                    particle_inside_aabb=inside_aabb,
                    n_valid=n_real if n_padded > n_real else None,
                )
        else:
            if grid.total_cells > 128_000_000:
                raise ValueError(
                    f"global reconstruction would materialize a dense "
                    f"{grid.n_cells} grid ({grid.total_cells} cells); use "
                    f"SpatialDecomposition.UNIFORM_GRID for domains this large"
                )
            from splashsurf_tpu.global_pipeline import reconstruct_surface_global

            try:
                rec = reconstruct_surface_global(
                    particle_positions, parameters, grid,
                    particle_inside_aabb=inside_aabb, grid_check=grid_check,
                    n_valid=n_real if n_padded > n_real else None,
                    defer_pull=_defer_pull
                    and not parameters.global_neighborhood_list,
                )
            except GridPlanMiss:
                _GRID_MISSED_WITH = _GRID_PLAN.pop(gkey, None)
                # remember the missed grid: if the cold recompute produces
                # the same grid, the domain straddles an alignment boundary
                # and speculation would miss every frame — stop speculating
                if _GRID_MISSED_WITH is not None:
                    _PENDING_NOSPEC[gkey] = _GRID_MISSED_WITH
                continue
            if gkey is not None:
                if _PENDING_NOSPEC.pop(gkey, None) == (grid, raw_nc):
                    _GRID_NOSPEC.add(gkey)
                else:
                    if not use_cached_grid and gkey not in _WARMED:
                        planned_cold = True
                    _GRID_PLAN[gkey] = (grid, raw_nc)
        break
    assert rec is not None

    if planned_cold:
        # Planning frames compile the COLD program set; the next frame would
        # otherwise pay several seconds tracing+compiling the WARM set
        # (_densities_planned, the fitted-overflow rasterize/sweep, the grid
        # check — measured 4.2 s on frame 1 of an animation at 2M). Dispatch
        # one discarded deferred-pull frame on the same input: it exercises
        # exactly the warm-frame programs with no host round trip, moving
        # the one-time cost into the planning frame.
        import os

        if os.environ.get("SPLASHSURF_TPU_PREWARM", "1") == "1":
            _WARMED.add(gkey)
            try:
                reconstruct_surface(_orig_input, parameters, _defer_pull=True)
            except Exception:
                _WARMED.discard(gkey)

    # Trim count-padding dummies out of per-particle outputs.
    if n_padded > n_real:
        if rec.particle_densities is not None:
            rec.particle_densities = rec.particle_densities[:n_real]
        if rec.particle_neighbors is not None:
            from splashsurf_tpu.neighbors import NeighborhoodLists

            rec.particle_neighbors = NeighborhoodLists(
                rec.particle_neighbors[:n_real]
            )

    if rec._pending_mesh is not None:
        # Wrap the dense-path PendingPull: its resolve() validates the
        # speculation plans (updating them on a miss exactly like the
        # synchronous path); on a miss the whole frame re-runs through the
        # synchronous entry point with the original inputs.
        pending = rec._pending_mesh
        _gkey, _grid, _raw_nc = gkey, grid, raw_nc

        def _resolve_mesh(rec=rec):
            out = pending.resolve()
            if out[0] == "ok":
                return TriMesh3d(vertices=out[1], triangles=out[2])
            if out[0] == "redo_grid" and _gkey is not None:
                missed = _GRID_PLAN.pop(_gkey, None)
                if missed is not None:
                    _PENDING_NOSPEC[_gkey] = missed
            redo = reconstruct_surface(_orig_input, parameters)
            rec.grid = redo.grid
            rec.particle_densities = redo.particle_densities
            return redo.mesh

        rec._pending_mesh = _resolve_mesh
    return rec


def reconstruct_sequence(frames, parameters: Parameters):
    """Pipelined sequence reconstruction (generator over frames).

    Mirrors the reference's multi-frame runner (reconstruct.rs:405-432)
    with device pipelining instead of a thread pool: frame t+1's device
    programs are dispatched BEFORE frame t's mesh is pulled, so the mesh
    transfer/decode of one frame overlaps the next frame's compute (warm
    frames are dispatch-only thanks to the speculation plans). Yields one
    resolved :class:`SurfaceReconstruction` per input frame, in order.
    Set SPLASHSURF_TPU_PIPELINE=0 to force frame-at-a-time execution.
    """
    import os

    pipeline = os.environ.get("SPLASHSURF_TPU_PIPELINE", "1") != "0"
    prev = None
    for pts in frames:
        cur = reconstruct_surface(pts, parameters, _defer_pull=pipeline)
        if prev is not None:
            yield prev.resolve()
        prev = cur
    if prev is not None:
        yield prev.resolve()
