"""Global (single dense grid) reconstruction pipeline.

The analog of the reference's global path (reconstruction.rs:65-194):
densities -> level set on the full background grid -> marching cubes. Only
viable when the whole grid fits in memory; the subdomain pipeline is the
scalable path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import neighbors
from splashsurf_tpu.mesh import TriMesh3d
from splashsurf_tpu.params import Parameters
from splashsurf_tpu.reconstruction import SurfaceReconstruction
from splashsurf_tpu.uniform_grid import UniformGrid


# Frame speculation outcome counters (observability; reset freely in tests)
SPECULATION_STATS = {
    "frames": 0,
    "density_miss": 0,
    "grid_miss": 0,
    "caps_retry": 0,
    "overflow_retry": 0,
}


def compute_densities(positions, parameters: Parameters):
    """Per-particle SPH densities via the sort-based cell binning."""
    return neighbors.compute_particle_densities(
        positions,
        parameters.compact_support_radius,
        parameters.particle_rest_mass,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "bgrid", "kind", "kslots", "u_cap", "ocap", "ccap",
        "csr", "hsc", "slots", "backend", "ofc", "vcap", "tcap",
        "nv_b", "nc_b", "has_n_valid",
    ),
)
def _warm_frame(
    positions,
    particle_rest_mass,
    iso,
    n_valid,
    *,
    has_n_valid: bool,
    grid,
    bgrid,
    kind: str,
    kslots: int,
    u_cap: int,
    ocap: int,
    ccap: int,
    csr: float,
    hsc: int,
    slots: int,
    backend: str,
    ofc: int,
    vcap: int,
    tcap: int,
    nv_b: int,
    nc_b: int,
):
    """The ENTIRE warm frame as one program: densities (speculative plan) ->
    raster -> level-set sweep -> packed MC -> transfer slices.

    One dispatch + one device_get per frame. Splitting these into per-stage
    jits measured ~500 ms/frame of inter-program overhead over the serving
    tunnel at 2M particles — the stages themselves sum to <500 ms.
    """
    from splashsurf_tpu.ops import global_sweep as gs

    rho, dcheck = neighbors._densities_planned(
        positions, csr, particle_rest_mass, bgrid,
        kind=kind, slots=kslots, u_cap=u_cap, ocap=ocap, ccap=ccap,
        n_valid=n_valid, has_n_valid=has_n_valid,
    )
    values = particle_rest_mass / rho
    lane_align = 128 if backend.startswith("pallas") else 1
    r = gs.rasterize_global(
        positions, values, grid, slots, hsc, ofc, lane_align=lane_align
    )
    ls = gs.sweep_global(*r[:8], grid, csr, hsc, backend)
    import os

    quant_t = (
        ls.dtype == jnp.float32
        and os.environ.get("SPLASHSURF_TPU_PULL_QUANT", "1") == "1"
    )
    out = gs.mc_global_cells(
        ls, grid, jnp.asarray(iso, ls.dtype), vcap, tcap, encode=True,
        quant_t=quant_t,
    )
    t, packed_s, bincl, total_v, total_t, total_c = out
    sl = gs._pack_cellwise(t, packed_s, nv=nv_b, nc=nc_b)
    return sl + (bincl, total_v, total_t, total_c, r[8], dcheck, rho)


def _try_warm_frame(
    positions, parameters: Parameters, grid, hsc, grid_check, n_valid=None
):
    """Run the single-dispatch warm frame if every plan is in place.

    Returns (verts, tris, rho) on success, None when any plan is missing or
    missed (caller falls back to the cold multi-dispatch orchestration).
    Raises GridPlanMiss when the speculated background grid is stale.
    """
    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.profiling import profile
    from splashsurf_tpu.reconstruction import GridPlanMiss

    import os

    if os.environ.get("SPLASHSURF_TPU_MONO_FRAME", "0") != "1":
        # One giant program measured ~2x SLOWER than the per-stage jits on
        # TPU (XLA layout/scheduling pessimizes the composed graph); keep
        # the fused frame opt-in until that is understood.
        return None
    csr = float(parameters.compact_support_radius)
    dtype = str(positions.dtype)
    dkey = (
        int(positions.shape[0]), dtype, csr, None,
        None if n_valid is None else int(n_valid),
    )
    dplan = neighbors._DENSITY_PLAN.get(dkey)
    key = (grid.n_points, dtype)
    caps = gs._MC_CAPS.get(key)
    # Encoded-transfer buckets are (vertex, active-CELL) counts; bootstrap
    # from the default path's (vertex, triangle) plan — cells <= triangles,
    # so the triangle bucket is a safe initial cell bucket.
    pull_plan = gs._PULL_PLAN_ENC.get(key) or gs._PULL_PLAN.get(key)
    if dplan is None or caps is None or pull_plan is None:
        return None
    vcap, tcap = caps
    nv_b, nc_b = pull_plan
    if nv_b > vcap or nc_b > tcap:
        return None
    backend = (
        "pallas"
        if jax.default_backend() == "tpu" and dtype == "float32"
        else "scan"
    )
    okey = (grid.n_points, int(positions.shape[0]))
    ofc = gs._OVER_PLAN.get(okey)
    if ofc is None:
        ofc = gs._pow2(int(positions.shape[0]) // 64, lo=4096)

    with profile("warm frame dispatch"):
        nvj = jnp.asarray(
            positions.shape[0] if n_valid is None else n_valid, jnp.int32
        )
        out = _warm_frame(
            positions,
            jnp.asarray(parameters.particle_rest_mass, positions.dtype),
            jnp.asarray(parameters.iso_surface_threshold, positions.dtype),
            nvj,
            has_n_valid=n_valid is not None
            and n_valid < positions.shape[0],
            grid=grid, bgrid=dplan["grid"], kind=dplan["kind"],
            kslots=dplan["slots"], u_cap=dplan["u_cap"],
            ocap=dplan["ocap"], ccap=dplan["ccap"], csr=csr, hsc=hsc,
            slots=2, backend=backend, ofc=ofc, vcap=vcap, tcap=tcap,
            nv_b=nv_b, nc_b=nc_b,
        )
    t, packed_s, bincl, tv_d, tt_d, tc_d, nov_d, dcheck, rho = out
    with profile("pull mesh"):
        extra = (grid_check,) if grid_check is not None else ()
        pulled = jax.device_get(
            (tv_d, tt_d, tc_d, nov_d, dcheck) + extra
            + (t, packed_s, bincl)
        )
    total_v, total_t, total_c, total_over = (int(x) for x in pulled[:4])
    density_ok = bool(pulled[4])
    grid_ok = bool(pulled[5]) if grid_check is not None else True
    enc = pulled[-3:]
    if not grid_ok:
        raise GridPlanMiss("speculated background grid is stale")
    if not density_ok:
        neighbors.clear_density_plan()
        return None
    if total_over > ofc:
        # overflow-capacity plan miss: grow the plan and fall back to the
        # default path, whose retry loop re-rasterizes at the new capacity
        gs._OVER_PLAN[okey] = min(
            gs._pow2(total_over * 2, lo=4096),
            gs._pow2(int(positions.shape[0])),
        )
        return None
    if total_v > vcap or total_t > tcap:
        gs._MC_CAPS[key] = (
            gs._bucket16(total_v * 5 // 4), gs._bucket16(total_t * 5 // 4)
        )
        gs._PULL_PLAN.pop(key, None)
        gs._PULL_PLAN_ENC.pop(key, None)
        return None
    if total_v > nv_b or total_c > nc_b:
        # transfer-bucket miss: record the larger buckets and fall back
        gs._PULL_PLAN_ENC[key] = (
            min(vcap, gs._bucket16(total_v)), min(tcap, gs._bucket16(total_c))
        )
        return None
    gs._PULL_PLAN_ENC[key] = (
        min(vcap, gs._bucket16(total_v)), min(tcap, gs._bucket16(total_c))
    )
    gs._note_overflow_plan(okey, total_over)
    with profile("decode mesh"):
        from splashsurf_tpu import native

        t_ = gs._dequant_t(enc[0])
        pc_, pcs_ = gs._unpack_compact(enc[1], enc[2], total_c)
        dec = None
        if t_.dtype == np.float32:
            dec = native.mc_decode(
                t_, pc_, pcs_, total_v, total_t, total_c,
                grid.n_points[1], grid.n_points[2], grid.min, grid.cell_size,
            )
        if dec is None:
            dec = gs._decode_cellwise_mesh(
                t_, pc_, pcs_, total_v, total_t, total_c, grid
            )
        verts, tris = dec
    return verts, tris, rho


def _cellrast_frame(
    positions, parameters: Parameters, grid, hsc, grid_check, n_valid,
    defer_pull: bool,
):
    """Warm frame with cell-raster density (see reconstruct_surface_global).

    Returns ((verts, tris) | PendingPull, rho) on success, or None when the
    frame missed (raster overflow appeared — the deferred n_overflow check
    exceeds the zero capacity — or an MC caps retry is needed): the caller
    re-runs the frame through the legacy density path, and _OVER_PLAN has
    been grown so subsequent frames stop taking this branch until the
    overflow plan re-fits to zero.
    """
    import math
    import os

    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.profiling import profile

    csr = float(parameters.compact_support_radius)
    dtype = positions.dtype
    reach = int(math.ceil(csr / grid.cell_size - 1e-9))
    h_over_cs = csr / grid.cell_size
    on_tpu = jax.default_backend() == "tpu"
    # f64 pallas_calls break the TPU X64 rewriter — double precision rides
    # the XLA formulations (see gs.reconstruct_global_dense)
    f32 = dtype == jnp.float32
    backend = "pallas" if (on_tpu and f32) else "scan"
    dens_backend = "pallas" if (on_tpu and f32) else "xla"
    sync = os.environ.get("SPLASHSURF_TPU_SYNC_PROFILE", "0") == "1"

    def _sync(x):
        if sync:
            jax.block_until_ready(x)
        return x

    with profile("rasterize"):
        r = _sync(
            gs.rasterize_global(
                positions, positions[:, 0], grid, 2, hsc, 0,
                lane_align=128 if on_tpu else 1, with_meta=True,
            )
        )
    fx, fy, fz, opx, opy, opz, oval, n_over, rank, ok_m, cx, cy, cz = r
    with profile("compute particle densities"):
        fv, rho = _sync(
            gs.density_weights_from_rasters(
                fx, fy, fz, rank, ok_m, cx, cy, cz,
                jnp.asarray(parameters.particle_rest_mass, dtype),
                jnp.asarray(csr, dtype),
                grid, hsc, reach, float(h_over_cs), dens_backend,
            )
        )
    with profile("levelset sweep"):
        ls = _sync(
            gs.sweep_global(
                fx, fy, fz, fv, opx, opy, opz, oval, grid, csr, hsc, backend
            )
        )
    del fx, fy, fz, fv

    key = (grid.n_points, str(ls.dtype))
    okey = (grid.n_points, int(positions.shape[0]))
    caps = gs._MC_CAPS[key]
    checks = (grid_check,) if grid_check is not None else ()
    labels = ("grid",) if grid_check is not None else ()
    try:
        out = gs._finish_global_dense(
            ls, grid, parameters.iso_surface_threshold, caps, key, okey,
            0, n_over, deferred_checks=checks, _sync=_sync,
            profile=profile, defer_pull=defer_pull, check_labels=labels,
        )
    except gs.SpeculationMiss as e:
        from splashsurf_tpu.reconstruction import GridPlanMiss

        SPECULATION_STATS["grid_miss"] += 1
        raise GridPlanMiss(str(e)) from e
    if out is None:
        # overflow appeared: grow the plan so later frames go legacy until
        # a frame re-fits it to zero; this frame redoes through legacy
        SPECULATION_STATS["overflow_retry"] += 1
        gs._OVER_PLAN[okey] = gs._pow2(gs._LAST_OVERFLOW[0] * 2, lo=4096)
        return None
    return out, rho


def reconstruct_surface_global(
    positions,
    parameters: Parameters,
    grid: UniformGrid,
    particle_inside_aabb: Optional[np.ndarray] = None,
    grid_check=None,
    n_valid: Optional[int] = None,
    defer_pull: bool = False,
) -> SurfaceReconstruction:
    from splashsurf_tpu.ops.global_sweep import (
        PendingPull,
        SpeculationMiss,
        reconstruct_global_dense,
    )
    from splashsurf_tpu.profiling import profile
    from splashsurf_tpu.uniform_grid import kernel_extents

    positions = jnp.asarray(positions)
    hsc = kernel_extents(
        parameters.compact_support_radius, grid.cell_size
    ).half_supported_cells
    SPECULATION_STATS["frames"] += 1

    warm = _try_warm_frame(
        positions, parameters, grid, hsc, grid_check, n_valid
    )
    if warm is not None:
        verts, tris, rho = warm
        mesh = TriMesh3d(vertices=verts, triangles=tris)
        particle_neighbors = None
        if parameters.global_neighborhood_list:
            lists = neighbors.neighborhood_search_spatial_hashing_parallel(
                positions, parameters.compact_support_radius
            )
            particle_neighbors = lists
        return SurfaceReconstruction(
            grid=grid,
            mesh=mesh,
            particle_densities=rho,
            particle_neighbors=particle_neighbors,
            particle_inside_aabb=particle_inside_aabb,
        )

    import os

    # Cell-raster density fast path: when the previous frame's raster had
    # ZERO slot overflow (every particle owns a raster slot), rho comes
    # from a pair sweep over the level-set rasters themselves — no separate
    # density stage (binning scatters + its own sweep, ~105 ms at 2M).
    # Any overflow in the actual frame invalidates it via the existing
    # deferred n_overflow check and falls back to the legacy formulations.
    from splashsurf_tpu.ops import global_sweep as gs

    okey = (grid.n_points, int(positions.shape[0]))
    on_tpu = jax.default_backend() == "tpu"
    # Default OFF: the r4 TPU A/B measured it perf-NEUTRAL vs the geoslot
    # default (0.408 vs 0.401 s best at 2M — the 3x-candidate cell-pair fan
    # costs what the standalone stage saved) while its Mosaic compile takes
    # ~23 min per new grid shape. Kept as a tested alternative formulation
    # ("1" on TPU, "1cpu" to force the portable path in tests).
    cr_env = os.environ.get("SPLASHSURF_TPU_DENSITY_CELLRASTER", "0")
    use_cellrast = (
        cr_env != "0"
        and (on_tpu or cr_env == "1cpu")
        and gs._OVER_PLAN.get(okey) == 0
        and (grid.n_points, str(positions.dtype)) in gs._MC_CAPS
    )
    if use_cellrast:
        out = _cellrast_frame(
            positions, parameters, grid, hsc, grid_check, n_valid,
            defer_pull=defer_pull
            and not parameters.global_neighborhood_list,
        )
        if out is not None:
            rec_or_pending, rho = out
            if isinstance(rec_or_pending, gs.PendingPull):
                rec = SurfaceReconstruction(
                    grid=grid, mesh=None, particle_densities=rho,
                    particle_inside_aabb=particle_inside_aabb,
                )
                rec._pending_mesh = rec_or_pending
                return rec
            verts, tris = rec_or_pending
            particle_neighbors = None
            if parameters.global_neighborhood_list:
                particle_neighbors = (
                    neighbors.neighborhood_search_spatial_hashing_parallel(
                        positions, parameters.compact_support_radius
                    )
                )
            return SurfaceReconstruction(
                grid=grid,
                mesh=TriMesh3d(vertices=verts, triangles=tris),
                particle_densities=rho,
                particle_neighbors=particle_neighbors,
                particle_inside_aabb=particle_inside_aabb,
            )
        # miss (overflow appeared / caps retry): legacy path below

    # Densities (and, for warm frames, the background grid) run under
    # speculative plans; their validity flags are pulled together with the
    # final mesh totals. A density miss recomputes the frame here; a grid
    # miss propagates to reconstruct_surface, which re-derives the grid.
    sync = os.environ.get("SPLASHSURF_TPU_SYNC_PROFILE", "0") == "1"
    for _attempt in range(2):
        with profile("compute particle densities"):
            rho, check = neighbors.compute_particle_densities(
                positions,
                parameters.compact_support_radius,
                parameters.particle_rest_mass,
                speculate=True,
                n_valid=n_valid,
            )
            if sync:
                jax.block_until_ready(rho)
        values = jnp.asarray(parameters.particle_rest_mass, rho.dtype) / rho
        checks = []
        labels = []
        if check is not None:
            checks.append(check)
            labels.append("density")
        if grid_check is not None:
            checks.append(grid_check)
            labels.append("grid")
        try:
            out = reconstruct_global_dense(
                positions,
                values,
                grid,
                parameters.compact_support_radius,
                hsc,
                parameters.iso_surface_threshold,
                deferred_checks=tuple(checks),
                defer_pull=defer_pull,
                check_labels=tuple(labels),
            )
            if isinstance(out, PendingPull):
                rec = SurfaceReconstruction(
                    grid=grid,
                    mesh=None,
                    particle_densities=rho,
                    particle_inside_aabb=particle_inside_aabb,
                )
                rec._pending_mesh = out
                return rec
            verts, tris = out
            break
        except SpeculationMiss as e:
            failed = {
                labels[i] for i, ok in enumerate(e.flags) if not ok
            }
            if "grid" in failed:
                from splashsurf_tpu.reconstruction import GridPlanMiss

                SPECULATION_STATS["grid_miss"] += 1
                raise GridPlanMiss(str(e)) from e
            SPECULATION_STATS["density_miss"] += 1
            neighbors.clear_density_plan()
    else:
        raise RuntimeError(
            "speculative density plan missed twice in a row — the retry "
            "frame should always plan from scratch; this indicates a "
            "plan-invalidation bug"
        )
    mesh = TriMesh3d(vertices=verts, triangles=tris)

    particle_neighbors = None
    if parameters.global_neighborhood_list:
        lists = neighbors.neighborhood_search_spatial_hashing_parallel(
            positions, parameters.compact_support_radius
        )
        particle_neighbors = lists

    return SurfaceReconstruction(
        grid=grid,
        mesh=mesh,
        particle_densities=rho,  # device array; pulled lazily by consumers
        particle_neighbors=particle_neighbors,
        particle_inside_aabb=particle_inside_aabb,
    )


def _lists_to_csr(lists):
    """CSR view of ragged neighbor lists (legacy helper; the public
    ``particle_neighbors`` now carries NeighborhoodLists directly)."""
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=offsets[1:])
    indices = (
        np.concatenate(lists) if lists else np.zeros(0, np.int32)
    ).astype(np.int32)
    return offsets, indices
