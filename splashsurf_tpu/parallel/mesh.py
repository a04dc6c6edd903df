"""Device-mesh parallel reconstruction.

The subdomain batch axis is the parallel axis (SURVEY.md §5: the analog of
the reference's Rayon task-parallelism over subdomains,
dense_subdomains.rs:521-526). Subdomain level-set blocks are independent;
the only cross-subdomain communication is the canonical halo overwrite,
which XLA lowers to gather collectives over ICI when the batch axis is
sharded.

Strategy (1-D mesh over axis "sub"):
  - particle positions/values: replicated (they are read-gathered by every
    subdomain's splat; for very large N a spatial sharding of particles is
    the round-2+ refinement)
  - per-subdomain particle lists, sub_ijk, level sets: sharded on axis 0
  - halo overwrite: jnp.take over the sharded batch axis -> all_gather of
    the 26 boundary slabs over ICI
  - marching cubes + compaction: fully local per shard
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splashsurf_tpu import subdomains as sub_mod
from splashsurf_tpu.params import Parameters
from splashsurf_tpu.subdomains import SubdomainGridParams


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "sub") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


# ---------------------------------------------------------------------------
# production sharded kernels (shard_map over the subdomain batch axis)
#
# The subdomain batch is the parallel axis (the TPU analog of the reference's
# Rayon task pool over subdomains, dense_subdomains.rs:521-526). shard_map
# (not bare GSPMD) guarantees the splat's flat scatters and the MC's global
# cumsum compaction stay shard-local; the only collective is the halo
# exchange, which all-gathers the 26 *mirror regions* (faces/edges/corners,
# ~P^2 + ... floats per subdomain — ~10x less than the full P^3 blocks).
# A ppermute ring is NOT applicable here: the neighbor graph over *occupied*
# subdomains is irregular and data-dependent (occupancy gaps), so there is
# no static device permutation that realizes it; the mirror-region
# all-gather is the minimal static collective that does.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def sharded_splat_scatter(mesh: Mesh, sd: SubdomainGridParams, hsc: int, support: float):
    """jitted shard_map wrapper: scatter splat, batch axis sharded."""
    from jax import shard_map

    def local(positions_ext, values_ext, plists, sub_ijk):
        return sub_mod.chunk_levelset_scatter(
            positions_ext, values_ext, plists, sub_ijk, sd, support, hsc
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,  # scan carries inside the kernels start unvarying
            in_specs=(P(), P(), P("sub"), P("sub")),
            out_specs=P("sub"),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_splat_raster(
    mesh: Mesh, sd: SubdomainGridParams, hsc: int, support: float, unroll
):
    """jitted shard_map wrapper: raster-sweep splat (Pallas on TPU)."""
    from jax import shard_map

    def local(positions_ext, values_ext, plists, plocal, prank, sub_ijk):
        ls, over = sub_mod.chunk_levelset_raster(
            positions_ext, values_ext, plists, plocal, prank, sub_ijk,
            sd, support, hsc, unroll=unroll,
        )
        # replicate the overflow scalar so the P() out-spec holds
        return ls, jax.lax.pmax(over, "sub")

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,  # scan carries inside the kernels start unvarying
            in_specs=(P(), P(), P("sub"), P("sub"), P("sub"), P("sub")),
            out_specs=(P("sub"), P()),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_halo_overwrite(mesh: Mesh):
    """jitted shard_map halo pass: all-gather of the 26 mirror regions over
    ICI, then the same min-subdomain-id overwrite as the single-chip pass."""
    from jax import shard_map
    from splashsurf_tpu.subdomains import _DIRS26, _INT32_MAX, _mirror, _region

    def local(ls, own_flat, nb_idx, nb_flat):
        Pn = ls.shape[1]
        out = ls
        best = jnp.broadcast_to(
            own_flat[:, None, None, None], ls.shape
        ).astype(jnp.int32)
        for d, o in enumerate(_DIRS26):
            reg_s = (slice(None),) + tuple(_region(int(c), Pn) for c in o)
            reg_t = (slice(None),) + tuple(_mirror(int(c), Pn) for c in o)
            mirror = ls[reg_t]  # local rows' donated region
            full = jax.lax.all_gather(mirror, "sub", axis=0, tiled=True)
            cand_val = full[nb_idx[d]]
            cand_flat = nb_flat[d][:, None, None, None]
            take = cand_flat < best[reg_s]
            out = out.at[reg_s].set(jnp.where(take, cand_val, out[reg_s]))
            best = best.at[reg_s].set(jnp.where(take, cand_flat, best[reg_s]))
        return out

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,  # scan carries inside the kernels start unvarying
            in_specs=(P("sub"), P("sub"), P(None, "sub"), P(None, "sub")),
            out_specs=P("sub"),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_mc_counts(mesh: Mesh, sd: SubdomainGridParams):
    from jax import shard_map

    def local(ls, iso):
        return sub_mod.chunk_mc_counts(ls, sd, iso)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,  # scan carries inside the kernels start unvarying
            in_specs=(P("sub"), P()),
            out_specs=(P("sub"), P("sub"), P("sub")),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_mc_counts_encoded(mesh: Mesh, sd: SubdomainGridParams):
    from jax import shard_map

    def local(ls, iso):
        return sub_mod.chunk_mc_counts_encoded(ls, sd, iso)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P()),
            out_specs=(P("sub"), P("sub"), P("sub")),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_scan_mc_encode(
    mesh: Mesh, sd: SubdomainGridParams, pack_pc: int, pack_vc: int, quant_t: bool
):
    """Sharded encoded chunk MC: shard_map over the chunk axis with the
    single-device scan body (subdomains._scan_chunk_mc_encode) — identical
    per-chunk packs, so the compacted streams (and hence the decoded mesh)
    are bit-identical to the single-device run."""
    from jax import shard_map
    from splashsurf_tpu.subdomains import _scan_chunk_mc_encode

    def local(ls_ext, rows_mat, iso):
        return _scan_chunk_mc_encode(
            ls_ext, rows_mat, sd=sd, iso=iso,
            pack_pc=pack_pc, pack_vc=pack_vc, quant_t=quant_t,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P(), P("sub"), P()),
            out_specs=tuple([P("sub")] * 4),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_chunk_mc(mesh: Mesh, sd: SubdomainGridParams, vcap_local: int, tcap_local: int):
    """jitted shard_map MC: each shard compacts its rows into its own pack
    arrays; the device stitch dedups across shards afterwards."""
    from jax import shard_map

    def local(ls, sub_ijk, iso):
        out = sub_mod.chunk_mc(
            ls, sub_ijk, sd, iso,
            pack_vertex_capacity=vcap_local,
            pack_triangle_capacity=tcap_local,
        )
        return tuple(o[None] for o in out)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,  # scan carries inside the kernels start unvarying
            in_specs=(P("sub"), P("sub"), P()),
            out_specs=tuple([P("sub")] * 11),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_scan_splat(
    mesh: Mesh, sd: SubdomainGridParams, hsc: int, K: int, unroll, kind: str,
    support: float = None,
):
    """Sharded chunk-group splat: shard_map over the CHUNK axis, each
    device scanning its chunks with the SAME (C, K)-shaped scan body as the
    single-device executor (subdomains._scan_splat). Sharing the scan body
    keeps the sharded run bit-identical to single-device — scan-compiled
    bodies round identically across scan lengths and shard_map wrapping
    (measured), while a standalone jit of the same math may contract
    FMAs differently."""
    from jax import shard_map
    from splashsurf_tpu.subdomains import _scan_splat

    def local(pe, ve, pid_s, cell_s, rank_s, starts, counts, sub_ijk_d,
              rows_mat):
        return _scan_splat(
            pe, ve, pid_s, cell_s, rank_s, starts, counts, sub_ijk_d,
            rows_mat, sd=sd, support=float(support), hsc=hsc, K=K,
            unroll=unroll, kind=kind,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P(),) * 8 + (P("sub"),),
            out_specs=(P("sub"), P("sub")),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_scan_splat_pairs(
    mesh: Mesh, sd: SubdomainGridParams, hsc: int, K: int, unroll, kind: str,
    support: float,
):
    """Sharded chunk-group splat over DEVICE-LOCAL pair tables.

    The sharded-decompose integration: pair columns, segment tables and
    sub_ijk arrive sharded P("sub") (each device owns its x-slab's pairs,
    parallel/decompose.py), and rows_mat addresses LOCAL occupied-subdomain
    rows — so the splat gathers never leave the shard. Scan body shared
    with the single-device executor (bit-identity, see sharded_scan_splat).
    Positions/values stay replicated (the documented remaining O(N) term).
    """
    from jax import shard_map
    from splashsurf_tpu.subdomains import _scan_splat

    def local(pe, ve, pid_s, cell_s, rank_s, starts, counts, sub_ijk_d,
              rows_mat):
        return _scan_splat(
            pe, ve, pid_s, cell_s, rank_s, starts, counts, sub_ijk_d,
            rows_mat, sd=sd, support=float(support), hsc=hsc, K=K,
            unroll=unroll, kind=kind,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P(), P()) + (P("sub"),) * 7,
            out_specs=(P("sub"), P("sub")),
        )
    )


@functools.lru_cache(maxsize=32)
def sharded_scan_mc(mesh: Mesh, sd: SubdomainGridParams, pack_vc: int, pack_tc: int):
    """Sharded chunked marching cubes: shard_map over the chunk axis with
    the single-device scan body (subdomains._scan_chunk_mc). The level-set
    batch is replicated for the MC stage (arbitrary chunk rows gather from
    it); the halo stage before it stays sharded."""
    from jax import shard_map
    from splashsurf_tpu.subdomains import _scan_chunk_mc

    def local(ls_ext, sub_ijk_ext, rows_mat, iso):
        return _scan_chunk_mc(
            ls_ext, sub_ijk_ext, rows_mat, sd=sd, iso=iso,
            pack_vc=pack_vc, pack_tc=pack_tc,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P(), P(), P("sub"), P()),
            out_specs=tuple([P("sub")] * 11),
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=("sd", "hsc", "vertex_capacity", "triangle_capacity"),
)
def _levelset_mc_step(
    positions_ext,
    values_ext,
    plists,
    sub_ijk,
    own_flat,
    nb_idx,
    nb_flat,
    sd: SubdomainGridParams,
    compact_support_radius,
    iso,
    hsc: int,
    vertex_capacity: int,
    triangle_capacity: int,
):
    """One fully-jitted reconstruction step over a subdomain batch:
    splat -> halo overwrite -> batched marching cubes."""
    ls = sub_mod.chunk_levelset_scatter(
        positions_ext, values_ext, plists, sub_ijk, sd, compact_support_radius, hsc
    )
    ls = sub_mod.halo_overwrite(ls, own_flat, nb_idx, nb_flat)
    return sub_mod.chunk_mc(
        ls,
        sub_ijk,
        sd,
        iso,
        pack_vertex_capacity=vertex_capacity,
        pack_triangle_capacity=triangle_capacity,
    )


def sharded_levelset_step(mesh: Mesh, axis_name: str = "sub"):
    """Return (step_fn, shardings): the jitted splat+halo+MC step plus the
    NamedSharding layout for its array arguments on ``mesh``.

    The subdomain batch axes are sharded over the mesh; particle arrays are
    replicated. XLA inserts the halo gather collectives.
    """
    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    nb = NamedSharding(mesh, P(None, axis_name))
    shardings = dict(
        positions_ext=repl,
        values_ext=repl,
        plists=batch,
        sub_ijk=batch,
        own_flat=batch,
        nb_idx=nb,
        nb_flat=nb,
    )
    return _levelset_mc_step, shardings


def sharded_reconstruction_demo(n_devices: int, parameters: Optional[Parameters] = None):
    """Build tiny inputs, shard them over an ``n_devices`` mesh, run ONE
    splat+halo+MC step, and block on the result.

    This is the multi-chip dry-run entry: it validates that the sharded
    program compiles and executes (with collectives for the halo pass)
    without requiring real multi-chip hardware.
    """
    from splashsurf_tpu.reconstruction import grid_for_reconstruction
    from splashsurf_tpu.params import GridDecompositionParameters
    import dataclasses

    if parameters is None:
        parameters = Parameters.new_relative(0.025, 4.0, 1.0)
    parameters = dataclasses.replace(
        parameters,
        grid_decomposition=GridDecompositionParameters(8, auto_disable=False),
    )

    mesh = make_mesh(n_devices)
    n_dev = len(mesh.devices.ravel())

    # A small lattice cloud spanning several subdomains.
    rng = np.random.default_rng(0)
    side = 12
    coords = (np.arange(side) + 0.5) * 2 * parameters.particle_radius
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    pts += rng.uniform(-0.2, 0.2, pts.shape).astype(np.float32) * parameters.particle_radius

    grid = grid_for_reconstruction(
        pts,
        parameters.particle_radius,
        parameters.compact_support_radius,
        parameters.cube_size,
    )
    sd = sub_mod.initialize_parameters(parameters, grid)
    hsc = sd.margin_cells

    from splashsurf_tpu import neighbors

    rho = neighbors.compute_particle_densities(
        pts, parameters.compact_support_radius, parameters.particle_rest_mass
    )
    values = jnp.asarray(parameters.particle_rest_mass, jnp.float32) / rho
    positions_ext = jnp.concatenate([jnp.asarray(pts), jnp.full((1, 3), 1e30, jnp.float32)])
    values_ext = jnp.concatenate([values, jnp.zeros((1,), jnp.float32)])

    cap = sub_mod._pow2_at_least(2 * len(pts))
    tgt, pid, _cell, _rank, n_pairs = sub_mod.decompose(jnp.asarray(pts), sd, cap)
    tgt_np = np.asarray(tgt[: int(n_pairs)])
    occ_ids, occ_starts, occ_counts = sub_mod._segments(tgt_np)
    B = len(occ_ids)
    # Pad the batch to a multiple of the device count.
    B_pad = ((B + n_dev - 1) // n_dev) * n_dev
    K = sub_mod._pow2_at_least(int(occ_counts.max()), lo=32)

    rows = np.arange(B_pad) % B
    plists = sub_mod._gather_plists(
        pid, jnp.asarray(occ_starts), jnp.asarray(occ_counts), jnp.asarray(rows), K, len(pts)
    )
    # padded rows get empty particle lists so they contribute nothing
    plists = jnp.where(
        (np.arange(B_pad) < B)[:, None], plists, len(pts)
    )
    ns = sd.num_subdomains
    sub_ijk = np.stack(
        [
            occ_ids[rows] // (ns[1] * ns[2]),
            (occ_ids[rows] // ns[2]) % ns[1],
            occ_ids[rows] % ns[2],
        ],
        axis=1,
    ).astype(np.int32)
    own_flat = occ_ids[rows].astype(np.int32)
    nb_idx, nb_flat = sub_mod._neighbor_tables(occ_ids, sub_ijk[:B], sd)
    nb_idx_pad = np.zeros((26, B_pad), np.int32)
    nb_flat_pad = np.full((26, B_pad), sub_mod._INT32_MAX, np.int32)
    nb_idx_pad[:, :B] = nb_idx
    nb_flat_pad[:, :B] = nb_flat

    batch = NamedSharding(mesh, P("sub"))
    repl = NamedSharding(mesh, P())
    nbs = NamedSharding(mesh, P(None, "sub"))

    args = dict(
        positions_ext=jax.device_put(positions_ext, repl),
        values_ext=jax.device_put(values_ext, repl),
        plists=jax.device_put(plists, batch),
        sub_ijk=jax.device_put(jnp.asarray(sub_ijk), batch),
        own_flat=jax.device_put(jnp.asarray(own_flat), batch),
        nb_idx=jax.device_put(jnp.asarray(nb_idx_pad), nbs),
        nb_flat=jax.device_put(jnp.asarray(nb_flat_pad), nbs),
    )

    with mesh:
        out = _levelset_mc_step(
            sd=sd,
            compact_support_radius=jnp.float32(parameters.compact_support_radius),
            iso=jnp.float32(parameters.iso_surface_threshold),
            hsc=hsc,
            vertex_capacity=4096,
            triangle_capacity=8192,
            **args,
        )
        jax.block_until_ready(out)
    total_v = int(out[9])
    total_t = int(out[10])
    assert total_t > 0, "sharded demo produced no triangles"
    return {
        "devices": n_dev,
        "subdomains": B,
        "vertices": total_v,
        "triangles": total_t,
    }
