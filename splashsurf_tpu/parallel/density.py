"""Sharded SPH density over a device mesh (x-slab bin-lattice decomposition).

The reference computes per-particle densities with the whole machine
(dense_subdomains.rs:496-646 — 63% of its runtime); this is the TPU
analog. The density bin lattice is cut into per-device x-slabs, particles
are routed to their slab owner (plus one boundary-plane halo copy) with a
single all_to_all over the mesh axis, each device runs the same dense
27-offset raster sweep on its local slab, and the densities ride the
reverse all_to_all home. Every per-device array in the stage is O(N/D):
no full-N replicated array exists on any device.

Bit-identity with the single-device raster path
(neighbors.compute_particle_densities_raster):
  - fracs are computed from global quantities (grid min, bin size, global
    cell index) with exactly the single-device expressions;
  - within-bin slot ranks reproduce the global (bin, particle-index)
    order: the all_to_all receive buffer is ascending-global-index per
    source block and blocks concatenate in device order, so a local stable
    sort by bin ties identically to the global sort;
  - the sweep shares neighbors._raster_sweep_xla, so the accumulation
    order per (query bin, slot) is the single-device order.
The rare rank>=slots overflow correction is exact but its scatter-add
order differs from single-device (per-slab vs global overflow-bin
compaction), so scenes WITH slot overflow agree to float tolerance rather
than bitwise; tests/test_parallel_density.py covers both regimes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splashsurf_tpu import kernels
from splashsurf_tpu.neighbors import (
    BinGrid,
    _INT32_MAX,
    _raster_sweep_xla,
    _round_up,
    _STENCIL,
)


def _pow2_at_least(n: int, lo: int = 64) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


def _bins_local(px, py, pz, grid: BinGrid, gidx, nv):
    """Global flat bin per particle (build_cell_list's exact formula, on
    per-component columns); count-padding dummies (gidx >= nv) and
    non-finite pad rows get the INT32_MAX sentinel."""
    dtype = px.dtype
    bs = jnp.asarray(grid.bin_size, dtype)
    dims = grid.dims
    strides = (dims[1] * dims[2], dims[2], 1)
    bins = jnp.zeros(px.shape, jnp.int32)
    comps = (px, py, pz)
    cells = []
    for d in range(3):
        mn = jnp.asarray(grid.min[d], dtype)
        c = jnp.clip(
            jnp.floor((comps[d] - mn) / bs).astype(jnp.int32), 0, dims[d] - 1
        )
        cells.append(c)
        bins = bins + c * strides[d]
    valid = (gidx < nv) & jnp.isfinite(px)
    bins = jnp.where(valid, bins, _INT32_MAX)
    return bins, cells[0], valid


def _route_masks(bx, sid, valid, dst: int, slab_w: int, D: int):
    """(owner, halo) membership of bucket ``dst`` for each local particle.

    Owner: the particle's slab is ``dst``. Halo: the particle sits on a
    boundary x-plane of an adjacent slab — the first plane of slab dst+1
    or the last plane of slab dst-1 — whose bins the destination's sweep
    stencil reads.
    """
    owner = valid & (sid == dst)
    first = bx % slab_w == 0
    last = bx % slab_w == slab_w - 1
    halo = valid & (
        (first & (sid == dst + 1)) | (last & (sid == dst - 1))
    )
    return owner, halo


@functools.lru_cache(maxsize=32)
def _stats_fn(mesh: Mesh, grid: BinGrid, D: int, slab_w: int):
    """Jitted shard_map returning (max send-bucket count, global max bin
    occupancy, global over-8 excess, occupied bins) — all replicated."""
    from jax import shard_map

    LX, LY, LZ = grid.dims
    lattice = LX * LY * LZ

    def local(px, py, pz, nv):
        Nl = px.shape[0]
        d = jax.lax.axis_index("sub")
        gidx = d * Nl + jnp.arange(Nl, dtype=jnp.int32)
        bins, bx, valid = _bins_local(px, py, pz, grid, gidx, nv)
        sid = jnp.clip(bx // slab_w, 0, D - 1)
        cnt_max = jnp.zeros((), jnp.int32)
        for dst in range(D):
            owner, halo = _route_masks(bx, sid, valid, dst, slab_w, D)
            cnt_max = jnp.maximum(
                cnt_max, jnp.sum(owner | halo).astype(jnp.int32)
            )
        cnt_max = jax.lax.pmax(cnt_max, "sub")
        # global per-bin occupancy: local scatter + psum of the table
        tbl = (
            jnp.zeros((lattice,), jnp.int32)
            .at[jnp.where(valid, bins, lattice)]
            .add(1, mode="drop")
        )
        tbl = jax.lax.psum(tbl, "sub")
        max_occ = jnp.max(tbl)
        over8 = jnp.sum(jnp.maximum(tbl - 8, 0))
        n_bins = jnp.sum(tbl > 0)
        return cnt_max, max_occ, over8, n_bins

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P("sub"), P("sub"), P()),
            out_specs=(P(), P(), P(), P()),
        )
    )


def _overflow_correction_local(
    spx, spy, spz, sb, order, rho_rows, slots, OC, CAP, h, dims_l
):
    """Exact rank>=slots correction on the local slab (the sharded analog
    of neighbors._overflow_correction, indexing receive-buffer rows).

    Queries derive their stencil from the local SORTED bin id directly (no
    positions->bin round trip), candidates gather from the local sorted
    order, and distances use the routed global positions — so the
    correction is exact; only the overflow-row enumeration order differs
    from the single-device pass (see module docstring).
    """
    LXl, LY, LZ = dims_l
    lattice = LXl * LY * LZ
    M = sb.shape[0]
    dtype = spx.dtype

    is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    in_lat = sb != _INT32_MAX
    sb_c = jnp.where(in_lat, sb, 0)
    starts_table = (
        jnp.zeros((lattice,), jnp.int32)
        .at[jnp.where(is_start & in_lat, sb_c, lattice)]
        .set(jnp.arange(M, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    counts_table = (
        jnp.zeros((lattice,), jnp.int32)
        .at[jnp.where(in_lat, sb_c, lattice)]
        .add(1, mode="drop")
    )

    # compact overflow BINS (count > slots)
    over_bin = counts_table > slots
    obin_dest = jnp.where(over_bin, jnp.cumsum(over_bin) - 1, OC)
    lat_ids = jnp.arange(lattice, dtype=jnp.int32)
    obin = (
        jnp.full((OC,), lattice, jnp.int32)
        .at[obin_dest]
        .set(lat_ids, mode="drop", unique_indices=True)
    )
    ob_valid = obin < lattice
    obin_c = jnp.where(ob_valid, obin, 0)
    base = starts_table[obin_c]
    cnt = jnp.where(ob_valid, counts_table[obin_c], 0)

    # overflow slots -> compacted overflow rows (sorted-order indices)
    R = CAP - slots
    rr = jnp.arange(slots, CAP, dtype=jnp.int32)[None, :]
    sidx = base[:, None] + rr
    pvalid = (ob_valid[:, None] & (rr < cnt[:, None])).reshape(-1)
    pdest = jnp.where(pvalid, jnp.cumsum(pvalid) - 1, OC)
    osid = (
        jnp.full((OC,), M, jnp.int32)
        .at[pdest]
        .set(sidx.reshape(-1), mode="drop", unique_indices=True)
    )
    ovalid = osid < M
    osid_c = jnp.where(ovalid, osid, 0)
    opos = [
        jnp.where(
            ovalid, comp[osid_c],
            jnp.asarray(kernels.far_fill(comp.dtype), comp.dtype),
        )
        for comp in (spx, spy, spz)
    ]
    orow = jnp.where(ovalid, order[osid_c], M)  # receive-buffer rows

    # stencil segments from the overflow particle's own (sorted) bin
    qb_flat = jnp.where(ovalid, sb[osid_c], 0)
    q_ijk = jnp.stack(
        [qb_flat // (LY * LZ), (qb_flat // LZ) % LY, qb_flat % LZ], axis=1
    )
    dims_j = jnp.asarray(dims_l, jnp.int32)
    nb = q_ijk[:, None, :] + jnp.asarray(_STENCIL)[None, :, :]  # (OC,27,3)
    nb_ok = jnp.all((nb >= 0) & (nb < dims_j), axis=-1)
    nb_flat = (
        (jnp.clip(nb[..., 0], 0, LXl - 1) * LY + jnp.clip(nb[..., 1], 0, LY - 1))
        * LZ
        + jnp.clip(nb[..., 2], 0, LZ - 1)
    )
    cstarts = starts_table[nb_flat]  # (OC, 27)
    ccounts = jnp.where(nb_ok, counts_table[nb_flat], 0)

    slot_k = jnp.arange(CAP, dtype=jnp.int32)
    gather_pos = cstarts[:, :, None] + slot_k[None, None, :]  # (OC,27,CAP)
    cmask = slot_k[None, None, :] < ccounts[:, :, None]
    gather_pos = jnp.clip(gather_pos, 0, max(M - 1, 0))
    idx = order[gather_pos].reshape(OC, -1)  # receive-buffer rows
    cmask = (cmask.reshape(OC, -1)) & ovalid[:, None]
    gp = gather_pos.reshape(OC, -1)

    d2o = jnp.zeros(idx.shape, dtype)
    for comp, oc in zip((spx, spy, spz), opos):
        diff = comp[gp] - oc[:, None]
        diff = jnp.where(jnp.isfinite(diff), diff, jnp.inf)
        d2o = d2o + diff * diff
    wo = jnp.where(cmask, kernels.cubic_kernel(jnp.sqrt(d2o), h), 0.0)
    rho_over = jnp.sum(wo, axis=1)

    slot_within = jnp.tile(slot_k, 27)[None, :]
    to_table = cmask & (slot_within < slots)
    rho_rows = rho_rows.at[idx.reshape(-1)].add(
        jnp.where(to_table, wo, 0.0).reshape(-1), mode="drop"
    )
    rho_rows = rho_rows.at[orow].add(rho_over, mode="drop")
    return rho_rows


@functools.lru_cache(maxsize=32)
def _phase_fn(mesh: Mesh):
    """Jitted shard_map: per-axis circular mean of (x mod period) over the
    sharded particle components (the sharded analog of
    neighbors._octant_phase; no full-N array on any device)."""
    from jax import shard_map

    def local(px, py, pz, nv, period):
        dtype = px.dtype
        Nl = px.shape[0]
        d = jax.lax.axis_index("sub")
        gidx = d * Nl + jnp.arange(Nl, dtype=jnp.int32)
        m = (gidx < nv) & jnp.isfinite(px)
        out = []
        for comp in (px, py, pz):
            c0 = jnp.where(m, comp, 0.0)
            frac = c0 - period * jnp.floor(c0 / period)
            ang = frac * (2.0 * np.pi) / period
            c = jax.lax.psum(jnp.sum(jnp.where(m, jnp.cos(ang), 0.0)), "sub")
            s = jax.lax.psum(jnp.sum(jnp.where(m, jnp.sin(ang), 0.0)), "sub")
            out.append(jnp.arctan2(s, c) / (2.0 * np.pi) * period)
        return jnp.stack(out)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P("sub"), P("sub"), P(), P()),
            out_specs=P(),
        )
    )


@functools.lru_cache(maxsize=32)
def _density_fn_geoslot(mesh: Mesh, grid: BinGrid, D: int, slab_w: int, C: int):
    """Jitted shard_map: route -> sort-free octant raster sweep -> route
    back (the sharded analog of neighbors.compute_particle_densities_geoslot).

    Bit-identity with the single-device geoslot program is by construction:
    the octant slot is a pure function of the particle's position and the
    (global) lattice, so slot assignment needs no order reproduction, and
    the sweep shares _raster_sweep_xla's accumulation order per query bin.
    Returns (rho P('sub'), ok replicated) — ok is False on any octant
    collision or out-of-lattice particle; the caller falls back to the
    sorted path exactly like the single-device planning frame.
    """
    from jax import shard_map

    LX, LY, LZ = grid.dims
    LXl = slab_w + 2
    Yp, Zp = LY + 2, LZ + 2
    Xp = LXl + 2
    W = LY * Zp
    M = D * C

    def local(px, py, pz, nv, h):
        dtype = px.dtype
        Nl = px.shape[0]
        d = jax.lax.axis_index("sub")
        gidx = d * Nl + jnp.arange(Nl, dtype=jnp.int32)
        bins, bx, valid = _bins_local(px, py, pz, grid, gidx, nv)
        sid = jnp.clip(bx // slab_w, 0, D - 1)

        # in-lattice: raw (unclipped) bin coords in range for every valid
        # source particle (mirrors the single-device geoslot check)
        bs = jnp.asarray(grid.bin_size, dtype)
        in_lat = jnp.asarray(True)
        for i, comp in enumerate((px, py, pz)):
            mn_i = jnp.asarray(grid.min[i], dtype)
            raw = jnp.floor(
                (jnp.where(valid, comp, mn_i) - mn_i) / bs
            ).astype(jnp.int32)
            in_lat = in_lat & ~jnp.any(
                valid & ((raw < 0) | (raw >= grid.dims[i]))
            )
        in_lat = jax.lax.pmin(in_lat.astype(jnp.int32), "sub") > 0

        # ---- send buffers (identical routing to the sorted sharded path)
        send = [jnp.full((M,), jnp.inf, dtype) for _ in range(3)]
        src_row = jnp.full((M,), Nl, jnp.int32)
        lidx = jnp.arange(Nl, dtype=jnp.int32)
        for dst in range(D):
            owner, halo = _route_masks(bx, sid, valid, dst, slab_w, D)
            m = owner | halo
            rank = jnp.cumsum(m) - 1
            row = jnp.where(m & (rank < C), dst * C + rank, M)
            for k, comp in enumerate((px, py, pz)):
                send[k] = send[k].at[row].set(
                    comp, mode="drop", unique_indices=True
                )
            orow = jnp.where(owner & (rank < C), row, M)
            src_row = src_row.at[orow].set(
                lidx, mode="drop", unique_indices=True
            )

        rx = [
            jax.lax.all_to_all(s, "sub", split_axis=0, concat_axis=0, tiled=True)
            for s in send
        ]
        rxx, rxy, rxz = rx

        # ---- receiver: octant addressing on the local slab, no sort
        rbins, rbx, _ = _bins_local(
            rxx, rxy, rxz, grid, jnp.zeros((M,), jnp.int32), jnp.int32(1)
        )
        rvalid = jnp.isfinite(rxx)
        x0 = d * slab_w
        lx = rbx - (x0 - 1)
        in_slab = rvalid & (lx >= 0) & (lx < LXl)
        rby = (rbins // LZ) % LY
        rbz = rbins % LZ
        mn = [jnp.asarray(grid.min[i], dtype) for i in range(3)]
        half = bs * jnp.asarray(0.5, dtype)
        bcoord = [rbx, rby, rbz]
        fracs, oct_bits = [], []
        for i, comp in enumerate((rxx, rxy, rxz)):
            f = comp - (mn[i] + bcoord[i].astype(dtype) * bs)
            fracs.append(f)
            oct_bits.append((f >= half).astype(jnp.int32))
        oct = (oct_bits[0] << 2) | (oct_bits[1] << 1) | oct_bits[2]
        total = 8 * Xp * Yp * Zp
        lx_c = jnp.clip(lx, 0, LXl - 1)
        dest = jnp.where(
            in_slab,
            ((oct * Xp + lx_c + 1) * Yp + rby + 1) * Zp + (rbz + 1),
            total,
        )
        counts = jnp.zeros((total,), jnp.int32).at[dest].add(1, mode="drop")
        # Table-side collision check (mirrors the single-device geoslot
        # path EXACTLY — see neighbors.compute_particle_densities_geoslot):
        # on accepted frames every in-slab row's slot count is 1, so
        # ``ok = in_slab`` is bit-identical; collision frames are discarded
        # and the flag depends only on ``counts`` (deterministic).
        ok = in_slab
        no_coll = (
            jax.lax.psum(jnp.sum((counts > 1).astype(jnp.int32)), "sub") == 0
        )

        rdest = jnp.where(ok, dest, total)
        if (
            os.environ.get("SPLASHSURF_TPU_PACK_SCATTER", "0") == "1"
            and dtype == jnp.float32
        ):
            # complex-packed frac scatter (3 -> 2 row passes), mirroring the
            # single-device geoslot path; real/imag extraction is exact.
            # f32-only: the TPU X64 rewriter cannot rewrite complex128 HLOs.
            cdt = jnp.complex64
            packed = (
                jnp.full((total,), complex(np.inf, np.inf), cdt)
                .at[rdest]
                .set(
                    jax.lax.complex(fracs[0], fracs[1]),
                    mode="drop",
                    unique_indices=True,
                )
                .reshape(8, Xp, Yp, Zp)
            )
            rasters = [
                jnp.real(packed),
                jnp.imag(packed),
                jnp.full((total,), jnp.inf, dtype)
                .at[rdest]
                .set(fracs[2], mode="drop", unique_indices=True)
                .reshape(8, Xp, Yp, Zp),
            ]
        else:
            rasters = [
                jnp.full((total,), jnp.inf, dtype)
                .at[rdest]
                .set(f, mode="drop", unique_indices=True)
                .reshape(8, Xp, Yp, Zp)
                for f in fracs
            ]
        acc = _raster_sweep_xla(rasters, LXl, Yp, Zp, bs, h)
        acc_flat = acc.reshape(-1)
        src = jnp.where(ok, (oct * LXl + lx_c) * W + rby * Zp + rbz, 0)
        rho_rows = jnp.where(ok, acc_flat[src], 0.0)

        back = jax.lax.all_to_all(
            rho_rows, "sub", split_axis=0, concat_axis=0, tiled=True
        )
        rho_local = (
            jnp.zeros((Nl,), dtype)
            .at[src_row]
            .set(back, mode="drop", unique_indices=True)
        )
        return rho_local, (no_coll & in_lat)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P("sub"), P("sub"), P(), P()),
            out_specs=(P("sub"), P()),
        )
    )


@functools.lru_cache(maxsize=32)
def _density_fn(
    mesh: Mesh,
    grid: BinGrid,
    D: int,
    slab_w: int,
    C: int,
    slots: int,
    ocap: int,
    ccap: int,
):
    """Jitted shard_map: route -> local raster sweep -> route back."""
    from jax import shard_map

    LX, LY, LZ = grid.dims
    LXl = slab_w + 2  # own planes + one halo plane each side
    Yp, Zp = LY + 2, LZ + 2
    Xp = LXl + 2
    W = LY * Zp
    M = D * C

    def local(px, py, pz, nv, h):
        dtype = px.dtype
        Nl = px.shape[0]
        d = jax.lax.axis_index("sub")
        gidx = d * Nl + jnp.arange(Nl, dtype=jnp.int32)
        bins, bx, valid = _bins_local(px, py, pz, grid, gidx, nv)
        sid = jnp.clip(bx // slab_w, 0, D - 1)

        # ---- send buffers: positions + the owner-row -> local-index map
        send = [jnp.full((M,), jnp.inf, dtype) for _ in range(3)]
        src_row = jnp.full((M,), Nl, jnp.int32)
        lidx = jnp.arange(Nl, dtype=jnp.int32)
        for dst in range(D):
            owner, halo = _route_masks(bx, sid, valid, dst, slab_w, D)
            m = owner | halo
            rank = jnp.cumsum(m) - 1
            row = jnp.where(m & (rank < C), dst * C + rank, M)
            for k, comp in enumerate((px, py, pz)):
                send[k] = send[k].at[row].set(
                    comp, mode="drop", unique_indices=True
                )
            orow = jnp.where(owner & (rank < C), row, M)
            src_row = src_row.at[orow].set(
                lidx, mode="drop", unique_indices=True
            )

        rx = [
            jax.lax.all_to_all(s, "sub", split_axis=0, concat_axis=0, tiled=True)
            for s in send
        ]

        # ---- receiver: local cell list over the slab lattice
        rxx, rxy, rxz = rx
        rbins, rbx, rvalid = _bins_local(
            rxx, rxy, rxz, grid, jnp.zeros((M,), jnp.int32), jnp.int32(1)
        )
        # rvalid from _bins_local needs gidx<nv semantics only at the source;
        # here validity is just finiteness of the routed position
        rvalid = jnp.isfinite(rxx)
        x0 = d * slab_w
        lx = rbx - (x0 - 1)
        in_slab = rvalid & (lx >= 0) & (lx < LXl)
        rby = (rbins // LZ) % LY
        rbz = rbins % LZ
        lbin = jnp.where(
            in_slab, (lx * LY + rby) * LZ + rbz, _INT32_MAX
        )
        order = jnp.argsort(lbin).astype(jnp.int32)
        sb = lbin[order]
        spx, spy, spz = rxx[order], rxy[order], rxz[order]

        # within-bin slot ranks (global-order ties: see module docstring)
        is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        ridx = jnp.arange(M, dtype=jnp.int32)
        run_starts = (
            jnp.zeros((M,), jnp.int32)
            .at[jnp.where(is_start, run_id, M)]
            .set(ridx, mode="drop", unique_indices=True)
        )
        slot = ridx - run_starts[run_id]
        ok = (slot < slots) & (sb != _INT32_MAX)

        # rasterize fracs from GLOBAL quantities (single-device expressions)
        sb_c = jnp.where(sb != _INT32_MAX, sb, 0)
        s_lx = sb_c // (LY * LZ)
        s_by = (sb_c // LZ) % LY
        s_bz = sb_c % LZ
        s_bx = s_lx + (x0 - 1)  # global x cell
        bs = jnp.asarray(grid.bin_size, dtype)
        mn = [jnp.asarray(grid.min[i], dtype) for i in range(3)]
        bcoord = [s_bx, s_by, s_bz]
        total = slots * Xp * Yp * Zp
        dest = jnp.where(
            ok,
            ((slot * Xp + s_lx + 1) * Yp + s_by + 1) * Zp + (s_bz + 1),
            total,
        )
        rasters = []
        for i, comp in enumerate((spx, spy, spz)):
            frac = comp - (mn[i] + bcoord[i].astype(dtype) * bs)
            rasters.append(
                jnp.full((total,), jnp.inf, dtype)
                .at[dest]
                .set(frac, mode="drop", unique_indices=True)
                .reshape(slots, Xp, Yp, Zp)
            )

        acc = _raster_sweep_xla(rasters, LXl, Yp, Zp, bs, h)
        acc_flat = acc.reshape(-1)
        src = jnp.where(ok, (slot * LXl + s_lx) * W + s_by * Zp + s_bz, 0)
        rho_sorted = jnp.where(ok, acc_flat[src], 0.0)
        rho_rows = (
            jnp.zeros((M,), dtype)
            .at[order]
            .set(rho_sorted, mode="drop", unique_indices=True)
        )
        if ocap:
            rho_rows = _overflow_correction_local(
                spx, spy, spz, sb, order, rho_rows, slots, ocap, ccap, h,
                (LXl, LY, LZ),
            )

        # ---- route home; sources keep only their owner rows
        back = jax.lax.all_to_all(
            rho_rows, "sub", split_axis=0, concat_axis=0, tiled=True
        )
        rho_local = (
            jnp.zeros((Nl,), dtype)
            .at[src_row]
            .set(back, mode="drop", unique_indices=True)
        )
        return rho_local

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P("sub"), P("sub"), P(), P()),
            out_specs=P("sub"),
        )
    )


def compute_particle_densities_sharded(
    positions,
    compact_support_radius: float,
    particle_rest_mass: float,
    mesh: Optional[Mesh] = None,
    n_valid: Optional[int] = None,
):
    """Per-particle SPH densities, computed sharded over ``mesh``.

    Returns a (N,) array laid out P("sub") on the particle axis. Falls
    back to the replicated single-device path when the mesh has one
    device or the lattice exceeds the raster gate (huge sparse domains).
    """
    from splashsurf_tpu import neighbors
    from splashsurf_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    D = len(mesh.devices.ravel())
    positions = jnp.asarray(positions)
    n = positions.shape[0]
    dtype = positions.dtype
    nv = n if n_valid is None else int(n_valid)
    if D <= 1:
        return neighbors.compute_particle_densities(
            positions, compact_support_radius, particle_rest_mass,
            n_valid=n_valid,
        )

    # AABB over real particles (one pull), then the global bin lattice
    if nv < n:
        m = (jnp.arange(n, dtype=jnp.int32) < nv)[:, None]
        mn, mx = jax.device_get(
            (
                jnp.min(jnp.where(m, positions, jnp.inf), axis=0),
                jnp.max(jnp.where(m, positions, -jnp.inf), axis=0),
            )
        )
    else:
        mn, mx = jax.device_get(
            (jnp.min(positions, axis=0), jnp.max(positions, axis=0))
        )
    grid = BinGrid.for_domain(mn, mx, compact_support_radius)
    if (
        grid.dims[0] * grid.dims[1] * grid.dims[2]
        > neighbors.GATE_LATTICE_MAX
    ):
        return neighbors.compute_particle_densities(
            positions, compact_support_radius, particle_rest_mass,
            n_valid=n_valid,
        )

    # pad N to a device multiple; pads behave as dummies (gidx >= nv)
    Nl = -(-n // D)
    n_pad = Nl * D
    comps = [positions[:, d] for d in range(3)]
    if n_pad > n:
        pad = jnp.full((n_pad - n,), jnp.inf, dtype)
        comps = [jnp.concatenate([c, pad]) for c in comps]
    shard = NamedSharding(mesh, P("sub"))
    comps = [jax.device_put(c, shard) for c in comps]
    nv_j = jnp.asarray(nv, jnp.int32)

    def stats_for(g):
        sw = -(-g.dims[0] // D)
        return sw, tuple(
            int(x)
            for x in jax.device_get(_stats_fn(mesh, g, D, sw)(*comps, nv_j))
        )

    # phase 1: exact capacities (one pull). The formulation selection is
    # the SHARED neighbors.density_gate — never duplicate it here (the
    # sharded subdomain pipeline's bit-identity contract depends on both
    # paths picking the same formulation on the same scene).
    slab_w, (cnt_max, max_occ, over8, n_bins) = stats_for(grid)
    if neighbors.density_phase_retry(n, over8):
        grid2 = neighbors.phase_shifted_bingrid(grid, compact_support_radius)
        sw2, st2 = stats_for(grid2)
        if st2[2] < over8:
            grid, slab_w = grid2, sw2
            cnt_max, max_occ, over8, n_bins = st2
    lattice = grid.dims[0] * grid.dims[1] * grid.dims[2]
    gate = neighbors.density_gate(
        n, lattice, n_bins, max_occ, over8, which="sharded"
    )

    if gate["try_geoslot"]:
        # Sort-free octant path (mirrors the single-device wrapper's
        # geoslot attempt): phase-align the lattice, try the sharded
        # geoslot program, fall back to the sorted formulations on any
        # octant collision.
        from splashsurf_tpu.neighbors import _phase_aligned_bingrid

        phases = jax.device_get(
            _phase_fn(mesh)(
                *comps, nv_j,
                jnp.asarray(compact_support_radius / 2.0, dtype),
            )
        )
        agrid = _phase_aligned_bingrid(
            mn, mx, compact_support_radius, phases
        )
        alat = agrid.dims[0] * agrid.dims[1] * agrid.dims[2]
        if alat <= neighbors.GATE_LATTICE_MAX:
            asw, (acnt_max, _, _, _) = stats_for(agrid)
            Cg = _pow2_at_least(max(acnt_max, 1), lo=64)
            rho_g, ok_g = _density_fn_geoslot(mesh, agrid, D, asw, Cg)(
                *comps, nv_j, jnp.asarray(compact_support_radius, dtype)
            )
            ok_g = bool(jax.device_get(ok_g))
            neighbors._note_geoslot_outcome(ok_g)
            if ok_g:
                rho = jnp.asarray(particle_rest_mass, dtype) * rho_g
                return rho[:n]

    if not gate["use_raster"]:
        # the single-device wrapper would take the binned formulation here
        return neighbors.compute_particle_densities(
            positions, compact_support_radius, particle_rest_mass,
            n_valid=n_valid,
        )
    C = _pow2_at_least(max(cnt_max, 1), lo=64)
    ocap, ccap = gate["ocap"], gate["ccap"]

    rho = _density_fn(mesh, grid, D, slab_w, C, 8, ocap, ccap)(
        *comps, nv_j, jnp.asarray(compact_support_radius, dtype)
    )
    rho = jnp.asarray(particle_rest_mass, dtype) * rho
    return rho[:n]
