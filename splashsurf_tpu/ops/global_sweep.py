"""Fast global dense reconstruction: raster splat + packed MC on the full grid.

For domains whose background grid fits in HBM (the common case for dam-break
/ benchmark scenes), the subdomain decomposition machinery (pair expansion,
sort, halo overwrite, stitching — dense_subdomains.rs:349-1749) is pure
overhead on a TPU: a single dense raster sweep over the global grid plus one
packed marching-cubes pass produces the identical mesh with no decomposition,
no ghost duplication and no vertex dedup (an edge IS its vertex).

Pipeline (3 jit dispatches, 1 host sync at the end):
  1. ``rasterize_global``  — particles -> per-cell slot rasters holding cell
     fractions (one unique-index scatter per component; analog of the
     reference's per-subdomain particle lists).
  2. ``sweep_global``      — dense stencil sweep over statically pruned cell
     offsets: the global analog of the reference's AVX2/NEON density grid
     loops (dense_subdomains.rs:849-1133); overflow particles are added via
     the scatter path inside the same program.
  3. ``mc_global_packed``  — active-edge/active-cell compacted marching cubes
     emitting exact-size-sliceable packed arrays (marching_cubes/ analog).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import kernels
from splashsurf_tpu.density import gather_cell_offsets, supported_point_offsets
from splashsurf_tpu.ops.prefix import cumsum_small_i32, cumsum_small_i32_blocks
from splashsurf_tpu.mc import lut
from splashsurf_tpu.mc import dense as mc_dense
from splashsurf_tpu.uniform_grid import UniformGrid


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "slots", "hsc", "overflow_capacity", "lane_align",
        "with_meta", "slab_ncx",
    ),
)
def rasterize_global(
    positions,  # (N, 3)
    values,  # (N,)
    grid: UniformGrid,
    slots: int,
    hsc: int,
    overflow_capacity: int,
    lane_align: int = 1,
    with_meta: bool = False,
    slab_ncx: int | None = None,
    slab_x0=None,
):
    """Rasterize particles into per-cell slot tables over the whole grid.

    Returns (fx, fy, fz, fv) each of shape (slots, Xp, Yp, Zp) where
    Xp = ncx + 2*(hsc+1) etc. — cells padded by the sweep's reach on every
    side. frac components hold the particle position relative to its cell
    corner (+inf in empty slots, so W evaluates to exactly 0 without masks),
    fv holds the splat weight (0 in empty slots). Out-of-grid particles
    (count-padding dummies) are dropped. Per-cell slot ranks follow ascending
    particle index, making the accumulation order a pure function of the
    particle set (the determinism contract shared with the subdomain path).

    Also returns (opos0, opos1, opos2, oval, n_overflow): particles whose
    cell already had ``slots`` occupants, to be splatted via the scatter
    path. n_overflow must be validated <= overflow_capacity by the caller.

    Slab mode (the x-slab streamed dense path, ops/slab_sweep.py): with
    ``slab_ncx`` (static width in cells) and ``slab_x0`` (traced start
    cell), the table covers global cells [x0-pad, x0+slab_ncx+pad) in x —
    including the HALO band whose particles reach the slab's points. Cell
    indices and fracs are computed against the GLOBAL grid origin, so a
    particle's frac (and hence every kernel value) is bit-identical no
    matter which slab rasterized it — the determinism contract that makes
    neighboring slabs agree exactly on their shared point plane.
    """
    if isinstance(positions, (tuple, list)):
        # component-array form (the slab path's column buffers): avoids
        # round-tripping through a (N, 3) stack
        px = [jnp.asarray(c) for c in positions]
    else:
        positions = jnp.asarray(positions)
        px = [positions[:, d] for d in range(3)]
    values = jnp.asarray(values)
    dtype = px[0].dtype
    n = px[0].shape[0]
    ncx, ncy, ncz = grid.n_cells
    if slab_ncx is not None:
        ncx = slab_ncx
    pad = hsc + 1
    Xp = ncx + 2 * pad
    # Mosaic DMA memref views require tile-aligned slices: the minor (lane)
    # dim rounds to 128 and the second-minor (sublane) dim to 8 — an
    # unaligned Yp compiles for SOME shapes but fails for others ("Slice
    # shape along dimension 2 must be aligned to tiling (8), but is 191").
    sub_align = 8 if lane_align > 1 else 1
    Yp = -(-(ncy + 2 * pad) // sub_align) * sub_align
    Zp = -(-(ncz + 2 * pad) // lane_align) * lane_align
    if lane_align > 1:
        # The pallas sweep's OUTPUT block must be (8, 128)-tile aligned in
        # BOTH minor dims (Mosaic mis-stores the final partial tile of the
        # last grid step otherwise — measured wrong values in the last
        # (x, y) row at 2M scale). Its sublane (y) windows SLICE rows up to
        # 2*pad - 1 + round8(PY), so Yp must cover that reach (a <= 1-tile
        # bump). Lane (z) windows that would overrun Zp use an in-kernel
        # lane roll instead — widening Zp by a whole 128-lane tile would
        # double the raster + DMA cost at typical grid shapes.
        Yo = -(-(ncy + 1) // 8) * 8
        Yp = max(Yp, -(-(2 * pad - 1 + Yo) // 8) * 8)

    cs = jnp.asarray(grid.cell_size, dtype)
    mn = [jnp.asarray(grid.min[d], dtype) for d in range(3)]
    cell = [jnp.floor((px[d] - mn[d]) / cs).astype(jnp.int32) for d in range(3)]
    if slab_ncx is None:
        cx_rel = cell[0]  # x index relative to the table's cell range
        valid_x = (cell[0] >= 0) & (cell[0] < ncx)
        ncells_rank = ncx * ncy * ncz
    else:
        # slab mode: accept the halo band too; rank space covers it
        x0 = jnp.asarray(slab_x0, jnp.int32)
        cx_rel = cell[0] - x0  # relative x, in [-pad, ncx+pad) when valid
        valid_x = (cx_rel >= -pad) & (cx_rel < ncx + pad)
        ncells_rank = (ncx + 2 * pad) * ncy * ncz
    valid = (
        valid_x
        & (cell[1] >= 0) & (cell[1] < ncy)
        & (cell[2] >= 0) & (cell[2] < ncz)
    )
    import os

    ncells = ncells_rank
    rank_x = cx_rel if slab_ncx is None else cx_rel + pad
    cflat = jnp.where(valid, (rank_x * ncy + cell[1]) * ncz + cell[2], ncells)
    idx = jnp.arange(n, dtype=jnp.int32)

    if os.environ.get("SPLASHSURF_TPU_RASTER_SORTFREE", "1") == "1":
        # Slot ranks WITHOUT the full-N sort: ``slots`` scatter-min passes
        # over a per-cell table assign ranks in ascending particle index —
        # the same determinism contract as the sorted formulation (rank r
        # goes to the (r+1)-th smallest particle index in the cell), at ~2
        # scatter+gather passes instead of a 2M-key radix sort. Particles
        # beyond ``slots`` spill to the overflow path.
        # COST IS SLOTS-LINEAR: each round materializes a fresh
        # (ncells+1) int32 table (~192 MB/round at the 48M-cell dense
        # gate) — fine at slots=2, a silent HBM-traffic cliff if slots is
        # ever raised; prefer the sorted formulation past slots ~4.
        rank = jnp.full((n,), slots, jnp.int32)
        remaining = valid
        key = jnp.int32(n) - idx  # ascending idx -> descending positive key
        for r in range(slots):
            # zeros-init + scatter-MAX of (n - idx): identical winners to a
            # sentinel-init scatter-min of idx (keys are unique), but the
            # table init is a plain zero fill
            tbl = (
                jnp.zeros((ncells + 1,), jnp.int32)
                .at[jnp.where(remaining, cflat, ncells)]
                .max(key)
            )
            won = remaining & (tbl[cflat] == key)
            rank = jnp.where(won, r, rank)
            remaining = remaining & ~won
    else:
        # sorted formulation: stable sort by cell id, run-boundary rank,
        # undo the sort
        sflat = jnp.where(valid, cflat, np.int32(2**31 - 1))
        order = jnp.argsort(sflat, stable=True).astype(jnp.int32)
        sf = sflat[order]
        is_start = jnp.concatenate([jnp.array([True]), sf[1:] != sf[:-1]])
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        run_starts = (
            jnp.zeros((n,), jnp.int32)
            .at[jnp.where(is_start, run_id, n)]
            .set(idx, mode="drop", unique_indices=True)
        )
        rank_sorted = idx - run_starts[run_id]
        rank = (
            jnp.zeros((n,), jnp.int32)
            .at[order]
            .set(rank_sorted, mode="drop", unique_indices=True)
        )

    ok = valid & (rank < slots)
    total = slots * Xp * Yp * Zp
    dest = (
        (rank * Xp + (cx_rel + pad)) * Yp + (cell[1] + pad)
    ) * Zp + (cell[2] + pad)
    dest = jnp.where(ok, dest, total)

    frac = [px[d] - (mn[d] + cell[d].astype(dtype) * cs) for d in range(3)]

    def raster(component, fill):
        return (
            jnp.full((total,), fill, dtype)
            .at[dest]
            .set(component, mode="drop", unique_indices=True)
            .reshape(slots, Xp, Yp, Zp)
        )

    if (
        os.environ.get("SPLASHSURF_TPU_PACK_SCATTER", "0") == "1"
        and dtype == jnp.float32
    ):
        # Scatter cost on TPU is per update ROW (~6 ms/M rows), not per
        # byte: packing two f32 components into one complex scatter halves
        # the raster's scatter rows, and real/imag extraction afterwards is
        # an exact (bit-identical) cheap HBM pass. 4 scatters -> 2.
        # f32-only: the TPU X64 rewriter cannot rewrite complex128 HLOs
        # (RET_CHECK x64_rewriter.cc, measured on the f64 smoke r4_15c).
        cdt = jnp.complex64

        def raster2(ca, cb, fill_a, fill_b):
            packed = (
                jnp.full((total,), complex(fill_a, fill_b), cdt)
                .at[dest]
                .set(jax.lax.complex(ca, cb), mode="drop", unique_indices=True)
                .reshape(slots, Xp, Yp, Zp)
            )
            return jnp.real(packed), jnp.imag(packed)

        fx, fy = raster2(frac[0], frac[1], np.inf, np.inf)
        if with_meta:
            # cell-raster density path: no value raster (rho comes from the
            # pair sweep), so fz rides alone
            fz, fv = raster(frac[2], jnp.inf), None
        else:
            fz, fv = raster2(frac[2], values, np.inf, 0.0)
    else:
        far = kernels.far_fill(dtype)  # inf (f32) / finite (f64; X64 emu)
        fx = raster(frac[0], far)
        fy = raster(frac[1], far)
        fz = raster(frac[2], far)
        # with_meta (the cell-raster density path) derives the value raster
        # from the pair sweep instead — skip its 1-per-particle scatter
        fv = None if with_meta else raster(values, 0.0)

    # overflow compaction
    over = valid & (rank >= slots)
    odest = jnp.where(over, cumsum_small_i32(over) - 1, overflow_capacity)
    opos = [
        jnp.full((overflow_capacity,), -1e30, dtype).at[odest].set(px[d], mode="drop")
        for d in range(3)
    ]
    oval = (
        jnp.zeros((overflow_capacity,), dtype).at[odest].set(values, mode="drop")
    )
    n_overflow = jnp.sum(over).astype(jnp.int32)
    if with_meta:
        # (slot rank, validity, per-axis cell) per particle: the cell-raster
        # density path reads rho back through them (no value raster)
        return (
            fx, fy, fz, opos[0], opos[1], opos[2], oval, n_overflow,
            rank, ok, cell[0], cell[1], cell[2],
        )
    return fx, fy, fz, fv, opos[0], opos[1], opos[2], oval, n_overflow


def _scatter_splat_points(
    opx, opy, opz, oval, grid, h, hsc, out_flat,
    slab_npx: int | None = None, slab_x0=None,
):
    """Scatter-add splat of (few) overflow particles onto the global points.

    Slab mode: points are the slab's ([x0, x0+npx) global x planes); point
    COORDINATES stay in global-grid arithmetic so contributions are
    bit-identical across slabs (see rasterize_global's slab note)."""
    dtype = opx.dtype
    npx, npy, npz = grid.n_points
    if slab_npx is not None:
        npx = slab_npx
        x0 = jnp.asarray(slab_x0, jnp.int32)
    total_points = npx * npy * npz
    cs = jnp.asarray(grid.cell_size, dtype)
    mn = [jnp.asarray(grid.min[d], dtype) for d in range(3)]
    pxs = [opx, opy, opz]
    cell = [jnp.floor((pxs[d] - mn[d]) / cs).astype(jnp.int32) for d in range(3)]

    offs_np = supported_point_offsets(hsc)
    block = 128
    padn = (-len(offs_np)) % block
    offs_np = np.concatenate(
        [offs_np, np.full((padn, 3), -(10 * (hsc + 2)), np.int32)]
    )
    offs_blocks = jnp.asarray(offs_np.reshape(-1, block, 3))
    npts = (npx, npy, npz)
    strides = (npy * npz, npz, 1)
    hj = jnp.asarray(h, dtype)

    def body(out, offs):
        nb = opx.shape[0]
        d2 = jnp.zeros((nb, block), dtype)
        flat = jnp.zeros((nb, block), jnp.int32)
        in_grid = jnp.ones((nb, block), bool)
        for d in range(3):
            p = cell[d][:, None] + offs[None, :, d]  # GLOBAL point index
            coord = mn[d] + p.astype(dtype) * cs
            delta = coord - pxs[d][:, None]
            if dtype == jnp.float64:
                # X64-emulation guards (measured, tools/f64_probe r5): the
                # dummy fill rows' delta^2 overflows the f32-RANGE
                # double-float representation (whose sqrt(inf) is NaN),
                # and the emulated f64->s32 convert of their huge cell
                # coordinates can WRAP INTO the grid — NaN*0 then
                # scatter-adds NaN at the corner. Clamping delta keeps W
                # at an exact 0 for dummy rows, so a garbage-aliased
                # index adds 0.0 harmlessly. f32 (native IEEE +
                # saturating converts) keeps its exact program.
                delta = jnp.clip(delta, -1e15, 1e15)
            d2 = d2 + delta * delta
            p_rel = p - x0 if (slab_npx is not None and d == 0) else p
            in_grid = in_grid & (p_rel >= 0) & (p_rel < npts[d])
            flat = flat + p_rel * strides[d]
        w = kernels.cubic_kernel(jnp.sqrt(d2), hj) * oval[:, None]
        dst = jnp.where(in_grid, flat, total_points)
        return out.at[dst.reshape(-1)].add(w.reshape(-1), mode="drop"), None

    out_flat, _ = jax.lax.scan(body, out_flat, offs_blocks)
    return out_flat


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "compact_support_radius", "hsc", "backend", "slab_npx",
    ),
)
def sweep_global(
    fx, fy, fz, fv,  # (S, Xp, Yp, Zp)
    opx, opy, opz, oval,  # overflow particles (scatter path)
    grid: UniformGrid,
    compact_support_radius: float,
    hsc: int,
    backend: str = "unroll",
    slab_npx: int | None = None,
    slab_x0=None,
):
    """Level set phi on the global grid points: dense sweep + overflow scatter.

    backend: "unroll" (static shifted windows; the TPU path) or "scan"
    (dynamic slices; compiles fast for host tests). Slab mode (slab_npx +
    slab_x0): the points are the slab's x-planes; the dense sweep is
    already relative arithmetic, only the overflow scatter needs the
    global->slab offset.
    """
    dtype = fx.dtype
    S = fx.shape[0]
    PX, PY, PZ = grid.n_points
    if slab_npx is not None:
        PX = slab_npx
    pad = hsc + 1
    cs = jnp.asarray(grid.cell_size, dtype)
    h = jnp.asarray(compact_support_radius, dtype)
    offs = gather_cell_offsets(hsc) + pad  # slice starts in [0, 2*hsc+2)

    if backend in ("pallas", "pallas_interpret"):
        from splashsurf_tpu.ops.splat_pallas import sweep_global_pallas

        acc = sweep_global_pallas(
            fx, fy, fz, fv,
            cell_size=grid.cell_size,
            compact_support_radius=float(compact_support_radius),
            hsc=hsc,
            n_points=(PX, PY, PZ),
            interpret=(backend == "pallas_interpret"),
        )
    elif backend == "unroll":
        acc = jnp.zeros((PX, PY, PZ), dtype)
        for s in range(S):
            for o0, o1, o2 in offs:
                o0, o1, o2 = int(o0), int(o1), int(o2)
                wx = fx[s, o0 : o0 + PX, o1 : o1 + PY, o2 : o2 + PZ]
                wy = fy[s, o0 : o0 + PX, o1 : o1 + PY, o2 : o2 + PZ]
                wz = fz[s, o0 : o0 + PX, o1 : o1 + PY, o2 : o2 + PZ]
                wv = fv[s, o0 : o0 + PX, o1 : o1 + PY, o2 : o2 + PZ]
                dx = wx + (o0 - pad) * cs
                dy = wy + (o1 - pad) * cs
                dz = wz + (o2 - pad) * cs
                d2 = dx * dx + dy * dy + dz * dz
                acc = acc + kernels.cubic_kernel(jnp.sqrt(d2), h) * wv
    else:
        offs_j = jnp.asarray(offs, jnp.int32)
        zero = jnp.int32(0)

        def body(a, o):
            sizes = (S, PX, PY, PZ)
            starts = (zero, o[0], o[1], o[2])
            wx = jax.lax.dynamic_slice(fx, starts, sizes)
            wy = jax.lax.dynamic_slice(fy, starts, sizes)
            wz = jax.lax.dynamic_slice(fz, starts, sizes)
            wv = jax.lax.dynamic_slice(fv, starts, sizes)
            od = (o - pad).astype(dtype) * cs
            d2 = (wx + od[0]) ** 2 + (wy + od[1]) ** 2 + (wz + od[2]) ** 2
            w = kernels.cubic_kernel(jnp.sqrt(d2), h) * wv
            return a + jnp.sum(w, axis=0), None

        acc, _ = jax.lax.scan(body, jnp.zeros((PX, PY, PZ), dtype), offs_j)

    if opx.shape[0] == 0:
        # overflow capacity 0 (speculative plan: previous frame had no
        # raster overflow) — the scatter is statically absent
        return acc.reshape(PX, PY, PZ)
    out_flat = _scatter_splat_points(
        opx, opy, opz, oval, grid, compact_support_radius, hsc,
        acc.reshape(-1), slab_npx=slab_npx, slab_x0=slab_x0,
    )
    return out_flat.reshape(PX, PY, PZ)


# ---------------------------------------------------------------------------
# cell-raster density: rho computed FROM the level-set rasters (no separate
# density stage). The standalone density paid its own binning scatters +
# sweep (~105 ms at 2M); here the pair sums run over the (slot, cell)
# rasters already built for the level set, fv = m/rho is a pure elementwise
# transform in raster layout (zero extra scatters), and per-particle rho is
# one gather. Valid only when the frame has NO raster slot overflow (every
# particle holds a raster slot) — the caller routes overflowing scenes
# through the legacy density formulations.
# ---------------------------------------------------------------------------


def _pair_sweep_xla(fx, fy, fz, grid, cs, h, reach, h_over_cs, pad):
    """Portable unrolled fallback of pair_sweep_pallas: acc4 (S, ncx, ncy,
    ncz) of unnormalized spline pair sums (inf pads -> exactly 0 terms)."""
    from splashsurf_tpu.ops.splat_pallas import pair_cell_offsets

    S = fx.shape[0]
    ncx, ncy, ncz = grid.n_cells
    sl_q = (
        slice(None), slice(pad, pad + ncx), slice(pad, pad + ncy),
        slice(pad, pad + ncz),
    )
    fq = [f[sl_q] for f in (fx, fy, fz)]
    acc = jnp.zeros((S, ncx, ncy, ncz), fx.dtype)
    for o0, o1, o2 in pair_cell_offsets(reach, float(h_over_cs)):
        sl = (
            slice(None),
            slice(pad + o0, pad + o0 + ncx),
            slice(pad + o1, pad + o1 + ncy),
            slice(pad + o2, pad + o2 + ncz),
        )
        for kj in range(S):
            dx = fq[0] - (fx[sl][kj] + o0 * cs)
            dy = fq[1] - (fy[sl][kj] + o1 * cs)
            dz = fq[2] - (fz[sl][kj] + o2 * cs)
            d2 = dx * dx + dy * dy + dz * dz
            q = jnp.sqrt(d2) * (2.0 / h)
            a = jnp.maximum(2.0 - q, 0.0)
            b = jnp.maximum(1.0 - q, 0.0)
            acc = acc + (a * a * a - 4.0 * (b * b * b))
    return acc / (4.0 * np.pi)


@functools.partial(
    jax.jit,
    static_argnames=("grid", "hsc", "reach", "h_over_cs", "backend"),
)
def density_weights_from_rasters(
    fx, fy, fz,  # (S, Xp, Yp, Zp) cell-fraction rasters (inf pads)
    rank, ok, cx, cy, cz,  # per-particle raster meta (rasterize_global)
    particle_rest_mass,
    compact_support_radius,
    grid: UniformGrid,
    hsc: int,
    reach: int,
    h_over_cs: float,
    backend: str,
):
    """(fv raster for sweep_global, per-particle rho) from the pair sweep.

    Exact ONLY when no particle overflowed the raster slots (the caller
    validates n_overflow == 0; overflowing frames take the legacy density).
    """
    dtype = fx.dtype
    S, Xp, Yp, Zp = fx.shape
    ncx, ncy, ncz = grid.n_cells
    pad = hsc + 1
    h = jnp.asarray(compact_support_radius, dtype)
    cs = jnp.asarray(grid.cell_size, dtype)
    m = jnp.asarray(particle_rest_mass, dtype)
    sigma = 8.0 / (h * h * h)

    if backend.startswith("pallas") and dtype == jnp.float32:
        from splashsurf_tpu.ops.splat_pallas import pair_sweep_pallas

        acc = pair_sweep_pallas(
            fx, fy, fz, cs, h, reach, h_over_cs, pad, grid.n_cells,
            interpret=(backend == "pallas_interpret"),
        )
        acc4 = acc[:, :ncx, : ncy * Zp].reshape(S, ncx, ncy, Zp)[..., :ncz]
    else:
        acc4 = _pair_sweep_xla(
            fx, fy, fz, grid, cs, h, reach, h_over_cs, pad
        )

    # fv = m / rho = 1 / (sigma * acc) on real slots, EXACTLY 0 on empty /
    # pad slots (sweep_global's contract); empty-query lanes hold NaN/inf.
    finite = jnp.isfinite(acc4) & (acc4 > 0)
    fv_inner = jnp.where(finite, 1.0 / (sigma * jnp.where(finite, acc4, 1.0)), 0.0)
    fv = jnp.zeros((S, Xp, Yp, Zp), dtype)
    fv = fv.at[:, pad : pad + ncx, pad : pad + ncy, pad : pad + ncz].set(
        fv_inner
    )

    # per-particle rho readback (one gather)
    acc_flat = acc4.reshape(-1)
    src = ((jnp.clip(rank, 0, S - 1) * ncx + cx) * ncy + cy) * ncz + cz
    src = jnp.where(ok, src, 0)
    rho = jnp.where(ok, m * sigma * acc_flat[src], 0.0)
    return fv, rho


@functools.partial(
    jax.jit,
    static_argnames=("grid", "vertex_capacity", "triangle_capacity", "encode"),
)
def mc_global_packed(
    ls,  # (PX, PY, PZ) level set on grid points
    grid: UniformGrid,
    iso,
    vertex_capacity: int,
    triangle_capacity: int,
    encode: bool = False,
):
    """Packed marching cubes over the dense global grid.

    Active-edge / active-cell compacted (the sparse narrow-band analog,
    marching_cubes/narrow_band_extraction.rs:8-219 + triangulation.rs:23-57):
    vertex positions are computed only for the compacted active set, so the
    dense phase is just the three edge masks plus one cumsum.

    Returns (vx, vy, vz, t0, t1, t2, total_v, total_t); slice the packed
    arrays to the totals on the host. No dedup is needed: one vertex per
    active global edge by construction.
    """
    dtype = ls.dtype
    PX, PY, PZ = ls.shape
    iso = jnp.asarray(iso, dtype)
    inside = ls >= iso
    ls_flat = ls.reshape(-1)
    mn = [jnp.asarray(grid.min[d], dtype) for d in range(3)]
    cs = jnp.asarray(grid.cell_size, dtype)

    # --- phase 1: active-edge compaction ---------------------------------
    masks = []
    for a in range(3):
        sl0 = tuple(slice(0, -1) if d == a else slice(None) for d in range(3))
        sl1 = tuple(slice(1, None) if d == a else slice(None) for d in range(3))
        masks.append((inside[sl0] != inside[sl1]).reshape(-1))
    mask = jnp.concatenate(masks)
    vidx = cumsum_small_i32(mask) - 1
    total_v = (vidx[-1] + 1).astype(jnp.int32)
    n_edges = mask.shape[0]
    # capacity scatter (measured FASTER in-graph than a binary search over
    # the cumsum, which blocks fusion of the mask/cumsum chain)
    vdest = jnp.where(mask, vidx, vertex_capacity)
    active_edge = (
        jnp.zeros((vertex_capacity,), jnp.int32)
        .at[vdest]
        .set(jnp.arange(n_edges, dtype=jnp.int32), mode="drop", unique_indices=True)
    )

    # --- phase 2: vertex data on the active set ---------------------------
    axis, ijk = mc_dense.decode_edge_flat(active_edge, (PX, PY, PZ))
    p_flat0 = (ijk[:, 0] * PY + ijk[:, 1]) * PZ + ijk[:, 2]
    step = jnp.where(axis == 0, PY * PZ, jnp.where(axis == 1, PZ, 1))
    v0 = ls_flat[p_flat0]
    v1 = ls_flat[p_flat0 + step]
    denom = v1 - v0
    t = jnp.clip(
        (iso - v0) / jnp.where(denom == 0, jnp.ones_like(denom), denom), 0.0, 1.0
    )
    if not encode:
        pvs = []
        for d in range(3):
            pos_d = mn[d] + ijk[:, d].astype(dtype) * cs
            pos_d = pos_d + jnp.where(axis == d, t, 0) * cs
            pvs.append(pos_d)
        vx, vy, vz = pvs

    # --- phase 3: active-cell compaction + triangle emission --------------
    case = jnp.zeros((PX - 1, PY - 1, PZ - 1), jnp.int32)
    for c8 in range(8):
        oi, oj, ok = (c8 >> 2) & 1, (c8 >> 1) & 1, c8 & 1
        corner = inside[oi : oi + PX - 1, oj : oj + PY - 1, ok : ok + PZ - 1]
        case = case | (corner.astype(jnp.int32) << c8)
    case_flat = case.reshape(-1)
    counts = jnp.asarray(lut.TRI_COUNT, jnp.int32)[case_flat]
    ccum = cumsum_small_i32(counts)
    offsets = ccum - counts
    total_t = ccum[-1]

    if encode:
        # Compact-transfer encoding: the host rebuilds triangle indices from
        # (cell id, case) pairs and vertex positions from (edge id, t) —
        # ~3x fewer bytes across the device link, and the per-slot
        # forward-fill + triangle-corner gathers move to cheap host numpy.
        active = counts > 0
        acum = cumsum_small_i32(active)
        total_c = acum[-1]
        n_cells_flat = case_flat.shape[0]
        ucdest = jnp.where(active, acum - 1, triangle_capacity)
        cells_c = (
            jnp.zeros((triangle_capacity,), jnp.int32)
            .at[ucdest]
            .set(
                jnp.arange(n_cells_flat, dtype=jnp.int32),
                mode="drop",
                unique_indices=True,
            )
        )
        cases_c = (
            jnp.zeros((triangle_capacity,), jnp.uint8)
            .at[ucdest]
            .set(
                case_flat.astype(jnp.uint8), mode="drop", unique_indices=True
            )
        )
        return active_edge, t, cells_c, cases_c, total_v, total_t, total_c

    n_cells_flat = case_flat.shape[0]
    # Compact active cells: every active cell emits >= 1 triangle, so the
    # triangle offset indexes a compact table; forward-fill assigns the
    # in-between slots. (A binary search over the count cumsum measured
    # SLOWER than this scatter+scan on TPU - the scatter sources are only
    # the ~2% active cells wide here, unlike the edge compaction.)
    cdest = jnp.where(counts > 0, offsets, triangle_capacity)
    active_cell = (
        jnp.zeros((triangle_capacity,), jnp.int32)
        .at[cdest]
        .set(jnp.arange(n_cells_flat, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    active_cell = jax.lax.associative_scan(jnp.maximum, active_cell)
    acase = case_flat[active_cell]
    acounts = counts[active_cell]
    aoffsets = offsets[active_cell]
    slot_in_cell = jnp.arange(triangle_capacity, dtype=jnp.int32) - aoffsets
    emit = slot_in_cell < acounts

    cy, cz = PY - 1, PZ - 1
    aci = active_cell // (cy * cz)
    acj = (active_cell // cz) % cy
    ack = active_cell % cz

    const, ci_c, cj_c, ck_c = mc_dense._local_edge_coeffs((PX, PY, PZ))
    n_slots = lut.TRI_TABLE.shape[1]
    tri_tab = np.where(lut.TRI_TABLE >= 0, lut.TRI_TABLE, 0)
    safe_slot = jnp.clip(slot_in_cell, 0, n_slots - 1)
    tcols = []
    for corner in range(3):
        tab = jnp.asarray(tri_tab[:, :, corner], jnp.int32)
        local = tab[acase, safe_slot]
        edge_flat = (
            jnp.asarray(const)[local]
            + jnp.asarray(ci_c)[local] * aci
            + jnp.asarray(cj_c)[local] * acj
            + jnp.asarray(ck_c)[local] * ack
        )
        tvidx = vidx[edge_flat]
        tcols.append(jnp.where(emit, tvidx, 0))

    return vx, vy, vz, tcols[0], tcols[1], tcols[2], total_v, total_t


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "vertex_capacity", "triangle_capacity", "encode", "quant_t"
    ),
)
def mc_global_cells(
    ls,  # (PX, PY, PZ) level set on grid points
    grid: UniformGrid,
    iso,
    vertex_capacity: int,
    triangle_capacity: int,
    encode: bool = False,
    quant_t: bool = False,
    own_px=None,
):
    """Cell-list marching cubes: compact active CELLS first, derive everything
    else from the compact list.

    The edge-major formulation (``mc_global_packed``) pays one scatter with
    3*n_cells update rows (active-edge compaction) plus one with n_cells rows
    (cell forward-fill) — scatters process ~1M update rows/ms on TPU, so at a
    32M-cell grid that is ~130 ms of pure scatter. Here the ONLY wide scatter
    is the active-cell compaction (n_cells rows); everything downstream runs
    at active-cell scale (~1-2%% of the grid):

      - per-cell origin-edge activity comes from the case bits (corner 0 vs
        corners +x/+y/+z), no edge masks over the dense grid;
      - vertex order is (axis, active-cell-rank) — axis-major so no (N,3)
        minor-dim-3 arrays materialize;
      - triangle corners map to vertices via a dense cell->rank table
        (n_cells-wide but written with only ~active-cell update rows).

    Matches marching_cubes_lut.rs triangulation semantics through the same
    generated LUT; the narrow-band analog of narrow_band_extraction.rs.
    Returns (vx, vy, vz, t0, t1, t2, total_v, total_t), or with
    ``encode=True`` the compact transfer streams
    (t, cells_c, cases_c, total_v, total_t, total_c) from which the host
    rebuilds the identical mesh (see ``_decode_cellwise_mesh``).
    """
    dtype = ls.dtype
    PX, PY, PZ = ls.shape
    n_pts = PX * PY * PZ
    cap = triangle_capacity  # active points <~ active cells <= triangles
    iso = jnp.asarray(iso, dtype)
    inside = ls >= iso
    ls_flat = ls.reshape(-1)
    mn = [jnp.asarray(grid.min[d], dtype) for d in range(3)]
    cs = jnp.asarray(grid.cell_size, dtype)

    # --- active-POINT compaction ------------------------------------------
    # Each grid point owns its 3 origin edges (+x/+y/+z) and, when interior,
    # the cell with the same ijk. A point-shaped 11-bit word packs the cell
    # case (bits 0-7; 0 for far-boundary points with no cell) and the three
    # origin-edge activity bits (8-10). Points own edges rather than cells
    # because a surface touching the far grid planes has active edges whose
    # same-ijk CELL does not exist — the point always does.
    # One shared padded array feeds every shifted term (each per-term
    # pad+concat materialized a full point-grid intermediate).
    insp = jnp.pad(inside, ((0, 1), (0, 1), (0, 1)))  # (PX+1, PY+1, PZ+1)

    def win(oi, oj, ok):
        return jax.lax.dynamic_slice(insp, (oi, oj, ok), (PX, PY, PZ))

    base = win(0, 0, 0)
    case = jnp.zeros((PX, PY, PZ), jnp.int32)
    for c8 in range(8):
        oi, oj, ok = (c8 >> 2) & 1, (c8 >> 1) & 1, c8 & 1
        case = case | (win(oi, oj, ok).astype(jnp.int32) << c8)
    # pad plane points have no cell: their case includes out-of-grid zeros,
    # which is exactly the reference's "no data = outside" domain shrink —
    # but the cell bits must be DROPPED on far-boundary points (no cell).
    ii = jnp.arange(PX)[:, None, None]
    jj = jnp.arange(PY)[None, :, None]
    kk = jnp.arange(PZ)[None, None, :]
    has_cell = (ii < PX - 1) & (jj < PY - 1) & (kk < PZ - 1)
    word = jnp.where(
        has_cell & (case != 0) & (case != 255), case, 0
    )
    for a, bit in ((0, 8), (1, 9), (2, 10)):
        nbr = win(1 if a == 0 else 0, 1 if a == 1 else 0, 1 if a == 2 else 0)
        in_rng = (ii, jj, kk)[a] < (PX, PY, PZ)[a] - 1
        em = (base != nbr) & in_rng
        word = word | (em.astype(jnp.int32) << bit)
    if own_px is not None:
        # x-slab ownership (ops/slab_sweep.py): points on the slab's far x
        # plane(s) are owned — and emitted bit-identically — by the next
        # slab; masking their word keeps the merged point stream duplicate-
        # free (the subdomain path's canonical-ownership idea on slabs).
        word = jnp.where(ii < jnp.asarray(own_px, jnp.int32), word, 0)
    word_flat = word.reshape(-1)
    active = word_flat != 0
    # Packed single-scatter compaction: scattering (point id, word) as two
    # n_pts-update-row scatters measured ~34 ms APIECE at a 6M grid — half
    # the MC wall. Pack the point's offset within its 32-wide cumsum block
    # (5 bits) above the 11-bit word — EXACTLY 16 bits, so the encoded pull
    # ships u16 — and scatter ONCE; point ids are then block*32 + local,
    # with each compact slot's block recovered from a tiny (n_blocks-row)
    # block-start scatter + max-scan (and one np.repeat on the host).
    BLOCK = 32
    acum, boffs, bsum = cumsum_small_i32_blocks(active, BLOCK)
    total_c = acum[-1]
    nb = boffs.shape[0]
    bdest = jnp.where(bsum > 0, boffs, cap)
    blk_of_slot = (
        jnp.zeros((cap,), jnp.int32)
        .at[bdest]
        .set(jnp.arange(nb, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    blk_of_slot = jax.lax.associative_scan(jnp.maximum, blk_of_slot)
    import os

    if os.environ.get("SPLASHSURF_TPU_MC_BITMASK", "1") == "1":
        # Bitmask compaction: the n_pts-row u16 scatter above was ~34 ms at
        # a 6M grid and scales with GRID points, not surface size — at the
        # slab-streamed 350M-point scale it alone would cost seconds. Pack
        # each 32-block's activity into a u32 mask (pure elementwise) and
        # recover slot -> point via popcount binary search at ACTIVE-slot
        # scale: 3 cap-row gathers + ~30 VPU ops replace the grid-wide
        # scatter. Values are identical to the scatter formulation
        # (fallback below; bit-identity tested).
        bits = jnp.pad(active, (0, nb * BLOCK - n_pts)).reshape(nb, BLOCK)
        mask32 = jnp.sum(
            bits.astype(jnp.uint32)
            << jnp.arange(BLOCK, dtype=jnp.uint32)[None, :],
            axis=1,
            dtype=jnp.uint32,
        )
        jj = jnp.arange(cap, dtype=jnp.int32) - boffs[blk_of_slot]
        cur = mask32[blk_of_slot]
        bit = jnp.zeros((cap,), jnp.int32)
        for shift in (16, 8, 4, 2, 1):
            lowm = jnp.uint32((1 << shift) - 1)
            c = jax.lax.population_count(cur & lowm).astype(jnp.int32)
            go = jj >= c
            jj = jnp.where(go, jj - c, jj)
            cur = jnp.where(go, cur >> jnp.uint32(shift), cur & lowm)
            bit = bit + jnp.where(go, shift, 0)
        points_c = blk_of_slot * BLOCK + bit
        valid_slot = jnp.arange(cap, dtype=jnp.int32) < total_c
        words_c = jnp.where(
            valid_slot, word_flat[jnp.minimum(points_c, n_pts - 1)], 0
        )
        packed = jnp.where(valid_slot, (bit << 11) | words_c, 0)
    else:
        ucdest = jnp.where(active, acum - 1, cap)
        local = jnp.arange(n_pts, dtype=jnp.int32) & (BLOCK - 1)
        packed = (
            jnp.zeros((cap,), jnp.uint16)
            .at[ucdest]
            .set(
                ((local << 11) | word_flat).astype(jnp.uint16),
                mode="drop",
                unique_indices=True,
            )
            .astype(jnp.int32)
        )
        words_c = packed & 0x7FF
        points_c = blk_of_slot * BLOCK + (packed >> 11)

    # --- vertex stream: one vertex per active origin edge, axis-major -----
    ex = (words_c >> 8) & 1
    ey = (words_c >> 9) & 1
    ez = (words_c >> 10) & 1
    emask = jnp.concatenate([ex, ey, ez]) == 1  # (3*cap,) axis-major
    vcum = cumsum_small_i32(emask)
    total_v = vcum[-1]
    vidx_pos = vcum - 1  # GLOBAL vertex index of active slot (axis*cap + rank)

    vdest = jnp.where(emask, vidx_pos, vertex_capacity)
    vslot = (
        jnp.zeros((vertex_capacity,), jnp.int32)
        .at[vdest]
        .set(jnp.arange(3 * cap, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    vaxis = vslot // cap
    vrank = vslot - vaxis * cap
    p0 = points_c[vrank]  # flat POINT id (== edge base point)
    step = jnp.where(vaxis == 0, PY * PZ, jnp.where(vaxis == 1, PZ, 1))
    v0 = ls_flat[p0]
    v1 = ls_flat[jnp.minimum(p0 + step, n_pts - 1)]
    denom = v1 - v0
    t = jnp.clip(
        (iso - v0) / jnp.where(denom == 0, jnp.ones_like(denom), denom), 0.0, 1.0
    )
    if encode:
        counts_enc = jnp.asarray(lut.TRI_COUNT, jnp.int32)[words_c & 0xFF]
        if quant_t:
            # u16-quantized edge parameter: halves the t stream's link
            # bytes; max position error cell_size/65535 (~1e-7 of the
            # domain) — orders below the 1e-4 accuracy budget. f32-only
            # (f64 runs keep full-precision t).
            t = jnp.round(t * 65535.0).astype(jnp.uint16)
        # Ship the PACKED stream (u16/slot, local<<11|word) + u8 per-block
        # active counts instead of (points i32 + words u16) — 4 B/slot
        # fewer link bytes; the host unpacks with one np.repeat.
        return (
            t,
            packed.astype(jnp.uint16),
            bsum.astype(jnp.uint8),  # per-block active counts (nb,), <= 32
            total_v,
            jnp.sum(counts_enc),
            total_c,
        )
    vci = p0 // (PY * PZ)
    vrem = p0 - vci * (PY * PZ)
    vcj = vrem // PZ
    vck = vrem - vcj * PZ
    vijk = (vci, vcj, vck)
    pvs = []
    for d in range(3):
        pos_d = mn[d] + vijk[d].astype(dtype) * cs
        pos_d = pos_d + jnp.where(vaxis == d, t, 0) * cs
        pvs.append(pos_d)
    vx, vy, vz = pvs

    # --- triangle stream --------------------------------------------------
    # point -> rank table for neighbor-owned edge lookups (update rows = cap)
    rank_dest = jnp.where(jnp.arange(cap) < total_c, points_c, n_pts)
    rank_map = (
        jnp.zeros((n_pts,), jnp.int32)
        .at[rank_dest]
        .set(jnp.arange(cap, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    cases_c = words_c & 0xFF
    counts = jnp.asarray(lut.TRI_COUNT, jnp.int32)[cases_c]
    ccum = cumsum_small_i32(counts)
    offsets = ccum - counts
    total_t = ccum[-1]
    # forward-fill: which active-point slot owns each triangle slot
    cdest = jnp.where(counts > 0, offsets, triangle_capacity)
    slot_map = (
        jnp.zeros((triangle_capacity,), jnp.int32)
        .at[cdest]
        .set(jnp.arange(cap, dtype=jnp.int32), mode="drop", unique_indices=True)
    )
    slot_map = jax.lax.associative_scan(jnp.maximum, slot_map)
    acase = cases_c[slot_map]
    slot_in_cell = jnp.arange(triangle_capacity, dtype=jnp.int32) - offsets[slot_map]
    emit = slot_in_cell < counts[slot_map]
    tpoint = points_c[slot_map]

    n_slots = lut.TRI_TABLE.shape[1]
    tri_tab = np.where(lut.TRI_TABLE >= 0, lut.TRI_TABLE, 0)
    safe_slot = jnp.clip(slot_in_cell, 0, n_slots - 1)
    # local edge -> (base-point offset, axis): the owner of an edge is its
    # base POINT, at cell_ijk + EDGE_BASE_OFFSET — always a valid grid point
    eb = lut.EDGE_BASE_OFFSET.astype(np.int32)  # (12, 3)
    ea = lut.EDGE_AXIS.astype(np.int32)  # (12,)
    edge_delta = eb[:, 0] * PY * PZ + eb[:, 1] * PZ + eb[:, 2]  # (12,) flat
    tcols = []
    for corner in range(3):
        tab = jnp.asarray(tri_tab[:, :, corner], jnp.int32)
        local = tab[acase, safe_slot]
        nflat = tpoint + jnp.asarray(edge_delta)[local]
        nrank = rank_map[jnp.clip(nflat, 0, n_pts - 1)]
        eaxis = jnp.asarray(ea)[local]
        tvidx = vidx_pos[eaxis * cap + nrank]
        tcols.append(jnp.where(emit, tvidx, 0))

    return vx, vy, vz, tcols[0], tcols[1], tcols[2], total_v, total_t


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

# Per-(grid shape, dtype) speculative MC capacities, reused across frames of
# a sequence so steady-state frames run with zero mid-frame host syncs.
_MC_CAPS: dict = {}

# Per-key speculative transfer buckets (nv_b, nt_b): warm frames pack the
# mesh with the previous frame's buckets and pull totals + mesh in ONE
# device_get — no totals round trip before the transfer starts.
_PULL_PLAN: dict = {}

# Same idea for the mono-frame ENCODED transfer (global_pipeline._try_warm_frame),
# whose second bucket is an active-CELL count, not a triangle count — a separate
# dict so the two bucket semantics never alias each other's plans.
_PULL_PLAN_ENC: dict = {}

# Per-(grid shape, n) speculative raster-overflow capacity. Cold frames use
# the conservative n//64 bound; every frame pulls the true overflow count
# anyway, so warm frames rasterize with a bucket fitted to the PREVIOUS
# frame's count — usually 0, which skips _scatter_splat_points entirely
# (measured 189 ms/frame at the 2M bench scattering 32,768 dummy rows over
# ~384 stencil offsets while the true count was 0). A fluctuating scene
# that overflows past its plan costs one re-rasterized frame (retry below),
# and the plan only ever grows on a miss, so thrash is bounded.
_OVER_PLAN: dict = {}


class SpeculationMiss(RuntimeError):
    """One of the caller's deferred speculative checks pulled False.

    ``flags`` holds the boolean value of each check, in the order they were
    passed via ``deferred_checks``; the caller maps indices back to plans.
    """

    def __init__(self, flags):
        super().__init__(f"speculative plan violated: {flags}")
        self.flags = tuple(flags)


class EmptyFieldError(RuntimeError):
    """An empty mesh was produced although the level-set field says it
    should not have been.

    A zero-triangle result is VALID when the field never reaches the iso
    threshold (e.g. an unreachable --surface-threshold); it is a BUG when
    the field is identically zero despite input particles (the splat died
    — round 4's f64-on-TPU failure mode) or when it crosses iso but MC
    emitted nothing. Raised instead of returning silent garbage."""


def check_empty_field(total_t: int, ls_max: float, iso: float) -> None:
    """Contract guard for empty meshes (see EmptyFieldError). ``ls_max``
    is the frame's maximum level-set value (one scalar, pulled only when
    the mesh came back empty — the hot path never pays for this)."""
    if total_t > 0:
        return
    if np.isnan(ls_max):
        raise EmptyFieldError(
            "empty mesh and the level set contains NaN — a sentinel or "
            "kernel evaluation produced non-finite values (the r4 "
            "f64-on-TPU failure mode: inf arithmetic under the X64 "
            "emulation; see kernels.far_fill)"
        )
    if ls_max == 0.0:
        raise EmptyFieldError(
            "empty mesh and the level set is identically zero despite "
            "input particles — the density splat produced no field"
        )
    if ls_max >= iso:
        raise EmptyFieldError(
            f"empty mesh but the level set reaches {ls_max:.6g} >= "
            f"iso={iso:.6g} — marching cubes or the transfer encoding "
            "dropped the surface"
        )


def _pow2(n: int, lo: int = 1024) -> int:
    return max(lo, 1 << (max(int(n), 1) - 1).bit_length())


def _bucket16(n: int, lo: int = 1024) -> int:
    """Round up to 16 steps per power of two (<= 6% transfer waste while
    keeping the set of slice/pack program shapes small and cacheable)."""
    n = max(int(n), lo)
    p = 1 << max((n - 1).bit_length() - 4, 0)
    return -(-n // p) * p


@functools.partial(jax.jit, static_argnames=("nv", "nt"))
def _pack_mesh(vx, vy, vz, t0, t1, t2, nv: int, nt: int):
    """Pack the mesh into two contiguous buffers for the host pull."""
    verts = jnp.stack([vx[:nv], vy[:nv], vz[:nv]])
    tris = jnp.stack([t0[:nt], t1[:nt], t2[:nt]])
    return verts, tris


@functools.partial(jax.jit, static_argnames=("nv", "nc"))
def _pack_encoded(ae, t, cells, cases, nv: int, nc: int):
    """Slice the encoded mesh streams to their transfer buckets."""
    return ae[:nv], t[:nv], cells[:nc], cases[:nc]


@functools.partial(jax.jit, static_argnames=("nv", "nc"))
def _pack_cellwise(t, packed, nv: int, nc: int):
    """Slice the cellwise encoded streams (t, packed) to transfer buckets."""
    return t[:nv], packed[:nc]


def _unpack_compact(packed, bcounts, total_c):
    """Host inverse of the packed compaction: (points, words) from the u16
    packed stream + the u8 per-block active counts (block width 32)."""
    packed = np.asarray(packed[:total_c]).astype(np.int64)
    counts = np.asarray(bcounts).astype(np.int64)
    blk = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if len(blk) != total_c:
        raise RuntimeError("packed-compaction decode inconsistency")
    points = (blk * 32 + (packed >> 11)).astype(np.int32)
    words = (packed & 0x7FF).astype(np.uint16)
    return points, words


def _dequant_t(t):
    """Host-side inverse of the u16 edge-parameter quantization (no-op for
    full-precision streams)."""
    if t.dtype == np.uint16:
        return t.astype(np.float32) * np.float32(1.0 / 65535.0)
    return t


def _decode_cellwise_mesh(t, points, words, total_v, total_t, total_c, grid):
    """Numpy fallback for the native ``mc_decode``: rebuild the mesh from the
    point-word compact streams (same output up to FMA rounding of vertex
    positions — the device fuses mn + ijk*cs, hosts multiply then add)."""
    PY, PZ = grid.n_points[1], grid.n_points[2]
    points = np.asarray(points[:total_c]).astype(np.int64)
    words = np.asarray(words[:total_c]).astype(np.int64)
    t = np.asarray(t[:total_v])
    dtype = t.dtype
    cases = words & 0xFF

    ea = [(words >> 8) & 1, (words >> 9) & 1, (words >> 10) & 1]
    emask = np.concatenate(ea) == 1
    vcum = np.cumsum(emask)
    if total_v and int(vcum[-1]) != total_v:
        raise RuntimeError("cellwise decode inconsistency: vertex count")
    vidx_pos = vcum - 1

    # vertices, axis-major order matching the device
    ci = points // (PY * PZ)
    rem = points - ci * (PY * PZ)
    cj = rem // PZ
    ck = rem - cj * PZ
    ijk = np.stack([ci, cj, ck])
    verts = np.empty((total_v, 3), dtype)
    cs = dtype.type(grid.cell_size)
    vo = 0
    for a in range(3):
        sel = ea[a] == 1
        n_a = int(sel.sum())
        ta = t[vo : vo + n_a]
        for d in range(3):
            pos_d = dtype.type(grid.min[d]) + ijk[d][sel].astype(dtype) * cs
            if d == a:
                pos_d = pos_d + ta * cs
            verts[vo : vo + n_a, d] = pos_d
        vo += n_a

    if total_t == 0:
        return verts, np.zeros((0, 3), np.int32)

    # neighbor ranks for the 7 nonzero offsets via searchsorted (points asc)
    rank7 = np.empty((8, total_c), np.int64)
    rank7[0] = np.arange(total_c)
    for off in range(1, 8):
        di, dj, dk = (off >> 2) & 1, (off >> 1) & 1, off & 1
        target = points + (di * (PY * PZ) + dj * PZ + dk)
        pos = np.searchsorted(points, target)
        posc = np.minimum(pos, total_c - 1)
        ok = points[posc] == target
        rank7[off] = np.where(ok, posc, -1)

    counts = lut.TRI_COUNT[cases].astype(np.int64)
    rep = np.repeat(np.arange(total_c, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    slot = np.arange(len(rep), dtype=np.int64) - starts[rep]
    if len(rep) != total_t:
        raise RuntimeError("cellwise decode inconsistency: triangle count")
    tri_tab = np.where(lut.TRI_TABLE >= 0, lut.TRI_TABLE, 0)
    eb = lut.EDGE_BASE_OFFSET.astype(np.int64)
    eax = lut.EDGE_AXIS.astype(np.int64)
    tris = np.empty((total_t, 3), np.int32)
    off_idx_tab = eb[:, 0] * 4 + eb[:, 1] * 2 + eb[:, 2]
    for corner in range(3):
        local = tri_tab[cases[rep], slot, corner]
        rank = rank7[off_idx_tab[local], rep]
        if (rank < 0).any():
            raise RuntimeError("cellwise decode inconsistency: missing owner")
        a = eax[local]
        # vidx_pos is the GLOBAL vertex index (cumsum over the axis-major
        # concatenated edge mask), matching the device's vidx_pos gather
        tris[:, corner] = vidx_pos[a * total_c + rank].astype(np.int32)
    return verts, tris


def _decode_packed_mesh(ae, t, cells, cases, total_v, total_t, total_c, grid):
    """Host rebuild of the mesh from the compact encoding.

    Vertex positions mirror the device's phase-2 arithmetic in f32 numpy;
    triangle vertex indices come from the case LUT + a searchsorted over
    the (ascending) active-edge ids.
    """
    n_points = grid.n_points
    _shapes, strides, offs, _total = mc_dense.edge_layout(n_points)
    ae = np.asarray(ae[:total_v])
    t = np.asarray(t[:total_v])
    axis = np.where(ae >= offs[2], 2, np.where(ae >= offs[1], 1, 0))
    ijk = np.zeros((total_v, 3), np.int64)
    for a in range(3):
        la = ae - offs[a]
        s0, s1, _ = strides[a]
        ia = la // s0
        ra = la - ia * s0
        sel = axis == a
        ijk[sel, 0] = ia[sel]
        ijk[sel, 1] = (ra // s1)[sel]
        ijk[sel, 2] = (ra - (ra // s1) * s1)[sel]
    dtype = t.dtype
    cs = dtype.type(grid.cell_size)
    verts = np.empty((total_v, 3), dtype)
    for d in range(3):
        pos_d = dtype.type(grid.min[d]) + ijk[:, d].astype(dtype) * cs
        verts[:, d] = pos_d + np.where(axis == d, t, dtype.type(0)) * cs
    if total_v == 0 or total_t == 0:
        return verts[:0], np.zeros((0, 3), np.int32)

    cells = np.asarray(cells[:total_c]).astype(np.int64)
    cases = np.asarray(cases[:total_c]).astype(np.int64)
    counts = lut.TRI_COUNT[cases].astype(np.int64)
    rep = np.repeat(np.arange(total_c, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    slot = np.arange(len(rep), dtype=np.int64) - starts[rep]
    assert len(rep) == total_t, (len(rep), total_t)
    _py, _pz = n_points[1], n_points[2]
    cy, cz = _py - 1, _pz - 1
    ci = cells // (cy * cz)
    cj = (cells // cz) % cy
    ck = cells % cz
    const, ci_c, cj_c, ck_c = mc_dense._local_edge_coeffs(n_points)
    const = const.astype(np.int64)
    tris = np.empty((total_t, 3), np.int32)
    tri_tab = np.where(lut.TRI_TABLE >= 0, lut.TRI_TABLE, 0)
    for corner in range(3):
        local = tri_tab[cases[rep], slot, corner]
        edge_flat = (
            const[local]
            + ci_c[local].astype(np.int64) * ci[rep]
            + cj_c[local].astype(np.int64) * cj[rep]
            + ck_c[local].astype(np.int64) * ck[rep]
        )
        tris[:, corner] = np.searchsorted(ae, edge_flat).astype(np.int32)
    return verts, tris


def reconstruct_global_dense(
    positions,
    values,
    grid: UniformGrid,
    compact_support_radius: float,
    hsc: int,
    iso: float,
    slots: int = 2,
    backend: str | None = None,
    deferred_checks: tuple = (),
    defer_pull: bool = False,
    check_labels: tuple = (),
):
    """Full dense-grid reconstruction. Returns (vertices (V,3), triangles (T,3)).

    ``positions``/``values`` may include out-of-grid padding dummies (they
    are dropped by the rasterizer). With ``defer_pull`` on a fully-warm
    frame, returns a :class:`PendingPull` instead (sequence pipelining).
    """
    import os

    from splashsurf_tpu.profiling import profile

    # SPLASHSURF_TPU_SYNC_PROFILE=1: block after each stage so profile
    # scopes show real device walls (costs ~28 ms/output array over the
    # tunnel; only for diagnosis)
    sync = os.environ.get("SPLASHSURF_TPU_SYNC_PROFILE", "0") == "1"

    def _sync(x):
        if sync:
            jax.block_until_ready(x)
        return x

    positions = jnp.asarray(positions)
    n = positions.shape[0]
    if backend is None:
        # f64 must NOT route to Pallas: the TPU X64 rewriter cannot rewrite
        # f64 pallas_call custom-calls (remote compile HTTP 500, measured on
        # the f64 smoke) — double precision takes the XLA scan sweep.
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and positions.dtype == jnp.float32
            else "scan"
        )
    okey = (grid.n_points, int(n))
    ocap = _OVER_PLAN.get(okey)
    if ocap is None:
        ocap = _pow2(n // 64, lo=4096)
    lane_align = 128 if backend.startswith("pallas") else 1

    for _overflow_attempt in range(4):
        with profile("rasterize"):
            fx, fy, fz, fv, opx, opy, opz, oval, n_over = _sync(rasterize_global(
                positions, values, grid, slots, hsc, ocap,
                lane_align=lane_align,
            ))
        with profile("levelset sweep"):
            ls = _sync(sweep_global(
                fx, fy, fz, fv, opx, opy, opz, oval, grid,
                float(compact_support_radius), hsc, backend,
            ))
        del fx, fy, fz, fv

        key = (grid.n_points, str(ls.dtype))
        caps = _MC_CAPS.get(key)
        if caps is None:
            with profile("mc counts"):
                nv, nt = mc_dense._mc_counts(ls, jnp.asarray(iso, ls.dtype))
                caps = (_bucket16(int(nv) * 5 // 4), _bucket16(int(nt) * 5 // 4))
                _MC_CAPS[key] = caps

        out = _finish_global_dense(
            ls, grid, iso, caps, key, okey, ocap, n_over, deferred_checks,
            _sync, profile, defer_pull=defer_pull, check_labels=check_labels,
        )
        if out is not None:
            return out
        # overflow-capacity miss: the level set is missing the splats of
        # the dropped overflow particles — regrow the plan and re-rasterize
        from splashsurf_tpu.global_pipeline import SPECULATION_STATS

        SPECULATION_STATS["overflow_retry"] += 1
        ocap = min(_pow2(_LAST_OVERFLOW[0] * 2, lo=4096), _pow2(n))
        _OVER_PLAN[okey] = ocap
    raise RuntimeError(
        f"raster overflow exceeded capacity {ocap} after retries"
    )


def _defer_encoded_pull(
    t_s, packed_s, bincl_d, tv_d, tt_d, tc_d, n_over, deferred_checks,
    check_labels, plan, caps, key, okey, overflow_capacity, grid,
):
    """Build the PendingPull for a fully-warm encoded-transfer frame.

    The resolver mirrors the synchronous validation/plan-update sequence of
    ``_finish_global_dense`` exactly; any miss updates the relevant plan and
    reports "redo" so the sequence driver re-runs the frame synchronously
    (misses are rare by construction — plans only exist after a fit).
    """
    nv_b, nc_b = plan
    vcap, tcap = caps
    pt_d, ppk_d = _pack_cellwise(t_s, packed_s, nv=nv_b, nc=nc_b)
    arrs = (
        (tv_d, tt_d, tc_d, n_over)
        + tuple(deferred_checks)
        + (pt_d, ppk_d, bincl_d)
    )

    def resolve():
        from splashsurf_tpu.global_pipeline import SPECULATION_STATS
        from splashsurf_tpu import neighbors

        pulled = jax.device_get(arrs)
        total_v, total_t, total_c, total_over = (int(x) for x in pulled[:4])
        flags = [bool(c) for c in pulled[4:-3]]
        pt_, ppk_, bincl_ = pulled[-3:]
        if not all(flags):
            failed = {
                check_labels[i] for i, ok in enumerate(flags) if not ok
            }
            if "grid" in failed:
                SPECULATION_STATS["grid_miss"] += 1
                return ("redo_grid",)
            SPECULATION_STATS["density_miss"] += 1
            neighbors.clear_density_plan()
            return ("redo",)
        if total_over > overflow_capacity:
            SPECULATION_STATS["overflow_retry"] += 1
            _OVER_PLAN[okey] = _pow2(total_over * 2, lo=4096)
            return ("redo",)
        if total_v > vcap or total_t > tcap:
            SPECULATION_STATS["caps_retry"] += 1
            _MC_CAPS[key] = (
                _bucket16(total_v * 5 // 4), _bucket16(total_t * 5 // 4)
            )
            _PULL_PLAN_ENC.pop(key, None)
            return ("redo",)
        nv2 = min(vcap, _bucket16(total_v))
        nc2 = min(tcap, _bucket16(total_c))
        if total_v > pt_.shape[0] or total_c > ppk_.shape[0]:
            # transfer-bucket miss: repack exactly (one extra round trip)
            pt_, ppk_ = jax.device_get(
                _pack_cellwise(t_s, packed_s, nv=nv2, nc=nc2)
            )
        _PULL_PLAN_ENC[key] = (nv2, nc2)
        _note_overflow_plan(okey, total_over)
        from splashsurf_tpu import native

        pt_ = _dequant_t(pt_)
        pc_, pcs_ = _unpack_compact(ppk_, bincl_, total_c)
        dec = None
        if pt_.dtype == np.float32:
            dec = native.mc_decode(
                pt_, pc_, pcs_, total_v, total_t, total_c,
                grid.n_points[1], grid.n_points[2], grid.min, grid.cell_size,
            )
        if dec is None:
            dec = _decode_cellwise_mesh(
                pt_, pc_, pcs_, total_v, total_t, total_c, grid
            )
        return ("ok",) + tuple(dec)

    return PendingPull(resolve, arrs)


# Side-channel for the overflow-miss retry (single-threaded orchestration).
_LAST_OVERFLOW = [0]


def _note_overflow_plan(okey, total_over: int) -> None:
    """Fit the next frame's overflow capacity to this frame's true count."""
    _OVER_PLAN[okey] = 0 if total_over == 0 else _pow2(total_over * 2, lo=1024)


class PendingPull:
    """A dispatched-but-not-pulled warm frame (sequence pipelining).

    ``resolve()`` performs the one deferred host round trip, runs the same
    plan validations as the synchronous path (updating the speculation
    plans on a miss exactly as it would), and returns either
    ``("ok", verts, tris)`` or ``("redo",)`` / ``("redo_grid",)`` — the
    caller re-runs the frame synchronously on a miss. Device-to-host
    copies are started asynchronously at construction, so a sequence
    driver that dispatches frame t+1 before resolving frame t overlaps
    the mesh transfer with the next frame's compute.
    """

    def __init__(self, fn, arrs):
        self._fn = fn
        for a in arrs:
            try:
                a.copy_to_host_async()
            except Exception:
                pass

    def resolve(self):
        return self._fn()


def _finish_global_dense(
    ls, grid, iso, caps, key, okey, overflow_capacity, n_over,
    deferred_checks, _sync, profile, defer_pull=False, check_labels=(),
):
    """MC + pull for the dense global path.

    Returns the (vertices, triangles) result, or None when the frame's true
    raster-overflow count exceeded ``overflow_capacity`` (caller re-rasters
    with a larger plan). With ``defer_pull`` and a fully-warm plan set, the
    pull is NOT performed: a :class:`PendingPull` is returned instead.
    """
    import os

    # Transfer modes (SPLASHSURF_TPU_PULL):
    #   "encoded" (default): ship only (t, cells, cases) — ~5x fewer link
    #     bytes — and rebuild the mesh on the host (native C++ decoder via
    #     ctypes, numpy fallback). Device-side MC also skips the triangle
    #     and position streams entirely.
    #   "packed": transfer the full packed vertex/triangle buffers.
    mc_edges = os.environ.get("SPLASHSURF_TPU_MC", "cells") == "edges"
    use_enc = (
        not mc_edges and os.environ.get("SPLASHSURF_TPU_PULL", "encoded") == "encoded"
    )
    quant_t = (
        use_enc
        and ls.dtype == jnp.float32
        and os.environ.get("SPLASHSURF_TPU_PULL_QUANT", "1") == "1"
    )
    mc_impl = mc_global_packed if mc_edges else mc_global_cells
    while True:
        vcap, tcap = caps
        if use_enc:
            with profile("marching cubes"):
                enc = _sync(
                    mc_global_cells(
                        ls, grid, jnp.asarray(iso, ls.dtype), vcap, tcap,
                        encode=True, quant_t=quant_t,
                    )
                )
            t_s, packed_s, bincl_d, tv_d, tt_d, tc_d = enc
            if defer_pull:
                plan = _PULL_PLAN_ENC.get(key)
                if plan is None or plan[0] > vcap or plan[1] > tcap:
                    defer_pull = False  # cold frame: pull synchronously
                else:
                    return _defer_encoded_pull(
                        t_s, packed_s, bincl_d, tv_d, tt_d, tc_d, n_over,
                        deferred_checks, check_labels, plan, caps, key, okey,
                        overflow_capacity, grid,
                    )
            with profile("pull mesh"):
                plan = _PULL_PLAN_ENC.get(key)
                if plan is not None and plan[0] <= vcap and plan[1] <= tcap:
                    nv_b, nc_b = plan
                    pt_, ppk_ = _pack_cellwise(
                        t_s, packed_s, nv=nv_b, nc=nc_b
                    )
                    pulled = jax.device_get(
                        (tv_d, tt_d, tc_d, n_over) + tuple(deferred_checks)
                        + (pt_, ppk_, bincl_d)
                    )
                    total_v, total_t, total_c, total_over = (
                        int(x) for x in pulled[:4]
                    )
                    flags = [bool(c) for c in pulled[4:-3]]
                    pt_, ppk_, bincl_ = pulled[-3:]
                else:
                    pulled = jax.device_get(
                        (tv_d, tt_d, tc_d, n_over) + tuple(deferred_checks)
                    )
                    total_v, total_t, total_c, total_over = (
                        int(x) for x in pulled[:4]
                    )
                    flags = [bool(c) for c in pulled[4:]]
                    pt_ = ppk_ = bincl_ = None
                if not all(flags):
                    raise SpeculationMiss(flags)
                if total_over > overflow_capacity:
                    _LAST_OVERFLOW[0] = total_over
                    return None
                if total_v > vcap or total_t > tcap:
                    from splashsurf_tpu.global_pipeline import SPECULATION_STATS

                    SPECULATION_STATS["caps_retry"] += 1
                    caps = (_bucket16(total_v * 5 // 4), _bucket16(total_t * 5 // 4))
                    _MC_CAPS[key] = caps
                    _PULL_PLAN_ENC.pop(key, None)
                    continue
                nv_b = min(vcap, _bucket16(total_v))
                nc_b = min(tcap, _bucket16(total_c))
                if pt_ is None or total_v > pt_.shape[0] or total_c > ppk_.shape[0]:
                    pt_, ppk_, bincl_ = jax.device_get(
                        _pack_cellwise(t_s, packed_s, nv=nv_b, nc=nc_b)
                        + (bincl_d,)
                    )
                _PULL_PLAN_ENC[key] = (nv_b, nc_b)
                if total_t == 0:
                    check_empty_field(total_t, float(jnp.max(ls)), float(iso))
            with profile("decode mesh"):
                from splashsurf_tpu import native

                pt_ = _dequant_t(pt_)
                pc_, pcs_ = _unpack_compact(ppk_, bincl_, total_c)
                dec = None
                if pt_.dtype == np.float32:
                    dec = native.mc_decode(
                        pt_, pc_, pcs_, total_v, total_t, total_c,
                        grid.n_points[1], grid.n_points[2],
                        grid.min, grid.cell_size,
                    )
                if dec is None:
                    dec = _decode_cellwise_mesh(
                        pt_, pc_, pcs_, total_v, total_t, total_c, grid
                    )
            _note_overflow_plan(okey, total_over)
            return dec

        with profile("marching cubes"):
            out = _sync(
                mc_impl(ls, grid, jnp.asarray(iso, ls.dtype), vcap, tcap)
            )
        with profile("pull mesh"):
            plan = _PULL_PLAN.get(key)
            if plan is not None and plan[0] <= vcap and plan[1] <= tcap:
                # warm frame: pack with the previous frame's buckets and
                # pull totals + mesh + deferred checks in ONE round trip
                nv_b, nt_b = plan
                pv, pt = _pack_mesh(*out[:6], nv=nv_b, nt=nt_b)
                pulled = jax.device_get(
                    (out[6], out[7], n_over) + tuple(deferred_checks)
                    + (pv, pt)
                )
                total_v, total_t, total_over = (int(x) for x in pulled[:3])
                flags = [bool(c) for c in pulled[3:-2]]
                pv, pt = pulled[-2], pulled[-1]
            else:
                # planning frame: totals first, then the packed buffers
                pulled = jax.device_get(
                    (out[6], out[7], n_over) + tuple(deferred_checks)
                )
                total_v, total_t, total_over = (int(x) for x in pulled[:3])
                flags = [bool(c) for c in pulled[3:]]
                pv = pt = None
            if not all(flags):
                raise SpeculationMiss(flags)
            if total_over > overflow_capacity:
                _LAST_OVERFLOW[0] = total_over
                return None
            if total_v > vcap or total_t > tcap:
                from splashsurf_tpu.global_pipeline import SPECULATION_STATS

                SPECULATION_STATS["caps_retry"] += 1
                caps = (_bucket16(total_v * 5 // 4), _bucket16(total_t * 5 // 4))
                _MC_CAPS[key] = caps
                _PULL_PLAN.pop(key, None)
                continue
            nv_b = min(vcap, _bucket16(total_v))
            nt_b = min(tcap, _bucket16(total_t))
            if pv is None or total_v > pv.shape[1] or total_t > pt.shape[1]:
                # planning frame or bucket miss: (re)pack exactly and pull
                pv, pt = _pack_mesh(*out[:6], nv=nv_b, nt=nt_b)
                pv, pt = jax.device_get((pv, pt))
            _PULL_PLAN[key] = (nv_b, nt_b)
            if total_t == 0:
                check_empty_field(total_t, float(jnp.max(ls)), float(iso))
        _note_overflow_plan(okey, total_over)
        verts = np.ascontiguousarray(pv.T[:total_v])
        tris = np.ascontiguousarray(pt.T[:total_t]).astype(np.int32)
        return verts, tris
