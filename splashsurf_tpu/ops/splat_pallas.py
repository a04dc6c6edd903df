"""Pallas TPU kernel for the SPH density raster sweep.

The hot loop of the whole engine (reference analog: the AVX2/NEON density
grid loops, dense_subdomains.rs:849-1133): accumulate
phi(p) = sum_slots sum_offsets W(|dx|) * v over statically pruned cell
offsets, where particles are rasterized into per-cell slot tables holding
*cell-fraction* coordinates, so dx = frac + (offset - margin - 1) * cube is
a window read plus a compile-time constant.

Kernel layout choices (driven by the (8, 128) VMEM tiling):
  - the (y, z) raster plane is flattened into the lane dimension
    (Rp*Rp + pad lanes), so a (sy, sz) window shift is ONE contiguous lane
    slice instead of a 2-D relayout;
  - the x axis is tiled over the grid; per tile the x-halo window of each
    component is DMA'd from HBM into VMEM scratch once and re-read by all
    ~180 * slots offsets from VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

TILE_X = 8


def sweep_global_pallas(
    fx, fy, fz, fv,  # (S, Xp, Yp, Zp) padded cell-fraction rasters
    cell_size: float,
    compact_support_radius: float,
    hsc: int,
    n_points,  # (PX, PY, PZ)
    interpret: bool = False,
):
    """Global-grid level-set sweep: TX=8 output x-planes per program instance.

    Per instance: DMA the TX + 2*(hsc+1) input x-planes of every (slot,
    component) raster into VMEM with (x, y) flattened onto sublanes, then
    accumulate the ~|ball| statically pruned (o1, o2) windows — each ONE
    (TX*Yp, Zp) VPU expression covering all TX planes via a single sublane
    slice at o0*Yp + o1 (and a lane slice/roll for o2). The reference
    analog is the AVX2/NEON density grid loop (dense_subdomains.rs:849-1133)
    applied to the whole background grid instead of per-subdomain blocks.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from splashsurf_tpu.density import gather_cell_offsets

    S, Xp, Yp, Zp = fx.shape
    PX, PY, PZ = (int(v) for v in n_points)
    p = hsc + 1
    offs = gather_cell_offsets(hsc) + p
    by_o01 = {}
    for o0, o1, o2 in offs:
        by_o01.setdefault((int(o0), int(o1)), []).append(int(o2))

    # Register-blocked accumulation: Mosaic does NOT fuse elementwise
    # chains, so an op chain on a whole-plane value streams every
    # intermediate through VMEM (~630 GB/frame at the 2M bench shape,
    # measured 271 ms). Instead, each program step computes a (Y_BLK, Zo)
    # ROW TILE of one output x-plane with the whole offset fan unrolled on
    # vreg-resident values; the step's input window is DMA'd into a small
    # scratch so every in-kernel load is a STATIC slice (traced slice
    # starts sent Mosaic's compiler into a tailspin: a fori_loop variant of
    # this kernel with pl.ds(traced) loads compiled for >30 min).
    Y_BLK = 64
    Zo = -(-PZ // 128) * 128
    n_yt = -(-PY // Y_BLK)
    # o1 slices of the loaded (o0, y) window reach Y_BLK + 2p - 1 rows; the
    # DMA'd range spans the 2p x-planes contributing to the output plane
    # (offsets o0 in [0, 2p-1] after the +p shift).
    ext_rows = Y_BLK + (-(-(2 * p - 1) // 8) * 8)
    R = (2 * p - 1) * Yp + ext_rows  # rows DMA'd per step (8 | R)

    # Raster guarantees Yp >= PY + 2p - 1, but the y-tiling reads up to
    # n_yt*Y_BLK + 2p - 1 and the x reach up to (PX - 1) + 2p - 1 planes;
    # pad to the tile reach (pads hold inf fracs / 0 values -> exactly 0).
    y_pad = n_yt * Y_BLK + ext_rows - Y_BLK - Yp
    x_pad = (PX - 1) + 2 * p - Xp
    if y_pad > 0 or x_pad > 0:
        pw = ((0, 0), (0, max(x_pad, 0)), (0, max(y_pad, 0)), (0, 0))
        fx = jnp.pad(fx, pw, constant_values=np.inf)
        fy = jnp.pad(fy, pw, constant_values=np.inf)
        fz = jnp.pad(fz, pw, constant_values=np.inf)
        fv = jnp.pad(fv, pw, constant_values=0.0)
        Xp, Yp = fx.shape[1], fx.shape[2]
        ext_rows = Y_BLK + (-(-(2 * p - 1) // 8) * 8)
        R = (2 * p - 1) * Yp + ext_rows

    h = float(compact_support_radius)
    cs = float(cell_size)
    sigma = 8.0 / (h * h * h) / (4.0 * math.pi)
    dtype = fx.dtype

    # flatten (x, y) onto the sublane dim for whole-rows DMA slicing
    fx = fx.reshape(S, -1, Zp)
    fy = fy.reshape(S, -1, Zp)
    fz = fz.reshape(S, -1, Zp)
    fv = fv.reshape(S, -1, Zp)

    def kernel(fxh, fyh, fzh, fvh, out_ref, sx, sy, sz, sv, sems):
        # rows [x*Yp + y0, x*Yp + y0 + R): the (o0, o1) window of this
        # step's tile then lives at STATIC in-scratch offset o0*Yp + o1
        r_hbm = pl.program_id(0) * Yp + pl.program_id(1) * Y_BLK
        copies = []
        for s in range(S):
            for scr, hbm in ((sx, fxh), (sy, fyh), (sz, fzh), (sv, fvh)):
                dma = pltpu.make_async_copy(
                    hbm.at[np.int32(s), pl.ds(r_hbm, R)],
                    scr.at[np.int32(s)],
                    sems.at[np.int32(len(copies))],
                )
                dma.start()
                copies.append(dma)
        for dma in copies:
            dma.wait()

        acc = jnp.zeros((Y_BLK, Zo), dtype)
        for s in range(S):
            prev_o0 = None
            dxsq = vy = vz = vv = None
            for (o0, o1), o2s in by_o01.items():
                if o0 != prev_o0:
                    # hoist the per-o0 loads + x-term square over the whole
                    # (o1, o2) fan: d2 associates as ((wx^2 + wy^2) + wz^2),
                    # so sharing the partial sums is bit-identical to the
                    # naive form. Loads start 8-aligned at o0*Yp (Yp is a
                    # sublane multiple); the o1 shift slices the loaded
                    # VALUE, where unaligned sublane slicing is legal.
                    base = o0 * Yp
                    vx = sx[s, base : base + ext_rows, :]
                    wx = vx + ((o0 - p) * cs)
                    dxsq = wx * wx
                    vy = sy[s, base : base + ext_rows, :]
                    vz = sz[s, base : base + ext_rows, :]
                    vv = sv[s, base : base + ext_rows, :]
                    prev_o0 = o0
                wy = vy[o1 : o1 + Y_BLK, :] + ((o1 - p) * cs)
                A = dxsq[o1 : o1 + Y_BLK, :] + wy * wy  # (Y_BLK, Zp)
                vz1 = vz[o1 : o1 + Y_BLK, :]
                vv1 = vv[o1 : o1 + Y_BLK, :]
                for o2 in o2s:
                    # z window: a lane slice when it fits inside Zp, else a
                    # lane roll (the tile-aligned Zo output can reach up to
                    # 2p-1 lanes past Zp; wrapped lanes only land in the
                    # cropped [PZ, Zo) region — valid lanes l+o2 <=
                    # ncz+2p-1 < Zp never see them).
                    if o2 + Zo <= Zp:
                        lwin = lambda v: v[:, o2 : o2 + Zo]
                    else:
                        lwin = lambda v: pltpu.roll(v, np.int32(Zp - o2), 1)[:, :Zo]
                    wz = lwin(vz1) + ((o2 - p) * cs)
                    d2 = lwin(A) + wz * wz
                    q = jnp.sqrt(d2) * (2.0 / h)
                    a = jnp.maximum(2.0 - q, 0.0)
                    b = jnp.maximum(1.0 - q, 0.0)
                    acc = acc + (a * a * a - 4.0 * (b * b * b)) * lwin(vv1)
        out_ref[0] = acc * sigma

    # The output block must be (8, 128)-tile aligned in BOTH minor dims:
    # an unaligned (1, PY, PZ) block silently mis-stored the final partial
    # tile of the last grid step (wrong values in the last (x, y) row at 2M
    # scale; reproduced with a single far-corner particle). The
    # (1, Y_BLK, Zo) block accumulates over padded rows/lanes too — raster
    # pads hold inf-fracs / 0-values, so they compute to exactly 0 — and
    # the cropped view drops them.
    assert Zp >= Zo, (Zp, Zo)
    out = pl.pallas_call(
        kernel,
        grid=(PX, n_yt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (1, Y_BLK, Zo), lambda x, yt: (x, yt, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((PX, n_yt * Y_BLK, Zo), dtype),
        scratch_shapes=[
            pltpu.VMEM((S, R, Zp), dtype),
            pltpu.VMEM((S, R, Zp), dtype),
            pltpu.VMEM((S, R, Zp), dtype),
            pltpu.VMEM((S, R, Zp), dtype),
            pltpu.SemaphoreType.DMA((4 * S,)),
        ],
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(fx, fy, fz, fv)
    return out[:PX, :PY, :PZ]


DENSITY_TILE_X = 8


def density_sweep_pallas(
    fx, fy, fz,  # (slots, Xp, lanes) bin-fraction rasters, inf-filled pads
    bin_size,  # traced scalar
    compact_support_radius,  # traced scalar
    slots: int,
    LX: int,
    Zp: int,
    Wout: int,  # output lane width (>= LY*Zp, multiple of 128)
    interpret: bool = False,
):
    """Pallas plane-sweep for the SPH per-particle density raster
    (the density analog of ``sweep_global_pallas``; reference hot loop:
    neighborhood_search.rs:444-588 + density_map.rs:169-185).

    For every output x-plane tile: DMA the 3 fraction components of all
    ``slots`` bin slots into VMEM, then accumulate the 27 stencil offsets x
    slots^2 pair windows — each a (TILE_X, Wout) VPU expression with a
    contiguous lane shift, all intermediates VMEM-resident (the XLA
    formulation of the same sweep round-trips (slots^2, LX, W) blocks
    through HBM).

    Returns acc (slots, n_tiles*TILE_X, Wout): the *unnormalized* spline
    sum ``sum f(q)/(4 pi)``; the caller scales by ``sigma * m``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, Xp, LANES = fx.shape
    assert S == slots
    dtype = fx.dtype
    TILE_X = DENSITY_TILE_X
    n_tiles = -(-LX // TILE_X)
    win_x = -(-(TILE_X + 2) // 8) * 8  # 16
    x_pad = (n_tiles - 1) * TILE_X + win_x - Xp
    if x_pad > 0:
        pw = ((0, 0), (0, x_pad), (0, 0))
        fx = jnp.pad(fx, pw, constant_values=np.inf)
        fy = jnp.pad(fy, pw, constant_values=np.inf)
        fz = jnp.pad(fz, pw, constant_values=np.inf)

    inv4pi = 1.0 / (4.0 * math.pi)
    # traced geometry scalars ride in SMEM: [bin_size, 2/h]
    params = jnp.stack(
        [jnp.asarray(bin_size, dtype),
         2.0 / jnp.asarray(compact_support_radius, dtype)]
    ).reshape(1, 2)

    def kernel(par, fxh, fyh, fzh, out_ref, sx, sy, sz, sems):
        bs = par[0, 0]
        two_over_h = par[0, 1]
        t = pl.program_id(0)
        x0 = t * TILE_X
        copies = []
        for scr, hbm in ((sx, fxh), (sy, fyh), (sz, fzh)):
            dma = pltpu.make_async_copy(
                hbm.at[:, pl.ds(x0, win_x)], scr, sems.at[np.int32(len(copies))]
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        # dest (query) fractions with dest slots STACKED on sublanes:
        # (slots*TILE_X, Wout) — one VPU expression covers every dest slot,
        # keeping the unrolled program at 27*slots blocks instead of
        # 27*slots^2 (a fully scalar-unrolled variant took Mosaic >25 min
        # to compile at slots=8)
        SB = slots * TILE_X
        fq = [
            s[:, 1 : 1 + TILE_X, Zp + 1 : Zp + 1 + Wout].reshape(SB, Wout)
            for s in (sx, sy, sz)
        ]
        acc = jnp.zeros((SB, Wout), dtype)
        for o0 in range(3):
            dx0 = (o0 - 1) * bs
            for kj in range(slots):
                rx = sx[kj, o0 : o0 + TILE_X, :]
                ry = sy[kj, o0 : o0 + TILE_X, :]
                rz = sz[kj, o0 : o0 + TILE_X, :]
                for o1 in range(3):
                    for o2 in range(3):
                        shift = o1 * Zp + o2

                        def bc(w):
                            return jnp.broadcast_to(
                                w[None], (slots, TILE_X, Wout)
                            ).reshape(SB, Wout)

                        dx = fq[0] - bc(rx[:, shift : shift + Wout] + dx0)
                        dy = fq[1] - bc(
                            ry[:, shift : shift + Wout] + ((o1 - 1) * bs)
                        )
                        dz = fq[2] - bc(
                            rz[:, shift : shift + Wout] + ((o2 - 1) * bs)
                        )
                        d2 = dx * dx + dy * dy + dz * dz
                        q = jnp.sqrt(d2) * two_over_h
                        a = jnp.maximum(2.0 - q, 0.0)
                        b = jnp.maximum(1.0 - q, 0.0)
                        acc = acc + (a * a * a - 4.0 * (b * b * b))
        out_ref[...] = acc.reshape(slots, TILE_X, Wout) * inv4pi

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 2),
                lambda t: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (slots, TILE_X, Wout), lambda t: (np.int32(0), t, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((slots, n_tiles * TILE_X, Wout), dtype),
        scratch_shapes=[
            pltpu.VMEM((slots, win_x, LANES), dtype),
            pltpu.VMEM((slots, win_x, LANES), dtype),
            pltpu.VMEM((slots, win_x, LANES), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(params, fx, fy, fz)
    return out


def _offsets(hsc: int, margin: int) -> np.ndarray:
    from splashsurf_tpu.density import gather_cell_offsets

    return gather_cell_offsets(hsc) + (margin + 1)  # padded slice starts


@functools.lru_cache(maxsize=8)
def pair_cell_offsets(reach: int, h_over_cs: float):
    """Cell-to-cell offsets that can contain particle pairs within the
    support radius: per-axis minimum distance max(|o|-1, 0) cells, pruned
    to sum(dmin^2) <= (h/cs)^2 (+ rounding slack)."""
    rng = np.arange(-reach, reach + 1, dtype=np.int32)
    oi, oj, ok = np.meshgrid(rng, rng, rng, indexing="ij")
    offs = np.stack([oi, oj, ok], axis=-1).reshape(-1, 3)
    d = np.maximum(np.abs(offs) - 1, 0).astype(np.float64)
    keep = (d ** 2).sum(axis=1) <= (h_over_cs * (1.0 + 1e-3)) ** 2
    return tuple(map(tuple, offs[keep]))


def pair_sweep_pallas(
    fx, fy, fz,  # (S, Xp, Yp, Zp) padded CELL-fraction rasters (inf pads)
    cell_size,  # traced scalar
    compact_support_radius,  # traced scalar
    reach: int,  # ceil(h / cs)
    h_over_cs: float,  # static, for the offset-fan pruning only
    pad: int,  # raster padding (hsc + 1 from rasterize_global), >= reach
    n_cells,  # (ncx, ncy, ncz)
    interpret: bool = False,
):
    """SPH pair sweep over the MC-CELL rasters: the per-(slot, cell)
    unnormalized spline sums ``sum_q f(|dx|)/(4 pi)`` for every raster
    entry, consumed directly as the level-set particle weights
    (fv = mass / (sigma * acc)) with NO separate density stage.

    Same register structure as density_sweep_pallas but over the cell
    lattice with an R-reach pruned pair fan (~275 offsets at the default
    h/cs = 8/3) instead of the support-bin 27-fan. Returns acc
    (slots, n_x_tiles*TILE_X, Wout); query cell (s, cx, cy, cz) reads
    ``acc[s, cx, cy*Zp + cz]`` (valid for cz < Zp - 2*pad; lanes whose
    z-component wraps into the next y row are junk queries, never read).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, Xp, Yp, Zp = fx.shape
    ncx, ncy, ncz = (int(v) for v in n_cells)
    R = reach
    assert pad >= R, (pad, R)
    dtype = fx.dtype
    TILE_X = DENSITY_TILE_X
    n_tiles = -(-ncx // TILE_X)
    # DMA starts must be 8-sublane aligned: read from the tile start (x0 =
    # t*TILE_X, aligned) and cover the full reach [pad-R, pad+TILE_X+R)
    # in-window; unaligned slicing of LOADED values is legal.
    win_x = -(-(pad + TILE_X + R) // 8) * 8

    QSTART = pad * Zp + pad
    Wq = ncy * Zp  # query lanes: y in [0, ncy), z full rows (pads masked)
    # Lane tiling: Mosaic compile time scales with unrolled blocks x
    # vregs/op — the ~275-offset pair fan on a full-width (SB, 19k-lane)
    # accumulator exceeded a 60-minute compile; (SB, 2048) tiles bring
    # vregs/op from ~300 to 32 and the compile to minutes, at ~1.5x lane
    # DMA overlap between neighboring tiles.
    WT = 2048
    n_wt = -(-Wq // WT)
    Wout = n_wt * WT
    # per-w-tile DMA window: 128-aligned start C0 + wt*WT, static in-window
    # query offset q_off = QSTART - C0
    C0 = max((QSTART - R * Zp - R) // 128 * 128, 0)
    q_off = QSTART - C0
    W_LOAD = -(-(q_off + R * Zp + R + WT) // 128) * 128
    LANES = C0 + (n_wt - 1) * WT + W_LOAD
    x_need = (n_tiles - 1) * TILE_X + win_x
    fl = []
    for a, fill in ((fx, np.inf), (fy, np.inf), (fz, np.inf)):
        a = a.reshape(S, Xp, Yp * Zp)
        if LANES > Yp * Zp or x_need > Xp:
            a = jnp.pad(
                a,
                ((0, 0), (0, max(x_need - Xp, 0)),
                 (0, max(LANES - Yp * Zp, 0))),
                constant_values=fill,
            )
        if LANES < a.shape[2]:
            a = a[:, :, :LANES]
        fl.append(a)

    fan = pair_cell_offsets(R, float(h_over_cs))
    by_o0 = {}
    for o0, o1, o2 in fan:
        by_o0.setdefault(int(o0) + R, []).append((int(o1) + R, int(o2) + R))

    inv4pi = 1.0 / (4.0 * math.pi)
    params = jnp.stack(
        [jnp.asarray(cell_size, dtype),
         2.0 / jnp.asarray(compact_support_radius, dtype)]
    ).reshape(1, 2)

    def kernel(par, fxh, fyh, fzh, out_ref, sx, sy, sz, sems):
        cs = par[0, 0]
        two_over_h = par[0, 1]
        t = pl.program_id(0)
        wt = pl.program_id(1)
        x0 = t * TILE_X  # 8-aligned DMA start
        l0 = C0 + wt * WT  # 128-aligned lane start (WT % 128 == 0)
        copies = []
        for scr, hbm in ((sx, fxh), (sy, fyh), (sz, fzh)):
            dma = pltpu.make_async_copy(
                hbm.at[:, pl.ds(x0, win_x), pl.ds(l0, W_LOAD)],
                scr,
                sems.at[np.int32(len(copies))],
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        SB = S * TILE_X
        fq = [
            s[:, pad : pad + TILE_X, q_off : q_off + WT].reshape(SB, WT)
            for s in (sx, sy, sz)
        ]
        acc = jnp.zeros((SB, WT), dtype)
        for o0l, o12s in by_o0.items():
            dx0 = (o0l - R) * cs
            x_off = pad - R + o0l
            for kj in range(S):
                rx = sx[kj, x_off : x_off + TILE_X, :]
                ry = sy[kj, x_off : x_off + TILE_X, :]
                rz = sz[kj, x_off : x_off + TILE_X, :]
                for o1l, o2l in o12s:
                    shift = q_off + (o1l - R) * Zp + (o2l - R)

                    def bc(w):
                        return jnp.broadcast_to(
                            w[None], (S, TILE_X, WT)
                        ).reshape(SB, WT)

                    dx = fq[0] - bc(rx[:, shift : shift + WT] + dx0)
                    dy = fq[1] - bc(
                        ry[:, shift : shift + WT] + ((o1l - R) * cs)
                    )
                    dz = fq[2] - bc(
                        rz[:, shift : shift + WT] + ((o2l - R) * cs)
                    )
                    d2 = dx * dx + dy * dy + dz * dz
                    q = jnp.sqrt(d2) * two_over_h
                    a = jnp.maximum(2.0 - q, 0.0)
                    b = jnp.maximum(1.0 - q, 0.0)
                    acc = acc + (a * a * a - 4.0 * (b * b * b))
        out_ref[...] = acc.reshape(S, TILE_X, WT) * inv4pi

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_wt),
        in_specs=[
            pl.BlockSpec(
                (1, 2),
                lambda t, wt: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (S, TILE_X, WT), lambda t, wt: (np.int32(0), t, wt), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, n_tiles * TILE_X, Wout), dtype),
        scratch_shapes=[
            pltpu.VMEM((S, win_x, W_LOAD), dtype),
            pltpu.VMEM((S, win_x, W_LOAD), dtype),
            pltpu.VMEM((S, win_x, W_LOAD), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(params, *fl)
    return out


def splat_sweep_pallas(
    fx, fy, fz, fv,  # (C, S, Rp, Rp, Rp): frac components + values, padded
    cell_size: float,
    compact_support_radius: float,
    hsc: int,
    margin: int,
    n_points: int,  # P
    interpret: bool = False,
):
    """Returns level sets (C, P, P, P)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, S, Rp, _, _ = fx.shape
    P = n_points
    dtype = fx.dtype
    offs = _offsets(hsc, margin)
    n_tiles = -(-P // TILE_X)
    # x rows needed per tile, rounded to the sublane tiling (8) for DMA
    win_x = -(-(TILE_X + 2 * margin + 1) // 8) * 8
    x_pad = (n_tiles - 1) * TILE_X + win_x - Rp
    # flatten (y, z) into lanes, padded so the widest window slice
    # (start (S-1)*Rp + (S-1), width P*Rp) stays in range, and rounded to
    # the 128-lane tiling so DMA memref views stay aligned
    lane = -(-(Rp * Rp + 8) // 128) * 128

    def prep(a, fill):
        a = jnp.pad(
            a,
            ((0, 0), (0, 0), (0, max(x_pad, 0)), (0, 0), (0, 0)),
            constant_values=fill,
        )
        a = a.reshape(C, S, a.shape[2], Rp * Rp)
        return jnp.pad(
            a, ((0, 0), (0, 0), (0, 0), (0, lane - Rp * Rp)), constant_values=fill
        )

    fx, fy, fz = prep(fx, np.inf), prep(fy, np.inf), prep(fz, np.inf)
    fv = prep(fv, 0.0)

    h = float(compact_support_radius)
    cs = float(cell_size)
    sigma = 8.0 / (h * h * h) / (4.0 * math.pi)
    width = P * Rp

    def kernel(fx_hbm, fy_hbm, fz_hbm, fv_hbm, out_ref, sx, sy, sz, sv, sems):
        c = pl.program_id(0)
        t = pl.program_id(1)
        x0 = t * TILE_X

        copies = []
        for s in range(S):
            for scratch, hbm in ((sx, fx_hbm), (sy, fy_hbm), (sz, fz_hbm), (sv, fv_hbm)):
                dma = pltpu.make_async_copy(
                    hbm.at[c, np.int32(s), pl.ds(x0, win_x)],
                    scratch.at[np.int32(s)],
                    sems.at[np.int32(len(copies))],
                )
                dma.start()
                copies.append(dma)
        for dma in copies:
            dma.wait()

        acc = jnp.zeros((TILE_X, width), dtype)
        for s in range(S):
            # Load the whole windows as values; per-offset slicing then
            # lowers to sublane/lane shifts (ref slices at unaligned sublane
            # offsets are not representable as memref views).
            vx, vy, vz, vv = sx[s], sy[s], sz[s], sv[s]
            for o0, o1, o2 in offs:
                o0, o1, o2 = int(o0), int(o1), int(o2)
                shift = o1 * Rp + o2
                wx = vx[o0 : o0 + TILE_X, shift : shift + width]
                wy = vy[o0 : o0 + TILE_X, shift : shift + width]
                wz = vz[o0 : o0 + TILE_X, shift : shift + width]
                wv = vv[o0 : o0 + TILE_X, shift : shift + width]
                dx = wx + ((o0 - margin - 1) * cs)
                dy = wy + ((o1 - margin - 1) * cs)
                dz = wz + ((o2 - margin - 1) * cs)
                d2 = dx * dx + dy * dy + dz * dz
                q = jnp.sqrt(d2) * (2.0 / h)
                a = jnp.maximum(2.0 - q, 0.0)
                b = jnp.maximum(1.0 - q, 0.0)
                w = (a * a * a - 4.0 * (b * b * b)) * sigma
                acc = acc + w * wv
        # Keep the flattened (y*Rp + z) layout: Mosaic cannot shape-cast
        # lanes into sublanes; the caller reshapes outside the kernel.
        out_ref[0] = acc

    grid = (C, n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (1, TILE_X, width), lambda c, t: (c, t, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, n_tiles * TILE_X, width), dtype),
        scratch_shapes=[
            pltpu.VMEM((S, win_x, lane), dtype),
            pltpu.VMEM((S, win_x, lane), dtype),
            pltpu.VMEM((S, win_x, lane), dtype),
            pltpu.VMEM((S, win_x, lane), dtype),
            pltpu.SemaphoreType.DMA((4 * S,)),
        ],
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(fx, fy, fz, fv)
    return out[:, :P].reshape(C, P, P, Rp)[:, :, :, :P]
