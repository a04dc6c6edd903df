"""SPH density splat: particles -> level set on the marching cubes grid.

The level set is phi(x) = sum_i (m / rho_i) * W(|x - x_i|) evaluated at grid
points (reference: density_map.rs:636-737, dense_subdomains.rs:784-847).

Two TPU-native formulations, both exact:

1. ``splat_level_set_scatter`` — particle-centric scatter-add over each
   particle's (2*hsc+2)^3 supported points. Direct analog of the reference
   loop; used as the correctness oracle and for overflow particles.

2. ``splat_level_set`` — the fast path: particles are *rasterized* into a
   dense per-cell slot array (cell capacity ``slots``), then the level set
   is accumulated as a dense stencil sweep over a static list of cell
   offsets (pruned to the kernel-support sphere). Every step is a shifted
   dense slice + fused VPU math: no gather/scatter in the hot loop at all.

Determinism/stitching contract: slot ranks are assigned by position in the
bin-sorted particle order, so for any *fixed particle ordering* the
summation order at a grid point depends only on the point's global position
and the particle set — two subdomains computing a shared boundary point get
bit-identical values (the TPU analog of the reference's sorted-ghost trick,
dense_subdomains.rs:476-488).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu import kernels
from splashsurf_tpu.uniform_grid import UniformGrid, kernel_extents


def supported_point_offsets(hsc: int) -> np.ndarray:
    """Offsets from a particle's cell to all potentially supported points.

    (2*hsc+2)^3 point offsets in [-hsc, hsc+1]^3 (density_map.rs:649-663).
    """
    rng = np.arange(-hsc, hsc + 2, dtype=np.int32)
    oi, oj, ok = np.meshgrid(rng, rng, rng, indexing="ij")
    return np.stack([oi, oj, ok], axis=-1).reshape(-1, 3)


def gather_cell_offsets(hsc: int) -> np.ndarray:
    """Offsets from a grid point's base cell to cells that can contain
    contributing particles, pruned to the support sphere.

    A particle in cell c contributes to point p iff |x_p - x_particle| <
    support <= (hsc * cube). Cell offsets o = c - p with per-axis distance
    from the point to the cell interval [o, o+1] (in cube units): keep only
    offsets whose minimum distance is below hsc (+ rounding slack). This
    statically prunes the (2*hsc+2)^3 cube to ~a ball, a ~2.5-3x saving.
    """
    rng = np.arange(-(hsc + 1), hsc + 1, dtype=np.int32)
    oi, oj, ok = np.meshgrid(rng, rng, rng, indexing="ij")
    offs = np.stack([oi, oj, ok], axis=-1).reshape(-1, 3)
    d = np.where(offs > 0, offs, np.where(offs + 1 < 0, -(offs + 1), 0)).astype(
        np.float64
    )
    keep = (d**2).sum(axis=1) <= (hsc * (1.0 + 1e-3)) ** 2
    return offs[keep]


class RasterizedParticles(NamedTuple):
    """Particles rasterized into dense per-cell slots."""

    pos: jax.Array  # (ncx, ncy, ncz, slots, 3)
    val: jax.Array  # (ncx, ncy, ncz, slots) — zero for empty slots
    overflow_pos: jax.Array  # (overflow_capacity, 3)
    overflow_val: jax.Array  # (overflow_capacity,)
    num_overflow: jax.Array  # () int32 true overflow count


@functools.partial(
    jax.jit, static_argnames=("grid", "slots", "overflow_capacity")
)
def rasterize_particles(
    positions,
    values,
    grid: UniformGrid,
    slots: int,
    overflow_capacity: int = 256,
    ranks=None,
) -> RasterizedParticles:
    """Scatter particles into (cells, slots) dense arrays.

    ``values`` are the per-particle splat weights v_i = m / rho_i. Particles
    beyond the per-cell capacity go to the overflow list (handled by the
    scatter path). ``ranks``: optional precomputed global slot ranks — pass
    the rank computed on the *global* cell grid so subdomains agree on slot
    assignment and overflow membership.
    """
    positions = jnp.asarray(positions)
    values = jnp.asarray(values)
    ncx, ncy, ncz = grid.n_cells

    cell = jnp.clip(
        grid.enclosing_cell(positions), 0, jnp.asarray(grid.n_cells, jnp.int32) - 1
    )
    flat = grid.flatten_cell_index(cell)
    if ranks is None:
        order = jnp.argsort(flat).astype(jnp.int32)
        sf = flat[order]
        start_of_own = jnp.searchsorted(sf, sf, side="left")
        rank_sorted = jnp.arange(sf.shape[0], dtype=jnp.int32) - start_of_own.astype(
            jnp.int32
        )
        flat_s = sf
        pos_s = positions[order]
        val_s = values[order]
    else:
        rank_sorted = jnp.asarray(ranks, jnp.int32)
        flat_s = flat
        pos_s = positions
        val_s = values

    total_cells = ncx * ncy * ncz
    ok = rank_sorted < slots
    dest = jnp.where(ok, flat_s * slots + rank_sorted, total_cells * slots)
    rpos = (
        jnp.zeros((total_cells * slots, 3), positions.dtype)
        .at[dest]
        .set(pos_s, mode="drop")
        .reshape(ncx, ncy, ncz, slots, 3)
    )
    rval = (
        jnp.zeros((total_cells * slots,), values.dtype)
        .at[dest]
        .set(val_s, mode="drop")
        .reshape(ncx, ncy, ncz, slots)
    )

    # Overflow compaction (rare; capacity checked by caller via num_overflow).
    over = ~ok
    odest = jnp.where(over, jnp.cumsum(over) - 1, overflow_capacity)
    opos = (
        jnp.full(
            (overflow_capacity, 3),
            kernels.far_fill(positions.dtype),
            positions.dtype,
        )
        .at[odest]
        .set(pos_s, mode="drop")
    )
    oval = (
        jnp.zeros((overflow_capacity,), values.dtype).at[odest].set(val_s, mode="drop")
    )
    return RasterizedParticles(
        pos=rpos,
        val=rval,
        overflow_pos=opos,
        overflow_val=oval,
        num_overflow=jnp.sum(over).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("grid", "hsc"))
def splat_level_set_scatter(
    positions, values, grid: UniformGrid, compact_support_radius, hsc: int
):
    """Particle-centric scatter-add splat (the oracle path).

    Out-of-grid points are dropped; particles are assumed well inside the
    grid (guaranteed by the kernel margin in grid_for_reconstruction).
    """
    positions = jnp.asarray(positions)
    values = jnp.asarray(values)
    dtype = positions.dtype
    npx, npy, npz = grid.n_points
    total_points = npx * npy * npz
    n = positions.shape[0]

    h = jnp.asarray(compact_support_radius, dtype)
    cs = jnp.asarray(grid.cell_size, dtype)
    mn = [jnp.asarray(grid.min[d], dtype) for d in range(3)]
    pxs = [positions[:, d] for d in range(3)]  # component arrays (N,)
    cell = [jnp.floor((pxs[d] - mn[d]) / cs).astype(jnp.int32) for d in range(3)]

    # Stream over offset blocks (128 = lane width; the block axis is minor).
    offs_np = supported_point_offsets(hsc)
    block = 128
    pad = (-len(offs_np)) % block
    offs_np = np.concatenate(
        [offs_np, np.full((pad, 3), -(10 * (hsc + 2)), np.int32)]
    )
    offs_blocks = jnp.asarray(offs_np.reshape(-1, block, 3))
    npts = (npx, npy, npz)
    strides = (npy * npz, npz, 1)

    def body(out, offs):
        d2 = jnp.zeros((n, block), dtype)
        flat = jnp.zeros((n, block), jnp.int32)
        in_grid = jnp.ones((n, block), bool)
        for d in range(3):
            p = cell[d][:, None] + offs[None, :, d]  # (N, b)
            coord = mn[d] + p.astype(dtype) * cs
            delta = coord - pxs[d][:, None]
            if dtype == jnp.float64:
                # far-sentinel rows must contribute an exact 0 even if the
                # emulated f64->s32 convert aliases their cells into the
                # grid (see ops/global_sweep._scatter_splat_points)
                delta = jnp.clip(delta, -1e15, 1e15)
            d2 = d2 + delta * delta
            in_grid = in_grid & (p >= 0) & (p < npts[d])
            flat = flat + p * strides[d]
        w = kernels.cubic_kernel(jnp.sqrt(d2), h) * values[:, None]
        dest = jnp.where(in_grid, flat, total_points)
        return out.at[dest.reshape(-1)].add(w.reshape(-1), mode="drop"), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((total_points,), dtype), offs_blocks
    )
    return out.reshape((npx, npy, npz))


@functools.partial(jax.jit, static_argnames=("grid", "hsc", "point_offset"))
def _splat_raster_sweep(
    raster: RasterizedParticles,
    grid: UniformGrid,
    compact_support_radius,
    hsc: int,
    point_offset=(0, 0, 0),
):
    """Dense stencil sweep over rasterized particles.

    Produces the level set on the grid's points shifted by ``point_offset``
    (used by the subdomain path to evaluate an extended point range).
    """
    dtype = raster.pos.dtype
    ncx, ncy, ncz = grid.n_cells
    npx, npy, npz = ncx + 1, ncy + 1, ncz + 1
    slots = raster.pos.shape[3]
    pad = hsc + 1

    pw = ((pad, pad), (pad, pad), (pad, pad), (0, 0))
    rpos = jnp.pad(raster.pos, pw + ((0, 0),))
    rval = jnp.pad(raster.val, pw)

    # Point coordinates (computed from global indices for cross-subdomain
    # bit-exactness; dense_subdomains.rs:817-826).
    po = jnp.asarray(point_offset, jnp.int32)
    gi = (jax.lax.broadcasted_iota(jnp.int32, (npx, 1, 1), 0) + po[0]).astype(dtype)
    gj = (jax.lax.broadcasted_iota(jnp.int32, (1, npy, 1), 1) + po[1]).astype(dtype)
    gk = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, npz), 2) + po[2]).astype(dtype)
    cs = jnp.asarray(grid.cell_size, dtype)
    mn = jnp.asarray(grid.min, dtype)
    px = mn[0] + gi * cs
    py = mn[1] + gj * cs
    pz = mn[2] + gk * cs

    offs = jnp.asarray(gather_cell_offsets(hsc) + pad)  # (n_off, 3), pre-shifted
    h = jnp.asarray(compact_support_radius, dtype)

    zero = jnp.int32(0)

    def body(acc, o):
        sl_pos = jax.lax.dynamic_slice(
            rpos, (o[0] + po[0], o[1] + po[1], o[2] + po[2], zero, zero),
            (npx, npy, npz, slots, 3),
        )
        sl_val = jax.lax.dynamic_slice(
            rval, (o[0] + po[0], o[1] + po[1], o[2] + po[2], zero),
            (npx, npy, npz, slots),
        )
        dx = sl_pos[..., 0] - px[..., None]
        dy = sl_pos[..., 1] - py[..., None]
        dz = sl_pos[..., 2] - pz[..., None]
        d2 = dx * dx + dy * dy + dz * dz
        w = kernels.cubic_kernel(jnp.sqrt(d2), h) * sl_val
        return acc + jnp.sum(w, axis=-1), None

    init = jnp.zeros((npx, npy, npz), dtype)
    levelset, _ = jax.lax.scan(body, init, offs)
    return levelset


@functools.partial(
    jax.jit, static_argnames=("grid", "hsc", "slots", "overflow_capacity")
)
def splat_level_set(
    positions,
    values,
    grid: UniformGrid,
    compact_support_radius,
    hsc: int,
    slots: int = 4,
    overflow_capacity: int = 256,
):
    """Fast raster splat. Returns (levelset (n_points), num_overflow).

    Callers must check num_overflow <= overflow_capacity (re-run with a
    larger capacity otherwise; the convenience wrapper does this).
    """
    raster = rasterize_particles(
        positions, values, grid, slots, overflow_capacity
    )
    levelset = _splat_raster_sweep(raster, grid, compact_support_radius, hsc)
    # Overflow particles via the scatter path (inf positions -> out of grid
    # -> dropped; values zero anyway).
    over = splat_level_set_scatter(
        jnp.where(
            jnp.isfinite(raster.overflow_pos), raster.overflow_pos, jnp.asarray(-1e30)
        ),
        raster.overflow_val,
        grid,
        compact_support_radius,
        hsc,
    )
    return levelset + over, raster.num_overflow


def splat_level_set_auto(
    positions, values, grid: UniformGrid, compact_support_radius: float
):
    """Host convenience: picks hsc/slots/overflow capacity, verifies overflow."""
    ext = kernel_extents(compact_support_radius, grid.cell_size)
    slots = 4
    overflow_capacity = 256
    while True:
        levelset, n_over = splat_level_set(
            positions,
            values,
            grid,
            compact_support_radius,
            ext.half_supported_cells,
            slots=slots,
            overflow_capacity=overflow_capacity,
        )
        n_over = int(n_over)
        if n_over <= overflow_capacity:
            return levelset
        overflow_capacity = max(2 * overflow_capacity, 2 * n_over)
