"""Fully vectorized marching cubes over dense point-value grids.

TPU-native rework of the reference's sparse narrow-band marching cubes
(splashsurf_lib/src/marching_cubes/): instead of hashmap cell data and
per-cell LUT walks, everything is an array program over the dense value
grid —

  - case indices via 8 shifted slices (one VPU pass),
  - one iso-vertex per active grid edge in three dense per-axis edge arrays
    (no dedup maps needed: an edge IS its vertex),
  - triangle emission by gathering the generated case table and scattering
    into capacity-padded output arrays with cumsum stream compaction.

Semantics match the reference: a corner is "inside" iff value >= iso
(narrow_band_extraction.rs:79-100), vertex interpolation is linear:
t = (iso - v0) / (v1 - v0).

Outputs are capacity-padded and jit-stable; ``num_vertices``/
``num_triangles`` report the true counts (callers detect capacity overflow
by comparing against the capacities).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu.mc import lut


class MarchingCubesResult(NamedTuple):
    vertices: jax.Array  # (Vcap, 3) float
    triangles: jax.Array  # (Tcap, 3) int32, vertex indices
    num_vertices: jax.Array  # () int32
    num_triangles: jax.Array  # () int32
    vertex_edges: jax.Array  # (Vcap,) int32 flat edge id of each vertex


def edge_layout(n_points: Tuple[int, int, int]):
    """Shapes, strides and flat-offsets of the three per-axis edge arrays.

    Edge arrays (base-point indexed): x-edges (nx-1, ny, nz), y-edges
    (nx, ny-1, nz), z-edges (nx, ny, nz-1); flat ids are concatenated in
    x, y, z order.
    """
    nx, ny, nz = n_points
    shapes = [(nx - 1, ny, nz), (nx, ny - 1, nz), (nx, ny, nz - 1)]
    sizes = [s[0] * s[1] * s[2] for s in shapes]
    offsets = [0, sizes[0], sizes[0] + sizes[1]]
    strides = [(s[1] * s[2], s[2], 1) for s in shapes]
    total = sizes[0] + sizes[1] + sizes[2]
    return shapes, strides, offsets, total


def _local_edge_coeffs(n_points: Tuple[int, int, int]):
    """Per-local-edge affine map from cell ijk to flat edge id.

    flat_edge(local_edge e, cell (ci,cj,ck)) = CONST[e] + CI[e]*ci + CJ[e]*cj + CK[e]*ck
    """
    _, strides, offsets, _ = edge_layout(n_points)
    const = np.zeros(lut.NUM_EDGES, dtype=np.int32)
    ci = np.zeros(lut.NUM_EDGES, dtype=np.int32)
    cj = np.zeros(lut.NUM_EDGES, dtype=np.int32)
    ck = np.zeros(lut.NUM_EDGES, dtype=np.int32)
    for e in range(lut.NUM_EDGES):
        a = int(lut.EDGE_AXIS[e])
        bo = lut.EDGE_BASE_OFFSET[e].astype(np.int64)
        s = strides[a]
        const[e] = offsets[a] + bo[0] * s[0] + bo[1] * s[1] + bo[2] * s[2]
        ci[e], cj[e], ck[e] = s
    return const, ci, cj, ck


def _case_indices(inside):
    """Per-cell marching cubes case index from the inside mask (nx,ny,nz)->(..cells)."""
    nx, ny, nz = inside.shape
    case = jnp.zeros((nx - 1, ny - 1, nz - 1), dtype=jnp.int32)
    for c in range(8):
        oi, oj, ok = (c >> 2) & 1, (c >> 1) & 1, c & 1
        corner = inside[oi : oi + nx - 1, oj : oj + ny - 1, ok : ok + nz - 1]
        case = case | (corner.astype(jnp.int32) << c)
    return case


def _edge_vertices(values, iso, grid_min, cell_size, inside, index_offset=None):
    """Active-edge masks, interpolated vertex positions, per axis.

    Returns (mask (E,), positions (E, 3)) flattened in x,y,z edge order.
    ``index_offset`` (3,) int shifts local point indices to global ones so
    subdomains compute bit-identical shared-vertex coordinates
    (dense_subdomains.rs:817-826 analog).
    """
    nx, ny, nz = values.shape
    dtype = values.dtype
    if index_offset is None:
        index_offset = jnp.zeros((3,), jnp.int32)
    index_offset = jnp.asarray(index_offset, jnp.int32)
    masks = []
    positions = []
    for a in range(3):
        sl0 = tuple(slice(0, -1) if d == a else slice(None) for d in range(3))
        sl1 = tuple(slice(1, None) if d == a else slice(None) for d in range(3))
        v0 = values[sl0]
        v1 = values[sl1]
        m = inside[sl0] != inside[sl1]
        denom = v1 - v0
        t = (iso - v0) / jnp.where(denom == 0, jnp.ones_like(denom), denom)
        t = jnp.clip(t, 0.0, 1.0)
        shape = v0.shape
        base = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.int32, shape, d) + index_offset[d]
                for d in range(3)
            ],
            axis=-1,
        ).astype(dtype)
        pos = base * jnp.asarray(cell_size, dtype)
        pos = pos.at[..., a].add(t * jnp.asarray(cell_size, dtype))
        pos = pos + jnp.asarray(grid_min, dtype)
        masks.append(m.reshape(-1))
        positions.append(pos.reshape(-1, 3))
    return jnp.concatenate(masks), jnp.concatenate(positions, axis=0)


@functools.partial(
    jax.jit, static_argnames=("vertex_capacity", "triangle_capacity")
)
def marching_cubes_padded(
    values,
    iso,
    grid_min,
    cell_size,
    vertex_capacity: int,
    triangle_capacity: int,
    index_offset=None,
) -> MarchingCubesResult:
    """Marching cubes on a dense (nx, ny, nz) point-value grid.

    ``grid_min``/``cell_size`` place the grid in space; ``index_offset``
    shifts point indices to a global grid (for subdomains). Returns capacity-
    padded vertices/triangles plus true counts and per-vertex flat edge ids
    (used by the subdomain stitcher for global dedup keys).
    """
    values = jnp.asarray(values)
    iso = jnp.asarray(iso, dtype=values.dtype)
    inside = values >= iso

    # --- vertices: one per active edge ---------------------------------
    mask, pos = _edge_vertices(values, iso, grid_min, cell_size, inside, index_offset)
    vidx = jnp.cumsum(mask.astype(jnp.int32)) - 1  # index of each active edge
    num_vertices = jnp.where(mask.shape[0] > 0, vidx[-1] + 1, 0).astype(jnp.int32)

    edge_ids = jnp.arange(mask.shape[0], dtype=jnp.int32)
    dest = jnp.where(mask, vidx, vertex_capacity)
    vertices = jnp.zeros((vertex_capacity, 3), dtype=values.dtype)
    vertices = vertices.at[dest].set(pos, mode="drop")
    vertex_edges = jnp.full((vertex_capacity,), -1, dtype=jnp.int32)
    vertex_edges = vertex_edges.at[dest].set(edge_ids, mode="drop")

    # --- triangles: case table gather + compaction scatter ---------------
    case = _case_indices(inside)
    tri_count_tab = jnp.asarray(lut.TRI_COUNT, dtype=jnp.int32)
    tri_table = jnp.asarray(lut.TRI_TABLE, dtype=jnp.int32)  # (256, M, 3)

    counts = tri_count_tab[case].reshape(-1)  # (C,)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    num_triangles = (offsets[-1] + counts[-1]).astype(jnp.int32) if counts.shape[0] else jnp.int32(0)

    nx, ny, nz = values.shape
    const, ci_c, cj_c, ck_c = _local_edge_coeffs((nx, ny, nz))
    const = jnp.asarray(const)
    ci_c, cj_c, ck_c = jnp.asarray(ci_c), jnp.asarray(cj_c), jnp.asarray(ck_c)

    cells = (nx - 1, ny - 1, nz - 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, cells, 0).reshape(-1)
    cj = jax.lax.broadcasted_iota(jnp.int32, cells, 1).reshape(-1)
    ck = jax.lax.broadcasted_iota(jnp.int32, cells, 2).reshape(-1)

    case_flat = case.reshape(-1)
    local = tri_table[case_flat]  # (C, M, 3) local edge ids (-1 padded)
    safe_local = jnp.maximum(local, 0)
    edge_flat = (
        const[safe_local]
        + ci_c[safe_local] * ci[:, None, None]
        + cj_c[safe_local] * cj[:, None, None]
        + ck_c[safe_local] * ck[:, None, None]
    )
    tri_vidx = vidx[edge_flat]  # (C, M, 3) vertex indices

    n_slots = local.shape[1]
    slot = jnp.arange(n_slots, dtype=jnp.int32)[None, :]  # (1, M)
    slot_mask = slot < counts[:, None]  # (C, M)
    tri_dest = jnp.where(slot_mask, offsets[:, None] + slot, triangle_capacity)

    triangles = jnp.zeros((triangle_capacity, 3), dtype=jnp.int32)
    triangles = triangles.at[tri_dest.reshape(-1)].set(
        tri_vidx.reshape(-1, 3), mode="drop"
    )

    return MarchingCubesResult(
        vertices=vertices,
        triangles=triangles,
        num_vertices=num_vertices,
        num_triangles=num_triangles,
        vertex_edges=vertex_edges,
    )


@functools.partial(jax.jit)
def _mc_counts(values, iso):
    values = jnp.asarray(values)
    iso = jnp.asarray(iso, dtype=values.dtype)
    inside = values >= iso
    mask, _ = _edge_vertices(values, iso, jnp.zeros(3, values.dtype), 1.0, inside)
    case = _case_indices(inside)
    n_tris = jnp.sum(jnp.asarray(lut.TRI_COUNT, dtype=jnp.int32)[case])
    return jnp.sum(mask.astype(jnp.int32)), n_tris


def decode_edge_flat(edge_flat, n_points: Tuple[int, int, int]):
    """Decode flat edge ids into (axis, base point ijk).

    Inverse of the x,y,z-concatenated edge layout. Returns (axis (...,),
    ijk (..., 3)) as int32; invalid ids (< 0) decode to axis 0, ijk 0.
    """
    shapes, strides, offsets, _total = edge_layout(n_points)
    edge_flat = jnp.asarray(edge_flat)
    safe = jnp.maximum(edge_flat, 0)
    axis = jnp.where(
        safe >= offsets[2], 2, jnp.where(safe >= offsets[1], 1, 0)
    ).astype(jnp.int32)
    local = safe - jnp.asarray(offsets)[axis]
    s = jnp.asarray(strides)[axis]  # (..., 3)
    i = local // s[..., 0]
    j = (local % s[..., 0]) // s[..., 1]
    k = local % s[..., 1]
    return axis, jnp.stack([i, j, k], axis=-1).astype(jnp.int32)


def _round_capacity(n: int) -> int:
    """Round up to a small set of buckets to bound jit recompiles."""
    n = max(int(n), 16)
    return 1 << (n - 1).bit_length()


def marching_cubes(
    values,
    iso: float,
    cube_size: float = 1.0,
    translation=(0.0, 0.0, 0.0),
):
    """Host convenience API: dense scalar field -> TriMesh3d with exact sizes.

    Equivalent of ``pysplashsurf.marching_cubes`` on a raw 3-D array
    (pysplashsurf/src/marching_cubes.rs:106-178): the SDF/density-array ->
    mesh entry point with no SPH involved.
    """
    from splashsurf_tpu.mesh import TriMesh3d

    values = jnp.asarray(values)
    nv, nt = _mc_counts(values, iso)
    nv, nt = int(nv), int(nt)
    res = marching_cubes_padded(
        values,
        iso,
        jnp.asarray(translation, values.dtype),
        cube_size,
        vertex_capacity=_round_capacity(nv),
        triangle_capacity=_round_capacity(nt),
    )
    return TriMesh3d(
        vertices=np.asarray(res.vertices)[:nv],
        triangles=np.asarray(res.triangles)[:nt],
    )
