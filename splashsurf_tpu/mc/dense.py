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
    """Active-edge masks and interpolated vertex positions, per axis.

    Returns (mask (E,), (px, py, pz) each (E,)) flattened in x,y,z edge
    order. Positions are kept as separate component arrays: a big (E, 3)
    array would be padded to 128 lanes in its minor dimension on TPU, a 42x
    memory blowup. ``index_offset`` (3,) int shifts local point indices to
    global ones so subdomains compute bit-identical shared-vertex
    coordinates (dense_subdomains.rs:817-826 analog).
    """
    dtype = values.dtype
    if index_offset is None:
        index_offset = jnp.zeros((3,), jnp.int32)
    index_offset = jnp.asarray(index_offset, jnp.int32)
    cs = jnp.asarray(cell_size, dtype)
    mn = jnp.asarray(grid_min, dtype)
    masks = []
    comps = [[], [], []]
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
        for d in range(3):
            base = (
                jax.lax.broadcasted_iota(jnp.int32, shape, d) + index_offset[d]
            ).astype(dtype)
            pos_d = mn[d] + base * cs
            if d == a:
                pos_d = pos_d + t * cs
            comps[d].append(pos_d.reshape(-1))
        masks.append(m.reshape(-1))
    return (
        jnp.concatenate(masks),
        jnp.concatenate(comps[0]),
        jnp.concatenate(comps[1]),
        jnp.concatenate(comps[2]),
    )


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
    # All hot arrays stay 1-D (or small-leading-axis) so the TPU's
    # (sublane, 128-lane) tiling never pads a tiny minor dimension.
    mask, px, py, pz = _edge_vertices(
        values, iso, grid_min, cell_size, inside, index_offset
    )
    vidx = jnp.cumsum(mask.astype(jnp.int32)) - 1  # index of each active edge
    num_vertices = (vidx[-1] + 1).astype(jnp.int32)

    edge_ids = jnp.arange(mask.shape[0], dtype=jnp.int32)
    dest = jnp.where(mask, vidx, vertex_capacity)
    vx = jnp.zeros((vertex_capacity,), values.dtype).at[dest].set(px, mode="drop")
    vy = jnp.zeros((vertex_capacity,), values.dtype).at[dest].set(py, mode="drop")
    vz = jnp.zeros((vertex_capacity,), values.dtype).at[dest].set(pz, mode="drop")
    vertices = jnp.stack([vx, vy, vz], axis=-1)
    vertex_edges = jnp.full((vertex_capacity,), -1, dtype=jnp.int32)
    vertex_edges = vertex_edges.at[dest].set(edge_ids, mode="drop")

    # --- triangles: case table gather + compaction scatter ---------------
    case = _case_indices(inside)
    tri_count_tab = jnp.asarray(lut.TRI_COUNT, dtype=jnp.int32)

    counts = tri_count_tab[case].reshape(-1)  # (C,)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    num_triangles = (offsets[-1] + counts[-1]).astype(jnp.int32)

    nx, ny, nz = values.shape
    const, ci_c, cj_c, ck_c = _local_edge_coeffs((nx, ny, nz))

    cells = (nx - 1, ny - 1, nz - 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, cells, 0).reshape(-1)
    cj = jax.lax.broadcasted_iota(jnp.int32, cells, 1).reshape(-1)
    ck = jax.lax.broadcasted_iota(jnp.int32, cells, 2).reshape(-1)

    case_flat = case.reshape(-1)
    n_slots = lut.TRI_TABLE.shape[1]
    tri_cols = []
    for corner in range(3):
        # (M, 256) per-corner tables: one (C,) gather per slot, no (C, M, 3).
        tab = np.where(lut.TRI_TABLE[:, :, corner] >= 0, lut.TRI_TABLE[:, :, corner], 0)
        col = jnp.zeros((triangle_capacity,), jnp.int32)
        for s in range(n_slots):
            local = jnp.asarray(tab[:, s], jnp.int32)[case_flat]  # (C,)
            edge_flat = (
                jnp.asarray(const)[local]
                + jnp.asarray(ci_c)[local] * ci
                + jnp.asarray(cj_c)[local] * cj
                + jnp.asarray(ck_c)[local] * ck
            )
            tvidx = vidx[edge_flat]
            dest_s = jnp.where(s < counts, offsets + s, triangle_capacity)
            col = col.at[dest_s].set(tvidx, mode="drop")
        tri_cols.append(col)
    triangles = jnp.stack(tri_cols, axis=-1)

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
    n_verts = 0
    for a in range(3):
        sl0 = tuple(slice(0, -1) if d == a else slice(None) for d in range(3))
        sl1 = tuple(slice(1, None) if d == a else slice(None) for d in range(3))
        n_verts += jnp.sum((inside[sl0] != inside[sl1]).astype(jnp.int32))
    case = _case_indices(inside)
    n_tris = jnp.sum(jnp.asarray(lut.TRI_COUNT, dtype=jnp.int32)[case])
    return n_verts, n_tris


def decode_edge_flat(edge_flat, n_points: Tuple[int, int, int]):
    """Decode flat edge ids into (axis, base point ijk).

    Inverse of the x,y,z-concatenated edge layout. Returns (axis (...,),
    ijk (..., 3)) as int32; invalid ids (< 0) decode to axis 0, ijk 0.

    Decoded per axis with COMPILE-TIME-constant divisors (a gathered
    per-element stride would force the TPU's slow general integer
    division), then axis-selected.
    """
    _shapes, strides, offsets, _total = edge_layout(n_points)
    edge_flat = jnp.asarray(edge_flat)
    safe = jnp.maximum(edge_flat, 0)
    axis = jnp.where(
        safe >= offsets[2], 2, jnp.where(safe >= offsets[1], 1, 0)
    ).astype(jnp.int32)
    i = jnp.zeros_like(safe)
    j = jnp.zeros_like(safe)
    k = jnp.zeros_like(safe)
    for a in range(3):
        la = safe - offsets[a]
        s0, s1, _ = strides[a]
        ia = la // s0
        ra = la - ia * s0
        ja = ra // s1
        ka = ra - ja * s1
        sel = axis == a
        i = jnp.where(sel, ia, i)
        j = jnp.where(sel, ja, j)
        k = jnp.where(sel, ka, k)
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
