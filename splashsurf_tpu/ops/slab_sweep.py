"""Streamed dense global reconstruction over x-slabs.

The r4 sparse-path cost structure (BENCHLOG r4_12, 8M sheet / 348M-cell
grid): decomposition 16.7 s (pair sort), splat 8.9 s, stitch ~50 s — all
of it machinery the DENSE global path simply does not have. This module
runs the dense global pipeline (rasterize_global -> sweep_global ->
mc_global_cells) over consecutive x-slabs of the global grid, so grids an
order of magnitude past the resident dense gate (48M cells) keep the dense
path's cost structure: sort-free slot rasters, one stencil sweep, encoded
point streams, no pair table, no per-subdomain batching, no stitch.

Correctness structure (mirrors the subdomain path's two load-bearing
invariants, ref dense_subdomains.rs:476-488, 817-826):

- **Bit-identical shared planes.** Every slab computes cells and fracs
  against the GLOBAL grid origin (rasterize_global slab mode), so a
  particle's kernel contribution is bitwise the same no matter which slab
  evaluates it, and both neighbors of a shared point plane sum the same
  values in the same static order.
- **Canonical plane ownership.** Slabs run in descending x; each slab's
  far plane is OVERWRITTEN with the next slab's first plane (one (PY, PZ)
  array handoff), and mc_global_cells masks the far plane's words
  (own_px), so every global point is emitted by exactly one slab and the
  merged per-slab streams decode through the ordinary global decoder
  (native/mc_decode.cpp) with zero dedup.

The slab loop itself is ONE compiled program reused for every slab
(slab_x0 / own_px / plane handoff are traced values, not shapes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from splashsurf_tpu.ops import global_sweep as gs
from splashsurf_tpu.profiling import profile
from splashsurf_tpu.uniform_grid import UniformGrid

# caps/overflow plans per (grid n_points, slab width, dtype): planning
# frames pay an extra counts pass per slab; warm frames run one pass.
_SLAB_PLAN: dict = {}
_SLAB_OVER: dict = {}
_SLAB_K: dict = {}  # per-slab particle bucket capacity plans


def slab_width_cells(grid: UniformGrid, max_cells: int) -> int:
    """Slab width in cells so one slab's table+ls stays within the dense
    budget; at least 8 cells, at most the whole grid."""
    _, ncy, ncz = grid.n_cells
    per_x = max(1, ncy * ncz)
    return int(max(8, min(grid.n_cells[0], max_cells // per_x)))


@functools.partial(
    jax.jit,
    static_argnames=("grid", "W", "n_slabs", "K", "pad"),
)
def _slab_partition(
    positions, values, grid: UniformGrid, W: int, n_slabs: int, K: int,
    pad: int,
):
    """Bucket particles (and their values) by slab, including the halo
    bands, into a slab-major (n_slabs*K, 3) buffer.

    The probe (BENCHLOG r5): rasterizing the FULL 8M particles per slab
    cost 0.68 s raster + 0.83 s overflow PER SLAB. Bucketing costs one
    pass of per-slab cumsum ranks + one scatter per component and cuts
    every per-slab row count to slab-share + halo (~N/n_slabs * 1.03).

    Bucket layout per slab: primary particles (ascending index), then
    left-halo (primaries of slab s-1 whose cells reach into s), then
    right-halo (from s+1) — all ascending-index within their group. All
    particles of one CELL share a primary slab, so they stay in the same
    relative order in EVERY bucket containing them: slot ranks (and hence
    raster summation order) agree across slabs, which is what makes the
    shared-plane level sets bit-identical.

    Returns (px, py, pz, vbuf (n_slabs*K,) each, counts (n_slabs,)).
    Pad rows sit at far_position (dropped by the raster's validity mask).
    """
    from splashsurf_tpu import kernels

    dtype = positions.dtype
    n = positions.shape[0]
    cs = jnp.asarray(grid.cell_size, dtype)
    mnx = jnp.asarray(grid.min[0], dtype)
    cx = jnp.floor((positions[:, 0] - mnx) / cs).astype(jnp.int32)
    ncx = grid.n_cells[0]
    in_grid = (cx >= 0) & (cx < ncx)  # dummies/out-of-grid drop entirely
    sid = jnp.clip(cx // W, 0, n_slabs - 1)
    local = cx - sid * W
    total = n_slabs * K

    # per-slab primary counts and ranks via n_slabs cumsums (cheap: pure
    # elementwise/prefix passes, no scatters)
    from splashsurf_tpu.ops.prefix import cumsum_small_i32

    def bucket_dest(member, base_counts):
        """dest slot for each particle under ``member`` (bool (n_slabs, n)
        python list), stacked after base_counts (per-slab start offsets)."""
        dest = jnp.full((n,), total, jnp.int32)
        counts = []
        for s in range(n_slabs):
            m = member[s]
            r = cumsum_small_i32(m)  # MXU blocked prefix
            counts.append(r[-1])
            dest = jnp.where(
                m, s * K + base_counts[s] + r - 1, dest
            )
            dest = jnp.where(dest >= (s + 1) * K, total, dest)  # overflow
        return dest, counts

    prim = [in_grid & (sid == s) for s in range(n_slabs)]
    zero = jnp.zeros((), jnp.int32)
    dest_p, cnt_p = bucket_dest(prim, [zero] * n_slabs)
    # left halo of slab s = primaries of s+1 with local < pad
    lh = [
        in_grid & (sid == s + 1) & (local < pad) if s + 1 < n_slabs
        else jnp.zeros((n,), bool)
        for s in range(n_slabs)
    ]
    dest_l, cnt_l = bucket_dest(lh, cnt_p)
    # right halo of slab s = primaries of s-1 with local >= W - pad
    rh = [
        in_grid & (sid == s - 1) & (local >= W - pad) if s >= 1
        else jnp.zeros((n,), bool)
        for s in range(n_slabs)
    ]
    base_r = [cnt_p[s] + cnt_l[s] for s in range(n_slabs)]
    dest_r, cnt_r = bucket_dest(rh, base_r)

    far = jnp.asarray(kernels.far_position(dtype), dtype)
    # COLUMN buffers: a scatter of (N, 3) rows into a (total, 3) operand
    # measured 3.8x the cost of three column scatters on this chip (r5
    # part_probe: 0.68 s vs 0.18 s at 8M rows) — minor-dim-3 updates pay
    # the 128-lane tiling.
    cols = [jnp.full((total,), far, dtype) for _ in range(3)]
    vbuf = jnp.zeros((total,), dtype)
    pcols = [positions[:, d] for d in range(3)]
    for dst in (dest_p, dest_l, dest_r):
        for d in range(3):
            cols[d] = cols[d].at[dst].set(pcols[d], mode="drop")
        vbuf = vbuf.at[dst].set(values, mode="drop")
    counts = jnp.stack(
        [cnt_p[s] + cnt_l[s] + cnt_r[s] for s in range(n_slabs)]
    )
    return cols[0], cols[1], cols[2], vbuf, counts


@functools.partial(
    jax.jit,
    static_argnames=("grid", "W", "K", "slots", "hsc", "ocap", "backend",
                     "support"),
)
def _slab_ls(
    pxb, pyb, pzb, vbuf, slab_idx, plane_in, use_plane, x0,
    grid: UniformGrid, W: int, K: int, slots: int, hsc: int, ocap: int,
    backend: str, support: float,
):
    """One slab's level set: raster + sweep + far-plane canonical overwrite.

    Returns (ls (W+1, PY, PZ), plane_out = ls[0] pre-overwrite is ls[0]
    itself (index 0 is never overwritten), n_over)."""
    start = slab_idx * K
    positions = tuple(
        jax.lax.dynamic_slice(b, (start,), (K,)) for b in (pxb, pyb, pzb)
    )
    values = jax.lax.dynamic_slice(vbuf, (start,), (K,))
    lane_align = 128 if backend.startswith("pallas") else 1
    out = gs.rasterize_global(
        positions, values, grid, slots, hsc, ocap,
        lane_align=lane_align, slab_ncx=W, slab_x0=x0,
    )
    fx, fy, fz, fv, opx, opy, opz, oval, n_over = out
    ls = gs.sweep_global(
        fx, fy, fz, fv, opx, opy, opz, oval, grid,
        support, hsc, backend, slab_npx=W + 1, slab_x0=x0,
    )
    plane_out = ls[0]
    ls = ls.at[W].set(jnp.where(use_plane, plane_in, ls[W]))
    return ls, plane_out, n_over


@functools.partial(jax.jit, static_argnames=("grid", "vcap", "tcap", "quant"))
def _slab_enc(ls, iso, own_px, grid: UniformGrid, vcap: int, tcap: int, quant: bool):
    enc = gs.mc_global_cells(
        ls, grid, iso, vcap, tcap, encode=True, quant_t=quant, own_px=own_px
    )
    return enc + (jnp.max(ls),)


def reconstruct_global_slabbed(
    positions,
    values,
    grid: UniformGrid,
    compact_support_radius: float,
    hsc: int,
    iso: float,
    slots: int | None = None,
    max_cells: int | None = None,
):
    """Dense-global reconstruction streamed over x-slabs.

    Returns (vertices (V, 3), triangles (T, 3)) — the same mesh the
    unsplit dense path produces, bitwise (tests/test_slab_sweep.py)."""
    positions = jnp.asarray(positions)
    dtype = positions.dtype
    n = positions.shape[0]
    if slots is None:
        # measured (r5 probe, bucketed rows): slots=2 _slab_ls 0.65 s/slab
        # vs slots=4 1.03 s/slab — the sweep's slots-linear cost outweighs
        # the sheet's overflow-splat cost once buckets cap ocap at ~32k.
        slots = int(os.environ.get("SPLASHSURF_TPU_SLAB_SLOTS", "2"))
    if max_cells is None:
        max_cells = gs_dense_gate()
    W = slab_width_cells(grid, max_cells)
    ncx, ncy, ncz = grid.n_cells
    n_slabs = -(-ncx // W)
    PY, PZ = ncy + 1, ncz + 1
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if (on_tpu and dtype == jnp.float32) else "scan"
    quant = (
        dtype == jnp.float32
        and os.environ.get("SPLASHSURF_TPU_PULL_QUANT", "1") == "1"
    )
    iso_j = jnp.asarray(iso, dtype)
    support = float(compact_support_radius)

    okey = (grid.n_points, W, int(n), slots)
    pkey = (grid.n_points, W, str(dtype))
    kkey = (grid.n_points, W, int(n))
    pad = hsc + 1
    K = _SLAB_K.get(kkey, gs._bucket16(max(-(-n // n_slabs) * 5 // 4, 4096)))

    from splashsurf_tpu import subdomains as sub_mod

    sub_mod.LAST_RUN.clear()
    sub_mod.LAST_RUN.update(
        slabbed=True, n_slabs=n_slabs, slab_w=W,
        slab_cells=W * ncy * ncz, backend=backend,
    )

    for _attempt in range(6):
        # bucket particles by slab (incl. halo bands) — per-slab rasters
        # then run at slab-share row counts, not full N (probe: full-N cost
        # 0.68 s raster + 0.83 s overflow PER SLAB at 8M / 8 slabs)
        with profile("slab partition"):
            pxb, pyb, pzb, vbuf, counts_d = _slab_partition(
                positions, values, grid, W, n_slabs, K, pad
            )
        ocap_k = _SLAB_OVER.get(okey, gs._pow2(K // 64, lo=4096))

        caps = _SLAB_PLAN.get(pkey)
        if caps is None:
            # planning pass: per-slab counts fix shared static capacities
            with profile("slab counts"):
                cnts = jax.device_get(counts_d)
                if int(cnts.max()) > K:
                    K = gs._bucket16(int(cnts.max()) * 5 // 4)
                    _SLAB_K[kkey] = K
                    continue
                nv_max = nt_max = 0
                plane = jnp.zeros((PY, PZ), dtype)
                use_plane = jnp.asarray(False)
                overs = []
                for s in reversed(range(n_slabs)):
                    ls, plane, n_over = _slab_ls(
                        pxb, pyb, pzb, vbuf, jnp.asarray(s, jnp.int32),
                        plane, use_plane, jnp.asarray(s * W, jnp.int32),
                        grid, W, K, slots, hsc, ocap_k, backend, support,
                    )
                    use_plane = jnp.asarray(True)
                    nv, nt = gs.mc_dense._mc_counts(ls, iso_j)
                    nv, nt = int(nv), int(nt)
                    nv_max, nt_max = max(nv_max, nv), max(nt_max, nt)
                    overs.append(int(n_over))
                if max(overs) > ocap_k:
                    _SLAB_OVER[okey] = min(
                        gs._pow2(max(overs) * 2, lo=4096), gs._pow2(n)
                    )
                    continue
                caps = (
                    gs._bucket16(max(nv_max, 1) * 5 // 4),
                    gs._bucket16(max(nt_max, 1) * 5 // 4),
                )
                _SLAB_PLAN[pkey] = caps
        vcap, tcap = caps

        # main slab loop, descending x (plane handoff); everything stays on
        # device until one batched pull at the end
        sync = os.environ.get("SPLASHSURF_TPU_SYNC_PROFILE", "0") == "1"
        trace = os.environ.get("SPLASHSURF_TPU_SLAB_TRACE", "0") == "1"
        if trace:
            import time as _time

            _tt0 = _time.perf_counter()

            def _tr(msg):
                print(f"    [slab {_time.perf_counter()-_tt0:7.3f}s] {msg}",
                      flush=True)
        else:
            def _tr(msg):
                pass
        outs = []
        plane = jnp.zeros((PY, PZ), dtype)
        use_plane = jnp.asarray(False)
        with profile("slab sweep+mc"):
            for s in reversed(range(n_slabs)):
                x0 = s * W
                with profile("slab ls"):
                    ls, plane, n_over = _slab_ls(
                        pxb, pyb, pzb, vbuf, jnp.asarray(s, jnp.int32),
                        plane, use_plane, jnp.asarray(x0, jnp.int32),
                        grid, W, K, slots, hsc, ocap_k, backend, support,
                    )
                    if sync:
                        ls.block_until_ready()
                use_plane = jnp.asarray(True)
                own_px = W if s < n_slabs - 1 else (ncx - x0 + 1)
                with profile("slab mc"):
                    enc = _slab_enc(
                        ls, iso_j, jnp.asarray(own_px, jnp.int32), grid,
                        vcap, tcap, quant,
                    )
                    if sync:
                        jax.block_until_ready(enc)
                outs.append(enc + (n_over,))
                _tr(f"slab {s} dispatched")
        _tr("loop dispatched; pulling")
        with profile("slab pull"):
            pulled = jax.device_get(outs + [counts_d])
        _tr("pulled")
        cnts = pulled[-1]
        pulled = pulled[:-1]
        if int(cnts.max()) > K:
            K = gs._bucket16(int(cnts.max()) * 5 // 4)
            _SLAB_K[kkey] = K
            continue
        totals = np.array([[int(o[3]), int(o[4]), int(o[5])] for o in pulled])
        overs = [int(o[7]) for o in pulled]
        ls_max = max(float(o[6]) for o in pulled)
        if max(overs) > ocap_k:
            _SLAB_OVER[okey] = min(
                gs._pow2(max(overs) * 2, lo=4096), gs._pow2(n)
            )
            continue
        tv_all = totals[:, 0]
        tt_all = totals[:, 1]
        tc_all = totals[:, 2]
        if tv_all.max(initial=0) > vcap or tt_all.max(initial=0) > tcap:
            _SLAB_PLAN[pkey] = (
                gs._bucket16(int(tv_all.max()) * 5 // 4),
                gs._bucket16(int(tt_all.max()) * 5 // 4),
            )
            continue
        break
    else:
        raise RuntimeError("slab reconstruction exceeded retry budget")

    # host merge: per-slab streams -> one ascending global point list.
    # outs are in DESCENDING slab order; emitted ids ascend within a slab.
    # The t stream is AXIS-major: each slab's stream is (all x-edge t's,
    # all y, all z) over its own points, while the merged decode expects
    # axis-major over the MERGED point list — split each slab's stream at
    # its per-axis counts and regroup axis-major across slabs.
    with profile("slab decode"):
        import time as _time

        _td0 = _time.perf_counter()
        from splashsurf_tpu import native

        t_ax: list = [[], [], []]
        p_parts, w_parts = [], []
        for rev_i, o in enumerate(pulled):
            s = n_slabs - 1 - rev_i
            tvi, tci = int(tv_all[rev_i]), int(tc_all[rev_i])
            off = s * W * PY * PZ
            res = native.unpack_compact(o[1], o[2], tci, point_offset=off)
            if res is not None:
                points_l, words_l = res
            else:
                points_l, words_l = gs._unpack_compact(o[1], o[2], tci)
                points_l = (points_l.astype(np.int64) + off).astype(np.int64)
            t_s = np.asarray(o[0][:tvi])
            na = [
                int(((words_l >> (8 + a)) & 1).sum()) for a in range(3)
            ]
            assert na[0] + na[1] + na[2] == tvi
            t_ax[0].append(t_s[: na[0]])
            t_ax[1].append(t_s[na[0] : na[0] + na[1]])
            t_ax[2].append(t_s[na[0] + na[1] :])
            p_parts.append(points_l)
            w_parts.append(words_l)
        # ascending global order = ascending slab order
        t_all = (
            np.concatenate(
                [seg for a in range(3) for seg in t_ax[a][::-1]]
            )
            if p_parts
            else np.zeros(0)
        )
        p_all = (
            np.concatenate(p_parts[::-1])
            if p_parts
            else np.zeros(0, np.int64)
        )
        w_all = (
            np.concatenate(w_parts[::-1])
            if w_parts
            else np.zeros(0, np.uint16)
        )
        total_v = int(tv_all.sum())
        total_t = int(tt_all.sum())
        total_c = int(tc_all.sum())
        if total_t == 0:
            gs.check_empty_field(0, ls_max, float(iso))
            return (
                np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.int32),
            )
        if p_all.max(initial=0) < np.iinfo(np.int32).max:
            p_all = p_all.astype(np.int32)
        else:
            raise ValueError(
                "slabbed grids beyond 2^31 points are not supported yet"
            )
        from splashsurf_tpu import native

        t_all = gs._dequant_t(t_all)
        dec = None
        if t_all.dtype == np.float32:
            dec = native.mc_decode(
                t_all, p_all, w_all, total_v, total_t, total_c,
                PY, PZ, grid.min, grid.cell_size,
            )
        if dec is None:
            dec = gs._decode_cellwise_mesh(
                t_all, p_all, w_all, total_v, total_t, total_c, grid
            )
    if os.environ.get("SPLASHSURF_TPU_SLAB_TRACE", "0") == "1":
        print(f"    [slab decode {_time.perf_counter()-_td0:.3f}s]", flush=True)
    return dec


def gs_dense_gate() -> int:
    """Per-SLAB cell budget (slab width = budget / (ncy*ncz)).

    Deliberately decoupled from the residency gate (160M cells): every
    r5 slab measurement (probes + the 0.293 Mp/s sparse record) ran at
    the 48M-cell slab shape, and one slab's tables+ls+MC temporaries at
    48M cells stay ~2 GB while the loop keeps two slabs' worth alive
    (plane handoff + enc outputs in flight)."""
    return int(
        os.environ.get("SPLASHSURF_TPU_SLAB_CELLS_BUDGET", 48_000_000)
    )


def reconstruct_surface_slabbed(
    positions,
    parameters,
    grid: UniformGrid,
    particle_inside_aabb=None,
    n_valid=None,
):
    """Full-frame orchestration for the x-slab streamed dense path:
    densities -> slab loop -> SurfaceReconstruction (the mid-scale analog
    of reconstruct_surface_subdomain_grid; single-device)."""
    from splashsurf_tpu import neighbors
    from splashsurf_tpu.reconstruction import SurfaceReconstruction
    from splashsurf_tpu.mesh import TriMesh3d

    positions = jnp.asarray(positions)
    dtype = positions.dtype
    support = parameters.compact_support_radius
    hsc = int(np.ceil(support / grid.cell_size))

    with profile("compute particle densities"):
        rho = neighbors.compute_particle_densities(
            positions, support, parameters.particle_rest_mass,
            n_valid=n_valid,
        )
    values = jnp.asarray(parameters.particle_rest_mass, dtype) / rho

    with profile("slab reconstruction"):
        verts, tris = reconstruct_global_slabbed(
            positions, values, grid, float(support), hsc,
            float(parameters.iso_surface_threshold),
        )

    particle_neighbors = None
    if parameters.global_neighborhood_list:
        particle_neighbors = neighbors.neighborhood_search_spatial_hashing_parallel(
            positions, support
        )
    return SurfaceReconstruction(
        grid=grid,
        mesh=TriMesh3d(vertices=verts, triangles=np.asarray(tris, np.int32)),
        particle_densities=rho,
        particle_neighbors=particle_neighbors,
        particle_inside_aabb=particle_inside_aabb,
    )
