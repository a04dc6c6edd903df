"""Sharded subdomain decomposition (pair expansion + sort) over the mesh.

VERDICT r3 item 4: decompose() was the last full-N replicated stage of the
multi-device pipeline — every device expanded and radix-sorted the whole
(subdomain, particle) pair set (the reference's machine participates fully
in this stage, dense_subdomains.rs:349-494). Here particles arrive sharded
P("sub"), each device expands ITS block's ghost pairs, routes every pair to
the device owning the target subdomain's x-slab with one all_to_all, and
sorts/segments only its own slab's pairs — all per-device arrays are
O(pairs/D + imbalance), never O(N).

Bit-identity with subdomains.decompose: pairs are sorted by the SAME total
key (target, raster cell, particle id), so each subdomain's pair segment —
the only thing the splat consumes — has identical content and order no
matter which device sorted it; within-(target,cell) slot ranks follow from
the same run arithmetic. tests/test_parallel_decompose.py pins it.

Remaining replicated term: particle POSITIONS stay replicated for the
splat's pid gathers (12 B/particle; the pair arrays this module shards are
~48 B/particle including ghosts). Carrying coordinates inside the routed
pairs would remove it and is the natural next refinement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splashsurf_tpu.subdomains import (
    SubdomainGridParams,
    _INT32_MAX,
    _OFFSETS27,
)


def _pow2_at_least(n: int, lo: int = 64) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


def _expand_local(px, py, pz, gidx, nv, sd: SubdomainGridParams):
    """Per-device ghost-pair expansion on position COLUMNS.

    Returns (targets, cells, mask) stacked (n_exp, Nl) — the same expansion
    subdomains.decompose performs on the full array, with identical target
    and raster-cell arithmetic (bit-identity depends on it).
    """
    dtype = px.dtype
    g = sd.global_grid
    n_sub = sd.n_sub
    m = sd.margin_cells
    R = n_sub + 2 * m
    ns = sd.num_subdomains
    num_sub = jnp.asarray(ns, jnp.int32)
    cs = jnp.asarray(g.cell_size, dtype)
    comps = (px, py, pz)
    Nl = px.shape[0]
    valid_row = (gidx < nv) & jnp.isfinite(px)

    gc = []
    for d in range(3):
        mn = jnp.asarray(g.min[d], dtype)
        gc.append(jnp.floor((comps[d] - mn) / cs).astype(jnp.int32))
    own = [
        jnp.clip(gc[d] // n_sub, -1, num_sub[d]) for d in range(3)
    ]
    local = [gc[d] - own[d] * n_sub for d in range(3)]

    targets, cells, masks = [], [], []
    if n_sub > 2 * m:
        side = [
            jnp.where(
                local[d] < m,
                jnp.int32(-1),
                jnp.where(
                    local[d] >= n_sub - m, jnp.int32(1), jnp.int32(0)
                ),
            )
            for d in range(3)
        ]
        for bits in range(8):
            use = ((bits >> 2) & 1, (bits >> 1) & 1, bits & 1)
            cond = valid_row
            t = []
            for d in range(3):
                if use[d]:
                    cond = cond & (side[d] != 0)
                    t.append(own[d] + side[d])
                else:
                    t.append(own[d])
            for d in range(3):
                cond = cond & (t[d] >= 0) & (t[d] < num_sub[d])
            tflat = (t[0] * ns[1] + t[1]) * ns[2] + t[2]
            rc = [gc[d] - t[d] * n_sub + m for d in range(3)]
            rcf = (rc[0] * R + rc[1]) * R + rc[2]
            targets.append(jnp.where(cond, tflat, _INT32_MAX))
            cells.append(jnp.where(cond, rcf, 0))
            masks.append(cond)
    else:
        for o in _OFFSETS27:
            cond = valid_row
            for d in range(3):
                if o[d] == -1:
                    cond = cond & (local[d] < m)
                elif o[d] == 1:
                    cond = cond & (local[d] >= n_sub - m)
            t = [own[d] + int(o[d]) for d in range(3)]
            for d in range(3):
                cond = cond & (t[d] >= 0) & (t[d] < num_sub[d])
            tflat = (t[0] * ns[1] + t[1]) * ns[2] + t[2]
            rc = [gc[d] - t[d] * n_sub + m for d in range(3)]
            rcf = (rc[0] * R + rc[1]) * R + rc[2]
            targets.append(jnp.where(cond, tflat, _INT32_MAX))
            cells.append(jnp.where(cond, rcf, 0))
            masks.append(cond)

    tgt = jnp.stack(targets).reshape(-1)
    cell = jnp.stack(cells).reshape(-1)
    mask = jnp.stack(masks).reshape(-1)
    pid = jnp.tile(gidx, len(targets))
    return tgt, cell, pid, mask


def _owner_of(tgt, sd: SubdomainGridParams, D: int, slab_w: int):
    ns = sd.num_subdomains
    sub_i = jnp.where(tgt == _INT32_MAX, 0, tgt) // (ns[1] * ns[2])
    return jnp.minimum(sub_i // slab_w, D - 1)


def _decorrelate(comps, D: int):
    """Re-shard position components so every device holds one sub-block of
    EVERY source block (one all_to_all of the columns).

    x-sorted inputs (np.mgrid order, many simulators) make each device's
    block x-contiguous, so nearly all its pairs target ONE slab owner and
    the uniform (D, Lsend) send buckets degenerate to O(pairs/D) each.
    After decorrelation each device samples all x-ranges and buckets are
    ~pairs/D^2. Returns (resharded comps, global row index per local row).
    """
    Nl = comps[0].shape[0]
    Ns = Nl // D
    d = jax.lax.axis_index("sub")
    out = [
        jax.lax.all_to_all(
            c.reshape(D, Ns), "sub", split_axis=0, concat_axis=0, tiled=True
        ).reshape(-1)
        for c in comps
    ]
    src = jnp.repeat(jnp.arange(D, dtype=jnp.int32), Ns)
    k = jnp.tile(jnp.arange(Ns, dtype=jnp.int32), D)
    gidx = src * Nl + d * Ns + k
    return out, gidx


@functools.lru_cache(maxsize=32)
def _stats_fn(mesh: Mesh, sd: SubdomainGridParams, D: int, slab_w: int):
    """(max send-bucket count, max per-device received pairs, max per-device
    occupied subdomains, total pairs) — all replicated scalars."""
    from jax import shard_map

    def local(px, py, pz, nv):
        (px, py, pz), gidx = _decorrelate((px, py, pz), D)
        tgt, cell, pid, mask = _expand_local(px, py, pz, gidx, nv, sd)
        owner = _owner_of(tgt, sd, D, slab_w)
        send_max = jnp.zeros((), jnp.int32)
        recv = jnp.zeros((D,), jnp.int32)
        for dst in range(D):
            c = jnp.sum(mask & (owner == dst)).astype(jnp.int32)
            send_max = jnp.maximum(send_max, c)
            recv = recv.at[dst].add(c)
        send_max = jax.lax.pmax(send_max, "sub")
        recv = jax.lax.psum(recv, "sub")
        n_pairs = jnp.sum(recv)
        # occupied subdomains per device: count distinct targets locally
        # owned — psum a (D,)-table of per-owner distinct-subdomain counts
        # would need a global table; instead count distinct targets among
        # RECEIVED pairs after routing (done in the main pass); here bound
        # it by received pairs (b_cap sizing only needs an upper bound
        # before the exact per-device count is known).
        return send_max, jnp.max(recv), n_pairs

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P("sub"), P("sub"), P()),
            out_specs=(P(), P(), P()),
        )
    )


@functools.lru_cache(maxsize=32)
def _route_sort_fn(
    mesh: Mesh, sd: SubdomainGridParams, D: int, slab_w: int,
    Lsend: int, b_cap: int,
):
    """Route pairs to slab owners, sort each device's slab locally, and
    segment occupied subdomains. Out: per-device sorted pair columns
    ((D*Lp,) global views, Lp = D*Lsend), per-device segment tables
    ((D*b_cap,)), per-device pair/segment counts ((D,))."""
    from jax import shard_map

    Lp = D * Lsend

    def local(px, py, pz, nv):
        (px, py, pz), gidx = _decorrelate((px, py, pz), D)
        tgt, cell, pid, mask = _expand_local(px, py, pz, gidx, nv, sd)
        owner = _owner_of(tgt, sd, D, slab_w)

        # send buckets (D, Lsend) per field; ascending expansion order is
        # preserved within each bucket (cumsum compaction is stable)
        send_t = jnp.full((D, Lsend), _INT32_MAX, jnp.int32)
        send_c = jnp.zeros((D, Lsend), jnp.int32)
        send_p = jnp.zeros((D, Lsend), jnp.int32)
        overflow = jnp.zeros((), jnp.int32)
        for dst in range(D):
            sel = mask & (owner == dst)
            pos = jnp.cumsum(sel) - 1
            overflow = jnp.maximum(
                overflow, jnp.sum(sel).astype(jnp.int32) - Lsend
            )
            dest = jnp.where(sel & (pos < Lsend), pos, Lsend)
            send_t = send_t.at[dst, dest].set(tgt, mode="drop")
            send_c = send_c.at[dst, dest].set(cell, mode="drop")
            send_p = send_p.at[dst, dest].set(pid, mode="drop")
        overflow = jax.lax.pmax(overflow, "sub")

        # all_to_all: row dst of this device's buckets -> device dst
        rt, rc, rp = (
            jax.lax.all_to_all(s, "sub", split_axis=0, concat_axis=0, tiled=True)
            for s in (send_t, send_c, send_p)
        )
        tgt_l = rt.reshape(-1)
        cell_l = rc.reshape(-1)
        pid_l = rp.reshape(-1)

        # local sort by the SAME total key as subdomains.decompose
        # (invalid rows carry INT32_MAX targets and sort to the tail)
        tgt_s, cell_s, pid_s = jax.lax.sort(
            (tgt_l, cell_l, pid_l), num_keys=3
        )
        n_pairs_l = jnp.sum(tgt_s != _INT32_MAX).astype(jnp.int32)

        # within-(target, cell) slot ranks (decompose's exact arithmetic)
        is_start_rc = jnp.concatenate(
            [
                jnp.array([True]),
                (tgt_s[1:] != tgt_s[:-1]) | (cell_s[1:] != cell_s[:-1]),
            ]
        )
        run_id = jnp.cumsum(is_start_rc.astype(jnp.int32)) - 1
        idx = jnp.arange(Lp, dtype=jnp.int32)
        run_starts = (
            jnp.zeros((Lp,), jnp.int32)
            .at[jnp.where(is_start_rc, run_id, Lp)]
            .set(idx, mode="drop", unique_indices=True)
        )
        rank_s = idx - run_starts[run_id]

        # occupied-subdomain segments, local (subdomains._segments_device)
        valid = tgt_s != _INT32_MAX
        is_start = jnp.concatenate(
            [valid[:1], (tgt_s[1:] != tgt_s[:-1]) & valid[1:]]
        )
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        dest = jnp.where(is_start, seg, b_cap)
        occ = (
            jnp.full((b_cap,), _INT32_MAX, jnp.int32)
            .at[dest]
            .set(tgt_s, mode="drop", unique_indices=True)
        )
        starts = (
            jnp.zeros((b_cap,), jnp.int32)
            .at[dest]
            .set(idx, mode="drop", unique_indices=True)
        )
        counts = (
            jnp.zeros((b_cap,), jnp.int32)
            .at[jnp.where(valid, seg, b_cap)]
            .add(1, mode="drop")
        )
        n_occ_l = jnp.sum(is_start).astype(jnp.int32)
        return (
            tgt_s, pid_s, cell_s, rank_s, occ, starts, counts,
            n_pairs_l[None], n_occ_l[None], overflow,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("sub"), P("sub"), P("sub"), P()),
            out_specs=(
                P("sub"), P("sub"), P("sub"), P("sub"),
                P("sub"), P("sub"), P("sub"),
                P("sub"), P("sub"), P(),
            ),
        )
    )


def decompose_sharded(
    positions, sd: SubdomainGridParams, mesh: Mesh, n_valid=None
):
    """Sharded decomposition. Returns a dict with the per-device pair
    columns (global (D*Lp,) arrays sharded P("sub")), per-device segment
    tables ((D, b_cap) as host numpy), and the layout constants the sharded
    splat planner needs (Lp, b_cap, per-device occupied counts)."""
    positions = jnp.asarray(positions)
    n = positions.shape[0]
    dtype = positions.dtype
    D = len(mesh.devices.ravel())
    ns = sd.num_subdomains
    slab_w = -(-ns[0] // D)

    Nl = -(-n // (D * D)) * D  # local rows divisible by D (_decorrelate)
    n_pad = Nl * D
    comps = [positions[:, d] for d in range(3)]
    if n_pad > n:
        # pad rows land outside the global grid and expand to no pairs
        pad = jnp.full((n_pad - n,), jnp.inf, dtype)
        comps = [jnp.concatenate([c, pad]) for c in comps]
    shard = NamedSharding(mesh, P("sub"))
    comps = [jax.device_put(c, shard) for c in comps]
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)

    send_max, recv_max, n_pairs = (
        int(x)
        for x in jax.device_get(_stats_fn(mesh, sd, D, slab_w)(*comps, nv))
    )
    Lsend = _pow2_at_least(send_max, lo=64)
    total_sub = int(np.prod(sd.num_subdomains))
    b_cap = _pow2_at_least(min(recv_max, total_sub), lo=8)
    out = _route_sort_fn(mesh, sd, D, slab_w, Lsend, b_cap)(*comps, nv)
    overflow = int(jax.device_get(out[9]))
    if overflow > 0:  # exact stats make this unreachable; guard regardless
        raise RuntimeError("sharded decompose send bucket overflow")
    n_pairs_d = np.asarray(jax.device_get(out[7])).reshape(D)
    n_occ_d = np.asarray(jax.device_get(out[8])).reshape(D)
    occ_t, starts_t, counts_t = (
        np.asarray(jax.device_get(x)).reshape(D, b_cap) for x in out[4:7]
    )
    return dict(
        tgt_s=out[0], pid_s=out[1], cell_s=out[2], rank_s=out[3],
        occ=occ_t, starts=starts_t, counts=counts_t,
        n_pairs=n_pairs, n_pairs_d=n_pairs_d, n_occ_d=n_occ_d,
        Lp=D * Lsend, b_cap=b_cap, D=D, slab_w=slab_w,
    )
