#!/usr/bin/env python
"""Partition cost breakdown: cumsums vs dest math vs scatters."""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import splashsurf_tpu as st
    from splashsurf_tpu import neighbors
    from splashsurf_tpu.ops import global_sweep as gs
    from splashsurf_tpu.ops.prefix import cumsum_small_i32
    from splashsurf_tpu.reconstruction import grid_for_reconstruction, _bucket_grid
    from splashsurf_tpu.workspace import enable_persistent_cache
    from bench import make_canyon

    enable_persistent_cache()
    radius = 0.011
    pts = make_canyon(8_000_000, radius)
    params = st.Parameters.new_relative(radius, 4.0, 1.5)
    grid = _bucket_grid(grid_for_reconstruction(
        pts, radius, params.compact_support_radius, params.cube_size
    ))
    W, n_slabs = 340, 8
    K = gs._bucket16(max(-(-len(pts) // n_slabs) * 5 // 4, 4096))
    pts_d = jax.device_put(pts)
    vals = jnp.ones((len(pts),), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("what",))
    def probe(p, v, what: str):
        dtype = p.dtype
        cs = jnp.asarray(grid.cell_size, dtype)
        mnx = jnp.asarray(grid.min[0], dtype)
        cx = jnp.floor((p[:, 0] - mnx) / cs).astype(jnp.int32)
        sid = jnp.clip(cx // W, 0, n_slabs - 1)
        if what == "cumsums":
            acc = jnp.int32(0)
            for s in range(n_slabs):
                r = cumsum_small_i32(sid == s)
                acc = acc + r[-1]
            return acc
        if what == "cumsums_np":
            acc = jnp.int32(0)
            for s in range(n_slabs):
                r = jnp.cumsum((sid == s).astype(jnp.int32))
                acc = acc + r[-1]
            return acc
        # one combined scatter test: dest from a single cumsum
        r = cumsum_small_i32(sid >= 0)
        dest = jnp.where(sid >= 0, sid * K + r - 1, n_slabs * K)
        if what == "scatter2d":
            buf = jnp.zeros((n_slabs * K, 3), dtype).at[dest].set(
                p, mode="drop"
            )
            return buf[5, 1] + buf[123, 2]
        if what == "scatter_cols":
            out = jnp.int32(0)
            acc = jnp.float32(0)
            for d in range(3):
                b = jnp.zeros((n_slabs * K,), dtype).at[dest].set(
                    p[:, d], mode="drop"
                )
                acc = acc + b[5] + b[123]
            return acc
        raise ValueError(what)

    for what in ("cumsums", "cumsums_np", "scatter2d", "scatter_cols"):
        float(probe(pts_d, vals, what))
        ts = []
        for rep in range(3):
            pj = pts_d + np.float32(1e-6 * (rep + 1))
            jax.block_until_ready(pj)
            t0 = time.perf_counter()
            float(probe(pj, vals, what))
            ts.append(time.perf_counter() - t0)
        print(f"  {what}: {['%.3f' % t for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
