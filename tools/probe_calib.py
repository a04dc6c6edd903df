#!/usr/bin/env python
"""Hardware primitive calibration on the TPU: memory BW, scatter/gather
costs, (N,3) vs (3,N) layout. Relative numbers to direct optimization."""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def bench(fn, args_list, label):
    """Warm on args_list[0], time ONLY the remaining (fresh) inputs — the
    tunnel caches executions of identical (program, input), so re-timing
    the warmup input reports fake sub-ms walls."""
    import jax

    fn(*args_list[0]).block_until_ready()
    times = []
    for a in args_list[1:]:
        t0 = time.perf_counter()
        fn(*a).block_until_ready()
        times.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(times)*1e3:9.2f} ms")
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from splashsurf_tpu.workspace import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    M = 64 * 1024 * 1024  # 256 MB f32
    xs = [jax.device_put(rng.random(M, dtype=np.float32)) for _ in range(3)]
    bench(jax.jit(lambda x: jnp.sum(x)), [(x,) for x in xs], "sum 256MB f32")
    bench(
        jax.jit(lambda x: jnp.sum(x * 1.5 + 2.0)),
        [(x,) for x in xs],
        "muladd+sum 256MB f32",
    )

    N = 2_000_000
    T = 16_000_000
    idxs = [
        jax.device_put(rng.integers(0, T, N).astype(np.int32)) for _ in range(3)
    ]
    vals = [jax.device_put(rng.random(N, dtype=np.float32)) for _ in range(3)]

    @jax.jit
    def scat_set(i, v):
        return jnp.sum(
            jnp.zeros((T,), jnp.float32).at[i].set(v, mode="drop", unique_indices=True)
        )

    @jax.jit
    def scat_add(i, v):
        return jnp.sum(jnp.zeros((T,), jnp.float32).at[i].add(v, mode="drop"))

    @jax.jit
    def scat_min(i, v):
        return jnp.sum(jnp.full((T,), 1e30, jnp.float32).at[i].min(v, mode="drop"))

    @jax.jit
    def gath(i, v):
        big = jnp.zeros((T,), jnp.float32).at[0].set(v[0])
        return jnp.sum(big[i])

    bench(scat_set, list(zip(idxs, vals)), "scatter-set 2M rows -> 16M tbl")
    bench(scat_add, list(zip(idxs, vals)), "scatter-add 2M rows -> 16M tbl")
    bench(scat_min, list(zip(idxs, vals)), "scatter-min 2M rows -> 16M tbl")
    bench(gath, list(zip(idxs, vals)), "gather 2M rows from 16M tbl")

    idx8 = [
        jax.device_put(rng.integers(0, T, 8_000_000).astype(np.int32))
        for _ in range(3)
    ]
    val8 = [
        jax.device_put(rng.random(8_000_000, dtype=np.float32)) for _ in range(3)
    ]
    bench(scat_set, list(zip(idx8, val8)), "scatter-set 8M rows -> 16M tbl")

    # sorted (coherent) scatter indices - the MC compaction case
    sidx = [jax.device_put(np.sort(np.asarray(i))) for i in idxs]
    bench(scat_set, list(zip(sidx, vals)), "scatter-set 2M SORTED rows")

    @jax.jit
    def full_init(v):
        return jnp.sum(jnp.full((T,), v[0], jnp.float32))

    bench(full_init, [(v,) for v in vals], "full-init 64MB")

    # (N,3) vs (3,N) read cost
    p3 = [jax.device_put(rng.random((N, 3), dtype=np.float32)) for _ in range(3)]
    pt = [jax.device_put(np.ascontiguousarray(np.asarray(x).T)) for x in p3]

    @jax.jit
    def read_n3(p):
        return jnp.sum(p[:, 0]) + 2 * jnp.sum(p[:, 1]) + 3 * jnp.sum(p[:, 2])

    @jax.jit
    def read_3n(p):
        return jnp.sum(p[0]) + 2 * jnp.sum(p[1]) + 3 * jnp.sum(p[2])

    bench(read_n3, [(x,) for x in p3], "read (N,3) positions, 3 component sums")
    bench(read_3n, [(x,) for x in pt], "read (3,N) positions, 3 component sums")

    # i64 vs i32 scatter (packed-compaction candidate)
    v64 = [jax.device_put((np.asarray(v) * 1e9).astype(np.int64)) for v in vals]

    @jax.jit
    def scat_set64(i, v):
        return jnp.sum(
            jnp.zeros((T,), jnp.int64).at[i].set(v, mode="drop", unique_indices=True)
        )

    bench(scat_set64, list(zip(idxs, v64)), "scatter-set 2M i64 rows")


if __name__ == "__main__":
    main()
