#!/usr/bin/env python
"""f64 reconstruction smoke on REAL TPU hardware (VERDICT r2 item 8).

Runs a small double-precision frame end-to-end on the device and checks the
mesh against the f32 run of the same scene (band agreement + closedness).
Records wall time; f64 on TPU is emulated (no native f64 MXU/VPU paths) so
this is a correctness gate, not a perf path.

Usage: python tools/f64_tpu_smoke.py [n_particles]
"""

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    import jax

    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, ".")
    import splashsurf_tpu as st
    from splashsurf_tpu.workspace import enable_persistent_cache
    from bench import make_dam_break

    enable_persistent_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    radius = 0.011
    pts32 = make_dam_break(n, radius)
    params = st.Parameters.new_relative(radius, 4.0, 1.5)

    t0 = time.perf_counter()
    rec32 = st.reconstruct_surface(pts32, params)
    t32 = time.perf_counter() - t0
    m32 = rec32.mesh
    print(f"f32: {m32.num_vertices}v/{m32.num_triangles}t in {t32:.2f}s")

    p64 = params.try_convert("float64")
    t0 = time.perf_counter()
    rec64 = st.reconstruct_surface(pts32.astype(np.float64), p64)
    t64 = time.perf_counter() - t0
    m64 = rec64.mesh
    print(f"f64: {m64.num_vertices}v/{m64.num_triangles}t in {t64:.2f}s")
    assert m64.vertices.dtype == np.float64, m64.vertices.dtype

    # band agreement: same surface to within a percent of elements
    rv = abs(m64.num_vertices - m32.num_vertices) / max(m32.num_vertices, 1)
    rt = abs(m64.num_triangles - m32.num_triangles) / max(m32.num_triangles, 1)
    assert rv < 0.01 and rt < 0.01, (rv, rt)

    # geometric agreement on the shared AABB
    lo64, hi64 = m64.vertices.min(0), m64.vertices.max(0)
    lo32, hi32 = m32.vertices.min(0), m32.vertices.max(0)
    assert np.allclose(lo64, lo32, atol=1e-3) and np.allclose(
        hi64, hi32, atol=1e-3
    ), (lo64 - lo32, hi64 - hi32)

    from splashsurf_tpu.mesh import check_mesh_consistency

    err = check_mesh_consistency(
        m64.vertices, m64.triangles, grid=rec64.grid
    )
    assert err is None, err
    print("OK: f64 TPU frame matches f32 bands; mesh closed+manifold")


if __name__ == "__main__":
    main()
