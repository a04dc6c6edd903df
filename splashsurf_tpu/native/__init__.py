"""Native (C++) components: sequential mesh-topology hot paths.

The collapse-based post-processing (MC cleanup, barnacle decimation) is
inherently sequential host work; the C++ engine here runs it at native
speed over flat arrays, loaded via ctypes. Falls back to the pure-Python
half-edge implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "halfedge.cpp"), os.path.join(_DIR, "mc_decode.cpp")]
_SRC = _SRCS[0]
_LIB = os.path.join(_DIR, "libhalfedge.so")
_LOCK = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _LIB + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def _warn_fallback(reason: str) -> None:
    import warnings

    warnings.warn(
        "splashsurf_tpu native half-edge engine unavailable "
        f"({reason}); falling back to the pure-Python implementation — "
        "mesh cleanup/decimation will be MUCH slower on large meshes",
        RuntimeWarning,
        stacklevel=3,
    )


def load():
    """Load (building on first use) the native library, or None."""
    global _lib, _tried
    with _LOCK:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = max(os.path.getmtime(s) for s in _SRCS)
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
            if not _build():
                _warn_fallback("g++ build failed or no compiler available")
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _warn_fallback(f"could not load {_LIB}: {e}")
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.mc_cleanup.restype = ctypes.c_int64
        lib.mc_cleanup.argtypes = [
            f64p, ctypes.c_int64, i64p, ctypes.c_int64,
            i64p, f64p, ctypes.c_double, ctypes.c_int64, u8p, i64p,
        ]
        lib.process_collapses.restype = ctypes.c_int64
        lib.process_collapses.argtypes = [
            f64p, ctypes.c_int64, i64p, ctypes.c_int64,
            i64p, ctypes.c_int64, u8p, i64p,
        ]
        lib.vertex_ring_sizes.restype = None
        lib.vertex_ring_sizes.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.mc_decode.restype = ctypes.c_int64
        lib.mc_decode.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64,  # t, total_v, total_t
            i32p, u16p, ctypes.c_int64,  # points, words, total_c
            ctypes.c_int64, ctypes.c_int64,  # PY, PZ
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i8p, ctypes.c_int64,  # tri_table, n_slots
            u8p,  # tri_count
            i8p, i8p,  # edge_axis, edge_base
            f32p, i32p,  # verts_out, tris_out
        ]
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.mc_decode_sub.restype = ctypes.c_int64
        lib.mc_decode_sub.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64,  # t, total_v, total_t
            u32p, ctypes.c_int64,  # packed, total_c
            i32p, i32p, ctypes.c_int64,  # run_counts, run_base, n_runs
            ctypes.c_int64,  # ns
            ctypes.c_int64, ctypes.c_int64,  # NPY, NPZ
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i8p, ctypes.c_int64,  # tri_table, n_slots
            u8p,  # tri_count
            i8p, i8p,  # edge_axis, edge_base
            f32p, i32p,  # verts_out, tris_out
        ]
        lib.unpack_compact.restype = ctypes.c_int64
        lib.unpack_compact.argtypes = [
            u16p, ctypes.c_int64,  # packed, total_c
            u8p, ctypes.c_int64,  # bsum, n_blocks
            ctypes.c_int64,  # point_offset
            i32p, u16p,  # points_out, words_out
        ]
        _lib = lib
        return _lib


def mc_decode(t, points, words, total_v: int, total_t: int, total_c: int,
              PY: int, PZ: int, grid_min, cell_size: float):
    """Decode the compact (t, points, words) MC transfer into (verts, tris).

    Returns None when the native library is unavailable (caller falls back
    to the numpy decoder)."""
    lib = load()
    if lib is None:
        return None
    from splashsurf_tpu.mc import lut

    t = np.ascontiguousarray(np.asarray(t)[:total_v], dtype=np.float32)
    points = np.ascontiguousarray(np.asarray(points)[:total_c], dtype=np.int32)
    words = np.ascontiguousarray(np.asarray(words)[:total_c], dtype=np.uint16)
    tri_table = np.ascontiguousarray(
        np.where(lut.TRI_TABLE >= 0, lut.TRI_TABLE, 0), dtype=np.int8
    )
    tri_count = np.ascontiguousarray(lut.TRI_COUNT, dtype=np.uint8)
    edge_axis = np.ascontiguousarray(lut.EDGE_AXIS, dtype=np.int8)
    edge_base = np.ascontiguousarray(lut.EDGE_BASE_OFFSET, dtype=np.int8)
    verts = np.empty((max(total_v, 1), 3), np.float32)
    tris = np.empty((max(total_t, 1), 3), np.int32)
    n = lib.mc_decode(
        t, total_v, total_t, points, words, total_c, PY, PZ,
        float(grid_min[0]), float(grid_min[1]), float(grid_min[2]),
        float(cell_size),
        tri_table, tri_table.shape[1], tri_count, edge_axis, edge_base,
        verts, tris,
    )
    if n != total_t:
        raise RuntimeError(
            f"native mc_decode inconsistency: wrote {n} of {total_t} triangles"
        )
    return verts[:total_v], tris[:total_t]


def mc_decode_sub(t, packed, run_counts, run_base, total_v: int, total_t: int,
                  ns: int, NPY: int, NPZ: int, grid_min, cell_size: float,
                  quant_t: bool):
    """Decode the subdomain-path OWNED-point encoded transfer into
    (verts f32, tris i32). Returns None when the native library is
    unavailable (caller falls back to the numpy decoder)."""
    lib = load()
    if lib is None:
        return None
    from splashsurf_tpu.mc import lut

    t = np.asarray(t)
    if quant_t:
        t = t.astype(np.float32) * np.float32(1.0 / 65535.0)
    t = np.ascontiguousarray(t, dtype=np.float32)
    packed = np.ascontiguousarray(np.asarray(packed), dtype=np.uint32)
    run_counts = np.ascontiguousarray(run_counts, dtype=np.int32)
    run_base = np.ascontiguousarray(run_base, dtype=np.int32)
    tri_table = np.ascontiguousarray(
        np.where(lut.TRI_TABLE >= 0, lut.TRI_TABLE, 0), dtype=np.int8
    )
    tri_count = np.ascontiguousarray(lut.TRI_COUNT, dtype=np.uint8)
    edge_axis = np.ascontiguousarray(lut.EDGE_AXIS, dtype=np.int8)
    edge_base = np.ascontiguousarray(lut.EDGE_BASE_OFFSET, dtype=np.int8)
    verts = np.empty((max(total_v, 1), 3), np.float32)
    tris = np.empty((max(total_t, 1), 3), np.int32)
    n = lib.mc_decode_sub(
        t, total_v, total_t, packed, packed.shape[0],
        run_counts, run_base, run_counts.shape[0], ns, NPY, NPZ,
        float(grid_min[0]), float(grid_min[1]), float(grid_min[2]),
        float(cell_size),
        tri_table, tri_table.shape[1], tri_count, edge_axis, edge_base,
        verts, tris,
    )
    if n != total_t:
        raise RuntimeError(
            f"native mc_decode_sub inconsistency: wrote {n} of {total_t} triangles"
        )
    return verts[:total_v], tris[:total_t]


def unpack_compact(packed, bsum, total_c: int, point_offset: int = 0):
    """Native inverse of the packed point compaction (points, words).
    Returns None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(np.asarray(packed)[:total_c], np.uint16)
    bsum = np.ascontiguousarray(np.asarray(bsum), np.uint8)
    points = np.empty(max(total_c, 1), np.int32)
    words = np.empty(max(total_c, 1), np.uint16)
    r = lib.unpack_compact(
        packed, total_c, bsum, bsum.shape[0], point_offset, points, words
    )
    if r != 0:
        raise RuntimeError("native unpack_compact inconsistency")
    return points[:total_c], words[:total_c]


def available() -> bool:
    return load() is not None


def mc_cleanup(vertices, triangles, nearest_grid_point, grid_coords,
               max_snap_distance_sq: float, max_iter: int):
    """Run the native Moore/Warren cleanup. Returns
    (vertices, triangles_raw, tri_valid, vert_owner, n_collapses)."""
    lib = load()
    verts = np.ascontiguousarray(vertices, dtype=np.float64)
    tris = np.ascontiguousarray(triangles, dtype=np.int64)
    ngp = np.ascontiguousarray(nearest_grid_point, dtype=np.int64)
    gc = np.ascontiguousarray(grid_coords, dtype=np.float64)
    tri_valid = np.zeros(len(tris), np.uint8)
    owner = np.zeros(len(verts), np.int64)
    n = lib.mc_cleanup(
        verts, len(verts), tris, len(tris), ngp, gc,
        float(max_snap_distance_sq), int(max_iter), tri_valid, owner,
    )
    return verts, tris, tri_valid.astype(bool), owner, int(n)


def process_collapses(vertices, triangles, pairs):
    """Run a legality-checked collapse queue natively."""
    lib = load()
    verts = np.ascontiguousarray(vertices, dtype=np.float64)
    tris = np.ascontiguousarray(triangles, dtype=np.int64)
    pr = np.ascontiguousarray(pairs, dtype=np.int64).reshape(-1)
    tri_valid = np.zeros(len(tris), np.uint8)
    owner = np.zeros(len(verts), np.int64)
    n = lib.process_collapses(
        verts, len(verts), tris, len(tris), pr, len(pr) // 2, tri_valid, owner
    )
    return verts, tris, tri_valid.astype(bool), owner, int(n)


def vertex_ring_sizes(triangles, num_vertices: int) -> np.ndarray:
    lib = load()
    tris = np.ascontiguousarray(triangles, dtype=np.int64)
    out = np.zeros(num_vertices, np.int64)
    lib.vertex_ring_sizes(tris, len(tris), num_vertices, out)
    return out
