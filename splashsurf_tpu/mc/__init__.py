"""Marching cubes: generated case tables + fully vectorized triangulation."""

from splashsurf_tpu.mc.lut import (
    TRI_TABLE,
    TRI_COUNT,
    EDGE_AXIS,
    EDGE_BASE_OFFSET,
    NUM_EDGES,
)
from splashsurf_tpu.mc.dense import (
    marching_cubes,
    marching_cubes_padded,
    MarchingCubesResult,
)

__all__ = [
    "TRI_TABLE",
    "TRI_COUNT",
    "EDGE_AXIS",
    "EDGE_BASE_OFFSET",
    "NUM_EDGES",
    "marching_cubes",
    "marching_cubes_padded",
    "MarchingCubesResult",
]
