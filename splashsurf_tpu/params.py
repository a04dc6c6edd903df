"""Reconstruction parameters.

Mirrors the parameter surface of the reference's ``Parameters<R>``
(splashsurf_lib/src/lib.rs:157-243) and ``SpatialDecomposition`` /
``GridDecompositionParameters`` (lib.rs:119-154) as frozen dataclasses that
are hashable, so they can be passed as static arguments to jitted functions.

All distances are absolute (not relative to the particle radius); use
:meth:`Parameters.new_relative` for the CLI-style relative parameterization
(support = 2 * smoothing_length * radius, cube = cube_size_rel * radius;
reference: splashsurf/src/reconstruct.rs:628-629).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np

from splashsurf_tpu.aabb import Aabb3d


class SpatialDecomposition(enum.Enum):
    """Spatial decomposition strategy for the reconstruction.

    ``NONE`` runs a single global dense marching-cubes grid (only viable for
    small domains); ``UNIFORM_GRID`` decomposes the domain into cubic
    subdomains that form a batch axis for the TPU (reference:
    lib.rs:120-129).
    """

    NONE = "none"
    UNIFORM_GRID = "uniform_grid"


@dataclasses.dataclass(frozen=True)
class GridDecompositionParameters:
    """Parameters of the uniform-grid subdomain decomposition (lib.rs:138-154)."""

    subdomain_num_cubes_per_dim: int = 64
    auto_disable: bool = True


@dataclasses.dataclass(frozen=True)
class Parameters:
    """Parameters for the surface reconstruction (lib.rs:157-243)."""

    particle_radius: float
    compact_support_radius: float
    cube_size: float
    rest_density: float = 1000.0
    iso_surface_threshold: float = 0.6
    particle_aabb: Optional[Aabb3d] = None
    spatial_decomposition: SpatialDecomposition = SpatialDecomposition.UNIFORM_GRID
    grid_decomposition: GridDecompositionParameters = GridDecompositionParameters()
    global_neighborhood_list: bool = False
    dtype: str = "float32"

    def __post_init__(self):
        if not self.cube_size > 0.0:
            raise ValueError(f"cube_size must be positive, got {self.cube_size}")
        if not self.compact_support_radius > 0.0:
            raise ValueError(
                f"compact_support_radius must be positive, got {self.compact_support_radius}"
            )
        if not self.particle_radius > 0.0:
            raise ValueError(
                f"particle_radius must be positive, got {self.particle_radius}"
            )
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"dtype must be float32 or float64, got {self.dtype}")

    # -- constructors --------------------------------------------------------

    @staticmethod
    def new(
        particle_radius: float, compact_support_radius: float, cube_size: float, **kw
    ) -> "Parameters":
        return Parameters(
            particle_radius=particle_radius,
            compact_support_radius=compact_support_radius,
            cube_size=cube_size,
            **kw,
        )

    @staticmethod
    def new_relative(
        particle_radius: float,
        relative_compact_support_radius: float,
        relative_cube_size: float,
        **kw,
    ) -> "Parameters":
        """Parameters relative to the particle radius (lib.rs:216-226)."""
        return Parameters(
            particle_radius=particle_radius,
            compact_support_radius=particle_radius * relative_compact_support_radius,
            cube_size=particle_radius * relative_cube_size,
            **kw,
        )

    # -- derived physical quantities ------------------------------------------

    @property
    def particle_rest_volume(self) -> float:
        """Volume of a particle modeled as a cube of fluid, (2r)^3 (kernel.rs:28-30)."""
        return float((2.0 * self.particle_radius) ** 3)

    @property
    def particle_rest_mass(self) -> float:
        return self.particle_rest_volume * float(self.rest_density)

    @property
    def np_dtype(self):
        return np.dtype(self.dtype)

    def try_convert(self, dtype: str) -> "Parameters":
        return dataclasses.replace(self, dtype=dtype)
