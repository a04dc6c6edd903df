"""Axis-aligned bounding boxes.

Host-side AABB value type plus jittable reductions over particle arrays.
Mirrors the capability surface of the reference's ``Aabb3d``
(splashsurf_lib/src/aabb.rs:12-263) as a tiny immutable dataclass; the
parallel construction (``par_from_points``) maps to a single fused
``jnp.min``/``jnp.max`` reduction on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Aabb3d:
    """An axis-aligned bounding box given by its min/max corner (host values)."""

    min: tuple[float, float, float]
    max: tuple[float, float, float]

    def __post_init__(self):
        object.__setattr__(self, "min", tuple(float(x) for x in self.min))
        object.__setattr__(self, "max", tuple(float(x) for x in self.max))

    # -- constructors -----------------------------------------------------

    @staticmethod
    def from_points(points) -> "Aabb3d":
        """Smallest AABB enclosing the given (N, 3) points (device reduction)."""
        import jax

        lo, hi = jax.device_get(aabb_from_points(points))  # one round trip
        return Aabb3d(tuple(np.asarray(lo).tolist()), tuple(np.asarray(hi).tolist()))

    @staticmethod
    def par_from_points(points) -> "Aabb3d":
        # Parity alias: on TPU the reduction is always parallel.
        return Aabb3d.from_points(points)

    @staticmethod
    def from_min_max(min, max) -> "Aabb3d":
        """AABB with the given min and max corners (pysplashsurf.pyi:29)."""
        return Aabb3d(tuple(min), tuple(max))

    # -- queries -----------------------------------------------------------

    @property
    def mins(self) -> np.ndarray:
        return np.asarray(self.min, dtype=np.float64)

    @property
    def maxs(self) -> np.ndarray:
        return np.asarray(self.max, dtype=np.float64)

    def extents(self) -> np.ndarray:
        return self.maxs - self.mins

    def centroid(self) -> np.ndarray:
        return 0.5 * (self.mins + self.maxs)

    def is_consistent(self) -> bool:
        return bool(np.all(self.maxs >= self.mins))

    def is_degenerate(self) -> bool:
        return bool(np.any(self.maxs <= self.mins))

    def contains_point(self, x) -> bool:
        x = np.asarray(x, dtype=np.float64)
        return bool(np.all(x >= self.mins) and np.all(x <= self.maxs))

    def contains_points(self, points):
        """Vectorized membership test, jittable: (N,3) -> (N,) bool.

        Uses the reference's half-open convention for particle filtering
        (aabb.rs ``contains_point`` is inclusive; we keep inclusive).
        """
        points = jnp.asarray(points)
        lo = jnp.asarray(self.min, dtype=points.dtype)
        hi = jnp.asarray(self.max, dtype=points.dtype)
        return jnp.all((points >= lo) & (points <= hi), axis=-1)

    # -- combinators --------------------------------------------------------

    def grow_uniformly(self, margin: float) -> "Aabb3d":
        m = float(margin)
        return Aabb3d(tuple(v - m for v in self.min), tuple(v + m for v in self.max))

    def join(self, other: "Aabb3d") -> "Aabb3d":
        return Aabb3d(
            tuple(np.minimum(self.mins, other.mins).tolist()),
            tuple(np.maximum(self.maxs, other.maxs).tolist()),
        )

    @staticmethod
    def join_all(boxes: Iterable["Aabb3d"]) -> "Aabb3d":
        boxes = list(boxes)
        out = boxes[0]
        for b in boxes[1:]:
            out = out.join(b)
        return out


def aabb_from_points(points):
    """Jittable AABB reduction: (N, 3) -> ((3,), (3,)) min/max arrays."""
    points = jnp.asarray(points)
    return jnp.min(points, axis=0), jnp.max(points, axis=0)
