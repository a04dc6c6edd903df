"""SPH kernel functions, vectorized and branch-free.

The cubic spline kernel follows the reference semantics
(splashsurf_lib/src/kernel.rs:51-141): with compact support radius ``h``
(kernel vanishes at distance ``h``), spline parameter ``q = 2 r / h`` and
normalization ``sigma = 8 / h^3``:

    W(r) = sigma * f(q),   f(q) = (1/(4 pi)) * [ (2-q)_+^3 - 4 (1-q)_+^3 ]

which equals the piecewise form (3/(2 pi))(2/3 - q^2 + q^3/2) for q < 1 and
(1/(4 pi))(2-q)^3 for 1 <= q < 2. The clamped-polynomial rewrite is exactly
the trick the reference uses for its AVX/NEON lanes (kernel.rs:184-379) — on
TPU it runs on the VPU over whole arrays with no lane-width limit.

All functions are shape-polymorphic (apply elementwise over any leading
dims) and jit/vmap/grad friendly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_FOUR_PI = 4.0 * math.pi


def far_fill(dtype) -> float:
    """Empty-slot position sentinel: a distance so large the clamped
    cubic spline evaluates to exactly 0 (the mask-free empty-slot trick).

    f32 keeps +inf (native IEEE: W(sqrt(inf)) clamps to 0, no NaN). f64
    must use a FINITE value whose SQUARE stays within float32 range: the
    TPU X64 rewriter emulates f64 as f32 pairs (double-float), which has
    f64-like precision but only f32 DYNAMIC RANGE, and its sqrt(inf) is
    NaN — measured on hardware (tools/f64_micro.py, r5): inf sentinels
    NaN'ed 65% of the f64 densities through W(sqrt(d2)) and silently
    emptied the r4 f64 mesh, and 1e30 still overflowed on squaring.
    1e15 squares to 1e30 (< 3.4e38 even x3 components) and clamps the
    spline to exactly 0 for any physical support radius.
    """
    if np.dtype(dtype) == np.float64:
        return 1.0e15
    return float("inf")


def far_position(dtype) -> float:
    """Dummy-particle position sentinel (finite for BOTH dtypes: it feeds
    integer cell math that relies on saturation, not inf). f64 uses the
    square-safe 1e15 (see far_fill's X64-emulation range note)."""
    if np.dtype(dtype) == np.float64:
        return 1.0e15
    return 1.0e30


def cubic_function(q):
    """The normalized cubic spline f(q), support q in [0, 2)."""
    q = jnp.asarray(q)
    one = jnp.asarray(1.0, dtype=q.dtype)
    two = jnp.asarray(2.0, dtype=q.dtype)
    zero = jnp.asarray(0.0, dtype=q.dtype)
    a = jnp.maximum(two - q, zero)
    b = jnp.maximum(one - q, zero)
    return (a * a * a - 4.0 * (b * b * b)) * jnp.asarray(
        1.0 / _FOUR_PI, dtype=q.dtype
    )


def cubic_function_dq(q):
    """Derivative df/dq of the cubic spline."""
    q = jnp.asarray(q)
    one = jnp.asarray(1.0, dtype=q.dtype)
    two = jnp.asarray(2.0, dtype=q.dtype)
    zero = jnp.asarray(0.0, dtype=q.dtype)
    a = jnp.maximum(two - q, zero)
    b = jnp.maximum(one - q, zero)
    return (-3.0 * a * a + 12.0 * (b * b)) * jnp.asarray(
        1.0 / _FOUR_PI, dtype=q.dtype
    )


def cubic_kernel(r, compact_support_radius):
    """Cubic spline kernel W(r) with compact support radius h (kernel.rs:104-107)."""
    r = jnp.asarray(r)
    h = jnp.asarray(compact_support_radius, dtype=r.dtype)
    sigma = 8.0 / (h * h * h)
    q = (r + r) / h
    return sigma * cubic_function(q)


def cubic_kernel_rsq(r_sq, compact_support_radius):
    """W evaluated from squared distances (saves a mul on the hot path)."""
    r_sq = jnp.asarray(r_sq)
    return cubic_kernel(jnp.sqrt(r_sq), compact_support_radius)


def cubic_kernel_gradient(dx, compact_support_radius):
    """Gradient of W at offset(s) ``dx``: (..., 3) -> (..., 3) (kernel.rs:110-130).

    The gradient at the origin is zero (the reference divides by r and relies
    on callers to avoid r=0; we guard it).
    """
    dx = jnp.asarray(dx)
    h = jnp.asarray(compact_support_radius, dtype=dx.dtype)
    sigma = 8.0 / (h * h * h)
    r = jnp.linalg.norm(dx, axis=-1, keepdims=True)
    safe_r = jnp.where(r > 0, r, jnp.asarray(1.0, dtype=dx.dtype))
    drdx = jnp.where(r > 0, dx / safe_r, jnp.zeros_like(dx))
    q = (r + r) / h
    dfdq = cubic_function_dq(q)
    dqdr = 2.0 / h
    return drdx * (sigma * dfdq * dqdr)


def cubic_kernel_gradient_norm(r, compact_support_radius):
    """Signed magnitude of the kernel gradient at radius r (kernel.rs:133-140)."""
    r = jnp.asarray(r)
    h = jnp.asarray(compact_support_radius, dtype=r.dtype)
    sigma = 8.0 / (h * h * h)
    q = (r + r) / h
    return sigma * cubic_function_dq(q) * (2.0 / h)


def cube_particle_volume(particle_radius):
    """Volume of a particle modeled as a cube of fluid: (2r)^3 (kernel.rs:28-30)."""
    return (2.0 * particle_radius) ** 3


def sphere_particle_volume(particle_radius):
    """Volume of a particle modeled as a sphere of fluid (kernel.rs:33-35)."""
    return (4.0 / 3.0) * math.pi * particle_radius**3


class DiscreteSquaredDistanceCubicKernel:
    """LUT kernel over squared distances (kernel.rs:497-545 parity).

    Precomputes ``n`` samples of W over squared radii in [0, h^2]; evaluation
    is a single gather. Provided for API parity and as a cheap alternative on
    hosts; the branch-free polynomial above is preferred on TPU.
    """

    def __init__(self, n: int, compact_support_radius: float, dtype=np.float32):
        self.n = int(n)
        self.compact_support_radius = float(compact_support_radius)
        r_sq = (np.arange(self.n, dtype=np.float64) + 0.5) * (
            self.compact_support_radius**2 / self.n
        )
        r = np.sqrt(r_sq)
        h = self.compact_support_radius
        sigma = 8.0 / h**3
        q = 2.0 * r / h
        a = np.maximum(2.0 - q, 0.0)
        b = np.maximum(1.0 - q, 0.0)
        w = sigma * (a**3 - 4.0 * b**3) / _FOUR_PI
        self.values = jnp.asarray(w.astype(dtype))
        self._scale = self.n / (self.compact_support_radius**2)

    def evaluate(self, r_sq):
        r_sq = jnp.asarray(r_sq)
        idx = jnp.clip(
            (r_sq * jnp.asarray(self._scale, dtype=r_sq.dtype)).astype(jnp.int32),
            0,
            self.n - 1,
        )
        out = self.values[idx]
        return jnp.where(
            r_sq
            >= jnp.asarray(self.compact_support_radius**2, dtype=r_sq.dtype),
            jnp.zeros_like(out),
            out,
        )
