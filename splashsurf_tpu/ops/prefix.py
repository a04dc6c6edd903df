"""Blocked prefix sums on the MXU.

XLA lowers ``jnp.cumsum`` over multi-million-element arrays to a log-depth
shifted-add ladder on the VPU — tens of full HBM passes for the compaction
cumsums that marching cubes and the rasterizer run every frame. A prefix sum
of SMALL integers is a matmul: reshape to (blocks, B), multiply by an upper-
triangular ones matrix on the MXU (bf16 x bf16 -> f32 accumulate, exact for
values <= 255 and block sums < 2**24), then add exclusive block offsets from
one tiny carry cumsum. One MXU pass + two elementwise passes total.

This is the systolic-array analog of the reference's sequential compaction
loops (e.g. marching_cubes/narrow_band_extraction.rs run-length plumbing) —
the shape the hardware wants, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _triu_ones_np(block: int):
    # numpy constant (a cached jnp array would leak tracers across traces);
    # jnp.asarray per call is constant-folded by XLA
    return np.triu(np.ones((block, block), np.float32))


def cumsum_small_i32(x, block: int = 512):
    """Inclusive prefix sum of an int32/bool 1-D array of SMALL values.

    Exactness contract: every element must satisfy ``0 <= x_i <= 255`` (bf16
    represents those integers exactly) and every block partial sum must stay
    below 2**24 (f32 MXU accumulation is exact up to there; block <= 512 and
    values <= 255 give 130k, far inside). Callers here feed 0/1 masks and
    marching-cubes triangle counts (<= 5). Totals may exceed 2**24 — the
    cross-block carry is integer arithmetic.
    """
    import os

    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    if os.environ.get("SPLASHSURF_TPU_DEBUG_CHECKS", "0") == "1":
        # Exactness-contract guard (diagnosis only — a host callback per
        # call): a caller feeding values outside [0, 255] would get silently
        # wrong prefix sums and corrupt compaction indices downstream.
        def _check(bad):
            if bad:
                raise ValueError(
                    "cumsum_small_i32: input outside the exact range "
                    "[0, 255] — route large-valued inputs to jnp.cumsum"
                )

        jax.debug.callback(_check, jnp.any((x < 0) | (x > 255)))
    n = x.shape[0]
    if n < 4 * block or os.environ.get("SPLASHSURF_TPU_MXU_CUMSUM", "1") != "1":
        return jnp.cumsum(x)
    nb = -(-n // block)
    xp = jnp.pad(x, (0, nb * block - n)).reshape(nb, block)
    within = jnp.dot(
        xp.astype(jnp.bfloat16), jnp.asarray(_triu_ones_np(block), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    bsum = within[:, -1].astype(jnp.int32)
    offs = jnp.cumsum(bsum) - bsum  # exclusive carry, exact int32
    out = within.astype(jnp.int32) + offs[:, None]
    return out.reshape(-1)[:n]


def cumsum_small_i32_blocks(x, block: int = 512):
    """Like :func:`cumsum_small_i32` but also returns the per-block prefix
    structure: ``(incl, offs, bsum)`` where ``offs`` is each block's
    EXCLUSIVE prefix (the compact rank of its first active element) and
    ``bsum`` its total, both shape (ceil(n/block),).

    Consumers use the block tables to recover source positions from compact
    ranks (packed single-scatter compaction in marching cubes) without a
    second wide scatter. Same exactness contract as cumsum_small_i32.
    """
    import os

    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    n = x.shape[0]
    nb = -(-n // block)
    if n < 4 * block or os.environ.get("SPLASHSURF_TPU_MXU_CUMSUM", "1") != "1":
        incl = jnp.cumsum(x)
        ends = jnp.minimum(
            (jnp.arange(nb, dtype=jnp.int32) + 1) * block - 1, n - 1
        )
        bincl = incl[ends]
        bsum = jnp.diff(bincl, prepend=jnp.zeros((1,), bincl.dtype))
        return incl, bincl - bsum, bsum
    xp = jnp.pad(x, (0, nb * block - n)).reshape(nb, block)
    within = jnp.dot(
        xp.astype(jnp.bfloat16), jnp.asarray(_triu_ones_np(block), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    bsum = within[:, -1].astype(jnp.int32)
    offs = jnp.cumsum(bsum) - bsum
    out = within.astype(jnp.int32) + offs[:, None]
    return out.reshape(-1)[:n], offs, bsum
