"""Tests for the MXU-blocked prefix sum (ops/prefix.py).

The compaction cumsums in marching cubes and the rasterizer run through
``cumsum_small_i32``; its exactness contract (values <= 255, block sums
< 2**24) must hold bit-for-bit against ``jnp.cumsum`` or compacted indices
silently corrupt meshes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from splashsurf_tpu.ops.prefix import cumsum_small_i32


@pytest.mark.parametrize("n", [0, 1, 7, 511, 512, 513, 2047, 2048, 2049, 100_003])
def test_matches_numpy_mask(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 2, n).astype(np.int32)
    out = np.asarray(cumsum_small_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.cumsum(x))


@pytest.mark.parametrize("hi", [5, 255])
def test_matches_numpy_counts(hi):
    rng = np.random.default_rng(hi)
    x = rng.integers(0, hi + 1, 50_000).astype(np.int32)
    out = np.asarray(cumsum_small_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.cumsum(x))


def test_bool_input():
    x = np.array([True, False, True, True] * 1000)
    out = np.asarray(cumsum_small_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.cumsum(x.astype(np.int32)))


def test_total_can_exceed_f32_exact_range():
    # 18M ones: the running total passes 2**24; the cross-block carry is
    # integer so the result must stay exact end to end.
    n = 18_000_000
    x = jnp.ones((n,), jnp.int32)
    out = cumsum_small_i32(x)
    assert int(out[-1]) == n
    assert int(out[2**24 + 5]) == 2**24 + 6
