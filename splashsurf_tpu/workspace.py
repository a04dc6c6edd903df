"""Cross-frame reuse: the TPU analog of the reference's workspace.

The reference reuses thread-local scratch allocations between frames
(splashsurf_lib/src/workspace.rs:12-79). On TPU the analogs are:

  1. jit compilation reuse — shape bucketing throughout the pipeline keeps
     per-frame shapes stable so sequences hit the jit cache after frame 1;
  2. the persistent compilation cache — compiled programs survive process
     restarts (critical here: remote TPU compiles cost minutes);
  3. device buffer reuse — handled by XLA's allocator.

``enable_persistent_cache`` is called by the CLI and bench entry points.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SPLASHSURF_TPU_CACHE", _DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir


def device_memory_stats() -> dict:
    """Peak/current device memory (counting-allocator analog,
    splashsurf/src/allocator.rs:5-82)."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return stats or {}
