"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the platform flags before jax initializes. Real-TPU behavior is
exercised by bench.py; unit/integration tests run fast and deterministic on
host CPU with 8 virtual devices for sharding tests.
"""

import os

# Force-set (the image's sitecustomize pre-sets JAX_PLATFORMS to the TPU
# tunnel and imports jax, so we must also update the config below).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Isolate tests from the production .jax_cache: it holds TPU programs and
# may hold CPU AOT entries compiled on a DIFFERENT host generation (the
# XLA cpu_aot_loader warns about mismatched machine features and loading
# such an entry segfaulted a full-suite run mid-compile). CLI/pipeline
# tests call enable_persistent_cache(), which honors this env var.
os.environ.setdefault("SPLASHSURF_TPU_CACHE", "/tmp/splashsurf_tpu_test_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# f64 support is part of the API surface (the reference is generic over
# f32/f64); enabling x64 makes dtype discipline in the library explicit.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference data directory not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _reset_geoslot_hysteresis():
    """Geoslot hysteresis is process-global; collision-heavy tests must not
    silently disable the geoslot attempt for later tests."""
    from splashsurf_tpu import neighbors

    neighbors.reset_geoslot_hysteresis()
    yield
    neighbors.reset_geoslot_hysteresis()
