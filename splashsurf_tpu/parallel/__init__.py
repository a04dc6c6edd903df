"""Multi-device parallelism: subdomain batches sharded over the TPU mesh."""

from splashsurf_tpu.parallel.mesh import (
    make_mesh,
    sharded_levelset_step,
    sharded_reconstruction_demo,
)

__all__ = ["make_mesh", "sharded_levelset_step", "sharded_reconstruction_demo"]
