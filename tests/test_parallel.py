"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

Guards the driver's multi-chip dry run (`__graft_entry__.dryrun_multichip`)
and the sharded reconstruction path (reference analog: Rayon task
parallelism over subdomains, dense_subdomains.rs:521-526; here the
subdomain batch axis is sharded over a jax device mesh).
"""

import jax
import numpy as np
import pytest

from splashsurf_tpu.parallel.mesh import sharded_reconstruction_demo


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_reconstruction_demo_8dev():
    info = sharded_reconstruction_demo(8)
    assert info["devices"] == 8
    assert info["subdomains"] > 8
    assert info["triangles"] > 0
    assert info["vertices"] > 0


def test_dryrun_multichip_entry():
    # The driver's exact call; must be green without env preparation.
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
