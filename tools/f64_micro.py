#!/usr/bin/env python
"""Micro-probe: f64 primitive semantics on the real TPU (X64 emulation).

Checks the exact building blocks the density/splat paths rely on, plus
which density formulation the gate picked and a naive-oracle comparison.
"""

import os
import sys

os.environ.setdefault("SPLASHSURF_TPU_DENSITY_PALLAS", "0")

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from splashsurf_tpu import kernels, neighbors

    print("# devices:", jax.devices(), file=sys.stderr, flush=True)

    @jax.jit
    def prims(x):
        return (
            jnp.sqrt(x),
            jnp.maximum(jnp.asarray(2.0, x.dtype) - x, 0.0),
            kernels.cubic_kernel(x, jnp.asarray(0.1, x.dtype)),
            x * 0.0,
            x - x,
        )

    x = jnp.asarray([np.inf, 1.0e30, 1e15, 0.5, 0.0], jnp.float64)
    names = ["sqrt", "max(2-x,0)", "W(x,h=.1)", "x*0", "x-x"]
    outs = jax.device_get(prims(x))
    for nm, o in zip(names, outs):
        print(f"  {nm}: {o}", flush=True)

    # sum-of-kernel over a padded table: the exact density inner pattern
    @jax.jit
    def wsum(pos, q):
        d = pos - q
        return jnp.sum(kernels.cubic_kernel(jnp.abs(d), jnp.asarray(0.1, d.dtype)))

    pos = jnp.asarray([0.01, 0.02, 1.0e30, 1.0e30], jnp.float64)
    print("  wsum(finite-sentinel table):", float(wsum(pos, jnp.asarray(0.015, jnp.float64))), flush=True)
    pos_inf = jnp.asarray([0.01, 0.02, np.inf, np.inf], jnp.float64)
    print("  wsum(inf table):", float(wsum(pos_inf, jnp.asarray(0.015, jnp.float64))), flush=True)

    # small real scene: which gate path, naive vs production
    from bench import make_dam_break

    pts = jnp.asarray(make_dam_break(2000, 0.011).astype(np.float64))
    support = 4.0 * 0.011
    mass = 1.0
    rho = neighbors.compute_particle_densities(pts, support, mass)
    rho = np.asarray(rho)
    print("  gate:", {k: v for k, v in neighbors.LAST_GATE.items()}, flush=True)
    print(f"  rho: nans={int(np.isnan(rho).sum())}/{len(rho)} "
          f"min={np.nanmin(rho):.4g} max={np.nanmax(rho):.4g}", flush=True)

    # naive oracle on device (2000^2 pairs)
    @jax.jit
    def naive(p):
        d2 = sum((p[:, None, d] - p[None, :, d]) ** 2 for d in range(3))
        return jnp.sum(
            kernels.cubic_kernel(jnp.sqrt(d2), jnp.asarray(support, p.dtype)),
            axis=1,
        ) * mass
    rn = np.asarray(naive(pts))
    print(f"  naive: nans={int(np.isnan(rn).sum())} "
          f"min={rn.min():.4g} max={rn.max():.4g}", flush=True)
    ok = np.isfinite(rho)
    if ok.any():
        rel = np.abs(rho[ok] - rn[ok]) / rn[ok]
        print(f"  finite-rho vs naive: max rel err {rel.max():.3g}", flush=True)


if __name__ == "__main__":
    main()
