#!/usr/bin/env python
"""Regenerate tests/goldens/dataset_matrix.json (f64 geometry summaries).

Run ONLY after an intentional geometry change, on the forced-CPU test
platform, and review the resulting diff:

    JAX_PLATFORMS=cpu python tests/gen_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from test_dataset_matrix import (  # noqa: E402
    CASES, GOLDEN_CASES, GOLDEN_FILE, mesh_summary, reconstruct_case,
)

REFERENCE_DATA = "/root/reference/data"


def main():
    goldens = {}
    for case in CASES:
        fixture = case[0]
        if fixture not in GOLDEN_CASES:
            continue
        strategy = case[5][0]
        print(f"reconstructing {fixture} [{strategy}, f64] ...", flush=True)
        rec = reconstruct_case(REFERENCE_DATA, case, strategy, dtype="float64")
        goldens[fixture] = mesh_summary(rec.mesh)
        print(f"  -> {goldens[fixture]['num_triangles']} triangles")
    os.makedirs(os.path.dirname(GOLDEN_FILE), exist_ok=True)
    with open(GOLDEN_FILE, "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_FILE}")


if __name__ == "__main__":
    main()
